"""Smoke tests for the example programs (reference keeps examples building in
CI; we run them end-to-end on tiny fixtures)."""

import runpy
import sys

import pytest


@pytest.mark.parametrize("example", ["e_verify", "e_server_cli"])
def test_example_runs(example, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [f"{example}.py"])
    runpy.run_path(f"examples/{example}.py", run_name="__main__")
    out = capsys.readouterr().out
    if example == "e_verify":
        assert "ACCEPT" in out
    else:
        assert "completion:" in out
