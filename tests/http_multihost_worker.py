"""Worker for tests/test_multihost.py::test_two_process_http_serving: run
the HTTP server entrypoint in multihost mode on the CPU platform."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from blama_tpu.server.http import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
