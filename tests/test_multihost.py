"""Multi-host serving driver (parallel/multihost.py) across REAL processes.

VERDICT r1 #6: host-0 HTTP/session loop + follower replay, exercised with 2
localhost jax.distributed CPU processes (each owning one device of a global
tp=2 mesh). One complete + verify round trip runs end-to-end; the greedy
tokens must match a plain single-process run of the same model, and the
teacher-forced replay score must be exactly 1.0 (same engine, same mesh).
The failure policy (step failure → OP_CLEAR resync, error surfaced) is
documented in the module and unit-tested via the proxy protocol below.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(argv_list, env, tmp_path, timeout=540):
    """Spawn the worker processes with stdout+stderr redirected to FILES and
    wait for all of them; returns [(returncode, log_tail)].

    Never use subprocess.PIPE here: nothing drains the pipes while the
    processes run, and XLA's cpu_aot_loader can emit >64 KB of warnings on
    a warm persistent compile cache (machine-feature mismatch notes) —
    enough to fill a pipe buffer and block a worker mid-write while its
    peer waits on it in a distributed barrier (round-5 deadlock)."""
    logs = [open(tmp_path / f"mh_worker{i}.log", "w+b")
            for i in range(len(argv_list))]
    procs = [subprocess.Popen(argv, env=env, stdout=logs[i],
                              stderr=subprocess.STDOUT)
             for i, argv in enumerate(argv_list)]
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=20)
    out = []
    for i, p in enumerate(procs):
        logs[i].flush()
        logs[i].seek(0)
        out.append((p.returncode, logs[i].read().decode()[-4000:]))
        logs[i].close()
    return out


@pytest.fixture(scope="module")
def gguf(tmp_path_factory):
    from blama_tpu.gguf import GGMLType
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path_factory.mktemp("mh") / "mh.gguf")
    write_tiny_llama(p, GGMLType.Q8_0, spec={"n_head": 8, "n_head_kv": 4})
    return p


def _single_process_tokens(gguf):
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams

    m = Model(gguf, ModelParams())
    inst = Instance(m, InstanceInitParams(ctx_size=64, fast_greedy=False))
    s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    toks = [p.token for p in s.complete(CompleteParams(max_tokens=6))]
    inst.stop_session()
    m.close()
    return toks


def test_two_process_serve_and_verify(gguf, tmp_path):
    """2 jax.distributed processes serve one request end-to-end: host 0 runs
    the session, host 1 mirrors every engine call; replay verifies at 1.0."""
    port = _free_port()
    out = str(tmp_path / "result.json")
    env = {**os.environ, "PYTHONPATH": ROOT,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    worker = os.path.join(ROOT, "tests", "multihost_worker.py")
    # worker args: proc nproc port gguf out [mode] [local]
    results = _run_workers(
        [[sys.executable, worker, str(i), "2", str(port), gguf, out]
         for i in range(2)], env, tmp_path)
    for rc, tail in results:
        assert rc == 0, f"proc rc={rc}\nlog:\n{tail}"
    with open(out) as f:
        result = json.load(f)
    assert result["n_processes"] == 2
    assert result["score"] == 1.0  # same-engine replay: bit-exact top-10
    # the global-tp=2 multihost engine must agree with plain single-process
    assert result["tokens"] == _single_process_tokens(gguf)


def test_two_process_scheduler(gguf, tmp_path):
    """Continuous batching across 2 jax.distributed processes (VERDICT r4
    #5): host 0 runs ContinuousBatchingScheduler (paged pool + horizon mode)
    over the global tp=2 mesh, broadcasting every device dispatch via
    SchedulerHostLoop; host 1 replays them. Two concurrent requests complete;
    a teacher-forced verify row replays request 0 at score 1.0; the tokens
    match the same scheduler config single-process."""
    port = _free_port()
    out = str(tmp_path / "result.json")
    env = {**os.environ, "PYTHONPATH": ROOT,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    worker = os.path.join(ROOT, "tests", "multihost_worker.py")
    results = _run_workers(
        [[sys.executable, worker, str(i), "2", str(port), gguf, out, "sched"]
         for i in range(2)], env, tmp_path)
    for rc, tail in results:
        assert rc == 0, f"proc rc={rc}\nlog:\n{tail}"
    with open(out) as f:
        result = json.load(f)
    assert result["n_processes"] == 2
    assert result["score"] == 1.0  # same-engine replay: bit-exact top-10

    # the multihost scheduler must agree with the same scheduler config
    # run in ONE process (no mesh): same admission order, same greedy rows
    import threading

    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.server.scheduler import (ContinuousBatchingScheduler,
                                            GenRequest)

    m = Model(gguf, ModelParams())
    sched = ContinuousBatchingScheduler(
        m, max_batch=2, ctx_size=64, paged=True, page_size=8, horizon=4)
    results = {}
    done = threading.Event()

    def on_done(i):
        def cb(preds):
            results[i] = preds
            if len(results) == 2:
                done.set()
        return cb

    sched.start()
    for i, p in enumerate(["hello world", "the quick brown"]):
        sched.submit(GenRequest(prompt=m.vocab.tokenize(p, True, True),
                                max_tokens=6, on_done=on_done(i)))
    assert done.wait(timeout=300)
    sched.stop()
    m.close()
    solo = [[p.token for p in results[i]] for i in range(2)]
    assert result["tokens"] == solo


def test_host_loop_failure_policy(gguf, monkeypatch):
    """A failing engine step on host 0 broadcasts OP_CLEAR (resync) and
    re-raises — the documented failure policy. Single-process: broadcasts
    are identity, so this pins the protocol-level behavior."""
    from blama_tpu.parallel import multihost as mh
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams

    m = Model(gguf, ModelParams())
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    loop = mh.HostLoop(inst, max_chunk=16)
    sent = []
    monkeypatch.setattr(loop, "_bcast",
                        lambda op, args=(0, 0, 0), tokens=None, positions=None:
                        sent.append(op))

    def boom(tokens, positions):
        raise RuntimeError("injected step failure")

    monkeypatch.setattr(inst, "decode", boom)
    with pytest.raises(RuntimeError, match="injected step failure"):
        loop.decode([1, 2, 3], np.arange(3))
    assert sent == [mh.OP_DECODE, mh.OP_CLEAR]
    # the instance cache was cleared to a consistent empty state
    assert int(np.asarray(inst.cache.positions).max()) == -1
    m.close()


def test_two_process_quantized_70b_shaped(tmp_path):
    """70B-config rehearsal (BASELINE config #5, scaled): PACKED q4k_a8
    weights (ShardedQuant islands, tp_blocks fixed topology) + INT8 KV with
    the tp=4 axis SPANNING two jax.distributed processes (2 virtual devices
    each) — the multi-host packed-weight leg VERDICT r3 flagged missing.
    Greedy tokens must match the same engine solo; replay scores 1.0."""
    from blama_tpu.gguf import GGMLType
    from blama_tpu.testing import write_tiny_llama

    gguf = str(tmp_path / "q70b.gguf")
    # 70B-ish structure scaled down: GQA 8/4 heads, K dims % (tp*256) == 0
    write_tiny_llama(gguf, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))
    port = _free_port()
    out = str(tmp_path / "result.json")
    env = {**os.environ, "PYTHONPATH": ROOT, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(ROOT, "tests", "multihost_worker.py")
    results = _run_workers(
        [[sys.executable, worker, str(i), "2", str(port), gguf, out,
          "quant", "2"] for i in range(2)], env, tmp_path)
    for rc, tail in results:
        assert rc == 0, f"proc rc={rc}\nlog:\n{tail}"
    with open(out) as f:
        result = json.load(f)
    assert result["score"] == 1.0

    # same engine solo (q4k_a8 + tp_blocks=4 + int8 KV, single process):
    # fixed-topology paths make the tokens match the cross-host engine
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams

    m = Model(gguf, ModelParams(dtype="q4k_a8", tp_blocks=4))
    inst = Instance(m, InstanceInitParams(ctx_size=64, kv_dtype="int8",
                                          fast_greedy=False))
    s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s.set_initial_prompt(m.vocab.tokenize("hello world", True, True))
    solo = [p.token for p in s.complete(CompleteParams(max_tokens=6))]
    inst.stop_session()
    m.close()
    assert result["tokens"] == solo


def test_two_process_http_serving(gguf, tmp_path):
    """The full serving topology (north star): host 0 runs the HTTP server +
    continuous-batching scheduler over the global tp=2 mesh and broadcasts
    every device dispatch; host 1 replays them. A /complete then
    /verify_completion round trip through real HTTP scores 1.0."""
    import json as _json
    import time
    import urllib.request

    port = _free_port()
    http_port = _free_port()
    env_base = {**os.environ, "PYTHONPATH": ROOT, "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
                "BLAMA_MULTIHOST": "1", "BLAMA_SCHEDULER": "2",
                "BLAMA_HORIZON": "4", "BLAMA_MODEL": gguf,
                "BLAMA_COORD": f"127.0.0.1:{port}", "BLAMA_NPROC": "2",
                "BLAMA_PORT": str(http_port), "BLAMA_HOST": "127.0.0.1"}
    worker = os.path.join(ROOT, "tests", "http_multihost_worker.py")
    # stdout/stderr go to FILES, not pipes: nobody drains a PIPE while the
    # workers run, and XLA's cpu_aot_loader can emit >64 KB of warnings on
    # a warm persistent cache (machine-feature mismatch notes) — enough to
    # fill the pipe buffer and block the worker mid-write before the HTTP
    # server ever comes up (round-5 flake root cause).
    logs = [open(tmp_path / f"worker{i}.log", "w+b") for i in range(2)]
    procs = [
        subprocess.Popen([sys.executable, worker],
                         env={**env_base, "BLAMA_PROC_ID": str(i)},
                         stdout=logs[i], stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    try:
        resp = None
        deadline = time.time() + 240
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                break
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{http_port}/complete",
                    _json.dumps({"prompt": "hello world",
                                 "max_tokens": 6}).encode())
                resp = _json.load(urllib.request.urlopen(req, timeout=30))
                break
            except Exception:
                time.sleep(2.0)

        def _tails():
            out = []
            for i, p in enumerate(procs):
                logs[i].flush()
                logs[i].seek(0)
                out.append((p.poll(), logs[i].read().decode()[-1500:]))
            return out
        assert resp is not None and len(resp["tokenData"]) > 0, _tails()
        vreq = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/verify_completion",
            _json.dumps({"request": {"prompt": "hello world",
                                     "max_tokens": 6},
                         "response": resp}).encode())
        score = _json.load(urllib.request.urlopen(vreq, timeout=120))
        assert score["result"] == 1.0
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
        for f in logs:
            f.close()
