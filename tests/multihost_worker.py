"""Worker process for tests/test_multihost.py: one of N jax.distributed
localhost CPU processes serving a complete + verify round trip via
parallel.multihost.HostLoop (host 0 drives, others follow)."""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    gguf = sys.argv[4]
    out_path = sys.argv[5]
    # mode "quant" = the 70B-config rehearsal (BASELINE config #5 shape):
    # PACKED q4k_a8 weights as ShardedQuant islands + tp_blocks fixed
    # topology + INT8 KV, with the tp axis SPANNING the two processes
    # (2 local devices each) — the packed-weight multi-host leg VERDICT r3
    # flagged as missing. "dense" = the original dense tp=nproc leg.
    mode = sys.argv[6] if len(sys.argv) > 6 else "dense"
    local_devices = int(sys.argv[7]) if len(sys.argv) > 7 else 1

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from blama_tpu.parallel import multihost as mh

    mh.initialize(f"127.0.0.1:{port}", nproc, proc_id)
    assert jax.device_count() == nproc * local_devices, jax.devices()
    mesh = mh.global_mesh(dp=1, tp=nproc * local_devices)

    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.runtime.verify import LogitComparer, MetricsAggregator

    if mode == "sched":
        # continuous batching under jax.distributed (VERDICT r4 #5): host 0
        # runs the scheduler + sampling and broadcasts each device dispatch;
        # the follower replays them (SchedulerHostLoop). Two concurrent
        # requests + a teacher-forced verify row, paged pool + horizon mode.
        _sched_mode(gguf, mesh, out_path)
        return
    if mode == "quant":
        model = Model(gguf, ModelParams(dtype="q4k_a8", mesh=mesh,
                                        tp_blocks=4))
        from blama_tpu.ops.pallas.quant_matmul import ShardedQuant

        l0 = model.weights["layers"][0]
        assert isinstance(l0["wq"], ShardedQuant), type(l0["wq"])
        inst = Instance(model, InstanceInitParams(
            ctx_size=64, kv_dtype="int8", fast_greedy=False))
    else:
        model = Model(gguf, ModelParams(mesh=mesh))
        inst = Instance(model, InstanceInitParams(ctx_size=64))
    loop = mh.HostLoop(inst, max_chunk=64)

    if mh.is_primary():
        s = loop.start_session(SessionInitParams(seed=5, temperature=0.0))
        s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
        preds = s.complete(CompleteParams(max_tokens=6))
        inst.stop_session()

        # verify leg: teacher-forced replay on a fresh multihost session
        s2 = loop.start_session(SessionInitParams(seed=5, temperature=0.0))
        s2.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
        replayed = s2.fill_ctx(preds)
        agg = MetricsAggregator()
        score = None
        for a, b in zip(preds, replayed):
            score = agg.push_and_verify(LogitComparer.compare(a.logits, b.logits))
        inst.stop_session()
        loop.stop()
        with open(out_path, "w") as f:
            json.dump({"tokens": [p.token for p in preds],
                       "score": score,
                       "n_processes": jax.process_count()}, f)
    else:
        loop.follow()
    model.close()


def _sched_mode(gguf: str, mesh, out_path: str) -> None:
    import threading

    from blama_tpu.parallel import multihost as mh
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.server.scheduler import (ContinuousBatchingScheduler,
                                            GenRequest, VerifyRequest)

    model = Model(gguf, ModelParams(mesh=mesh))
    sched = ContinuousBatchingScheduler(
        model, max_batch=2, ctx_size=64, paged=True, page_size=8,
        horizon=4)
    loop = mh.SchedulerHostLoop(sched)
    if mh.is_primary():
        prompts = ["hello world", "the quick brown"]
        results = {}
        done = threading.Event()

        def on_done(i):
            def cb(preds):
                results[i] = preds
                if len(results) == len(prompts):
                    done.set()
            return cb

        loop.start()
        for i, p in enumerate(prompts):
            sched.submit(GenRequest(
                prompt=model.vocab.tokenize(p, True, True), max_tokens=6,
                on_done=on_done(i)))
        assert done.wait(timeout=300)

        # teacher-forced replay of request 0 through the SAME multihost
        # scheduler: same engine + same mesh => bit-exact, score 1.0
        score = {}
        vdone = threading.Event()

        def on_score(s):
            score["s"] = s
            vdone.set()

        sched.submit(VerifyRequest(
            prompt=model.vocab.tokenize(prompts[0], True, True),
            predictions=results[0], on_done=on_score))
        assert vdone.wait(timeout=300)
        loop.stop()
        with open(out_path, "w") as f:
            json.dump({"tokens": [[p.token for p in results[i]]
                                  for i in range(len(prompts))],
                       "score": score["s"],
                       "n_processes": __import__("jax").process_count()}, f)
    else:
        loop.follow()
    model.close()


if __name__ == "__main__":
    main()
