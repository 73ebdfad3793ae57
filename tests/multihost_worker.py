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


if __name__ == "__main__":
    main()
