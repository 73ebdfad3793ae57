"""Capture a device trace of the 8B decode loop and print per-op totals.

probe_overhead bounded the XLA-glue cost at ~0.7 ms/step but ~1.5+ ms of the
step remains unattributed (in-context vs isolated kernel gaps). This grabs
the ground truth: jax.profiler trace around a few fused decode steps, then
aggregates XLA-op self-times from the xplane protobuf.

Usage: python -m blama_tpu.tools.trace_step [preset] [n_steps]
  BLAMA_PROFILE_KV / _CACHE / _FLASH as in profile_step.
"""
import glob
import os
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np


def summarize_trace_json(trace_dir: str, top: int = 40):
    """Aggregate op self-times from the Chrome trace JSON (fallback parser:
    the tensorboard_plugin_profile wheel in this image has no xplane_pb2)."""
    import gzip
    import json as _json
    import re
    from collections import defaultdict as _dd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        data = _json.load(f)
    ev = data["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    totals, counts = _dd(float), _dd(int)
    dev_total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        base = re.sub(r"\.\d+", "", e["name"])
        totals[base] += e["dur"] / 1e3  # ms
        counts[base] += 1
        dev_total += e["dur"] / 1e3
    print(f"device op total: {dev_total:.3f} ms over {len(totals)} op names")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.3f} ms  x{counts[name]:<6d} {name[:100]}")
    return totals


def summarize_xplane(trace_dir: str, top: int = 40):
    """Aggregate op self-times from the trace's .xplane.pb (device planes)."""
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        return summarize_trace_json(trace_dir, top)

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    totals = defaultdict(float)
    counts = defaultdict(int)
    device_total = 0.0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # XLA op lines carry per-op events; take the op-level line(s)
                if "XLA Ops" not in line.name and "Steps" in line.name:
                    continue
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    totals[name] += dur
                    counts[name] += 1
                    device_total += dur
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    print(f"device op total: {device_total:.3f} ms over {len(totals)} op names")
    for name, ms in rows:
        print(f"  {ms:9.3f} ms  x{counts[name]:<5d} {name[:100]}")
    return totals


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "llama3-8b"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    wdtype = os.environ.get("BLAMA_BENCH_DTYPE", "q4k_a8")

    import dataclasses

    from blama_tpu.models.llama import LlamaStatic
    from blama_tpu.ops.generate_loop import greedy_generate
    from blama_tpu.ops.kv_cache import KVCache
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.testing import synthesize_llama_gguf

    path = os.path.join("/tmp", f"blama_bench_{preset}.gguf")
    if not os.path.exists(path):
        synthesize_llama_gguf(path, preset)
    model = Model(path, ModelParams(dtype=wdtype))
    cfg = model.config
    st = LlamaStatic.of(cfg)
    if os.environ.get("BLAMA_PROFILE_FLASH", "1") == "1":
        st = dataclasses.replace(st, attn_fused=True)
    S = int(os.environ.get("BLAMA_PROFILE_CACHE", "2048"))
    kv = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": "int8"}[
        os.environ.get("BLAMA_PROFILE_KV", "int8")]

    def fresh():
        return KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv, cfg.head_dim_, kv)

    prompt = jnp.asarray(
        np.random.default_rng(0).integers(3, cfg.n_vocab - 1, (1, 8)).astype(np.int32))
    # compile + settle
    toks, *_ = greedy_generate(st, model.weights, prompt, fresh(), 8, n_steps)
    np.asarray(toks)

    trace_dir = os.environ.get("BLAMA_TRACE_DIR", "/tmp/blama_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        toks, *_ = greedy_generate(st, model.weights, prompt, fresh(), 8, n_steps)
        np.asarray(toks)
    print(f"# traced {n_steps} steps (plus prefill) to {trace_dir}")
    totals = summarize_xplane(trace_dir)
    # rough per-step view: divide by n_steps (prefill pollutes slightly)
    print(f"\nper-step (/{n_steps}):")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms/n_steps:9.4f} ms  {name[:100]}")
    model.close()


if __name__ == "__main__":
    main()
