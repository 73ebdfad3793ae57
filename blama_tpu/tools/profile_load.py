"""Attribute GGUF→device load time: page-in vs repack vs upload vs commit.

VERDICT r2 weak #3: BENCH_r01 recorded load_s=88.7 but BENCH_r02 327.9 for
the same 8B Q4_K file — unexplained. This walks the real load path one phase
at a time:

  page-in   read every tensor's mmap bytes (np.add.reduce over the view)
  repack    native C++ repack of every Q4_K tensor (no upload)
  upload    jnp.asarray of the repacked arrays (enqueue)
  commit    block until every device array is resident

Usage: python -m blama_tpu.tools.profile_load [gguf_path]
"""
import os
import sys
import time

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/blama_bench_llama3-8b.gguf"
    os.system(f"sync; echo 3 > /proc/sys/vm/drop_caches 2>/dev/null || true")

    from blama_tpu.gguf.constants import GGMLType
    from blama_tpu.gguf.reader import GGUFReader
    from blama_tpu import native

    t0 = time.perf_counter()
    r = GGUFReader(path)
    t_parse = time.perf_counter() - t0
    print(f"parse: {t_parse:.2f}s ({len(r.tensors)} tensors)")

    names = [n for n in r.tensor_names()
             if r.tensors[n].ggml_type == GGMLType.Q4_K]
    total_bytes = sum(r.tensors[n].nbytes for n in names)

    t0 = time.perf_counter()
    acc = 0
    for n in names:
        acc += int(r.tensor_bytes(n)[::4096].sum())  # touch every page
    t_pagein = time.perf_counter() - t0
    print(f"page-in: {t_pagein:.2f}s ({total_bytes/1e9:.2f} GB, "
          f"{total_bytes/t_pagein/1e9:.2f} GB/s)")

    t0 = time.perf_counter()
    repacked = []
    for n in names:
        info = r.tensors[n]
        out = native.native_repack_q4k(r.tensor_bytes(n), info.ne[1], info.ne[0])
        assert out is not None, "native lib unavailable"
        repacked.append(out[:3])
    t_repack = time.perf_counter() - t0
    rep_bytes = sum(sum(a.nbytes for a in t) for t in repacked)
    print(f"repack (warm pages): {t_repack:.2f}s "
          f"({rep_bytes/1e9:.2f} GB out, {total_bytes/t_repack/1e9:.2f} GB/s in)")

    # bf16 scale/min cast on host (the production a8s layout)
    import ml_dtypes
    t0 = time.perf_counter()
    host = []
    for codes, scales, mins in repacked:
        host.append((codes, scales.astype(ml_dtypes.bfloat16),
                     mins.astype(ml_dtypes.bfloat16)))
    t_cast = time.perf_counter() - t0
    up_bytes = sum(sum(a.nbytes for a in t) for t in host)
    print(f"bf16 cast: {t_cast:.2f}s (upload set {up_bytes/1e9:.2f} GB)")
    del repacked

    import jax
    import jax.numpy as jnp

    jax.devices()
    t0 = time.perf_counter()
    dev = []
    for t in host:
        dev.append(tuple(jnp.asarray(a) for a in t))
    t_up = time.perf_counter() - t0
    print(f"upload enqueue: {t_up:.2f}s")

    t0 = time.perf_counter()
    for t in dev:
        for a in t:
            a.block_until_ready()
    # force one real device->host readback to be sure (tunnel platform quirk)
    np.asarray(dev[-1][0][:1, :8])
    t_commit = time.perf_counter() - t0
    print(f"commit: {t_commit:.2f}s "
          f"({up_bytes/1e9:.2f} GB at {up_bytes/max(t_up+t_commit,1e-9)/1e9:.2f} GB/s)")
    print(f"TOTAL: {t_parse+t_pagein+t_repack+t_cast+t_up+t_commit:.2f}s")
    r.close()


if __name__ == "__main__":
    main()
