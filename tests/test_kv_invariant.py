"""Cross-engine INT8-KV write invariant (VERDICT r4 weak #4).

Round 4 found the MoE forward silently value-CASTING bf16 into the int8
cache (codes ~N(0,1) clipped to tiny ints) instead of quantize-on-write;
only the engines someone remembered had regression tests. This pins the
invariant structurally for EVERY engine mode: max-abs symmetric
quantization (ops/kv_cache.quantize_kv) maps each written (layer, slot,
head) row's extreme element to exactly ±127, so after any generation the
occupied cache rows must saturate. A value-cast bug cannot pass (standard-
normal activations cast to int8 give |codes| ~ 3).
"""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model, ModelParams
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_llama, write_tiny_moe


def _assert_saturated(cache):
    pos = np.asarray(cache.positions)          # [B, S]
    occ = pos >= 0
    assert occ.any(), "nothing was written"
    for arr in (np.asarray(cache.k), np.asarray(cache.v)):
        assert arr.dtype == np.int8
        m = np.abs(arr.astype(np.int32)).max(axis=-1)   # [L, B, S, Hkv]
        m = m[:, occ, :]                                # [L, occupied, Hkv]
        # every occupied row saturates (all-zero rows allowed: a zero
        # activation vector quantizes to zero codes with zero scale)
        assert ((m == 127) | (m == 0)).all(), np.unique(m)
        assert (m == 127).mean() > 0.5


def _drive(model, *, flash=False, fast_greedy=False):
    inst = Instance(model, InstanceInitParams(
        ctx_size=64, kv_dtype="int8", flash_attn=flash,
        fast_greedy=fast_greedy))
    s = inst.start_session(SessionInitParams(seed=5, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("the cat sat on", True, True))
    s.complete(CompleteParams(max_tokens=6))
    inst.stop_session()
    cache = inst.cache
    inst.close() if hasattr(inst, "close") else None
    return cache


@pytest.mark.parametrize("dtype,quant,flash,fast", [
    ("bfloat16", GGMLType.Q8_0, False, False),
    ("bfloat16", GGMLType.Q8_0, True, True),
    ("q4k_fused", GGMLType.Q4_K, False, False),
    ("q4k_fused", GGMLType.Q4_K, True, True),
    ("q4k_a8", GGMLType.Q4_K, True, True),
    ("q8_0_fused", GGMLType.Q8_0, True, True),
])
def test_llama_engines_saturate_int8_kv(tmp_path, dtype, quant, flash, fast):
    p = str(tmp_path / "t.gguf")
    write_tiny_llama(p, quant)
    m = Model(p, ModelParams(dtype=dtype))
    _assert_saturated(_drive(m, flash=flash, fast_greedy=fast))
    m.close()


@pytest.mark.parametrize("dtype", ["bfloat16", "q4k_fused"])
def test_moe_engines_saturate_int8_kv(tmp_path, dtype):
    p = str(tmp_path / "moe.gguf")
    write_tiny_moe(p)
    m = Model(p, ModelParams(dtype=dtype))
    _assert_saturated(_drive(m))
    m.close()
