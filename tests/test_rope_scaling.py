"""RoPE scaling: linear, YaRN NTK-by-parts, llama-3.1 freq_factors.

Pins the llama.cpp rope_yarn semantics (ggml rope_yarn / rope_yarn_ramp /
rope_yarn_corr_dim) that the reference inherits through llama_decode
(SURVEY.md §2.2 "Compute-graph executor").
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from blama_tpu.models.config import ModelConfig
from blama_tpu.models.llama import LlamaStatic
from blama_tpu.ops.rope import rope_angles, yarn_corr_dim


def ref_yarn_angles(pos, rope_dim, base, freq_scale, ext, attn, bfast, bslow, orig):
    """Straight scalar transcription of ggml's rope_yarn loop (float64)."""
    half = rope_dim // 2
    low = max(0.0, math.floor(yarn_corr_dim(rope_dim, orig, bfast, base)))
    high = min(rope_dim - 1.0, math.ceil(yarn_corr_dim(rope_dim, orig, bslow, base)))
    cos, sin = [], []
    for i in range(half):
        theta_extrap = pos * base ** (-2.0 * i / rope_dim)
        theta_interp = freq_scale * theta_extrap
        mscale = attn
        if ext != 0.0:
            ramp = 1.0 - min(1.0, max(0.0, (i - low) / max(0.001, high - low)))
            mix = ramp * ext
            theta = theta_interp * (1 - mix) + theta_extrap * mix
            mscale *= 1.0 + 0.1 * math.log(1.0 / freq_scale)
        else:
            theta = theta_interp
        cos.append(math.cos(theta) * mscale)
        sin.append(math.sin(theta) * mscale)
    return np.array(cos), np.array(sin)


def test_yarn_matches_ggml_formula():
    rope_dim, base = 128, 10000.0
    yarn = (1.0, 1.0, 32.0, 1.0, 4096)
    for pos in (0, 17, 3000, 16000):
        cos, sin = rope_angles(jnp.asarray([pos]), rope_dim, base, 0.25, yarn=yarn)
        rc, rs = ref_yarn_angles(pos, rope_dim, base, 0.25, *yarn)
        np.testing.assert_allclose(np.asarray(cos)[0], rc, rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sin)[0], rs, rtol=2e-3, atol=1e-3)


def test_yarn_ext_zero_equals_linear():
    cos_y, sin_y = rope_angles(jnp.asarray([100]), 64, 10000.0, 0.5,
                               yarn=(0.0, 1.0, 32.0, 1.0, 2048))
    cos_l, sin_l = rope_angles(jnp.asarray([100]), 64, 10000.0, 0.5)
    np.testing.assert_array_equal(np.asarray(cos_y), np.asarray(cos_l))
    np.testing.assert_array_equal(np.asarray(sin_y), np.asarray(sin_l))


def test_yarn_mscale_applied():
    # freq_scale 0.25 → mscale = 1 + 0.1*ln(4); at pos 0 every theta is 0 so
    # cos = mscale exactly
    cos, _ = rope_angles(jnp.asarray([0]), 64, 10000.0, 0.25,
                         yarn=(1.0, 1.0, 32.0, 1.0, 2048))
    expect = 1.0 + 0.1 * math.log(4.0)
    np.testing.assert_allclose(np.asarray(cos)[0], expect, rtol=1e-6)


def test_yarn_low_dims_extrapolate_high_dims_interpolate():
    rope_dim, base, orig = 128, 10000.0, 4096
    yarn = (1.0, 1.0, 32.0, 1.0, orig)
    pos = 1000
    cos, sin = rope_angles(jnp.asarray([pos]), rope_dim, base, 0.25, yarn=yarn)
    theta = np.arctan2(np.asarray(sin)[0], np.asarray(cos)[0])
    # dim 0 rotates fast → pure extrapolation: theta mod 2π of pos*1.0
    np.testing.assert_allclose(theta[0], math.remainder(pos, 2 * math.pi), atol=1e-3)
    # last dim is far above the correction range → pure interpolation
    i = rope_dim // 2 - 1
    want = 0.25 * pos * base ** (-2.0 * i / rope_dim)
    np.testing.assert_allclose(theta[i], want, rtol=1e-3)


def test_freq_factors_divide_inv_freq():
    half = 32
    ff = jnp.full((half,), 8.0, jnp.float32)
    cos_f, sin_f = rope_angles(jnp.asarray([64]), 64, 10000.0, freq_factors=ff)
    cos_8, sin_8 = rope_angles(jnp.asarray([8]), 64, 10000.0)
    np.testing.assert_allclose(np.asarray(cos_f), np.asarray(cos_8), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_f), np.asarray(sin_8), rtol=1e-5, atol=1e-6)


def test_config_parses_yarn_metadata():
    md = {
        "general.architecture": "llama",
        "llama.block_count": 2,
        "llama.embedding_length": 64,
        "llama.attention.head_count": 4,
        "llama.context_length": 32768,
        "llama.rope.scaling.type": "yarn",
        "llama.rope.scaling.factor": 8.0,
        "llama.rope.scaling.attn_factor": 1.2,
        "llama.rope.scaling.original_context_length": 4096,
    }
    cfg = ModelConfig.from_metadata(md)
    assert cfg.rope_scaling_type == "yarn"
    assert cfg.rope_scale_factor == 8.0
    assert cfg.rope_attn_factor == pytest.approx(1.2)
    assert cfg.rope_orig_ctx == 4096
    st = LlamaStatic.of(cfg)
    assert st.rope_scale == pytest.approx(1.0 / 8.0)
    assert st.yarn == (1.0, pytest.approx(1.2), 32.0, 1.0, 4096)


def test_linear_config_has_no_yarn():
    md = {
        "general.architecture": "llama",
        "llama.attention.head_count": 4,
        "llama.embedding_length": 64,
        "llama.rope.scaling.type": "linear",
        "llama.rope.scaling.factor": 2.0,
    }
    st = LlamaStatic.of(ModelConfig.from_metadata(md))
    assert st.yarn is None
    assert st.rope_scale == 0.5
