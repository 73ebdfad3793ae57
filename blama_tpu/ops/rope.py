"""Rotary position embeddings.

Two layouts:
  * interleaved ("NORM", ggml's layout for the llama family): rotate adjacent
    dim pairs (2i, 2i+1)
  * half ("NEOX"): rotate (i, i + d/2) pairs

Applied lazily: K is cached UNROTATED and rotated at attention time using the
cache's per-slot position array. RoPE depends only on relative position, so
this is mathematically identical to rotate-at-write — and it makes the
reference's KV position edits (llama_kv_self_seq_add/div used for
context-shift and Self-Extend, /root/reference/inference/code/llama/
Session.cpp:341-361) free metadata updates instead of KV rewrites.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def yarn_corr_dim(rope_dim: int, orig_ctx: int, beta: float, freq_base: float) -> float:
    """Dimension index below which rotations exceed `beta` full turns over the
    original context (ggml_rope_yarn_corr_dim semantics)."""
    return rope_dim * math.log(orig_ctx / (beta * 2.0 * math.pi)) / (2.0 * math.log(freq_base))


def rope_angles(
    positions: jnp.ndarray,
    rope_dim: int,
    freq_base: float,
    scale: float = 1.0,
    yarn: tuple | None = None,          # (ext_factor, attn_factor, beta_fast, beta_slow, orig_ctx)
    freq_factors: jnp.ndarray | None = None,  # [rope_dim//2] llama-3.1 per-dim divisors
):
    """positions [...,] -> cos/sin of shape [..., rope_dim//2], float32.

    `scale` is freq_scale = 1/scaling-factor (linear scaling multiplies every
    angle). `yarn` switches to YaRN NTK-by-parts interpolation: low dims
    (fast-rotating) keep the extrapolated angle, high dims interpolate, with a
    linear ramp between the beta_fast/beta_slow correction dims and an
    attention magnitude scale folded into cos/sin (llama.cpp rope_yarn
    semantics). `freq_factors` divides the inverse frequencies per dim
    (llama-3.1 `rope_freqs.weight` tensor)."""
    half = rope_dim // 2
    exponents = jnp.arange(half, dtype=jnp.float32) * (2.0 / rope_dim)
    inv_freq = freq_base ** (-exponents)  # [half]
    if freq_factors is not None:
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)
    theta_extrap = positions.astype(jnp.float32)[..., None] * inv_freq
    ext = yarn[0] if yarn is not None else 0.0
    if yarn is None or ext == 0.0:
        theta = theta_extrap * scale
        mscale = yarn[1] if yarn is not None else 1.0
    else:
        _, attn_factor, beta_fast, beta_slow, orig_ctx = yarn
        low = max(0.0, math.floor(yarn_corr_dim(rope_dim, orig_ctx, beta_fast, freq_base)))
        high = min(rope_dim - 1.0, math.ceil(yarn_corr_dim(rope_dim, orig_ctx, beta_slow, freq_base)))
        dim_i = jnp.arange(half, dtype=jnp.float32)  # = i0/2 in ggml's loop
        ramp = 1.0 - jnp.clip((dim_i - low) / max(0.001, high - low), 0.0, 1.0)
        mix = ramp * ext
        theta = (theta_extrap * scale) * (1.0 - mix) + theta_extrap * mix
        mscale = attn_factor * (1.0 + 0.1 * math.log(1.0 / scale))
    if mscale != 1.0:
        return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    rope_dim: int,
    freq_base: float,
    interleaved: bool = True,
    scale: float = 1.0,
    cos_sin: tuple | None = None,
    yarn: tuple | None = None,
    freq_factors: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x: [..., T, H, D] (positions broadcastable to [..., T]). Rotates the
    first `rope_dim` dims of D; the rest pass through. Pass `cos_sin` to
    reuse precomputed angles (hoisted out of the layer scan)."""
    if rope_dim == 0:  # non-rotary models (gpt2/bert)
        return x
    dtype = x.dtype
    if cos_sin is not None:
        cos, sin = cos_sin
    else:
        cos, sin = rope_angles(positions, rope_dim, freq_base, scale,
                               yarn=yarn, freq_factors=freq_factors)  # [..., T, half]
    cos = cos[..., None, :]  # [..., T, 1, half]
    sin = sin[..., None, :]
    rot = x[..., :rope_dim].astype(jnp.float32)
    rest = x[..., rope_dim:]
    if interleaved:
        x_even = rot[..., 0::2]
        x_odd = rot[..., 1::2]
        r_even = x_even * cos - x_odd * sin
        r_odd = x_even * sin + x_odd * cos
        rotated = jnp.stack([r_even, r_odd], axis=-1).reshape(rot.shape)
    else:
        half = rope_dim // 2
        x1 = rot[..., :half]
        x2 = rot[..., half:]
        rotated = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    out = rotated.astype(dtype)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out
