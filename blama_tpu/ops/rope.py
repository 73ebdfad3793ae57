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

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, rope_dim: int, freq_base: float, scale: float = 1.0):
    """positions [...,] -> cos/sin of shape [..., rope_dim//2], float32."""
    half = rope_dim // 2
    exponents = jnp.arange(half, dtype=jnp.float32) * (2.0 / rope_dim)
    inv_freq = freq_base ** (-exponents)  # [half]
    theta = positions.astype(jnp.float32)[..., None] * inv_freq * scale
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    rope_dim: int,
    freq_base: float,
    interleaved: bool = True,
    scale: float = 1.0,
    cos_sin: tuple | None = None,
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
        cos, sin = rope_angles(positions, rope_dim, freq_base, scale)  # [..., T, half]
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
