"""Attention over the position-mapped KV cache.

XLA implementation (MXU einsums, f32 softmax); the reference semantics any
fused variant must match bit-for-bit for verification replay.

Replaces llama.cpp's ggml attention graph the reference drives via
llama_decode (/root/reference/inference/code/llama/Session.cpp:384-392).
"""

from __future__ import annotations

import jax.numpy as jnp

from .rope import apply_rope

NEG_INF = -1e30


def attention(
    q: jnp.ndarray,          # [B, T, H, D] already rotated
    k_cache: jnp.ndarray,    # [B, S, Hkv, D] unrotated
    v_cache: jnp.ndarray,    # [B, S, Hkv, D]
    q_pos: jnp.ndarray,      # [B, T] int32
    kv_pos: jnp.ndarray,     # [B, S] int32 (-1 = empty)
    rope_dim: int,
    freq_base: float,
    interleaved: bool = True,
    causal: bool = True,
    logit_scale: float | None = None,
    kv_rope: tuple | None = None,  # precomputed (cos, sin) for kv positions
) -> jnp.ndarray:
    B, T, H, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    group = H // Hkv

    k = apply_rope(k_cache, jnp.maximum(kv_pos, 0), rope_dim, freq_base,
                   interleaved, cos_sin=kv_rope)

    scale = logit_scale if logit_scale is not None else 1.0 / (D**0.5)

    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    kf = k.astype(jnp.float32)
    # [B, Hkv, group, T, S]
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, kf) * scale

    valid = kv_pos[:, None, None, None, :] >= 0
    if causal:
        allowed = kv_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None]
        valid = valid & allowed
    scores = jnp.where(valid, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.maximum(m, NEG_INF / 2))
    e = jnp.where(valid, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)

    vf = v_cache.astype(jnp.float32)
    out = jnp.einsum("bhgts,bshd->bthgd", p, vf)
    return out.reshape(B, T, H, D).astype(q.dtype)
