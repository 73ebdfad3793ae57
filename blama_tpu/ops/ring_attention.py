"""Ring attention: sequence-parallel blockwise attention over a device ring.

The reference's only long-context tools are single-device context-shift and
Self-Extend (SURVEY.md §5.7); scaling the sequence dimension across chips is
new, north-star territory (SURVEY.md §2.3 "SP/CP/ring"). This implements the
standard ring schedule: Q stays resident, K/V blocks rotate around the `sp`
mesh axis via ppermute (ICI neighbor exchange), and softmax is accumulated
online (flash-style running max/denominator), so no device ever materializes
the full [T, S] score matrix or the full K/V.

Causality is positional, matching the position-mapped KV design
(ops/kv_cache.py): masks come from (kv_pos <= q_pos) & (kv_pos >= 0), not
from block indices, so holes and shifted positions behave identically to the
single-device path.

Numerics note: the online-softmax accumulation order differs from
ops.attention's single-pass softmax, so outputs agree to f32 tolerance, not
bit-for-bit — ring prefill is its own engine mode for verification purposes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, q_pos, kv_pos, *, axis: str, scale: float,
                          causal: bool):
    """Per-device body under shard_map.

    q      [B, Tl, H, D]   local query block (rotated)
    k, v   [B, Sl, Hkv, D] local key/value block (k rotated)
    q_pos  [B, Tl], kv_pos [B, Sl]
    """
    B, Tl, H, D = q.shape
    Hkv = k.shape[2]
    group = H // Hkv
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    qf = q.astype(jnp.float32).reshape(B, Tl, Hkv, group, D)

    def scores_of(k_blk, kp_blk):
        kf = k_blk.astype(jnp.float32)
        s = jnp.einsum("bthgd,bshd->bhgts", qf, kf) * scale
        valid = kp_blk[:, None, None, None, :] >= 0
        if causal:
            valid = valid & (kp_blk[:, None, None, None, :]
                             <= q_pos[:, None, None, :, None])
        return jnp.where(valid, s, NEG_INF), valid

    m0 = jnp.full((B, Hkv, group, Tl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, group, Tl, 1), jnp.float32)
    acc0 = jnp.zeros((B, Hkv, group, Tl, D), jnp.float32)

    def step(carry, _):
        k_cur, v_cur, kp_cur, m, l, acc = carry
        s, valid = scores_of(k_cur, kp_cur)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # rescale prior accumulation; exp(NEG_INF - m) underflows to 0 safely
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)
        e = jnp.where(valid, e, 0.0)
        l = l * corr + jnp.sum(e, axis=-1, keepdims=True)
        vf = v_cur.astype(jnp.float32)
        acc = acc * corr + jnp.einsum("bhgts,bshd->bhgtd", e, vf)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        kp_nxt = jax.lax.ppermute(kp_cur, axis, perm)
        return (k_nxt, v_nxt, kp_nxt, m_new, l, acc), ()

    (k, v, kv_pos, m, l, acc), _ = jax.lax.scan(
        step, (k, v, kv_pos, m0, l0, acc0), None, length=n_dev)

    out = acc / jnp.maximum(l, 1e-30)
    # rows with no valid key anywhere (m still NEG_INF) produce zeros
    out = jnp.where(m > NEG_INF / 2, out, 0.0)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, H, D).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,        # [B, T, H, D] rotated queries, T sharded on `axis`
    k: jnp.ndarray,        # [B, S, Hkv, D] rotated keys, S sharded on `axis`
    v: jnp.ndarray,        # [B, S, Hkv, D]
    q_pos: jnp.ndarray,    # [B, T] int32
    kv_pos: jnp.ndarray,   # [B, S] int32 (-1 = hole)
    mesh: Mesh,
    axis: str = "sp",
    scale: float | None = None,
    causal: bool = True,
) -> jnp.ndarray:
    """Sequence-parallel attention over `mesh[axis]`. Returns [B, T, H, D]
    sharded like q. K must be pre-rotated (rotate-at-write); pass positions
    for masking only."""
    D = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (D ** 0.5)
    body = partial(_ring_attention_local, axis=axis, scale=scale, causal=causal)
    spec_q = P(None, axis, None, None)
    spec_p = P(None, axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q, spec_p, spec_p),
        out_specs=spec_q,
        check_vma=False,
    )(q, k, v, q_pos, kv_pos)
