"""Pallas fused decode attention over the position-mapped KV cache.

One kernel per layer per decode step replaces the XLA chain
rope(K cache) -> QK^T -> softmax -> PV (ops/attention.py). The XLA chain
materializes a rotated f32 copy of the whole K cache (and, in INT8-KV mode,
f32 dequants of both K and V) every step; this kernel streams the cache
through VMEM exactly once per step:

  * K stays in its stored dtype (bf16 or int8 codes) until the block is in
    VMEM; rope angles are computed in-kernel from the per-slot position map
    (reads S int32s instead of an S x D f32 trig table).
  * INT8-KV dequant scales are folded into the score/probability rows
    (rope and the dots are linear in K/V), so the int8 codes feed the MXU
    path with no per-element dequant materialization and no transposes:
        q . rope(ks*codes_k) == ks * (q . rope(codes_k))
        p @ (vs*codes_v)     == (p*vs) @ codes_v
  * online (flash) softmax accumulates across sequence blocks in VMEM
    scratch, so arbitrary cache lengths never leave VMEM pressure.

HBM traffic per layer per step drops from ~6.5x the cache size (measured on
the XLA chain at S=2048) to ~1x. Replaces the attention part of llama.cpp's
fused CUDA decode path (SURVEY.md §2.2 "Compute-graph executor"); semantics
(empty-slot masking by position == -1, causal masking by position, lazy
rotate-on-read) match ops/attention.py.

Determinism: the grid walks sequence blocks in a fixed order and each dot has
a fixed shape, so logits are bit-identical across steps and replays for the
same cache length — the verification contract (SURVEY.md §3.3). Numerics
differ from the XLA chain (online vs two-pass softmax), so fused-attention is
an engine *mode*: prover and verifier pick the same mode, like the reference's
CPU-vs-CUDA backend split (e-verify.cpp).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def effective_inv_freq(
    rope_dim: int,
    head_dim: int,
    freq_base: float,
    scale: float = 1.0,
    yarn: tuple | None = None,
    freq_factors: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, float]:
    """Per-lane effective inverse frequency for in-kernel rope.

    Mirrors ops.rope.rope_angles: YaRN NTK-by-parts and llama-3.1 freq factors
    reduce to a pure per-dim multiplier on theta = pos * inv_freq, so the
    kernel only needs one [head_dim] f32 vector. Lanes are interleave-expanded
    (theta[2i] == theta[2i+1], ggml NORM layout) and zeroed beyond rope_dim —
    cos=1/sin=0 there makes the rotation an identity on pass-through dims.
    Traceable (freq_factors may be a device weight). Returns
    (inv_freq_e [head_dim] f32, mscale)."""
    from ..rope import yarn_corr_dim

    half = rope_dim // 2
    if half == 0:
        return jnp.zeros((head_dim,), jnp.float32), 1.0
    exponents = np.arange(half, dtype=np.float32) * (2.0 / rope_dim)
    inv_freq = jnp.asarray(freq_base ** (-exponents))
    if freq_factors is not None:
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)
    ext = yarn[0] if yarn is not None else 0.0
    if yarn is None or ext == 0.0:
        eff = inv_freq * scale
        mscale = yarn[1] if yarn is not None else 1.0
    else:
        _, attn_factor, beta_fast, beta_slow, orig_ctx = yarn
        low = max(0.0, math.floor(yarn_corr_dim(rope_dim, orig_ctx, beta_fast, freq_base)))
        high = min(rope_dim - 1.0, math.ceil(yarn_corr_dim(rope_dim, orig_ctx, beta_slow, freq_base)))
        dim_i = np.arange(half, dtype=np.float32)
        ramp = 1.0 - np.clip((dim_i - low) / max(0.001, high - low), 0.0, 1.0)
        mix = jnp.asarray(ramp * ext)
        eff = inv_freq * (scale * (1.0 - mix) + mix)
        mscale = attn_factor * (1.0 + 0.1 * math.log(1.0 / scale))
    out = jnp.zeros((head_dim,), jnp.float32)
    out = out.at[0:rope_dim:2].set(eff).at[1:rope_dim:2].set(eff)
    return out, float(mscale)


def _swap_pairs(x: jnp.ndarray, even: jnp.ndarray) -> jnp.ndarray:
    """Lane permutation (2i, 2i+1) -> (2i+1, 2i) via two rolls + select."""
    d = x.shape[1]
    return jnp.where(even, pltpu.roll(x, d - 1, axis=1), pltpu.roll(x, 1, axis=1))


def _decode_attn_kernel(
    # refs (quantized mode appends ks/vs before out)
    q_ref,       # [1, H, D]  q dtype (rotated, unscaled)
    k_ref,       # [1, BS, Hkv*D] stored dtype (bf16/int8 codes), unrotated
    v_ref,       # [1, BS, Hkv*D]
    posr_ref,    # [1, BS] int32 slot positions (row layout, mask)
    posc_ref,    # [BS, 1] int32 slot positions (column layout, rope angles)
    qpos_ref,    # [B, 1] int32 (whole-array SMEM) query positions
    invf_ref,    # [1, D] f32 effective inv-freq, interleave-expanded
    *rest_refs,
    n_kv_head: int,
    group: int,
    head_dim: int,
    scale: float,
    quantized: bool,
    stacked: bool = False,  # k/v refs carry a leading layer dim (see _call)
):
    if quantized:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = rest_refs
    else:
        out_ref, acc_ref, m_ref, l_ref = rest_refs
    if stacked:
        k_ref = k_ref.at[0]
        v_ref = v_ref.at[0]
    ns = pl.program_id(1)
    num_s = pl.num_programs(1)
    D = head_dim

    @pl.when(ns == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # rope angles for this sequence block, shared by all kv heads
    pos_col = posc_ref[:, 0:1]                            # [BS, 1] int32
    theta = pos_col.astype(jnp.float32) * invf_ref[0:1, :]  # [BS, D]
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    bs = theta.shape[0]
    even = jax.lax.broadcasted_iota(jnp.int32, (bs, D), 1) % 2 == 0
    sin_signed = jnp.where(even, -sin, sin)

    qpos = qpos_ref[pl.program_id(0), 0]
    pos_row = posr_ref[0:1, :]                            # [1, BS]
    mask_row = (pos_row >= 0) & (pos_row <= qpos)         # [1, BS]

    for h in range(n_kv_head):
        r0, r1 = h * group, (h + 1) * group
        kf = k_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)   # [BS, D]
        k_rot = kf * cos + _swap_pairs(kf, even) * sin_signed
        qh = q_ref[0, r0:r1, :].astype(jnp.float32)               # [g, D]
        scores = jax.lax.dot_general(
            qh, k_rot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                  # [g, BS]
        if quantized:
            scores = scores * ks_ref[0, h:h + 1, :]               # fold K scale
        scores = jnp.where(mask_row, scores, NEG_INF)

        m_prev = m_ref[r0:r1, 0:1]
        l_prev = l_ref[r0:r1, 0:1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)           # [g, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        e = jnp.where(mask_row, e, 0.0)                           # all-masked block safety
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        if quantized:
            e = e * vs_ref[0, h:h + 1, :]                         # fold V scale
        vf = v_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)   # [BS, D]
        pv = jax.lax.dot_general(
            e, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # [g, D]
        acc_ref[r0:r1, :] = acc_ref[r0:r1, :] * alpha + pv
        m_ref[r0:r1, :] = jnp.broadcast_to(m_new, (group, m_ref.shape[1]))
        l_ref[r0:r1, :] = jnp.broadcast_to(l_new, (group, l_ref.shape[1]))

    @pl.when(ns == num_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def _pick_block_s(S: int, itemsize: int, batch: int = 1) -> int | None:
    # Mosaic lane rule for the [1, B*S] position row layout: the lane block
    # must be a multiple of 128 OR the whole array (the latter admits the
    # small-context single-block case, e.g. S=32 at B=1)
    for bs in (512, 256, 128, 64, 32, 16, 8):
        if S % bs == 0 and (bs % 128 == 0 or bs == batch * S):
            return bs
    return None


def supports(S: int, head_dim: int, k_dtype, batch: int = 1) -> bool:
    """Whether the fused kernel can serve this cache geometry."""
    item = jnp.dtype(k_dtype).itemsize
    return (
        _pick_block_s(S, item, batch) is not None
        and head_dim % 2 == 0
        and head_dim <= 256
    )


@partial(jax.jit, static_argnames=("scale", "interpret", "layer"))
def _call(q, k2, v2, kv_pos, q_pos, inv_freq_e, ks, vs,
          scale: float, interpret: bool, layer: int | None = None):
    """layer != None: k2/v2 are the STACKED [L, B, S, Hkv*D] cache arrays and
    the block specs index layer directly — no per-layer slice materialization
    (a pallas operand must be contiguous, so an XLA-level k2[layer] costs a
    full-layer copy in AND a set-back copy out per step; measured ~0.5 ms/step
    across 32 layers at S=2048, BENCH_LOCAL round 3)."""
    B, H, D = q.shape
    if layer is None:
        S = k2.shape[1]
        Hkv = k2.shape[2] // D
        kspec = lambda blk: pl.BlockSpec(
            (1, blk, Hkv * D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM)
    else:
        S = k2.shape[2]
        Hkv = k2.shape[3] // D
        kspec = lambda blk: pl.BlockSpec(
            (1, 1, blk, Hkv * D), lambda b, n, li=layer: (li, b, n, 0),
            memory_space=pltpu.VMEM)
    group = H // Hkv
    block_s = _pick_block_s(S, jnp.dtype(k2.dtype).itemsize, B)
    grid = (B, S // block_s)
    nsb = S // block_s
    quantized = ks is not None

    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        kspec(block_s),
        kspec(block_s),
        # positions flattened to [1, B*S] / [B*S, 1] so the blocks satisfy
        # Mosaic tiling at ANY batch (row b block n = flat block b*nsb + n);
        # q_pos rides whole-array SMEM for the same reason
        pl.BlockSpec((1, block_s), lambda b, n: (0, b * nsb + n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_s, 1), lambda b, n: (b * nsb + n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k2, v2, kv_pos.reshape(1, B * S), kv_pos.reshape(B * S, 1),
            q_pos, inv_freq_e]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, Hkv, block_s), lambda b, n: (b, 0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, block_s), lambda b, n: (b, 0, n), memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]

    kernel = partial(
        _decode_attn_kernel,
        n_kv_head=Hkv, group=group, head_dim=D,
        scale=scale, quantized=quantized, stacked=layer is not None,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, D), jnp.float32),     # acc
            pltpu.VMEM((H, 128), jnp.float32),   # running max (col 0 is live)
            pltpu.VMEM((H, 128), jnp.float32),   # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def decode_attention(
    q: jnp.ndarray,          # [B, 1, H, D] rotated query (one decode token)
    k_cache: jnp.ndarray,    # [B, S, Hkv, D] unrotated (bf16/f32 or int8 codes)
    v_cache: jnp.ndarray,    # [B, S, Hkv, D]
    q_pos: jnp.ndarray,      # [B] int32
    kv_pos: jnp.ndarray,     # [B, S] int32, -1 = empty slot
    inv_freq_e: jnp.ndarray,  # [head_dim] f32 from effective_inv_freq
    k_scale: jnp.ndarray | None = None,  # [B, S, Hkv] f32 (INT8-KV mode)
    v_scale: jnp.ndarray | None = None,
    logit_scale: float | None = None,
    mscale: float = 1.0,
    layer: int | None = None,  # k/v_cache are stacked [L, B, S, Hkv, D]
) -> jnp.ndarray:
    """Fused single-token attention; returns [B, 1, H, D] in q.dtype.

    With `layer` set, k_cache/v_cache (and the scales) are the full stacked
    cache arrays and the kernel reads layer `layer` in place — the unrolled
    quantized decode path uses this to avoid per-layer slice/set-back copies
    of the cache (custom-call operands can't alias an XLA slice)."""
    B, T, H, D = q.shape
    assert T == 1, "decode_attention is the T==1 fast path"
    if layer is None:
        S, Hkv = k_cache.shape[1], k_cache.shape[2]
        k2 = k_cache.reshape(B, S, Hkv * D)
        v2 = v_cache.reshape(B, S, Hkv * D)
        ks = vs = None
        if k_scale is not None:
            ks = jnp.swapaxes(k_scale, 1, 2)  # [B, Hkv, S]: lane-major S
            vs = jnp.swapaxes(v_scale, 1, 2)
    else:
        L, Bc, S, Hkv = k_cache.shape[:4]
        k2 = k_cache.reshape(L, Bc, S, Hkv * D)
        v2 = v_cache.reshape(L, Bc, S, Hkv * D)
        ks = vs = None
        if k_scale is not None:
            # scales are small ([B, S, Hkv] f32); slicing the layer costs
            # ~64KB, unlike the MB-scale k/v codes
            ks = jnp.swapaxes(k_scale[layer], 1, 2)
            vs = jnp.swapaxes(v_scale[layer], 1, 2)
    scale = (logit_scale if logit_scale is not None else 1.0 / (D ** 0.5)) * mscale
    out = _call(
        q.reshape(B, H, D), k2, v2, kv_pos,
        q_pos.reshape(B, 1), inv_freq_e.reshape(1, D), ks, vs,
        scale=float(scale),
        interpret=jax.default_backend() == "cpu",
        layer=layer,
    )
    return out.reshape(B, 1, H, D)


# ---------------------------------------------------------------------------
# Prefill (T > 1) flash attention over the position-mapped KV cache
# ---------------------------------------------------------------------------
#
# The XLA prefill chain materializes a rotated f32 copy of the whole K cache
# (and f32 dequants of K and V in INT8-KV mode) for EVERY ≤ubatch chunk of
# the prompt, so a long prompt re-reads the cache with a ~6.5x materialized
# footprint per chunk (NEXT.md r1 #4 / VERDICT r1 missing #5). This kernel
# is the T-block generalization of _decode_attn_kernel: one streaming pass
# of the stored cache per chunk, rope computed in-kernel from the position
# map, INT8 scales folded into score/probability rows, online softmax over
# sequence blocks. Causality comes from the position map (kv_pos <= q_pos
# per query row), so edited maps (ctx-shift, Self-Extend) keep working.

def _prefill_attn_kernel(
    q_ref,       # [1, BT, H*D] f32/bf16 (rotated, unscaled)
    k_ref,       # [1, BS, Hkv*D] stored dtype, unrotated
    v_ref,       # [1, BS, Hkv*D]
    posr_ref,    # [1, BS] int32 slot positions (row layout, mask)
    posc_ref,    # [BS, 1] int32 slot positions (column layout, rope angles)
    qpos_ref,    # [BT, 1] int32 query positions (column layout)
    invf_ref,    # [1, D] f32 effective inv-freq, interleave-expanded
    *rest_refs,
    n_kv_head: int,
    group: int,
    head_dim: int,
    scale: float,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = rest_refs
    else:
        out_ref, acc_ref, m_ref, l_ref = rest_refs
    ns = pl.program_id(2)
    num_s = pl.num_programs(2)
    D = head_dim
    BT = q_ref.shape[1]
    g = group

    @pl.when(ns == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # rope angles for this sequence block, shared by all kv heads
    pos_col = posc_ref[:, 0:1]                              # [BS, 1]
    theta = pos_col.astype(jnp.float32) * invf_ref[0:1, :]  # [BS, D]
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    bs = theta.shape[0]
    even = jax.lax.broadcasted_iota(jnp.int32, (bs, D), 1) % 2 == 0
    sin_signed = jnp.where(even, -sin, sin)

    # causal mask by positions: [BT, BS]
    pos_row = posr_ref[0:1, :]                              # [1, BS]
    qpos = qpos_ref[:, 0:1]                                 # [BT, 1]
    mask_bt = (pos_row >= 0) & (pos_row <= qpos)            # [BT, BS]
    # rows are (t, gi) flattened: repeat each t row over its g head group
    mask = jnp.broadcast_to(
        mask_bt[:, None, :], (BT, g, mask_bt.shape[1])).reshape(BT * g, -1)

    for h in range(n_kv_head):
        r0, r1 = h * BT * g, (h + 1) * BT * g
        kf = k_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)   # [BS, D]
        k_rot = kf * cos + _swap_pairs(kf, even) * sin_signed
        qh = q_ref[0, :, h * g * D:(h + 1) * g * D].astype(jnp.float32)
        qh = qh.reshape(BT * g, D)                                # [BT·g, D]
        scores = jax.lax.dot_general(
            qh, k_rot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                  # [BT·g, BS]
        if quantized:
            scores = scores * ks_ref[0, h:h + 1, :]               # fold K scale
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[r0:r1, 0:1]
        l_prev = l_ref[r0:r1, 0:1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        e = jnp.where(mask, e, 0.0)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        if quantized:
            e = e * vs_ref[0, h:h + 1, :]                         # fold V scale
        vf = v_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)
        pv = jax.lax.dot_general(
            e, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # [BT·g, D]
        acc_ref[r0:r1, :] = acc_ref[r0:r1, :] * alpha + pv
        m_ref[r0:r1, :] = jnp.broadcast_to(m_new, (BT * g, m_ref.shape[1]))
        l_ref[r0:r1, :] = jnp.broadcast_to(l_new, (BT * g, l_ref.shape[1]))

    @pl.when(ns == num_s - 1)
    def _finalize():
        # acc rows are (h, t, gi)-ordered; write back per kv-head so row
        # (t, gi) lands in out columns (h·g+gi)·D .. — the q layout inverse
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        for h in range(n_kv_head):
            r0, r1 = h * BT * g, (h + 1) * BT * g
            out = (acc_ref[r0:r1, :] / denom[r0:r1]).astype(out_ref.dtype)
            out_ref[0, :, h * g * D:(h + 1) * g * D] = out.reshape(BT, g * D)


def _pick_block_t(T: int) -> int | None:
    for bt in (128, 64, 32, 16, 8):
        if T % bt == 0:
            return bt
    return None


def prefill_supports(T: int, S: int, head_dim: int, k_dtype,
                     batch: int = 1) -> bool:
    """Whether the fused prefill kernel can serve this chunk geometry."""
    item = jnp.dtype(k_dtype).itemsize
    return (
        T > 1
        and _pick_block_t(T) is not None
        and _pick_block_s(S, item, batch) is not None
        and head_dim % 2 == 0
        and head_dim <= 256
    )


@partial(jax.jit, static_argnames=("scale", "interpret"))
def _prefill_call(q2, k2, v2, kv_pos, q_pos, inv_freq_e, ks, vs,
                  scale: float, interpret: bool):
    B, T, HD = q2.shape
    D = inv_freq_e.shape[1]
    H = HD // D
    S = k2.shape[1]
    Hkv = k2.shape[2] // D
    group = H // Hkv
    block_t = _pick_block_t(T)
    block_s = _pick_block_s(S, jnp.dtype(k2.dtype).itemsize, B)
    grid = (B, T // block_t, S // block_s)
    nsb = S // block_s
    ntb = T // block_t
    quantized = ks is not None

    in_specs = [
        pl.BlockSpec((1, block_t, HD), lambda b, t, n: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_s, Hkv * D), lambda b, t, n: (b, n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_s, Hkv * D), lambda b, t, n: (b, n, 0),
                     memory_space=pltpu.VMEM),
        # positions/query-positions flattened ([1, B*S] / [B*S, 1] / [B*T, 1])
        # so the blocks satisfy Mosaic tiling at ANY batch
        pl.BlockSpec((1, block_s), lambda b, t, n: (0, b * nsb + n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_s, 1), lambda b, t, n: (b * nsb + n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, 1), lambda b, t, n: (b * ntb + t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda b, t, n: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q2, k2, v2, kv_pos.reshape(1, B * S), kv_pos.reshape(B * S, 1),
            q_pos.reshape(B * T, 1), inv_freq_e]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, Hkv, block_s), lambda b, t, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, block_s), lambda b, t, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]

    kernel = partial(
        _prefill_attn_kernel,
        n_kv_head=Hkv, group=group, head_dim=D,
        scale=scale, quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_t, HD), lambda b, t, n: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q2.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_t * H, D), jnp.float32),    # acc
            pltpu.VMEM((block_t * H, 128), jnp.float32),  # running max
            pltpu.VMEM((block_t * H, 128), jnp.float32),  # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def prefill_attention(
    q: jnp.ndarray,          # [B, T, H, D] rotated queries (prompt chunk)
    k_cache: jnp.ndarray,    # [B, S, Hkv, D] unrotated (bf16/f32 or int8 codes)
    v_cache: jnp.ndarray,    # [B, S, Hkv, D]
    q_pos: jnp.ndarray,      # [B, T] int32
    kv_pos: jnp.ndarray,     # [B, S] int32, -1 = empty slot
    inv_freq_e: jnp.ndarray,  # [head_dim] f32 from effective_inv_freq
    k_scale: jnp.ndarray | None = None,  # [B, S, Hkv] f32 (INT8-KV mode)
    v_scale: jnp.ndarray | None = None,
    logit_scale: float | None = None,
    mscale: float = 1.0,
) -> jnp.ndarray:
    """Fused chunked-prefill attention; returns [B, T, H, D] in q.dtype."""
    B, T, H, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    scale = (logit_scale if logit_scale is not None else 1.0 / (D ** 0.5)) * mscale

    q2 = q.reshape(B, T, H * D)
    k2 = k_cache.reshape(B, S, Hkv * D)
    v2 = v_cache.reshape(B, S, Hkv * D)
    ks = vs = None
    if k_scale is not None:
        ks = jnp.swapaxes(k_scale, 1, 2)  # [B, Hkv, S]
        vs = jnp.swapaxes(v_scale, 1, 2)
    out = _prefill_call(
        q2, k2, v2, kv_pos, q_pos, inv_freq_e.reshape(1, D),
        ks, vs, scale=float(scale),
        interpret=jax.default_backend() == "cpu",
    )
    return out.reshape(B, T, H, D)
