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
import os
from functools import partial

import jax
import jax.numpy as jnp

# probe flags, read ONCE at import: they participate in traced code, so a
# mid-process env toggle would otherwise silently keep the cached compile
# (ADVICE r3). Probes set these (or the env vars) before the first call.
_HB = os.environ.get("BLAMA_ATTN_HB", "0") == "1"
# int8 DECODE sequence-block cap (A/B probe: 2048 = whole-window blocks)
_BLOCK_CAP = int(os.environ.get("BLAMA_ATTN_BLOCK_CAP", "1024"))
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
    scales_stacked: bool = False,  # scale refs carry [1,1,Hkv,bs] (see _call)
    fresh: bool = False,    # fresh-token K/V ride as operands (see _call)
):
    rest = list(rest_refs)
    if quantized:
        ks_ref, vs_ref = rest[:2]
        rest = rest[2:]
    if fresh:
        slot_ref, kn_ref, vn_ref = rest[:3]  # [B,1] SMEM, [1, Hkv*D] x2
        rest = rest[3:]
    out_ref, acc_ref, m_ref, l_ref = rest
    ns = pl.program_id(1)
    num_s = pl.num_programs(1)
    D = head_dim
    Hkv = n_kv_head
    if scales_stacked:
        def shead(ref, h):
            return ref[0, 0, h:h + 1, :]
    else:
        def shead(ref, h):
            return ref[0, h:h + 1, :]

    if fresh:
        # fresh mode streams the cache through a 32-row-GROUP view
        # [1, 1, BS/32, 32, Hkv*D] (the int8 (32, 128) native tile — same
        # DMA as the flat view) so the fresh row can be PATCHED into the
        # block with one group-aligned store (Mosaic forbids dynamic
        # sublane-row stores; a full-block where cost ~0.3 ms/step)
        def khead(ref, h):
            bs_ = posc_ref.shape[0]
            return ref[0, 0, :, :, h * D:(h + 1) * D].reshape(bs_, D)
    elif stacked:
        # stacked refs are 4-D [1, 1, BS, Hkv*D] (the forward pass keeps the
        # stacked cache MERGED across the decode loop: a 5-D [.., Hkv, D]
        # int8 operand would tile (Hkv, D) as (32, 128) and pad the DMA 4x)
        def khead(ref, h):
            return ref[0, 0, :, h * D:(h + 1) * D]
    else:
        def khead(ref, h):
            return ref[0, :, h * D:(h + 1) * D]

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

    if fresh:
        # fresh-token K/V patch-on-read (no cache aliasing): this step's
        # attention takes the just-projected K/V row as an OPERAND and
        # patches it into the streamed VMEM block at the row's slot with a
        # 32-row group-aligned store (the write kernel's patch, minus its
        # aliased writeback outputs), so the XLA cache writes drop off the
        # critical path — nothing in this step reads them. Bit-identical
        # to write-then-read: same quantize formula as
        # ops/kv_cache.quantize_kv, codes round-trip through the store
        # dtype, then the SAME full-block reads/dots as the base kernel.
        bq = pl.program_id(0)
        bs_f = posc_ref.shape[0]
        slot = slot_ref[bq, 0]
        S_total = bs_f * num_s
        slot_c = jnp.minimum(slot, S_total - 1)
        slot_local = slot - ns * bs_f
        slot_local_c = slot_c - ns * bs_f
        valid = slot < S_total
        in_blk = (slot_local >= 0) & (slot_local < bs_f)
        if quantized:
            knf = kn_ref[0:1, :].astype(jnp.float32).reshape(Hkv, D)
            vnf = vn_ref[0:1, :].astype(jnp.float32).reshape(Hkv, D)

            def _q8(mat):
                amax = jnp.max(jnp.abs(mat), axis=-1, keepdims=True)
                sc = amax / 127.0
                inv = jnp.where(sc > 0, 1.0 / jnp.where(sc > 0, sc, 1.0), 0.0)
                return jnp.round(mat * inv), sc
            kq_f, ksc_f = _q8(knf)
            vq_f, vsc_f = _q8(vnf)
        else:
            kq_f = kn_ref[0:1, :].reshape(Hkv, D)
            vq_f = vn_ref[0:1, :].reshape(Hkv, D)

        @pl.when((slot_local_c >= 0) & (slot_local_c < bs_f))
        def _patch():
            grp = slot_local_c // 32
            row32 = jax.lax.broadcasted_iota(jnp.int32, (32, Hkv * D), 0)
            hit32 = (row32 == slot_c % 32) & valid
            k_grp = jnp.where(
                hit32, kq_f.reshape(1, Hkv * D).astype(k_ref.dtype),
                k_ref[0, 0, pl.dslice(grp, 1), :, :].reshape(32, Hkv * D))
            v_grp = jnp.where(
                hit32, vq_f.reshape(1, Hkv * D).astype(v_ref.dtype),
                v_ref[0, 0, pl.dslice(grp, 1), :, :].reshape(32, Hkv * D))
            k_ref[0, 0, pl.dslice(grp, 1), :, :] = k_grp.reshape(
                1, 32, Hkv * D)
            v_ref[0, 0, pl.dslice(grp, 1), :, :] = v_grp.reshape(
                1, 32, Hkv * D)
        if quantized:
            lane_hit = (jax.lax.broadcasted_iota(jnp.int32, (Hkv, bs), 1)
                        == slot_local) & in_blk & valid
            ks_blk = jnp.where(lane_hit, jnp.broadcast_to(ksc_f, (Hkv, bs)),
                               ks_ref[0, 0])
            vs_blk = jnp.where(lane_hit, jnp.broadcast_to(vsc_f, (Hkv, bs)),
                               vs_ref[0, 0])

    for h in range(n_kv_head):
        r0, r1 = h * group, (h + 1) * group
        kf = khead(k_ref, h).astype(jnp.float32)                  # [BS, D]
        k_rot = kf * cos + _swap_pairs(kf, even) * sin_signed
        qh = q_ref[0, r0:r1, :].astype(jnp.float32)               # [g, D]
        scores = jax.lax.dot_general(
            qh, k_rot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                  # [g, BS]
        if quantized:
            scores = scores * (ks_blk[h:h + 1, :] if fresh
                               else shead(ks_ref, h))             # fold K scale
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
            e = e * (vs_blk[h:h + 1, :] if fresh
                     else shead(vs_ref, h))                       # fold V scale
        vf = khead(v_ref, h).astype(jnp.float32)                  # [BS, D]
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


def _decode_attn_kernel_hb(
    # refs (quantized mode appends ks8/vs8 before out)
    q_ref,       # [1, H, D]  q dtype (rotated, unscaled)
    k_ref,       # stacked: [1, 1, BS, Hkv*D]; else [1, BS, Hkv*D]
    v_ref,       # same
    posr_ref,    # [1, BS*Hkv] int32 positions expanded in (s, h) order (mask)
    posc_ref,    # [BS*Hkv, 1] int32 same, column layout (rope angles)
    qpos_ref,    # [B, 1] int32 (whole-array SMEM) query positions
    invf_ref,    # [1, D] f32 effective inv-freq, interleave-expanded
    *rest_refs,
    n_kv_head: int,
    group: int,
    head_dim: int,
    scale: float,
    quantized: bool,
    stacked: bool,
):
    """HEAD-BATCHED decode attention: all kv heads in two dots per block.

    The per-head loop extracted [BS, D] head slices from the cache block —
    on the stacked 5-D operand that's a strided sublane gather per head
    (measured 63 us/call vs ~5 us of streaming at 8B/S=2048). Here the block
    collapses to rows r = (s, h) — a pure sublane merge, no relayout — and
    validity between q row and kv row is a MASK on the [H, BS*Hkv] score
    matrix. 8x the MXU flops of the per-head dots, but this kernel is
    bandwidth/overhead-bound and MXU time is noise (~0.3 us/block).
    Positions and INT8 scales arrive pre-expanded in (s, h) order, which is
    exactly the cache's native row-major flattening — no transposes
    anywhere."""
    if quantized:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = rest_refs
    else:
        out_ref, acc_ref, m_ref, l_ref = rest_refs
    ns = pl.program_id(1)
    num_s = pl.num_programs(1)
    D = head_dim
    H = group * n_kv_head

    @pl.when(ns == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    kf = k_ref[:].reshape(-1, D).astype(jnp.float32)       # [R, D], R = BS*Hkv
    vf = v_ref[:].reshape(-1, D).astype(jnp.float32)
    R = kf.shape[0]

    # rope angles per (slot, head) row — head-duplicated trig is VPU noise
    pos_col = posc_ref[:, 0:1]                             # [R, 1] int32
    theta = pos_col.astype(jnp.float32) * invf_ref[0:1, :]  # [R, D]
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    even = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1) % 2 == 0
    k_rot = kf * cos + _swap_pairs(kf, even) * jnp.where(even, -sin, sin)

    q_all = q_ref[0].astype(jnp.float32)                   # [H, D]
    scores = jax.lax.dot_general(
        q_all, k_rot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [H, R]
    if quantized:
        scores = scores * ks_ref[0:1, :]                   # fold K scale

    qpos = qpos_ref[pl.program_id(0), 0]
    pos_row = posr_ref[0:1, :]                             # [1, R]
    # row r of q belongs to kv head r//group; column j holds kv head j%Hkv
    rh = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0) // group
    jc = jax.lax.broadcasted_iota(jnp.int32, (H, R), 1) % n_kv_head
    mask = (jc == rh) & (pos_row >= 0) & (pos_row <= qpos)  # [H, R]
    scores = jnp.where(mask, scores, NEG_INF)

    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.max(scores, axis=-1, keepdims=True)        # [H, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    e = jnp.exp(scores - m_new)
    e = jnp.where(mask, e, 0.0)                            # all-masked safety
    l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
    if quantized:
        e = e * vs_ref[0:1, :]                             # fold V scale
    pv = jax.lax.dot_general(
        e, vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [H, D]
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ns == num_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def _pick_block_s(S: int, itemsize: int, batch: int = 1,
                  cap: int = 1024) -> int | None:
    # Mosaic lane rule for the [1, B*S] position row layout: the lane block
    # must be a multiple of 128 OR the whole array (the latter admits the
    # small-context single-block case, e.g. S=32 at B=1).
    # int8 caches take 1024-slot blocks in the DECODE kernel: at S=2048 it is
    # dispatch/ramp-bound (23.5 us/call vs ~5 us of streaming, device trace
    # round 3), so fewer, larger DMAs win. bf16 — and the prefill kernel,
    # whose q/acc/score buffers already crowd VMEM (cap=512 there) — keep
    # 512 so double-buffered K+V blocks stay well under the scoped limit.
    cands = (2048, 1024, 512, 256, 128, 64, 32, 16, 8) if itemsize == 1 else (
        512, 256, 128, 64, 32, 16, 8)
    for bs in cands:
        if bs <= cap and S % bs == 0 and (bs % 128 == 0 or bs == batch * S):
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


@partial(jax.jit, static_argnames=("scale", "interpret", "layer", "scales_t"))
def _call(q, k2, v2, kv_pos, q_pos, inv_freq_e, k_scale, v_scale,
          scale: float, interpret: bool, layer: int | None = None,
          scales_t: bool = False, k_new=None, v_new=None, slot=None):
    """layer != None: k2/v2 are the STACKED MERGED [L, B, S, Hkv*D] cache
    arrays (Hkv derived as shape[3] // D) in
    their NATIVE layout and the block specs index the layer directly — no
    per-layer slice materialization (a pallas operand must be contiguous, so
    an XLA-level k2[layer] costs a full-layer copy in AND a set-back copy out
    per step; ~0.5 ms/step across 32 layers at 8B/S=2048) and no Hkv*D merge
    (a full-cache relayout, ~13 ms/step — BENCH_LOCAL round 3).

    Kernel selection: the head-batched kernel (_decode_attn_kernel_hb)
    whenever the block rows can collapse to (BS*Hkv, D) without touching the
    lane dim — always true for the 5-D stacked operand, and for the merged
    2-D operand when D % 128 == 0. Models with smaller head dims keep the
    per-head-loop kernel."""
    B, H, D = q.shape
    fresh = k_new is not None
    if layer is None:
        S = k2.shape[1]
        Hkv = k2.shape[2] // D
        kspec = lambda blk: pl.BlockSpec(
            (1, blk, Hkv * D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM)
    elif fresh:
        # fresh mode: the caller carries the cache GROUPED
        # [L, B, S/32, 32, Hkv*D] across the whole fast loop (an in-call
        # reshape re-materialized the full cache every step — +0.33 ms at
        # 8B, device trace) so the kernel can patch the fresh row with one
        # group-aligned store; the (32, 128) group is the int8 native tile,
        # so the streamed blocks' DMA is unchanged
        S = k2.shape[2] * 32
        Hkv = k2.shape[4] // D
        kspec = lambda blk: pl.BlockSpec(
            (1, 1, blk // 32, 32, Hkv * D),
            lambda b, n, li=layer: (li, b, n, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        S = k2.shape[2]
        Hkv = k2.shape[3] // D
        kspec = lambda blk: pl.BlockSpec(
            (1, 1, blk, Hkv * D), lambda b, n, li=layer: (li, b, n, 0),
            memory_space=pltpu.VMEM)
    # head-batched turned out SLOWER on hardware: collapsing (s, h) rows is
    # an in-VMEM lane->sublane relayout (~70 us/call), while the per-head
    # LANE SLICES of the merged block are free. Keep hb available for probes.
    hb = D % 128 == 0 and _HB and not scales_t and not fresh
    group = H // Hkv
    # head-batched f32 intermediates are [block_s*Hkv, D]; cap rows at 4K
    cap = max(128, 4096 // Hkv) if hb else _BLOCK_CAP
    block_s = _pick_block_s(S, jnp.dtype(k2.dtype).itemsize, B, cap=cap)
    if hb and block_s is None:
        # the tighter hb cap can reject a geometry supports() approved
        # (e.g. B=1, S=192 needs the whole-array 192 block): fall back to
        # the per-head kernel rather than failing (ADVICE r3)
        hb = False
        block_s = _pick_block_s(S, jnp.dtype(k2.dtype).itemsize, B)
    grid = (B, S // block_s)
    nsb = S // block_s
    quantized = k_scale is not None

    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        kspec(block_s),
        kspec(block_s),
    ]
    if hb:
        # positions and INT8 scales expanded to (s, h) rows — the cache's
        # own row-major flattening, so no transposes anywhere
        kv_pos8 = jnp.repeat(kv_pos, Hkv, axis=1)          # [B, S*Hkv]
        be = block_s * Hkv
        in_specs += [
            pl.BlockSpec((1, be), lambda b, n: (0, b * nsb + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, 1), lambda b, n: (b * nsb + n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = [q, k2, v2, kv_pos8.reshape(1, B * S * Hkv),
                kv_pos8.reshape(B * S * Hkv, 1), q_pos, inv_freq_e]
        if quantized:
            ksl = k_scale[layer] if layer is not None else k_scale
            vsl = v_scale[layer] if layer is not None else v_scale
            in_specs += [
                pl.BlockSpec((1, be), lambda b, n: (b, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, be), lambda b, n: (b, n),
                             memory_space=pltpu.VMEM),
            ]
            args += [ksl.reshape(B, S * Hkv), vsl.reshape(B, S * Hkv)]
        kernel = partial(
            _decode_attn_kernel_hb,
            n_kv_head=Hkv, group=group, head_dim=D,
            scale=scale, quantized=quantized, stacked=layer is not None,
        )
    else:
        in_specs += [
            # positions flattened to [1, B*S] / [B*S, 1] so the blocks
            # satisfy Mosaic tiling at ANY batch (row b block n = flat block
            # b*nsb + n); q_pos rides whole-array SMEM for the same reason
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
            if scales_t:
                # fast-loop carry: scales ride the whole loop TRANSPOSED
                # [L, B, Hkv, S] and the block specs index the layer in
                # place — no per-layer [B, S, Hkv] slice + swapaxes copies
                # (2 slices + 2 transposes per layer per step otherwise;
                # round-5 trace glue)
                assert layer is not None
                in_specs += [
                    pl.BlockSpec((1, 1, Hkv, block_s),
                                 lambda b, n, li=layer: (li, b, 0, n),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, Hkv, block_s),
                                 lambda b, n, li=layer: (li, b, 0, n),
                                 memory_space=pltpu.VMEM),
                ]
                args += [k_scale, v_scale]
            else:
                in_specs += [
                    pl.BlockSpec((1, Hkv, block_s), lambda b, n: (b, 0, n), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Hkv, block_s), lambda b, n: (b, 0, n), memory_space=pltpu.VMEM),
                ]
                ksl = k_scale[layer] if layer is not None else k_scale
                vsl = v_scale[layer] if layer is not None else v_scale
                args += [jnp.swapaxes(ksl, 1, 2), jnp.swapaxes(vsl, 1, 2)]
        if fresh:
            # fresh-token K/V operands: slot rides whole-array SMEM like
            # q_pos; the rows are one VMEM block per batch row
            assert not quantized or scales_t, \
                "fresh mode requires the transposed stacked scale carry"
            in_specs += [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Hkv * D), lambda b, n: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv * D), lambda b, n: (b, 0),
                             memory_space=pltpu.VMEM),
            ]
            args += [slot.reshape(B, 1), k_new, v_new]
        kernel = partial(
            _decode_attn_kernel,
            n_kv_head=Hkv, group=group, head_dim=D,
            scale=scale, quantized=quantized, stacked=layer is not None,
            scales_stacked=scales_t, fresh=fresh,
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
            # head-batched f32 intermediates ([BS*Hkv, D] x ~5) exceed the
            # 16M default at 512-slot int8 blocks; v5e VMEM is far larger
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _decode_attn_write_kernel(
    slot_ref,    # [B] int32 scalar prefetch — cache row this step writes
    q_ref,       # [1, H, D]  rotated query
    k_ref,       # [1, 1, BS/32, 32, Hkv*D] stacked cache block (stored dtype)
    v_ref,       # [1, 1, BS/32, 32, Hkv*D]
    posr_ref,    # [1, BS] int32 slot positions (row layout, mask)
    posc_ref,    # [BS, 1] int32 slot positions (column layout, rope)
    qpos_ref,    # [B, 1] int32 (whole-array SMEM)
    invf_ref,    # [1, D] f32
    *rest_refs,
    n_kv_head: int,
    group: int,
    head_dim: int,
    scale: float,
    quantized: bool,
):
    """Fused decode attention WITH the token's KV quantize + cache write.

    The XLA write path (quantize_kv + 4 dynamic-update-slices + per-layer
    scale transposes) costs ~0.45 ms/step at 8B (round-5 no-write probe);
    here the fresh K/V row rides in as an operand, is quantized in-kernel
    (bit-identical formula to ops/kv_cache.quantize_kv), written to the
    cache through ALIASED row outputs, and injected into this step's
    attention in-register — value-for-value what write-then-read computed,
    in the same block order, so logits are bit-identical to the XLA-write
    path. Scales are carried TRANSPOSED [L, B, Hkv, S] by the fast loops
    and written back read-modify-write per block (cheap: [Hkv, BS] f32).

    Pad rows (slot >= S, e.g. idle scheduler rows) clamp to row S-1: the
    garbage write is never read because the row's position stays -1 (the
    XLA-side position scatter drops out-of-range indices) and every read
    masks on position >= 0."""
    if quantized:
        (ks_ref, vs_ref, kn_ref, vn_ref, out_ref, ko_ref, vo_ref,
         kso_ref, vso_ref, acc_ref, m_ref, l_ref) = rest_refs
    else:
        (kn_ref, vn_ref, out_ref, ko_ref, vo_ref,
         acc_ref, m_ref, l_ref) = rest_refs
    ns = pl.program_id(1)
    num_s = pl.num_programs(1)
    D = head_dim
    Hkv = n_kv_head

    @pl.when(ns == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # fresh-token quantize (exact quantize_kv formula, per (token, head))
    kn = kn_ref[0:1, :].astype(jnp.float32).reshape(Hkv, D)
    vn = vn_ref[0:1, :].astype(jnp.float32).reshape(Hkv, D)
    if quantized:
        def q8(mat):
            amax = jnp.max(jnp.abs(mat), axis=-1, keepdims=True)  # [Hkv, 1]
            sc = amax / 127.0
            inv = jnp.where(sc > 0, 1.0 / jnp.where(sc > 0, sc, 1.0), 0.0)
            return jnp.round(mat * inv), sc
        kq, k_sc = q8(kn)
        vq, v_sc = q8(vn)
    else:
        kq, vq = kn, vn

    bs = posc_ref.shape[0]
    b = pl.program_id(0)
    slot = slot_ref[b]
    S_total = bs * num_s
    # pads (slot >= S) clamp to the last row's GROUP and write identity
    slot_c = jnp.minimum(slot, S_total - 1)
    slot_local = slot - ns * bs
    slot_local_c = slot_c - ns * bs
    in_block = (slot_local >= 0) & (slot_local < bs)
    valid = slot < S_total

    # cache-row writes: the cache rides as [L, B, S/32, 32, Hkv*D] — the
    # 32-row group is the int8 (32, 128) native tile, so the view changes
    # NOTHING about the streamed blocks' DMA (an 8-row view padded the
    # int8 minor tile 4x and cost more than the XLA writes it replaced) —
    # and the write RMWs the group containing the slot. The fresh row is
    # PATCHED into the streamed VMEM block first, so the per-head reads
    # (and the group writeback) see exactly what write-then-read would
    # have. Pad rows (valid == False) patch nothing, so the clamped group
    # writeback is identity. The out block index is constant over ns; the
    # single in-block write survives to the one writeback at the b
    # boundary.
    @pl.when((slot_local_c >= 0) & (slot_local_c < bs))
    def _patch_and_write():
        grp = slot_local_c // 32
        row32 = jax.lax.broadcasted_iota(jnp.int32, (32, Hkv * D), 0)
        hit32 = (row32 == slot_c % 32) & valid
        k_grp = jnp.where(
            hit32, kq.reshape(1, Hkv * D).astype(k_ref.dtype),
            k_ref[0, 0, pl.dslice(grp, 1), :, :].reshape(32, Hkv * D))
        v_grp = jnp.where(
            hit32, vq.reshape(1, Hkv * D).astype(v_ref.dtype),
            v_ref[0, 0, pl.dslice(grp, 1), :, :].reshape(32, Hkv * D))
        # patch the streamed VMEM block (group-aligned store — Mosaic
        # forbids dynamic sublane-row stores)
        k_ref[0, 0, pl.dslice(grp, 1), :, :] = k_grp.reshape(1, 32, Hkv * D)
        v_ref[0, 0, pl.dslice(grp, 1), :, :] = v_grp.reshape(1, 32, Hkv * D)
        ko_ref[0, 0, 0] = k_grp
        vo_ref[0, 0, 0] = v_grp

    lane_hit = (jax.lax.broadcasted_iota(jnp.int32, (Hkv, bs), 1)
                == slot_local) & in_block
    if quantized:
        # scale blocks: read-modify-write (fresh column where this block
        # holds the slot, copy-through otherwise)
        ks_blk = jnp.where(lane_hit, jnp.broadcast_to(k_sc, (Hkv, bs)),
                           ks_ref[0, 0])
        vs_blk = jnp.where(lane_hit, jnp.broadcast_to(v_sc, (Hkv, bs)),
                           vs_ref[0, 0])
        kso_ref[0, 0] = ks_blk
        vso_ref[0, 0] = vs_blk

    # rope angles for this sequence block, shared by all kv heads
    pos_col = posc_ref[:, 0:1]                              # [BS, 1]
    theta = pos_col.astype(jnp.float32) * invf_ref[0:1, :]  # [BS, D]
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    even = jax.lax.broadcasted_iota(jnp.int32, (bs, D), 1) % 2 == 0
    sin_signed = jnp.where(even, -sin, sin)

    qpos = qpos_ref[b, 0]
    pos_row = posr_ref[0:1, :]                              # [1, BS]
    mask_row = (pos_row >= 0) & (pos_row <= qpos)           # [1, BS]

    for h in range(n_kv_head):
        r0, r1 = h * group, (h + 1) * group
        kf = k_ref[0, 0, :, :, h * D:(h + 1) * D].astype(
            jnp.float32).reshape(bs, D)
        k_rot = kf * cos + _swap_pairs(kf, even) * sin_signed
        qh = q_ref[0, r0:r1, :].astype(jnp.float32)               # [g, D]
        scores = jax.lax.dot_general(
            qh, k_rot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                  # [g, BS]
        if quantized:
            scores = scores * ks_blk[h:h + 1, :]                  # fold K scale
        scores = jnp.where(mask_row, scores, NEG_INF)

        m_prev = m_ref[r0:r1, 0:1]
        l_prev = l_ref[r0:r1, 0:1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)           # [g, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        e = jnp.where(mask_row, e, 0.0)
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        if quantized:
            e = e * vs_blk[h:h + 1, :]                            # fold V scale
        vf = v_ref[0, 0, :, :, h * D:(h + 1) * D].astype(
            jnp.float32).reshape(bs, D)
        pv = jax.lax.dot_general(
            e, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[r0:r1, :] = acc_ref[r0:r1, :] * alpha + pv
        m_ref[r0:r1, :] = jnp.broadcast_to(m_new, (group, m_ref.shape[1]))
        l_ref[r0:r1, :] = jnp.broadcast_to(l_new, (group, l_ref.shape[1]))

    @pl.when(ns == num_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "interpret", "layer"))
def _call_write(q, k2, v2, kv_pos, q_pos, inv_freq_e, ks_t, vs_t,
                k_new, v_new, slot, scale: float, interpret: bool,
                layer: int):
    """Write-mode dispatch: k2/v2 are the stacked MERGED [L, B, S, Hkv*D]
    cache, ks_t/vs_t the stacked TRANSPOSED [L, B, Hkv, S] scales; returns
    (attn_out, k2', v2', ks_t', vs_t') with the cache arrays updated
    in-place via input_output_aliases."""
    B, H, D = q.shape
    L = k2.shape[0]
    S = k2.shape[2]
    Hkv = k2.shape[3] // D
    group = H // Hkv
    quantized = ks_t is not None
    block_s = _pick_block_s(S, jnp.dtype(k2.dtype).itemsize, B)
    grid = (B, S // block_s)
    nsb = S // block_s

    # Single cache rows can't be written in the [.., S, Hkv*D] tiling
    # (Mosaic block-dim rules), so the cache rides as
    # [L, B, S/32, 32, Hkv*D] — a free view whose (32, Hkv*D) minor dims
    # are exact multiples of every dtype's native tile, so the streamed
    # blocks' DMA is unchanged — and the kernel RMWs the 32-row group
    # containing the slot.
    k5 = k2.reshape(L, B, S // 32, 32, Hkv * D)
    v5 = v2.reshape(L, B, S // 32, 32, Hkv * D)
    kspec = pl.BlockSpec((1, 1, block_s // 32, 32, Hkv * D),
                         lambda b, n, sl, li=layer: (li, b, n, 0, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec(
        (1, 1, 1, 32, Hkv * D),
        lambda b, n, sl, li=layer: (
            li, b, jnp.minimum(sl[b], S - 1) // 32, 0, 0),
        memory_space=pltpu.VMEM)
    scspec = pl.BlockSpec((1, 1, Hkv, block_s),
                          lambda b, n, sl, li=layer: (li, b, 0, n),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, n, sl: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        kspec,
        kspec,
        pl.BlockSpec((1, block_s), lambda b, n, sl: (0, b * nsb + n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_s, 1), lambda b, n, sl: (b * nsb + n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, D), lambda b, n, sl: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k5, v5, kv_pos.reshape(1, B * S), kv_pos.reshape(B * S, 1),
            q_pos, inv_freq_e]
    if quantized:
        in_specs += [scspec, scspec]
        args += [ks_t, vs_t]
    nspec = pl.BlockSpec((1, Hkv * D), lambda b, n, sl: (b, 0),
                         memory_space=pltpu.VMEM)
    in_specs += [nspec, nspec]
    args += [k_new, v_new]

    out_specs = [
        pl.BlockSpec((1, H, D), lambda b, n, sl: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        rowspec,
        rowspec,
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, D), q.dtype),
        jax.ShapeDtypeStruct(k5.shape, k5.dtype),
        jax.ShapeDtypeStruct(v5.shape, v5.dtype),
    ]
    # aliases count the scalar-prefetch operand (slot) as input 0
    aliases = {2: 1, 3: 2}
    if quantized:
        out_specs += [scspec, scspec]
        out_shapes += [jax.ShapeDtypeStruct(ks_t.shape, ks_t.dtype),
                       jax.ShapeDtypeStruct(vs_t.shape, vs_t.dtype)]
        aliases[8] = 3
        aliases[9] = 4

    kernel = partial(
        _decode_attn_write_kernel,
        n_kv_head=Hkv, group=group, head_dim=D,
        scale=scale, quantized=quantized,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((H, D), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(slot, *args)
    k_out = outs[1].reshape(k2.shape)
    v_out = outs[2].reshape(v2.shape)
    if quantized:
        return outs[0], k_out, v_out, outs[3], outs[4]
    return outs[0], k_out, v_out, None, None


def decode_attention_write(
    q: jnp.ndarray,          # [B, 1, H, D] rotated query
    k_cache: jnp.ndarray,    # [L, B, S, Hkv*D] stacked MERGED cache
    v_cache: jnp.ndarray,
    q_pos: jnp.ndarray,      # [B] int32
    kv_pos: jnp.ndarray,     # [B, S] int32 (already includes this token)
    inv_freq_e: jnp.ndarray,  # [head_dim] f32
    k_new: jnp.ndarray,      # [B, Hkv*D] fresh (unrotated) K, x dtype
    v_new: jnp.ndarray,      # [B, Hkv*D]
    slot: jnp.ndarray,       # [B] int32 cache row to write (>= S: pad row)
    layer: int,
    k_scale: jnp.ndarray | None = None,  # [L, B, Hkv, S] TRANSPOSED scales
    v_scale: jnp.ndarray | None = None,
    logit_scale: float | None = None,
    mscale: float = 1.0,
):
    """Fused decode attention + in-kernel KV quantize/write (see
    _decode_attn_write_kernel). Returns (attn [B, 1, H, D], k_cache',
    v_cache', k_scale', v_scale')."""
    B, T, H, D = q.shape
    assert T == 1
    scale = (logit_scale if logit_scale is not None else 1.0 / (D ** 0.5)) * mscale
    out, k2, v2, ks, vs = _call_write(
        q.reshape(B, H, D), k_cache, v_cache, kv_pos,
        q_pos.reshape(B, 1), inv_freq_e.reshape(1, D), k_scale, v_scale,
        k_new, v_new, slot.astype(jnp.int32),
        scale=float(scale), interpret=jax.default_backend() == "cpu",
        layer=layer,
    )
    return out.reshape(B, 1, H, D), k2, v2, ks, vs


def write_supports(S: int, head_dim: int, k_dtype, batch: int = 1) -> bool:
    """Whether the write-mode kernel serves this geometry: the base kernel's
    gate plus the 128-lane reshape the in-kernel quantize needs, the 8-row
    group view, and a block size the group view can tile."""
    if not (supports(S, head_dim, k_dtype, batch) and head_dim % 128 == 0
            and S % 32 == 0):
        return False
    bs = _pick_block_s(S, jnp.dtype(k_dtype).itemsize, batch)
    return bs is not None and bs % 32 == 0


def fresh_supports(S: int, head_dim: int, k_dtype, batch: int = 1) -> bool:
    """Whether the fresh-operand patch mode serves this geometry: the base
    kernel's gate plus the 128-lane [1, Hkv*D] -> [Hkv, D] reshape the
    in-kernel fresh row needs and the 32-row group view's tiling (same
    constraints as write_supports — the patch is the write kernel's)."""
    if not (supports(S, head_dim, k_dtype, batch) and head_dim % 128 == 0
            and S % 32 == 0):
        return False
    bs = _pick_block_s(S, jnp.dtype(k_dtype).itemsize, batch)
    return bs is not None and bs % 32 == 0


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
    layer: int | None = None,  # k/v_cache are stacked MERGED [L, B, S, Hkv*D]
    scales_t: bool = False,    # scales are stacked TRANSPOSED [L, B, Hkv, S]
    k_new: jnp.ndarray | None = None,  # [B, Hkv*D] fresh-token K (pre-write)
    v_new: jnp.ndarray | None = None,
    slot: jnp.ndarray | None = None,   # [B] int32 cache row of the fresh token
) -> jnp.ndarray:
    """Fused single-token attention; returns [B, 1, H, D] in q.dtype.

    With `layer` set, k_cache/v_cache are the full stacked cache arrays in
    the MERGED [L, B, S, Hkv*D] shape (the caller reshapes once per step —
    bitcast, not copy) and the kernel reads layer `layer` in place: no
    per-layer slice/set-back copies (a pallas operand can't alias an XLA
    slice) and no per-layer relayouts. Scales stay [L, B, S, Hkv] unless
    `scales_t`: then they ride stacked TRANSPOSED [L, B, Hkv, S] (the fast
    loops pre-transpose once — ops/generate_loop._fused_merge) and the
    kernel indexes the layer in place, like the cache."""
    B, T, H, D = q.shape
    assert T == 1, "decode_attention is the T==1 fast path"
    if layer is None:
        S, Hkv = k_cache.shape[1], k_cache.shape[2]
        k2 = k_cache.reshape(B, S, Hkv * D)
        v2 = v_cache.reshape(B, S, Hkv * D)
    else:
        # stacked arrays pass through UNRESHAPED: the Hkv*D merge would
        # retile the cache (full-array relayout copy per layer)
        k2, v2 = k_cache, v_cache
    scale = (logit_scale if logit_scale is not None else 1.0 / (D ** 0.5)) * mscale
    out = _call(
        q.reshape(B, H, D), k2, v2, kv_pos,
        q_pos.reshape(B, 1), inv_freq_e.reshape(1, D), k_scale, v_scale,
        scale=float(scale),
        interpret=jax.default_backend() == "cpu",
        layer=layer, scales_t=scales_t,
        k_new=k_new, v_new=v_new, slot=slot,
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
        and _pick_block_s(S, item, batch, cap=512) is not None
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
    block_s = _pick_block_s(S, jnp.dtype(k2.dtype).itemsize, B, cap=512)
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
            # q/out/acc blocks + (block_t*H, 128) m/l scratch + per-head
            # score temporaries exceed the 16M default scoped-vmem limit at
            # long S with a 128-row T block (observed 25.2M at S=2048 int8);
            # v5e VMEM is far larger, so raise the per-kernel budget
            vmem_limit_bytes=64 * 1024 * 1024,
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


def decode_attention_sharded(mesh, q, k_cache, v_cache, q_pos, kv_pos,
                             inv_freq_e, k_scale=None, v_scale=None,
                             logit_scale=None, mscale: float = 1.0,
                             layer: int | None = None):
    """decode_attention under a (dp, tp) mesh via a shard_map island.

    GSPMD cannot partition an opaque pallas_call, so the sharded configs ran
    the ~6.5x-HBM XLA attention chain (VERDICT r3 missing #4). But attention
    is per-(batch row, kv-head) INDEPENDENT: with the cache sharded on the
    kv-head axis (parallel/sharding.py kv_cache_specs) and q sharded on the
    matching head slice (wq is output-sharded), every device can run the
    fused kernel on its local shard with NO collectives — the ShardedQuant
    shard_map-island technique (quant_matmul._qmm_sharded) applied per head.
    Per-head arithmetic is identical at any tp (heads are never reduced
    against each other), so logits stay BIT-IDENTICAL across shardings —
    stronger than the matmul paths, which need pinned topologies.

    Shapes: layer=None → k/v [B, S, Hkv, D], scales [B, S, Hkv];
    layer=i → STACKED MERGED k/v [L, B, S, Hkv*D], scales [L, B, S, Hkv].
    Requires tp | Hkv and dp | B (checked by the caller's supports gate).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    quant = k_scale is not None
    B, T, H, D = q.shape
    if layer is None:
        Hkv = k_cache.shape[2]
        kv_spec = P("dp", None, "tp", None)
        sc_spec = P("dp", None, "tp")
    else:
        Hkv = k_cache.shape[3] // D
        # merged Hkv*D axis shards cleanly: head h's D columns are
        # contiguous, so a tp-slice of the merged axis is a whole-head slice
        kv_spec = P(None, "dp", None, "tp")
        sc_spec = P(None, "dp", None, "tp")
    tp = mesh.shape["tp"]
    assert Hkv % tp == 0 and H % tp == 0, (H, Hkv, tp)

    def body(q_l, k_l, v_l, qp_l, kp_l, inv, *scales):
        ks_l, vs_l = scales if quant else (None, None)
        return decode_attention(q_l, k_l, v_l, qp_l, kp_l, inv,
                                k_scale=ks_l, v_scale=vs_l,
                                logit_scale=logit_scale, mscale=mscale,
                                layer=layer)

    # inv_freq_e is rank-1 [D] (replicated) — a rank-2 spec here was a
    # latent bug masked by the supports() gate rejecting the small test
    # geometries (every mesh+fused test silently fell back to XLA attention
    # until a ctx the kernel accepts was exercised, round 5)
    args = [q, k_cache, v_cache, q_pos, kv_pos, inv_freq_e]
    specs = [P("dp", None, "tp", None), kv_spec, kv_spec, P("dp"),
             P("dp", None), P(None)]
    if quant:
        args += [k_scale, v_scale]
        specs += [sc_spec, sc_spec]
    return jax.shard_map(
        body, mesh=mesh, in_specs=tuple(specs),
        out_specs=P("dp", None, "tp", None), check_vma=False,
    )(*args)
