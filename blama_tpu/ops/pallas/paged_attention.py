"""Pallas paged attention: stream KV pages straight from the shared pool.

Companion to ops/pallas/decode_attention.py for the paged cache
(ops/paged_kv.py). The dense fused kernels walk a row's contiguous
[S, Hkv, D] cache; here a sequence's cache lives on scattered pages of a
pool shared by every scheduler row, so the sequence-block grid axis is
indirected through the row's page table: a scalar-prefetch index map picks
which physical page each grid step DMAs into VMEM
(pltpu.PrefetchScalarGridSpec — the page table is available to the index
maps before the body runs, the TPU-native analog of vLLM's block tables).

Multi-page batching (VERDICT r2 next #5): one grid step processes PAGE_BATCH
logical pages — the pool rides PAGE_BATCH times as separate operands whose
index maps select consecutive logical pages, so their DMAs overlap and the
grid (and its per-step fixed cost, the reason one-page-per-step lost to the
dense kernel at 2k context) shrinks PAGE_BATCH-fold while HBM traffic is
unchanged (only live pages are read).

No gathered copy of the row view is ever materialized: HBM traffic is one
pass over the row's LIVE pages per step, and pages the row does not own are
never read (the XLA fallback in models/llama.py gathers the full logical
window instead).

Numerics/determinism: the kernel body is the decode/prefill body of
decode_attention.py with block size == page size; the grid walks logical
pages in order, unmapped pages are fully masked (exact no-ops under the
online softmax), so the output is bit-identical to the dense fused kernel
over the same logical row — physical page placement cannot affect logits
(verification contract, SURVEY.md §3.3; pinned by tests/test_paged_kv.py).
PAGE_BATCH only regroups the same per-page scratch updates onto fewer grid
steps, in the same order — it cannot change results either.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import NEG_INF, _swap_pairs

__all__ = ["paged_decode_attention", "paged_prefill_attention", "supports"]


def supports(page_size: int, head_dim: int, k_dtype) -> bool:
    """Whether the paged kernels can serve this pool geometry. The page is
    the sequence block AND the lane dim of the [1, P*G] position row layout,
    so Mosaic requires it to be a multiple of 128 (which also covers every
    dtype's sublane tile for the [page, G, Hkv*D] KV blocks)."""
    return (
        page_size % 128 == 0
        and head_dim % 2 == 0
        and head_dim <= 256
    )


def _pick_page_batch(MP: int) -> int:
    """Logical pages per grid step (divisor of the table width)."""
    for pb in (4, 2):
        if MP % pb == 0:
            return pb
    return 1


def _page_update(
    j, pb, b, ns,
    q_ref, k_refs, v_refs, posr_refs, posc_refs, qpos_ref, invf_ref,
    ks_refs, vs_refs, acc_ref, m_ref, l_ref, pt_ref,
    *, n_kv_head, group, head_dim, scale, quantized, block_t,
    stacked=False,
):
    """Online-softmax update for one logical page (page-slot j of this grid
    step) — the per-page body shared by decode (block_t=0) and prefill.

    `stacked`: the k/v/scale refs carry a leading layer dim (the pool stays
    the whole stacked [L, P, G, Hkv*D] array and the block specs index the
    layer directly — no per-layer slice/set-back copies, mirroring
    decode_attention's stacked mode)."""
    D = head_dim
    if stacked:
        k_ref = k_refs[j].at[0]
        v_ref = v_refs[j].at[0]
        ks_refs = [r.at[0] for r in ks_refs] if ks_refs is not None else None
        vs_refs = [r.at[0] for r in vs_refs] if vs_refs is not None else None
    else:
        k_ref, v_ref = k_refs[j], v_refs[j]
    posr_ref, posc_ref = posr_refs[j], posc_refs[j]

    # rope angles for this page, shared by all kv heads
    pos_col = posc_ref[:, 0:1]                              # [G, 1]
    theta = pos_col.astype(jnp.float32) * invf_ref[0:1, :]  # [G, D]
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    g_rows = theta.shape[0]
    even = jax.lax.broadcasted_iota(jnp.int32, (g_rows, D), 1) % 2 == 0
    sin_signed = jnp.where(even, -sin, sin)

    # unmapped logical pages (pt == -1) are DMA'd as page 0 (index-map clamp)
    # but fully masked here: with every score at NEG_INF the online-softmax
    # update is an exact no-op, so garbage page-0 data cannot leak in.
    valid_page = pt_ref[b, ns * pb + j] >= 0
    pos_row = posr_ref[0:1, :]                              # [1, G]
    if block_t == 0:
        qpos = qpos_ref[b, 0]  # scalar-prefetch read (whole [B, 1] in SMEM)
        mask = (pos_row >= 0) & (pos_row <= qpos) & valid_page   # [1, G]
        rows_per_head = group
    else:
        qpos = qpos_ref[:, 0:1]                             # [BT, 1]
        mask_bt = (pos_row >= 0) & (pos_row <= qpos) & valid_page  # [BT, G]
        mask = jnp.broadcast_to(
            mask_bt[:, None, :], (block_t, group, mask_bt.shape[1])
        ).reshape(block_t * group, -1)
        rows_per_head = block_t * group

    for h in range(n_kv_head):
        r0, r1 = h * rows_per_head, (h + 1) * rows_per_head
        kf = k_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)   # [G, D]
        k_rot = kf * cos + _swap_pairs(kf, even) * sin_signed
        if block_t == 0:
            qh = q_ref[0, r0:r1, :].astype(jnp.float32)           # [g, D]
        else:
            qh = q_ref[0, :, h * group * D:(h + 1) * group * D].astype(jnp.float32)
            qh = qh.reshape(rows_per_head, D)
        scores = jax.lax.dot_general(
            qh, k_rot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                  # [rows, G]
        if quantized:
            scores = scores * ks_refs[j][0, h:h + 1, :]           # fold K scale
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[r0:r1, 0:1]
        l_prev = l_ref[r0:r1, 0:1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        e = jnp.where(mask, e, 0.0)                               # all-masked safety
        l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
        if quantized:
            e = e * vs_refs[j][0, h:h + 1, :]                     # fold V scale
        vf = v_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)   # [G, D]
        pv = jax.lax.dot_general(
            e, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[r0:r1, :] = acc_ref[r0:r1, :] * alpha + pv
        m_ref[r0:r1, :] = jnp.broadcast_to(m_new, (rows_per_head, m_ref.shape[1]))
        l_ref[r0:r1, :] = jnp.broadcast_to(l_new, (rows_per_head, l_ref.shape[1]))


def _paged_attn_kernel(
    pt_ref,      # [B, MP] int32 page table (scalar prefetch, SMEM)
    q_ref,       # [1, QR, D] rotated queries (QR = H decode / BT*H prefill rows)
    *page_and_rest_refs,
    n_kv_head: int,
    group: int,
    head_dim: int,
    scale: float,
    quantized: bool,
    block_t: int,  # 0 = decode (T==1), else prefill T-block
    page_batch: int,
    qpos_in_vmem: bool,  # prefill: qpos rides VMEM, not scalar prefetch
    stacked: bool = False,  # k/v/scale refs carry a leading layer dim
):
    pb = page_batch
    refs = list(page_and_rest_refs)
    k_refs = [refs.pop(0) for _ in range(pb)]
    v_refs = [refs.pop(0) for _ in range(pb)]
    posr_refs = [refs.pop(0) for _ in range(pb)]
    posc_refs = [refs.pop(0) for _ in range(pb)]
    qpos_ref = refs.pop(0)
    invf_ref = refs.pop(0)
    if quantized:
        ks_refs = [refs.pop(0) for _ in range(pb)]
        vs_refs = [refs.pop(0) for _ in range(pb)]
    else:
        ks_refs = vs_refs = None
    out_ref, acc_ref, m_ref, l_ref = refs

    b = pl.program_id(0)
    ns = pl.program_id(1 if block_t == 0 else 2)
    num_s = pl.num_programs(1 if block_t == 0 else 2)

    @pl.when(ns == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    for j in range(pb):
        _page_update(
            j, pb, b, ns, q_ref, k_refs, v_refs, posr_refs, posc_refs,
            qpos_ref, invf_ref, ks_refs, vs_refs, acc_ref, m_ref, l_ref,
            pt_ref, n_kv_head=n_kv_head, group=group, head_dim=head_dim,
            scale=scale, quantized=quantized, block_t=block_t,
            stacked=stacked,
        )

    @pl.when(ns == num_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        if block_t == 0:
            out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)
        else:
            # acc rows are (h, t, gi)-ordered; invert to the q column layout
            rows_per_head = block_t * group
            for h in range(n_kv_head):
                r0, r1 = h * rows_per_head, (h + 1) * rows_per_head
                out = (acc_ref[r0:r1, :] / denom[r0:r1]).astype(out_ref.dtype)
                out_ref[0, :, h * group * head_dim:(h + 1) * group * head_dim] = (
                    out.reshape(block_t, group * head_dim))


@partial(jax.jit, static_argnames=("scale", "interpret", "layer"))
def _paged_decode_call(page_table, q, kp, vp, pos_r, pos_c, q_pos, inv_freq_e,
                       ks, vs, scale: float, interpret: bool,
                       layer: int | None = None):
    """layer != None: kp/vp are the STACKED MERGED [L, P, G, Hkv*D] pool (and
    ks/vs the stacked transposed [L, P, Hkv, G] scales); the block specs
    index the layer directly — no per-layer slice materialization (an XLA
    kp[layer] costs a slice copy in AND a set-back copy out per layer per
    step; the dense stacked path measured ~0.5 ms/step of these at 8B)."""
    B, H, D = q.shape
    stacked = layer is not None
    P, G = (kp.shape[1], kp.shape[2]) if stacked else (kp.shape[0], kp.shape[1])
    Hkv = kp.shape[-1] // D
    group = H // Hkv
    MP = page_table.shape[1]
    pb = _pick_page_batch(MP)
    quantized = ks is not None

    def page(j):
        if stacked:
            return lambda b, n, pt, qp, li=layer: (
                li, jnp.maximum(pt[b, n * pb + j], 0), 0, 0)
        return lambda b, n, pt, qp: (jnp.maximum(pt[b, n * pb + j], 0), 0, 0)

    def posr(j):
        return lambda b, n, pt, qp: (0, jnp.maximum(pt[b, n * pb + j], 0))

    def posc(j):
        return lambda b, n, pt, qp: (jnp.maximum(pt[b, n * pb + j], 0), 0)

    kv_blk = (1, 1, G, Hkv * D) if stacked else (1, G, Hkv * D)
    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, n, pt, qp: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q]
    for j in range(pb):
        in_specs.append(pl.BlockSpec(kv_blk, page(j),
                                     memory_space=pltpu.VMEM))
        args.append(kp)
    for j in range(pb):
        in_specs.append(pl.BlockSpec(kv_blk, page(j),
                                     memory_space=pltpu.VMEM))
        args.append(vp)
    # positions in both layouts ([1, P*G] rows for the mask, [P*G, 1]
    # columns for rope angles) — Mosaic block rules (lane dim multiple of
    # 128 / sublane multiple of 8) shape these, same trick as the dense
    # kernel's kv_pos/kv_pos_t pair
    for j in range(pb):
        in_specs.append(pl.BlockSpec((1, G), posr(j), memory_space=pltpu.VMEM))
        args.append(pos_r)
    for j in range(pb):
        in_specs.append(pl.BlockSpec((G, 1), posc(j), memory_space=pltpu.VMEM))
        args.append(pos_c)
    in_specs.append(pl.BlockSpec((1, D), lambda b, n, pt, qp: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(inv_freq_e)
    if quantized:
        sc_blk = (1, 1, Hkv, G) if stacked else (1, Hkv, G)
        for j in range(pb):
            in_specs.append(pl.BlockSpec(sc_blk, page(j),
                                         memory_space=pltpu.VMEM))
            args.append(ks)
        for j in range(pb):
            in_specs.append(pl.BlockSpec(sc_blk, page(j),
                                         memory_space=pltpu.VMEM))
            args.append(vs)

    # q_pos rides scalar prefetch with the page table ([B, 1] SMEM blocks
    # don't satisfy Mosaic tiling at B > 1); the wrapper reorders it back
    # into the shared kernel body's slot.
    body = partial(
        _paged_attn_kernel,
        n_kv_head=Hkv, group=group, head_dim=D,
        scale=scale, quantized=quantized, block_t=0, page_batch=pb,
        qpos_in_vmem=False, stacked=stacked,
    )

    n_kv_operands = 4 * pb  # k, v, posr, posc groups

    def kernel(pt_ref, qpos_ref, q_ref, *rest):
        # reinsert qpos after invf (position the shared body expects)
        rest = list(rest)
        rest.insert(n_kv_operands, qpos_ref)
        body(pt_ref, q_ref, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP // pb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), lambda b, n, pt, qp: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, D), jnp.float32),     # acc
            pltpu.VMEM((H, 128), jnp.float32),   # running max (col 0 live)
            pltpu.VMEM((H, 128), jnp.float32),   # running denom
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, q_pos, *args)


def paged_decode_attention(
    q: jnp.ndarray,            # [B, 1, H, D] rotated query (one decode token)
    k_pool: jnp.ndarray,       # [P, G, Hkv, D] unrotated pool pages
    v_pool: jnp.ndarray,       # [P, G, Hkv, D]
    pool_pos: jnp.ndarray,     # [P, G] int32, -1 = empty slot
    page_table: jnp.ndarray,   # [B, MP] int32, -1 = unmapped
    q_pos: jnp.ndarray,        # [B] int32
    inv_freq_e: jnp.ndarray,   # [head_dim] f32 (decode_attention.effective_inv_freq)
    k_scale: jnp.ndarray | None = None,  # [P, G, Hkv] f32 (INT8-KV mode)
    v_scale: jnp.ndarray | None = None,
    logit_scale: float | None = None,
    mscale: float = 1.0,
    layer: int | None = None,
) -> jnp.ndarray:
    """Fused single-token paged attention; returns [B, 1, H, D] in q.dtype.

    With `layer` set, k_pool/v_pool are the full stacked pool in the MERGED
    [L, P, G, Hkv*D] shape and k_scale/v_scale the stacked TRANSPOSED
    [L, P, Hkv, G] scales (the loop carries both across steps — see
    ops/generate_loop._fused_merge); the kernel reads layer `layer` in
    place with no per-layer slice/relayout copies."""
    B, T, H, D = q.shape
    assert T == 1, "paged_decode_attention is the T==1 fast path"
    scale = (logit_scale if logit_scale is not None else 1.0 / (D ** 0.5)) * mscale

    if layer is not None:
        P, G = k_pool.shape[1], k_pool.shape[2]
        kp, vp, ks, vs = k_pool, v_pool, k_scale, v_scale
        assert ks is None or ks.shape[-1] == G, (ks.shape, G)
    else:
        P, G = k_pool.shape[0], k_pool.shape[1]
        Hkv = k_pool.shape[2]
        kp = k_pool.reshape(P, G, -1)
        vp = v_pool.reshape(P, G, -1)
        ks = vs = None
        if k_scale is not None:
            ks = jnp.swapaxes(k_scale, 1, 2)  # [P, Hkv, G]
            vs = jnp.swapaxes(v_scale, 1, 2)
    pos_r = pool_pos.reshape(1, P * G)   # row layout (mask)
    pos_c = pool_pos.reshape(P * G, 1)   # column layout (rope angles)
    out = _paged_decode_call(
        page_table, q.reshape(B, H, D), kp, vp, pos_r, pos_c,
        q_pos.reshape(B, 1), inv_freq_e.reshape(1, D), ks, vs,
        scale=float(scale), interpret=jax.default_backend() == "cpu",
        layer=layer,
    )
    return out.reshape(B, 1, H, D)


@partial(jax.jit, static_argnames=("block_t", "scale", "interpret"))
def _paged_prefill_call(page_table, q2, kp, vp, pos_r, pos_c, q_pos_t,
                        inv_freq_e, ks, vs, block_t: int, scale: float,
                        interpret: bool):
    B, T, HD = q2.shape
    D = inv_freq_e.shape[1]
    H = HD // D
    P, G = kp.shape[0], kp.shape[1]
    Hkv = kp.shape[2] // D
    group = H // Hkv
    MP = page_table.shape[1]
    pb = _pick_page_batch(MP)
    quantized = ks is not None

    def page(j):
        return lambda b, t, n, pt: (jnp.maximum(pt[b, n * pb + j], 0), 0, 0)

    def posr(j):
        return lambda b, t, n, pt: (0, jnp.maximum(pt[b, n * pb + j], 0))

    def posc(j):
        return lambda b, t, n, pt: (jnp.maximum(pt[b, n * pb + j], 0), 0)

    in_specs = [
        pl.BlockSpec((1, block_t, HD), lambda b, t, n, pt: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q2]
    for j in range(pb):
        in_specs.append(pl.BlockSpec((1, G, Hkv * D), page(j),
                                     memory_space=pltpu.VMEM))
        args.append(kp)
    for j in range(pb):
        in_specs.append(pl.BlockSpec((1, G, Hkv * D), page(j),
                                     memory_space=pltpu.VMEM))
        args.append(vp)
    for j in range(pb):
        in_specs.append(pl.BlockSpec((1, G), posr(j), memory_space=pltpu.VMEM))
        args.append(pos_r)
    for j in range(pb):
        in_specs.append(pl.BlockSpec((G, 1), posc(j), memory_space=pltpu.VMEM))
        args.append(pos_c)
    # query positions flattened to [B*T, 1] so the column block satisfies
    # Mosaic tiling at any batch (block index b*T/bt + t -> rows b*T+t*bt)
    in_specs.append(pl.BlockSpec(
        (block_t, 1), lambda b, t, n, pt, _nt=T // block_t: (b * _nt + t, 0),
        memory_space=pltpu.VMEM))
    args.append(q_pos_t)
    in_specs.append(pl.BlockSpec((1, D), lambda b, t, n, pt: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(inv_freq_e)
    if quantized:
        for j in range(pb):
            in_specs.append(pl.BlockSpec((1, Hkv, G), page(j),
                                         memory_space=pltpu.VMEM))
            args.append(ks)
        for j in range(pb):
            in_specs.append(pl.BlockSpec((1, Hkv, G), page(j),
                                         memory_space=pltpu.VMEM))
            args.append(vs)

    body = partial(
        _paged_attn_kernel,
        n_kv_head=Hkv, group=group, head_dim=D,
        scale=scale, quantized=quantized, block_t=block_t, page_batch=pb,
        qpos_in_vmem=True,
    )

    n_kv_operands = 4 * pb

    def kernel(pt_ref, q_ref, *rest):
        # prefill qpos sits between the posc group and invf, where the body
        # expects it — no reordering needed (it rides VMEM, not prefetch)
        body(pt_ref, q_ref, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // block_t, MP // pb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_t, HD), lambda b, t, n, pt: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_t * H, D), jnp.float32),
            pltpu.VMEM((block_t * H, 128), jnp.float32),
            pltpu.VMEM((block_t * H, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, *args)


def paged_prefill_attention(
    q: jnp.ndarray,            # [B, T, H, D] rotated queries (prompt chunk)
    k_pool: jnp.ndarray,       # [P, G, Hkv, D]
    v_pool: jnp.ndarray,       # [P, G, Hkv, D]
    pool_pos: jnp.ndarray,     # [P, G] int32
    page_table: jnp.ndarray,   # [B, MP] int32
    q_pos: jnp.ndarray,        # [B, T] int32
    inv_freq_e: jnp.ndarray,   # [head_dim] f32
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    logit_scale: float | None = None,
    mscale: float = 1.0,
) -> jnp.ndarray:
    """Fused chunked-prefill paged attention; returns [B, T, H, D]."""
    from .decode_attention import _pick_block_t

    B, T, H, D = q.shape
    P, G, Hkv = k_pool.shape[0], k_pool.shape[1], k_pool.shape[2]
    block_t = _pick_block_t(T)
    scale = (logit_scale if logit_scale is not None else 1.0 / (D ** 0.5)) * mscale

    q2 = q.reshape(B, T, H * D)
    kp = k_pool.reshape(P, G, Hkv * D)
    vp = v_pool.reshape(P, G, Hkv * D)
    ks = vs = None
    if k_scale is not None:
        ks = jnp.swapaxes(k_scale, 1, 2)
        vs = jnp.swapaxes(v_scale, 1, 2)
    out = _paged_prefill_call(
        page_table, q2, kp, vp, pool_pos.reshape(1, P * G),
        pool_pos.reshape(P * G, 1), q_pos.reshape(B * T, 1),
        inv_freq_e.reshape(1, D), ks, vs, block_t=block_t,
        scale=float(scale), interpret=jax.default_backend() == "cpu",
    )
    return out.reshape(B, T, H, D)


def prefill_supports(T: int, page_size: int, head_dim: int, k_dtype) -> bool:
    from .decode_attention import _pick_block_t

    return (
        T > 1
        and _pick_block_t(T) is not None
        and supports(page_size, head_dim, k_dtype)
    )


def _paged_sharded(mesh, fn, q, k_pool, v_pool, pool_pos, page_table, q_pos,
                   inv_freq_e, k_scale, v_scale, logit_scale, mscale,
                   q_pos_spec):
    """Run a paged attention kernel per (dp, tp) shard_map island.

    The page pool shards on the kv-head axis over tp (pages are global —
    indices in the table address the full pool on every device, only the
    head slice is local); rows shard over dp. Per-head arithmetic is
    independent, so logits are BIT-IDENTICAL at any tp, like
    decode_attention_sharded (VERDICT r4 #3 "paged sharded KV-cache")."""
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    quant = k_scale is not None

    def body(q_l, k_l, v_l, pp_l, pt_l, qp_l, inv, *scales):
        ks_l, vs_l = scales if quant else (None, None)
        return fn(q_l, k_l, v_l, pp_l, pt_l, qp_l, inv,
                  k_scale=ks_l, v_scale=vs_l,
                  logit_scale=logit_scale, mscale=mscale)

    pool_spec = P(None, None, "tp", None)
    sc_spec = P(None, None, "tp")
    args = [q, k_pool, v_pool, pool_pos, page_table, q_pos, inv_freq_e]
    specs = [P("dp", None, "tp", None), pool_spec, pool_spec, P(None, None),
             P("dp", None), q_pos_spec, P(None)]
    if quant:
        args += [k_scale, v_scale]
        specs += [sc_spec, sc_spec]
    return _jax.shard_map(
        body, mesh=mesh, in_specs=tuple(specs),
        out_specs=P("dp", None, "tp", None), check_vma=False,
    )(*args)


def paged_decode_attention_sharded(mesh, q, k_pool, v_pool, pool_pos,
                                   page_table, q_pos, inv_freq_e,
                                   k_scale=None, v_scale=None,
                                   logit_scale=None, mscale: float = 1.0):
    """paged_decode_attention under a (dp, tp) mesh (see _paged_sharded)."""
    from jax.sharding import PartitionSpec as P

    return _paged_sharded(mesh, paged_decode_attention, q, k_pool, v_pool,
                          pool_pos, page_table, q_pos, inv_freq_e,
                          k_scale, v_scale, logit_scale, mscale, P("dp"))


def paged_prefill_attention_sharded(mesh, q, k_pool, v_pool, pool_pos,
                                    page_table, q_pos, inv_freq_e,
                                    k_scale=None, v_scale=None,
                                    logit_scale=None, mscale: float = 1.0):
    """paged_prefill_attention under a (dp, tp) mesh (see _paged_sharded)."""
    from jax.sharding import PartitionSpec as P

    return _paged_sharded(mesh, paged_prefill_attention, q, k_pool, v_pool,
                          pool_pos, page_table, q_pos, inv_freq_e,
                          k_scale, v_scale, logit_scale, mscale,
                          P("dp", None))
