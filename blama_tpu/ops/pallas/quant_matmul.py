"""Pallas fused dequant-matmul: weights stay 4-bit packed in HBM.

The decode hot loop is HBM-bandwidth-bound: reading bf16 weights costs 16
bits/weight, while Q4_K is 4.5 bits. This kernel keeps weights packed in HBM
(4 bits codes + per-32-group f16 scale/min ≈ 5 bits/weight), unpacks in VMEM,
and feeds the MXU — the TPU analog of llama.cpp's CUDA dequant-matmul kernels
(SURVEY.md §2.2 "Block-quantization formats").

Layout (produced by `repack_q4k_for_tpu` at load time from GGUF bytes):
  codes  uint8 [K/2, N] — two 4-bit codes per byte, paired (j, j + KT/2)
                          within each KT-row tile so the kernel's unpack is a
                          cheap concat along sublanes
  scales f32   [K/32, N] — effective per-group scale d·sc
  mins   f32   [K/32, N] — effective per-group offset dmin·mn
f32 scales keep dequantized values bitwise identical to the host dequant path
(gguf.quants.dequantize_q4_k computes d·sc in f32), so fused-kernel and
dequant-at-load engines agree exactly — a verification-parity requirement.
Total ≈ 6 bits/weight vs 16 for bf16: 2.7× less HBM traffic.
  value[k, n] = codes[k, n] · scales[k//32, n] − mins[k//32, n]

K = n_in (contiguous/quantized ggml dim), N = n_out.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.quants import _f16_col, _unpack_scale_min_k4

KT = 256          # one Q4_K superblock (the repack pairing unit)
KB = 8            # superblocks per kernel K-step (grid-iteration amortization)
GROUP = 32        # Q4_K sub-block size


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """4-bit packed weight for x @ W, shape semantics (n_in, n_out).

    `n_out` is the true output width; the packed arrays may carry lane
    padding up to a 256 multiple (see repack_q4k_for_tpu)."""

    codes: jnp.ndarray    # uint8 [K/2, N_pad]
    scales: jnp.ndarray   # f32   [K/32, N_pad]
    mins: jnp.ndarray     # f32   [K/32, N_pad]
    n_out: int = 0

    def tree_flatten(self):
        return (self.codes, self.scales, self.mins), self.n_out

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_out=aux)

    @property
    def shape(self):
        return (self.codes.shape[0] * 2, self.n_out)

    @property
    def dtype(self):
        return jnp.bfloat16


def unpack_q4k_arrays(data: np.ndarray, n_rows: int, row_len: int):
    """GGUF Q4_K bytes → (codes u8 [N,K], scales f32 [N,K/32], mins f32 [N,K/32]).

    N = n_rows (ggml rows = output features), K = row_len (input features).
    Same bit-layout walk as gguf.quants.dequantize_q4_k, but codes stay 4-bit.
    """
    blk = np.frombuffer(data, dtype=np.uint8).reshape(-1, 144)
    nb = blk.shape[0]
    d = _f16_col(blk, 0, 2)
    dmin = _f16_col(blk, 2, 4)
    sc, mn = _unpack_scale_min_k4(blk[:, 4:16])
    qs = blk[:, 16:]
    codes = np.empty((nb, 256), np.uint8)
    for c in range(4):
        byte = qs[:, 32 * c: 32 * (c + 1)]
        codes[:, 64 * c: 64 * c + 32] = byte & 0x0F
        codes[:, 64 * c + 32: 64 * c + 64] = byte >> 4
    scales = (d[:, None] * sc).astype(np.float32)     # [nb, 8]
    mins = (dmin[:, None] * mn).astype(np.float32)
    blocks_per_row = row_len // 256
    codes = codes.reshape(n_rows, row_len)
    scales = scales.reshape(n_rows, blocks_per_row * 8)
    mins = mins.reshape(n_rows, blocks_per_row * 8)
    return codes, scales, mins


def _widen_target(N: int) -> int:
    """Smallest lane-padding target giving the kernels a large block divisor.

    The kernels' lane block is min(block_n, N_pad) reduced to a divisor of
    N_pad; a width aligned only to 256 (e.g. a 128256-vocab head) degrades
    the block to 256 lanes — measured 324 → 736 GB/s on the 8B lm head by
    padding to a 4096 multiple. Padding is zero-filled compute, so targets
    are only taken when they waste <= 5% (the head: +2.2%; a fused
    6144-wide qkv stays at its natural 2048 alignment)."""
    if N <= 4096:
        return N
    for t in (4096, 2048):
        if N % t == 0:
            return N
        np_ = -(-N // t) * t
        if (np_ - N) / N <= 0.05:
            return np_
    return N


def _widen_lanes(*arrs):
    """Host-side lane widening of repacked arrays (see _widen_target);
    zero-padded scales/ddm dequantize to exact 0, so outputs are unchanged
    before the n_out slice."""
    N = arrs[0].shape[1]
    target = _widen_target(N)
    if target == N:
        return arrs
    return tuple(np.pad(np.asarray(a), ((0, 0), (0, target - N))) for a in arrs)


def concat_quant(ws: list) -> "QuantTensor":
    """Concatenate packed tensors along the output dim: ONE kernel dispatch
    for fused qkv / gate-up projections (per-dispatch overhead is a real
    cost of the unrolled-layer decode loop, NEXT r1 #6). Requires unpadded
    inputs (every n_out already a 256 multiple); the result is re-widened
    device-side."""
    import jax

    cls = type(ws[0])
    assert all(type(w) is cls for w in ws), [type(w) for w in ws]
    for w in ws:
        assert jax.tree_util.tree_leaves(w)[0].shape[1] == w.n_out, \
            "concat_quant requires unpadded inputs"
    leaves = [jax.tree_util.tree_leaves(w) for w in ws]
    cat = [jnp.concatenate([lv[i] for lv in leaves], axis=1)
           for i in range(len(leaves[0]))]
    n_out = sum(w.n_out for w in ws)
    target = _widen_target(n_out)
    if target != n_out:
        cat = [jnp.pad(a, ((0, 0), (0, target - n_out))) for a in cat]
    if cls is QuantTensorQ8:
        # preserve the scale-group aux (16 for Q6_K — dropping it silently
        # dequantized fused gate+up with group-32 scales, caught round 4)
        assert len({w.group for w in ws}) == 1
        return cls(*cat, n_out=n_out, group=ws[0].group)
    return cls(*cat, n_out=n_out)


def repack_q4k_for_tpu(data: np.ndarray, n_rows: int, row_len: int) -> QuantTensor:
    """GGUF Q4_K tensor bytes → TPU-layout QuantTensor (transposed to K-major)."""
    from ... import native

    fast = native.native_repack_q4k(data, n_rows, row_len)
    if fast is not None:
        codes_packed, scales, mins, _ = fast
        codes_packed, scales, mins = _widen_lanes(codes_packed, scales, mins)
        return QuantTensor(
            jnp.asarray(codes_packed), jnp.asarray(scales), jnp.asarray(mins),
            n_out=n_rows,
        )
    codes, scales, mins = unpack_q4k_arrays(data, n_rows, row_len)
    K, N = row_len, n_rows
    codes = np.ascontiguousarray(codes.T)     # [K, N]
    scales = np.ascontiguousarray(scales.T)   # [K/32, N]
    mins = np.ascontiguousarray(mins.T)
    # pad N to a 256 multiple (zero scale ⇒ dequantizes to exactly 0)
    n_pad = -(-N // 256) * 256 - N
    if n_pad:
        codes = np.pad(codes, ((0, 0), (0, n_pad)))
        scales = np.pad(scales, ((0, 0), (0, n_pad)))
        mins = np.pad(mins, ((0, 0), (0, n_pad)))
        N += n_pad
    # pair rows (j, j + KT/2) within each KT tile into one byte
    ct = codes.reshape(K // KT, 2, KT // 2, N)
    packed = (ct[:, 0] | (ct[:, 1] << 4)).reshape(K // 2, N)
    packed, scales, mins = _widen_lanes(packed, scales, mins)
    return QuantTensor(
        jnp.asarray(packed),
        jnp.asarray(scales),  # f32: bitwise parity with the host dequant path
        jnp.asarray(mins),
        n_out=n_rows,
    )


def _q4k_block_body(x_ref, codes_ref, scales_ref) -> jnp.ndarray:
    """One K-step of the exact kernel: unpack + dequant + dot → [B, NT] f32.

    int32 mask/shift unpack (measured faster than the float-domain
    floor/fma variant on the v5e VPU; Mosaic lacks sub-32-bit shifts so
    the upcast is required either way). The block may hold several
    superblocks; the lo/hi pairing is per 256-row superblock, so unpack
    slab-wise."""
    return _q4k_block_math(x_ref[:], codes_ref[:], scales_ref[:])


def _q4k_block_math(x, codes, scales) -> jnp.ndarray:
    codes = codes.astype(jnp.int32)            # [kb·KT/2, NT]
    nt = codes.shape[1]
    kb = codes.shape[0] // (KT // 2)
    cs = codes.reshape(kb, KT // 2, nt)
    lo = cs & 0xF
    hi = (cs >> 4) & 0xF
    q = jnp.concatenate([lo, hi], axis=1).reshape(kb * KT, nt)

    scales = scales.astype(jnp.float32)        # [kb·KT/32, NT]
    q3 = q.astype(jnp.float32).reshape(kb * KT // GROUP, GROUP, nt)
    w = (q3 * scales[:, None, :]).reshape(kb * KT, nt)

    x = x.astype(jnp.float32)                  # [B, kb·KT]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _q4k_matmul_kernel(x_ref, codes_ref, scales_ref, out_ref):
    k = pl.program_id(2)
    partial_out = _q4k_block_body(x_ref, codes_ref, scales_ref)

    @pl.when(k == 0)
    def _():
        out_ref[:] = partial_out

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + partial_out


def _pick_block_m(M: int, cap: int = 256) -> int:
    """Largest power-of-2 row block <= cap dividing M (prefill batches can be
    thousands of rows; one monolithic x block would blow scoped VMEM)."""
    bm = 1
    while bm * 2 <= cap and M % (bm * 2) == 0:
        bm *= 2
    return bm


def _q4k_pos(x: jnp.ndarray, w: QuantTensor, block_n: int) -> jnp.ndarray:
    """Positive part of the exact kernel: x @ (codes·scales), no min term."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2 * 2, (x.shape, w.codes.shape)
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    kb = KB if K % (KB * KT) == 0 else 1
    kt_blk = kb * KT
    bm = _pick_block_m(B)
    grid = (B // bm, N // bn, K // kt_blk)

    return pl.pallas_call(
        _q4k_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kt_blk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // 2, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // GROUP, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=(B // bm) * (K * N // 2 + K * N // 4)
            + B * K * 4 + B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, w.codes, w.scales)


@partial(jax.jit, static_argnums=(2,))
def q4k_matmul(x: jnp.ndarray, w: QuantTensor, block_n: int = 2048) -> jnp.ndarray:
    """x [B, K] @ packed W [K, N] → [B, N] f32."""
    B, K = x.shape
    pos = _q4k_pos(x, w, block_n)
    # affine `- min` correction outside the kernel: pulls one elementwise op
    # per weight out of the VPU-bound unpack path.
    # Σ_k x_k(s·q − m) = kernel(x) − Σ_g (Σ_{k∈g} x_k)·m_g,n
    xg_sum = jnp.sum(x.astype(jnp.float32).reshape(B, K // GROUP, GROUP), axis=-1)
    return pos - jnp.dot(xg_sum, w.mins, preferred_element_type=jnp.float32)


def qmm_blocked(x: jnp.ndarray, w, nb: int) -> jnp.ndarray:
    """Fixed-topology K-blocked matmul: bit-identical logits at any tensor-
    parallel degree tp dividing nb (SURVEY.md §7.3 hardest-part #1).

    The contraction axis is split into `nb` blocks whose f32 partial products
    combine through a balanced binary tree pinned by the graph structure.
    GSPMD shards the block axis across tp devices, but every engine — from
    the single chip the verifier replays on to an 8-way-tp prover — performs
    the same additions with the same association, so LogitComparer replay
    across shardings is exact rather than threshold-level. Enable via
    ModelConfig.tp_blocks (a power of two); nb=0 falls back to the plain
    contraction.

    Packed (QuantTensor/QuantTensorA8S) weights take the K-blocked kernel
    path when the K axis is superblock-alignable (tp_blocks section below);
    other quantized variants fall back to qmm — mirrored by
    shard_quant_llama, which replicates them so sharded and solo engines
    stay on the same path.
    """
    if nb:
        if isinstance(w, LoraWrapped):
            # runtime low-rank term on replicated a/b: fixed leaf shapes at
            # any tp; the base takes whatever blocked path it supports
            base = qmm_blocked(x, w.base, nb)
            lora = (x.astype(jnp.float32) @ w.a) @ w.b
            return (base.astype(jnp.float32) + lora).astype(base.dtype)
        if (isinstance(w, ShardedQuant) and w.axis == "k"
                and _parts_supported(w.base, nb)
                and nb % w.mesh.shape[w.tp] == 0):
            return _qmm_sharded_blocked_k(x, w, nb)
        if _parts_supported(w, nb):
            return _qmm_quant_blocked(x, w, nb)
    if (not nb or isinstance(w, (QuantTensor, QuantTensorA8, QuantTensorK4,
                                 QuantTensorQ8, LoraWrapped, ShardedQuant))
            or x.shape[-1] % nb or nb & (nb - 1)):
        return qmm(x, w)
    lead, K = x.shape[:-1], x.shape[-1]
    xb = x.reshape(-1, nb, K // nb).swapaxes(0, 1)   # [nb, M, Kb]
    wb = w.reshape(nb, K // nb, -1)
    parts = jax.lax.dot_general(
        xb, wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [nb, M, N]
    while parts.shape[0] > 1:
        parts = parts[0::2] + parts[1::2]
    return parts[0].reshape(*lead, -1).astype(x.dtype)


def qmm_nblocked(x: jnp.ndarray, w, nb: int, out_dtype=None) -> jnp.ndarray:
    """Output-blocked matmul companion to qmm_blocked: pins the per-device
    gemm leaf shape for output-sharded projections (wq/k/v, gate/up, lm head).

    No cross-device arithmetic happens in these matmuls, but backend codegen
    may pick a K-accumulation order that varies with the LOCAL output width
    (observed on the XLA CPU backend), which breaks cross-tp bit-exactness.
    Batching the columns into `nb` fixed-width blocks makes every engine
    compute identical [M, K] x [K, N/nb] leaves regardless of tp; the
    concatenation is pure data movement.

    Packed (QuantTensor/QuantTensorA8S) weights get the analogous pinning:
    kernel lane blocks fixed at TPB_BLOCK_N and a column-blocked min
    correction (tp_blocks section below)."""
    if nb:
        if isinstance(w, LoraWrapped):
            base = qmm_nblocked(x, w.base, nb)
            lora = (x.astype(jnp.float32) @ w.a) @ w.b
            return (base.astype(jnp.float32) + lora).astype(
                out_dtype or base.dtype)
        if (isinstance(w, ShardedQuant) and w.axis == "n"
                and _pinned_supported(w.base)):
            out = _qmm_sharded(x, w, pinned=True)
            return out if out_dtype is None else out.astype(out_dtype)
        if _pinned_supported(w):
            lead = x.shape[:-1]
            flat = x.reshape(-1, x.shape[-1])
            out = _quant_kernel_call_pinned(flat, w)[:, : w.n_out]
            return out.reshape(*lead, -1).astype(out_dtype or x.dtype)
    if (not nb or isinstance(w, (QuantTensor, QuantTensorA8, QuantTensorK4,
                                 QuantTensorQ8, LoraWrapped, ShardedQuant))
            or w.shape[-1] % nb):
        return qmm(x, w)
    lead, K = x.shape[:-1], x.shape[-1]
    N = w.shape[-1]
    wb = w.reshape(K, nb, N // nb).transpose(1, 0, 2)       # [nb, K, Nb]
    xf = x.reshape(-1, K)
    xb = jnp.broadcast_to(xf, (nb,) + xf.shape)
    parts = jax.lax.dot_general(
        xb, wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # [nb, M, Nb]
    out = parts.transpose(1, 0, 2).reshape(*lead, N)
    return out.astype(out_dtype or x.dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class LoraWrapped:
    """Weight + runtime low-rank LoRA deltas: y = qmm(x, base) + (x·a)·b.

    llama.cpp applies adapters at matmul time on quantized models rather
    than folding into the packed codes (SURVEY.md §2.2 "LoRA adapter
    runtime"); this is the TPU analog. Multiple adapters stack along the
    rank axis; `tags` records (tag, rank) segments so a specific adapter
    can be removed bit-exactly (the base tensor is never touched)."""

    base: object          # QuantTensor* or dense jnp array, (n_in, n_out)
    a: jnp.ndarray        # f32 [K, R_total]
    b: jnp.ndarray        # f32 [R_total, N] (effective scale folded in)
    tags: tuple = ()      # ((tag, rank), ...) in stacking order

    def tree_flatten(self):
        return (self.base, self.a, self.b), self.tags

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, tags=aux)

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantEmbedding:
    """Row-gatherable packed Q4_K embedding table (dequant-on-gather).

    The embedding matmul never happens — rows are gathered per token — so
    the only cost of keeping the table packed is a tiny per-row unpack,
    while HBM *capacity* drops from 16 to 6 bits/weight (≈0.7 GB saved at
    8B/128k-vocab; NEXT.md item: the margin funds longer contexts on a
    16 GB chip). Codes pack global halves (j, j+E/2) per byte so the
    unpack is one concat; f32 effective scales keep dequantized values
    bitwise identical to the host dequant path."""

    codes: jnp.ndarray    # uint8 [V, E/2]: code[j] | code[j+E/2] << 4
    scales: jnp.ndarray   # f32   [V, E/32] effective d·sc
    mins: jnp.ndarray     # f32   [V, E/32] effective dmin·mn

    def tree_flatten(self):
        return (self.codes, self.scales, self.mins), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return (self.codes.shape[0], self.codes.shape[1] * 2)

    @property
    def dtype(self):
        return jnp.bfloat16


def repack_q4k_embedding(data: np.ndarray, n_rows: int, row_len: int) -> QuantEmbedding:
    """GGUF Q4_K token_embd bytes → row-major QuantEmbedding."""
    codes, scales, mins = unpack_q4k_arrays(data, n_rows, row_len)  # [V,E] u8
    half = row_len // 2
    packed = codes[:, :half] | (codes[:, half:] << 4)
    return QuantEmbedding(jnp.asarray(packed), jnp.asarray(scales),
                          jnp.asarray(mins))


def emb_lookup(emb, tokens: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Embedding row gather; dequantizes on the fly for QuantEmbedding."""
    if not isinstance(emb, QuantEmbedding):
        return emb[tokens]
    ci = emb.codes[tokens].astype(jnp.int32)            # [..., E/2]
    q = jnp.concatenate([ci & 0xF, (ci >> 4) & 0xF], axis=-1).astype(jnp.float32)
    s = emb.scales[tokens]                              # [..., E/32]
    m = emb.mins[tokens]
    lead = q.shape[:-1]
    qg = q.reshape(*lead, -1, GROUP)
    vals = qg * s[..., None] - m[..., None]
    return vals.reshape(*lead, -1).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedQuant:
    """Mesh-sharded packed weight: manual tensor parallelism for the Pallas
    kernels (GSPMD cannot partition an opaque pallas_call, so qmm wraps the
    kernel in a shard_map island; SURVEY.md §2.3 "TP sharding").

    axis "n": output dim sharded — each device computes its column slice,
              output carries a P(..., tp) sharding into the next op.
    axis "k": contraction dim sharded at superblock granularity — each
              device computes a partial product over its K slice, combined
              with one psum over the tp axis (rides ICI)."""

    base: object          # QuantTensor / QuantTensorA8S / QuantTensorK4 / ...
    mesh: object = None   # jax Mesh (hashable; aux)
    axis: str = "n"       # "n" | "k"
    tp: str = "tp"        # mesh axis name

    def tree_flatten(self):
        return (self.base,), (self.mesh, self.axis, self.tp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def n_out(self):
        return self.base.n_out


# Column chunks for the pipelined k-shard reduce (compute/collective
# overlap). 4 chunks ≈ 3/4 of the ICI time hidden at steady state.
_K_PSUM_CHUNKS = 4
# BLAMA_FUSED_COLLECTIVE=1 replaces the chunked-psum reduce of the k-sharded
# matmuls with the in-kernel remote-DMA all-reduce (ops/pallas/collectives).
# Read once at import (participates in traced code — see probe-flag note in
# decode_attention.py).
_FUSED_COLLECTIVE = os.environ.get("BLAMA_FUSED_COLLECTIVE", "0") == "1"


def _split_cols(w, nc: int):
    """Split a packed tensor into `nc` equal column chunks (every field of
    every Quant* layout is [*, N_pad]-shaped, so one split covers all).
    Falls back to fewer chunks when the 256-aligned width doesn't divide."""
    leaves, treedef = jax.tree_util.tree_flatten(w)
    N = leaves[0].shape[-1]
    while nc > 1 and N % (nc * 256) != 0:
        nc //= 2
    if nc <= 1:
        return [w]
    cw = N // nc
    return [
        treedef.unflatten([lv[..., i * cw:(i + 1) * cw] for lv in leaves])
        for i in range(nc)
    ]


def _qmm_sharded(x: jnp.ndarray, w: ShardedQuant, pinned: bool = False) -> jnp.ndarray:
    """shard_map island around the packed-weight kernel. pinned=True selects
    the fixed-lane-block kernels (tp_blocks mode, see section below)."""
    from jax.sharding import PartitionSpec as P

    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    leaves, treedef = jax.tree_util.tree_flatten(w.base)
    tp = w.tp

    if w.axis == "n":
        x_spec = P(None, None)
        w_specs = [P(None, tp) for _ in leaves]            # all [*, N_pad]
        out_spec = P(None, tp)

        def f(xl, *wl):
            call = _quant_kernel_call_pinned if pinned else _quant_kernel_call
            return call(xl, treedef.unflatten(wl))
    else:  # "k": x sharded on K, partials psummed
        x_spec = P(None, tp)
        w_specs = [P(tp, None) for _ in leaves]            # all [K/«», N_pad]
        out_spec = P(None, None)

        if _FUSED_COLLECTIVE:
            # in-kernel ICI collective (ops/pallas/collectives): the local
            # partial's transfers to every peer fly as concurrent remote
            # DMAs inside ONE Pallas kernel, accumulated in fixed device
            # order — bit-identical on every device and across runs. An
            # engine MODE (numerics differ from psum's internal order):
            # prover and verifier select it together, like fused attention.
            from .collectives import fused_all_reduce

            tp_size = w.mesh.shape[tp]

            def f(xl, *wl):
                partial = _quant_kernel_call(xl, treedef.unflatten(wl))
                return fused_all_reduce(
                    partial, tp, tp_size,
                    interpret=jax.default_backend() == "cpu")

            out = jax.shard_map(
                f, mesh=w.mesh, in_specs=(x_spec, *w_specs),
                out_specs=out_spec, check_vma=False,
            )(flat, *leaves)
            return out[:, : w.n_out].reshape(*lead, -1).astype(x.dtype)

        def f(xl, *wl):
            # Software-pipelined reduce (north star: ICI collectives
            # overlapped with compute): the local partial product is emitted
            # in column CHUNKS, each psummed as soon as it exists — chunk
            # i's all-reduce has no dependency on chunk i+1's kernel, so
            # XLA's latency-hiding scheduler runs the ICI transfer of one
            # chunk under the MXU/HBM work of the next instead of
            # serializing kernel -> one monolithic all-reduce. Per-element
            # arithmetic is unchanged (chunking splits N only; the psum
            # addition order over devices is identical), so results are
            # BIT-IDENTICAL to the unchunked path at any chunk count
            # (tests/test_parallel.py pins chunked == unchunked).
            wloc = treedef.unflatten(wl)
            return jnp.concatenate(
                [jax.lax.psum(_quant_kernel_call(xl, c), tp)
                 for c in _split_cols(wloc, _K_PSUM_CHUNKS)], axis=1)

    out = jax.shard_map(
        f, mesh=w.mesh, in_specs=(x_spec, *w_specs), out_specs=out_spec,
        check_vma=False,
    )(flat, *leaves)
    return out[:, : w.n_out].reshape(*lead, -1).astype(x.dtype)


def _quant_kernel_call(flat: jnp.ndarray, w) -> jnp.ndarray:
    """Raw kernel dispatch on a [M, K] batch — no n_out slice (the caller
    slices globally; a sharded weight's padding lives in the last shard)."""
    if isinstance(w, QuantTensorA8K4):
        if flat.shape[0] <= A8S_MAX_BATCH:
            return a8k4_matmul(flat, w)
        return q4k_native_matmul(flat, w)
    if isinstance(w, QuantTensorK4):
        return q4k_native_matmul(flat, w)
    if isinstance(w, QuantTensorA8S):
        if flat.shape[0] <= A8S_MAX_BATCH:
            # v5e sweep (tools/autotune_a8s, round 3): layer shapes run
            # fastest with the min correction folded in-kernel at a 4096
            # lane block (wgu 644→736, down 625→717 GB/s vs the r2
            # default, minus one XLA dot+sub per call). The wide lm head
            # runs the in-kernel-prologue xin variant at a 2048 lane block
            # (round-5 sweep /tmp-style A/B at the 8B head shape: 757 GB/s
            # vs 721 unfolded / 716 folded) — B > 1 falls back to fold
            # inside w4a8_swar_xin.
            if w.codes.shape[1] >= 65536:
                if _A8S_FOLD_HEAD:
                    return w4a8_swar_fold(flat, w, 2048)
                return w4a8_swar_xin(flat, w, 2048)
            # default: in-kernel activation quantization (bit-identical to
            # w4a8_swar_fold, no XLA prologue glue — BENCH_LOCAL round 3)
            if _A8S_PROLOGUE == "xla":
                return w4a8_swar_fold(flat, w)
            return w4a8_swar_xin(flat, w)
        return q4k_matmul(flat, w)
    if isinstance(w, QuantTensorA8):
        return w4a8_matmul(flat, w)
    if isinstance(w, QuantTensorQ8):
        return q8_0_matmul(flat, w)
    return q4k_matmul(flat, w)


def qmm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul dispatch: dense jnp array or packed QuantTensor.

    Accepts x of shape [..., K]; returns [..., N] in x.dtype for dense w and
    f32→x.dtype for quantized."""
    if isinstance(w, LoraWrapped):
        out = qmm(x, w.base)
        lora = (x.astype(jnp.float32) @ w.a) @ w.b       # [..., N]
        return (out.astype(jnp.float32) + lora).astype(out.dtype)
    if isinstance(w, ShardedQuant):
        return _qmm_sharded(x, w)
    if isinstance(w, (QuantTensor, QuantTensorA8, QuantTensorK4,
                      QuantTensorQ8)):
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        out = _quant_kernel_call(flat, w)[:, : w.n_out]
        return out.reshape(*lead, -1).astype(x.dtype)
    return x @ w


# ---------------------------------------------------------------------------
# W4A8 SWAR kernel: int8 activations × packed 4-bit codes on the MXU
# ---------------------------------------------------------------------------
#
# The exact kernel above spends ~2.4 VPU ops/weight on unpack+convert+scale —
# the decode loop's binding resource. This variant moves the multiply work to
# the MXU: activations are quantized per (row, 32-group) to int8 (llama.cpp's
# Q8_1 activation quantization for K-quant dot products — the reference
# engine's own numerics, SURVEY.md §2.2), nibbles are extracted SWAR-style
# (bitcast to i32 lanes, ONE mask per four lo-nibbles, bitcast to i8), and
# group-partial dot products come from int8 MXU matmuls against plane-masked
# activation copies. Per-weight VPU work drops to ~0.5 ops.


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensorA8S(QuantTensor):
    """Same arrays as QuantTensor; marks dispatch to the SWAR int8-MXU
    kernel (W4A8 numerics) instead of the exact f32 dequant kernel."""


def repack_q4k_a8s(data: np.ndarray, n_rows: int, row_len: int) -> QuantTensorA8S:
    # bf16 scales/mins: 5 bits/weight total. With the multiply moved to the
    # int8 MXU the decode loop is HBM-streaming-bound, so the byte saving wins
    # outright; scale rounding (~0.4%) is below the activation-quant noise.
    # The cast happens on the HOST (ml_dtypes) so the tunnel upload moves
    # bf16 bytes, not f32 — uploading f32 and casting on device doubled the
    # scale/min transfer (part of the r2 load_s regression, VERDICT r2 #2).
    import ml_dtypes

    from ... import native

    fast = native.native_repack_q4k(data, n_rows, row_len)
    if fast is not None:
        codes, scales, mins, _ = fast
        codes, scales, mins = _widen_lanes(
            codes, scales.astype(ml_dtypes.bfloat16),
            mins.astype(ml_dtypes.bfloat16))
        return QuantTensorA8S(jnp.asarray(codes), jnp.asarray(scales),
                              jnp.asarray(mins), n_out=n_rows)
    w = repack_q4k_for_tpu(data, n_rows, row_len)
    return QuantTensorA8S(w.codes, w.scales.astype(jnp.bfloat16),
                          w.mins.astype(jnp.bfloat16), n_out=w.n_out)


def _quant_acts(x: jnp.ndarray):
    """[B, K] float → (xq i8 [B, K], xs f32 [K/32, B], xsum f32 [K/32, B])."""
    B, K = x.shape
    xg = x.astype(jnp.float32).reshape(B, K // GROUP, GROUP)
    amax = jnp.max(jnp.abs(xg), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    xqg = jnp.round(xg * inv[..., None]).astype(jnp.int8)
    xsum = jnp.sum(xqg.astype(jnp.int32), axis=-1).astype(jnp.float32)
    return xqg.reshape(B, K), scale.T, xsum.T


def _a8s_planes(xq: jnp.ndarray, kb: int):
    """xq [B, K] i8 → (planes_lo, planes_hi) [4*kb*B, K/2] i8.

    Plane p = (t, g) of a kb-superblock slab holds the activations of
    superblock t's group g (lo: groups 0-3 at byte rows, hi: groups 4-7),
    zeros elsewhere — one int8 matmul of the stacked planes against the
    nibble matrix yields every per-(superblock, group) partial sum."""
    B, K = xq.shape
    xr = xq.reshape(B, K // (kb * KT), kb, 2, KT // 2)
    x_lo = xr[:, :, :, 0].reshape(B, K // 2)
    x_hi = xr[:, :, :, 1].reshape(B, K // 2)
    P = kb * 4
    i = jnp.arange(K // 2) % (kb * (KT // 2))
    p_of_i = (i // (KT // 2)) * 4 + (i % (KT // 2)) // GROUP
    def mk(xh):
        return jnp.concatenate(
            [jnp.where(p_of_i[None, :] == p, xh, jnp.int8(0)) for p in range(P)],
            axis=0)
    return mk(x_lo), mk(x_hi)


def _a8s_block_body(planes_lo_ref, planes_hi_ref, xs_ref, codes_ref,
                    scales_ref) -> jnp.ndarray:
    """One K-slab of the SWAR kernel: int8 MXU dots + scale combine → [B, bn]."""
    return _a8s_block_math(planes_lo_ref[:], planes_hi_ref[:], xs_ref[:],
                           codes_ref[:], scales_ref[:])


def _a8s_block_math(pl_lo, pl_hi, xs_arr, codes, scales) -> jnp.ndarray:
    w32 = pltpu.bitcast(codes, jnp.int32)               # [kb*KT/8, bn]
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)      # [kb*KT/2, bn]
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    PB = pl_lo.shape[0]
    bn = lo.shape[1]
    kb = lo.shape[0] // (KT // 2)
    P = kb * 4
    B = PB // P
    ip_lo = jax.lax.dot_general(pl_lo, lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ip_hi = jax.lax.dot_general(pl_hi, hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ws = scales.astype(jnp.float32).reshape(kb, 8, bn)
    xs = xs_arr.astype(jnp.float32).reshape(kb, 8, B)
    acc = jnp.sum(ip_lo.astype(jnp.float32).reshape(P, B, bn)
                  * ws[:, :4].reshape(P, 1, bn) * xs[:, :4].reshape(P, B, 1),
                  axis=0)
    acc += jnp.sum(ip_hi.astype(jnp.float32).reshape(P, B, bn)
                   * ws[:, 4:].reshape(P, 1, bn) * xs[:, 4:].reshape(P, B, 1),
                   axis=0)
    return acc


def _a8s_kernel(planes_lo_ref, planes_hi_ref, xs_ref, codes_ref, scales_ref,
                out_ref):
    ks = pl.program_id(1)
    acc = _a8s_block_body(planes_lo_ref, planes_hi_ref, xs_ref, codes_ref,
                          scales_ref)

    @pl.when(ks == 0)
    def _():
        out_ref[:] = acc

    @pl.when(ks != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


# decode-batch cap: plane count is 4·kb·B rows; beyond this the exact kernel
# amortizes its unpack over the batch anyway (prefill is not VPU-bound)
A8S_MAX_BATCH = 16

# probe flags, read ONCE at import (they participate in traced code; a
# mid-process env toggle would otherwise silently keep the cached compile
# — ADVICE r3). Probes set these attributes directly to A/B in-process.
_A8S_FOLD_HEAD = os.environ.get("BLAMA_A8S_FOLD_HEAD", "0") == "1"
_A8S_PROLOGUE = os.environ.get("BLAMA_A8S_PROLOGUE", "kernel")


def _a8s_pos(x: jnp.ndarray, w: QuantTensor, block_n: int, kb: int):
    """Positive part of the SWAR kernel; returns (pos [B, N] f32,
    sx = (x_scale·x_sum).T [B, K/32] f32 for the caller's min correction)."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2 * 2, (x.shape, w.codes.shape)
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    while K % (kb * KT) != 0:
        kb //= 2
    slab = kb * KT
    P = kb * 4
    xq, xsT, xsumT = _quant_acts(x)
    p_lo, p_hi = _a8s_planes(xq, kb)
    grid = (N // bn, K // slab)
    pos = pl.pallas_call(
        _a8s_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // 2, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N,
            bytes_accessed=K * N // 2 + (K // GROUP) * N * 4 + P * B * K + B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(p_lo, p_hi, xsT, w.codes, w.scales)
    return pos, (xsT * xsumT).T


@partial(jax.jit, static_argnums=(2, 3))
def w4a8_swar_matmul(x: jnp.ndarray, w: QuantTensor, block_n: int = 2048,
                     kb: int = 4) -> jnp.ndarray:
    """x [B, K] @ packed W [K, N] → [B, N] f32 via SWAR unpack + int8 MXU."""
    pos, sx = _a8s_pos(x, w, block_n, kb)
    neg = jnp.dot(sx, w.mins, preferred_element_type=jnp.float32)
    return pos - neg


# ---------------------------------------------------------------------------
# Native-layout Q4_K: 4.5 bits/weight, scales decoded in-kernel
# ---------------------------------------------------------------------------
#
# The f32 effective-scale layout above costs 6 bits/weight in HBM (4 codes +
# 2 scales/mins). The decode path is HBM-streaming-bound at the model level,
# so this variant keeps the FULL GGUF Q4_K superblock compression: per
# superblock only d/dmin (two f16, packed in one i32 word) and the 12-byte
# 6-bit sc/mn block (three i32 words) ride along with the packed codes —
# 4.5 bits/weight total, 25% less traffic. The kernel reconstructs
# f32(d)·sc exactly (f16→f32 via exponent-magic multiply is exact for
# normals and subnormals), so dequantized VALUES stay bitwise identical to
# the host dequant path (gguf.quants.dequantize_q4_k).


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensorK4:
    """Native-layout Q4_K weight for x @ W, shape semantics (n_in, n_out)."""

    codes: jnp.ndarray   # uint8 [K/2, N_pad] paired (j, j+KT/2) per KT tile
    ddm: jnp.ndarray     # int32 [K/256, N_pad]: d f16 bits | dmin f16 bits << 16
    scmn: jnp.ndarray    # int32 [3*K/256, N_pad]: 12-byte 6-bit sc/mn block LE
    n_out: int = 0

    def tree_flatten(self):
        return (self.codes, self.ddm, self.scmn), self.n_out

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_out=aux)

    @property
    def shape(self):
        return (self.codes.shape[0] * 2, self.n_out)

    @property
    def dtype(self):
        return jnp.bfloat16


def repack_q4k_native(data: np.ndarray, n_rows: int, row_len: int) -> QuantTensorK4:
    """GGUF Q4_K bytes → native-layout QuantTensorK4 (K-major, 4.5 b/w)."""
    from ... import native

    fast = native.native_repack_q4k_native(data, n_rows, row_len)
    if fast is not None:
        codes_packed, ddm, scmn, _ = fast
        codes_packed, ddm, scmn = _widen_lanes(codes_packed, ddm, scmn)
        return QuantTensorK4(
            jnp.asarray(codes_packed), jnp.asarray(ddm), jnp.asarray(scmn),
            n_out=n_rows,
        )
    blk = np.frombuffer(data, dtype=np.uint8).reshape(-1, 144)
    nb = blk.shape[0]
    K, N = row_len, n_rows
    spr = K // KT  # superblocks per ggml row

    ddm = blk[:, 0:4].copy().view(np.int32).reshape(nb)          # d | dmin<<16
    scmn = blk[:, 4:16].copy().view(np.int32).reshape(nb, 3)     # 3 LE words
    ddm = ddm.reshape(N, spr).T.copy()                           # [K/256, N]
    scmn = scmn.reshape(N, spr, 3).transpose(1, 2, 0).reshape(spr * 3, N).copy()

    # codes: same pairing as repack_q4k_for_tpu
    qs = blk[:, 16:]
    codes = np.empty((nb, 256), np.uint8)
    for c in range(4):
        byte = qs[:, 32 * c: 32 * (c + 1)]
        codes[:, 64 * c: 64 * c + 32] = byte & 0x0F
        codes[:, 64 * c + 32: 64 * c + 64] = byte >> 4
    codes = np.ascontiguousarray(codes.reshape(N, K).T)          # [K, N]

    n_pad = -(-N // 256) * 256 - N
    if n_pad:
        codes = np.pad(codes, ((0, 0), (0, n_pad)))
        ddm = np.pad(ddm, ((0, 0), (0, n_pad)))                  # d=0 → scale 0
        scmn = np.pad(scmn, ((0, 0), (0, n_pad)))
    ct = codes.reshape(K // KT, 2, KT // 2, codes.shape[1])
    packed = (ct[:, 0] | (ct[:, 1] << 4)).reshape(K // 2, codes.shape[1])
    packed, ddm, scmn = _widen_lanes(packed, ddm, scmn)
    return QuantTensorK4(jnp.asarray(packed), jnp.asarray(ddm),
                         jnp.asarray(scmn), n_out=n_rows)


def _f16_bits_to_f32(h: jnp.ndarray) -> jnp.ndarray:
    """f16 bit pattern (in i32 lanes) → f32 value; exact for normals and
    subnormals (the magic multiply rescales the exponent exactly)."""
    bits = ((h & 0x7FFF) << 13) | ((h & 0x8000) << 16)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(5.192296858534828e33)  # 2^112


def _q4k_native_kernel(xg_ref, x_ref, codes_ref, ddm_ref, scmn_ref, out_ref):
    k = pl.program_id(2)

    dd = ddm_ref[:]                                   # i32 [kb, nt]
    d = _f16_bits_to_f32(dd & 0xFFFF)                 # f32 [kb, nt]
    dmin = _f16_bits_to_f32((dd >> 16) & 0xFFFF)
    kb, nt = dd.shape
    w012 = scmn_ref[:].reshape(kb, 3, nt)             # i32
    w0, w1, w2 = w012[:, 0], w012[:, 1], w012[:, 2]
    scs, mns = [], []
    for j in range(8):  # ggml get_scale_min_k4 bit scheme, vectorized over n
        if j < 4:
            sc = (w0 >> (8 * j)) & 63
            mn = (w1 >> (8 * j)) & 63
        else:
            i = j - 4
            sc = ((w2 >> (8 * i)) & 0xF) | (((w0 >> (8 * i + 6)) & 3) << 4)
            mn = ((w2 >> (8 * i + 4)) & 0xF) | (((w1 >> (8 * i + 6)) & 3) << 4)
        scs.append(d * sc.astype(jnp.float32))        # f32(d)·sc: exact
        mns.append(dmin * mn.astype(jnp.float32))
    scales = jnp.stack(scs, axis=1).reshape(kb * 8, nt)
    mins = jnp.stack(mns, axis=1).reshape(kb * 8, nt)

    codes = codes_ref[:].astype(jnp.int32)            # [kb·KT/2, nt]
    cs = codes.reshape(kb, KT // 2, nt)
    lo = cs & 0xF
    hi = (cs >> 4) & 0xF
    q = jnp.concatenate([lo, hi], axis=1).reshape(kb * KT, nt)
    q3 = q.astype(jnp.float32).reshape(kb * KT // GROUP, GROUP, nt)
    w = (q3 * scales[:, None, :]).reshape(kb * KT, nt)

    x = x_ref[:].astype(jnp.float32)                  # [B, kb·KT]
    xg = xg_ref[:]                                    # f32 [kb·8, B] (K on sublanes)
    neg = jax.lax.dot_general(
        xg, mins, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [B, nt]
    partial_out = jnp.dot(x, w, preferred_element_type=jnp.float32) - neg

    @pl.when(k == 0)
    def _():
        out_ref[:] = partial_out

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + partial_out


@partial(jax.jit, static_argnums=(2,))
def q4k_native_matmul(x: jnp.ndarray, w: QuantTensorK4, block_n: int = 2048) -> jnp.ndarray:
    """x [B, K] @ native-layout W [K, N] → [B, N] f32."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2 * 2, (x.shape, w.codes.shape)
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    kb = KB if K % (KB * KT) == 0 else 1
    kt_blk = kb * KT
    bm = _pick_block_m(B)
    grid = (B // bm, N // bn, K // kt_blk)
    xf = x.astype(jnp.float32)
    xg = jnp.sum(xf.reshape(B, K // GROUP, GROUP), axis=-1).T  # [K/32, B]

    return pl.pallas_call(
        _q4k_native_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt_blk // GROUP, bm), lambda m, n, k: (k, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kt_blk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // 2, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // KT, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kt_blk // KT, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N // 2 + (K // KT) * N * 16 + B * K * 4 + B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xg, xf, w.codes, w.ddm, w.scmn)


# ---------------------------------------------------------------------------
# SWAR + native layout: 4.5 bits/weight AND int8-MXU consumption
# ---------------------------------------------------------------------------
#
# Combines the two winning ideas: the SWAR/plane int8-MXU path (VPU-cheap)
# with the native superblock scale storage (HBM-cheap). Planes and per-group
# activation scales are arranged G-MAJOR — (g, t, b) rather than (t, g, b) —
# so the in-kernel 6-bit scale decode produces each group-j slice [kb, nt]
# directly against a contiguous slab of the int partial-product matrix,
# avoiding the sublane-interleaving jnp.stack that made the exact native
# kernel VPU-expensive.


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensorA8K4(QuantTensorK4):
    """Native-layout arrays; marks dispatch to the SWAR int8-MXU kernel."""


def repack_q4k_a8k4(data: np.ndarray, n_rows: int, row_len: int) -> "QuantTensorA8K4":
    w = repack_q4k_native(data, n_rows, row_len)
    return QuantTensorA8K4(w.codes, w.ddm, w.scmn, n_out=w.n_out)


def _a8k4_planes(xq: jnp.ndarray, kb: int):
    """xq [B, K] i8 → (planes_lo, planes_hi) [4*kb*B, K/2] i8, g-major rows:
    row ((g*kb + t)*B + b) holds superblock t's group-(g or g+4) activations."""
    B, K = xq.shape
    xr = xq.reshape(B, K // (kb * KT), kb, 2, KT // 2)
    x_lo = xr[:, :, :, 0].reshape(B, K // 2)
    x_hi = xr[:, :, :, 1].reshape(B, K // 2)
    i = jnp.arange(K // 2) % (kb * (KT // 2))
    t_of_i = i // (KT // 2)
    g_of_i = (i % (KT // 2)) // GROUP

    def mk(xh):
        planes = []
        for g in range(4):
            for t in range(kb):
                keep = (g_of_i == g) & (t_of_i == t)
                planes.append(jnp.where(keep[None, :], xh, jnp.int8(0)))
        return jnp.concatenate(planes, axis=0)

    return mk(x_lo), mk(x_hi)


def _a8k4_kernel(planes_lo_ref, planes_hi_ref, xs_ref, xsum_ref, codes_ref,
                 ddm_ref, scmn_ref, out_ref):
    ks = pl.program_id(1)
    w32 = pltpu.bitcast(codes_ref[:], jnp.int32)
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)      # [kb*KT/2, bn]
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    pl_lo = planes_lo_ref[:]
    pl_hi = planes_hi_ref[:]
    PB = pl_lo.shape[0]
    bn = lo.shape[1]
    kb = lo.shape[0] // (KT // 2)
    B = PB // (kb * 4)
    ip_lo = jax.lax.dot_general(pl_lo, lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ip_hi = jax.lax.dot_general(pl_hi, hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)

    dd = ddm_ref[:]                                     # i32 [kb, nt]
    d = _f16_bits_to_f32(dd & 0xFFFF)
    dmin = _f16_bits_to_f32((dd >> 16) & 0xFFFF)
    w012 = scmn_ref[:].reshape(kb, 3, bn)
    w0, w1, w2 = w012[:, 0], w012[:, 1], w012[:, 2]

    # xs/xsum g-major: [8, kb, B] slabs (groups 0-3 pair with lo, 4-7 with hi)
    xs = xs_ref[:].reshape(8, kb, B).astype(jnp.float32)
    xsum = xsum_ref[:].reshape(8, kb, B).astype(jnp.float32)

    acc = jnp.zeros((B, bn), jnp.float32)
    for j in range(8):
        if j < 4:
            sc = (w0 >> (8 * j)) & 63
            mn = (w1 >> (8 * j)) & 63
            ip_j = ip_lo.reshape(4, kb, B, bn)[j]       # contiguous slab
        else:
            i = j - 4
            sc = ((w2 >> (8 * i)) & 0xF) | (((w0 >> (8 * i + 6)) & 3) << 4)
            mn = ((w2 >> (8 * i + 4)) & 0xF) | (((w1 >> (8 * i + 6)) & 3) << 4)
            ip_j = ip_hi.reshape(4, kb, B, bn)[i]
        ws_j = d * sc.astype(jnp.float32)               # [kb, nt]
        wm_j = dmin * mn.astype(jnp.float32)
        term = ip_j.astype(jnp.float32) * ws_j[:, None, :] * xs[j][:, :, None]
        term -= wm_j[:, None, :] * (xs[j] * xsum[j])[:, :, None]
        acc += jnp.sum(term, axis=0)

    @pl.when(ks == 0)
    def _():
        out_ref[:] = acc

    @pl.when(ks != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@partial(jax.jit, static_argnums=(2, 3))
def a8k4_matmul(x: jnp.ndarray, w: "QuantTensorA8K4", block_n: int = 2048,
                kb: int = 8) -> jnp.ndarray:
    """x [B, K] @ native-layout packed W → [B, N] f32 (W4A8 numerics)."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2 * 2
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    # TPU tiling: the ddm BlockSpec's sublane dim is kb, which must be a
    # multiple of 8 or cover the whole [K/KT, N] array (Mosaic constraint;
    # interpret-mode tests don't enforce it).
    nsb = K // KT
    kb = min(kb, nsb)
    while kb > 1 and nsb % kb != 0:
        kb //= 2
    if kb % 8 != 0 and kb != nsb:
        kb = nsb
    slab = kb * KT
    P = kb * 4
    xq, xsT, xsumT = _quant_acts(x)       # xsT/xsumT: [K/32, B] (t,g)-ordered
    p_lo, p_hi = _a8k4_planes(xq, kb)
    # rearrange activation scales g-major per slab: [K/32, B] → [8·K/KT?, ...]
    ns = K // slab
    xs_g = xsT.reshape(ns, kb, 8, B).transpose(0, 2, 1, 3).reshape(ns * 8 * kb, B)
    xsum_g = xsumT.reshape(ns, kb, 8, B).transpose(0, 2, 1, 3).reshape(ns * 8 * kb, B)
    grid = (N // bn, ns)
    return pl.pallas_call(
        _a8k4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * B, slab // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * kb, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * kb, B), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // 2, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kb, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N,
            bytes_accessed=K * N // 2 + (K // KT) * N * 16 + P * B * K + B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(p_lo, p_hi, xs_g, xsum_g, w.codes, w.ddm, w.scmn)


# ---------------------------------------------------------------------------
# W4A8: int8 activations × int4 codes on the MXU
# ---------------------------------------------------------------------------
#
# The unpack-to-float kernel above is VPU-bound (~3 ops/weight); the MXU can
# instead consume int8 operands natively. Activations are quantized per
# (row, 32-group) to int8 (the TPU analog of llama.cpp's Q8_1 activation
# quantization for K-quant dot products); codes are stored as int8 (one per
# weight, 8+1 bits total) so the group-batched integer matmul needs no
# per-weight VPU work at all:
#
#   y[b,n] = Σ_g x_scale[b,g]·( w_scale[g,n]·Σ_{k∈g} xq[b,k]·q[k,n]
#                               − w_min[g,n]·Σ_{k∈g} xq[b,k] )

def repack_q4k_w4a8(data: np.ndarray, n_rows: int, row_len: int) -> "QuantTensorA8":
    codes, scales, mins = unpack_q4k_arrays(data, n_rows, row_len)
    K, N = row_len, n_rows
    codes = np.ascontiguousarray(codes.T).astype(np.int8)   # [K, N]
    scales = np.ascontiguousarray(scales.T)                 # [K/32, N]
    mins = np.ascontiguousarray(mins.T)
    n_pad = -(-N // 256) * 256 - N
    if n_pad:
        codes = np.pad(codes, ((0, 0), (0, n_pad)))
        scales = np.pad(scales, ((0, 0), (0, n_pad)))
        mins = np.pad(mins, ((0, 0), (0, n_pad)))
    return QuantTensorA8(
        jnp.asarray(codes),
        # f16 scales: a8 numerics are already activation-quantized, and f16
        # halves scale memory (9 bits/weight total) — the margin that lets
        # 8B-class models fit a 16GB chip
        jnp.asarray(scales.astype(np.float16)),
        jnp.asarray(mins.astype(np.float16)),
        n_out=n_rows,
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensorA8:
    """int8-code weight for the W4A8 MXU kernel; shape (n_in, n_out)."""

    codes: jnp.ndarray    # int8 [K, N_pad], values 0..15
    scales: jnp.ndarray   # f32  [K/32, N_pad]
    mins: jnp.ndarray     # f32  [K/32, N_pad]
    n_out: int = 0

    def tree_flatten(self):
        return (self.codes, self.scales, self.mins), self.n_out

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_out=aux)

    @property
    def shape(self):
        return (self.codes.shape[0], self.n_out)

    @property
    def dtype(self):
        return jnp.bfloat16


@jax.jit
def w4a8_matmul(x: jnp.ndarray, w: QuantTensorA8) -> jnp.ndarray:
    """x [B, K] (float) @ packed W → [B, N] f32 via int8 MXU matmuls.

    Pure-XLA formulation: XLA lowers int8×int8 dot_general to the MXU
    natively and fuses the group-scale combine, so no Pallas kernel is
    needed (several Pallas variants hit Mosaic compile pathologies with
    K=32 contractions / sublane-level slices). The batched tile dot keeps
    the contraction at 256 with the G group-masked activation planes
    stacked along M.
    """
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2, (x.shape, w.codes.shape)
    G = KT // GROUP
    T = K // KT
    planes, xs, xsum = quantize_activations(x)   # [G*B, K], [K/32, B], [K/32, B]

    pt = planes.reshape(G, B, T, KT).transpose(2, 0, 1, 3).reshape(T, G * B, KT)
    ct = w.codes.reshape(T, KT, N)
    ip = jax.lax.dot_general(
        pt, ct,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                             # [T, G*B, N]
    ipf = ip.reshape(T, G, B, N).astype(jnp.float32)
    xs_r = xs.reshape(T, G, B)
    xsum_r = xsum.reshape(T, G, B)
    ws_r = w.scales.astype(jnp.float32).reshape(T, G, N)
    wm_r = w.mins.astype(jnp.float32).reshape(T, G, N)
    pos = jnp.einsum("tgbn,tgb,tgn->bn", ipf, xs_r, ws_r)
    neg = jnp.einsum("tgb,tgn->bn", xs_r * xsum_r, wm_r)
    return pos - neg


def quantize_activations(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, K] f32 → (masked int8 planes [G·B, K], scales [K/32, B],
    sums [K/32, B]).

    Plane g zeroes every activation outside tile-local group g (G = KT/GROUP
    planes; the pattern repeats every KT columns), so a single int8 matmul of
    the stacked planes yields per-group partial sums."""
    B, K = x.shape
    Gk = K // GROUP
    xg = x.astype(jnp.float32).reshape(B, Gk, GROUP)
    amax = jnp.max(jnp.abs(xg), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    xq = jnp.round(xg * inv[..., None]).astype(jnp.int8)
    xsum = jnp.sum(xq.astype(jnp.int32), axis=-1).astype(jnp.float32)
    xq = xq.reshape(B, K)
    gt = KT // GROUP
    local_g = (jnp.arange(K) // GROUP) % gt                  # [K]
    planes = jnp.concatenate(
        [jnp.where(local_g[None, :] == g, xq, jnp.int8(0)) for g in range(gt)],
        axis=0,
    )                                                        # [G·B, K]
    return planes, scale.T, xsum.T


# ---------------------------------------------------------------------------
# Fixed-topology (tp_blocks) paths for quantized weights
# ---------------------------------------------------------------------------
#
# Extends the cross-sharding bit-exactness contract of qmm_blocked /
# qmm_nblocked (SURVEY.md §7.3 hardest-part #1) to the packed production
# engines (q4k_fused = QuantTensor, q4k_a8 = QuantTensorA8S):
#
#  * contraction-sharded weights (wo, w_down): the K axis is split into `nb`
#    superblock-aligned blocks; ONE kernel dispatch computes every block's
#    partial product (with its min correction folded per block), and the
#    partials combine through the same balanced halving tree as the dense
#    path — GSPMD shards the block axis over tp and pins the association,
#    so a tp=8 prover and a solo verifier perform identical additions.
#  * output-sharded weights (wq/k/v, gate/up, lm head): the kernel's lane
#    block is pinned to TPB_BLOCK_N, so every engine computes identical
#    per-column-block leaves regardless of the LOCAL shard width.
#
# In BOTH modes the min correction moves INSIDE the kernel (per K-step,
# like q4k_native_matmul): an outside dot's arithmetic varies with the
# operand widths XLA sees (measured on the CPU backend: a batched
# dot_general's per-leaf results change with the batch count), while the
# in-kernel dot has a fixed block shape everywhere.
#
# Eligibility (checked by _parts_supported and mirrored by
# parallel.sharding.shard_quant_llama so sharded and solo engines always
# take the same path): K % (nb·256) == 0 for K-blocked weights, local
# width % TPB_BLOCK_N == 0 for output-sharded ones; unsupported tensors
# replicate on the mesh and run the plain kernel identically everywhere.

# Pinned lane-block width in tp_blocks mode. 128 (not 256) so every eligible
# width yields >= 2 grid programs: a single-program pallas grid compiles its
# lone iteration differently from a multi-program loop (measured on the CPU
# interpret path — (1,1) grids diverge from (2,1)+ grids at the last ulp),
# while all >= 2-program grids share one traced body. Eligibility requires
# local width % 256 == 0, so the n grid dim is always >= 2.
TPB_BLOCK_N = 128


def _parts_supported(w, nb: int) -> bool:
    """Whether w can take the K-blocked fixed-topology path at nb blocks."""
    return (type(w) in (QuantTensor, QuantTensorA8S)
            and nb > 0 and nb & (nb - 1) == 0
            and w.shape[0] % (nb * KT) == 0)


def _pinned_supported(w) -> bool:
    return type(w) in (QuantTensor, QuantTensorA8S)


def _tree_combine(parts: jnp.ndarray) -> jnp.ndarray:
    """Balanced halving tree over the leading (block) axis — the association
    every engine shares (identical to the dense qmm_blocked tree)."""
    while parts.shape[0] > 1:
        parts = parts[0::2] + parts[1::2]
    return parts[0]


def _q4k_tpb_body(xg_ref, x_ref, codes_ref, scales_ref, mins_ref) -> jnp.ndarray:
    """One K-step of the exact kernel with its min correction folded in."""
    pos = _q4k_block_body(x_ref, codes_ref, scales_ref)
    neg = jax.lax.dot_general(
        xg_ref[:], mins_ref[:].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return pos - neg


def _a8s_tpb_body(planes_lo_ref, planes_hi_ref, xs_ref, sxm_ref, codes_ref,
                  scales_ref, mins_ref) -> jnp.ndarray:
    """One K-slab of the SWAR kernel with its min correction folded in."""
    pos = _a8s_block_body(planes_lo_ref, planes_hi_ref, xs_ref, codes_ref,
                          scales_ref)
    neg = jax.lax.dot_general(
        sxm_ref[:], mins_ref[:].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return pos - neg


def _q4k_pinned_kernel(xg_ref, x_ref, codes_ref, scales_ref, mins_ref, out_ref):
    k = pl.program_id(1)
    partial_out = _q4k_tpb_body(xg_ref, x_ref, codes_ref, scales_ref, mins_ref)

    @pl.when(k == 0)
    def _():
        out_ref[:] = partial_out

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + partial_out


def _q4k_parts_kernel(xg_ref, x_ref, codes_ref, scales_ref, mins_ref, out_ref):
    k = pl.program_id(2)
    partial_out = _q4k_tpb_body(xg_ref, x_ref, codes_ref, scales_ref, mins_ref)

    @pl.when(k == 0)
    def _():
        out_ref[0] = partial_out

    @pl.when(k != 0)
    def _():
        out_ref[0] = out_ref[0] + partial_out


def _a8s_pinned_kernel(planes_lo_ref, planes_hi_ref, xs_ref, sxm_ref,
                       codes_ref, scales_ref, mins_ref, out_ref):
    k = pl.program_id(1)
    acc = _a8s_tpb_body(planes_lo_ref, planes_hi_ref, xs_ref, sxm_ref,
                        codes_ref, scales_ref, mins_ref)

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _a8s_parts_kernel(planes_lo_ref, planes_hi_ref, xs_ref, sxm_ref,
                      codes_ref, scales_ref, mins_ref, out_ref):
    k = pl.program_id(2)
    acc = _a8s_tpb_body(planes_lo_ref, planes_hi_ref, xs_ref, sxm_ref,
                        codes_ref, scales_ref, mins_ref)

    @pl.when(k == 0)
    def _():
        out_ref[0] = acc

    @pl.when(k != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _q4k_tpb_call(x: jnp.ndarray, w: QuantTensor, nb: int, block_n: int):
    """Shared exact-kernel dispatch for the tp_blocks paths.

    nb == 0: pinned mode — [B, N] with lane blocks fixed at block_n.
    nb > 0:  parts mode — [nb, B, N] per-K-block partials."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2 * 2, (x.shape, w.codes.shape)
    Kb = K // nb if nb else K
    assert Kb % KT == 0, (K, nb)
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    kb = KB if Kb % (KB * KT) == 0 else 1
    kt_blk = kb * KT
    ks = Kb // kt_blk
    xg = jnp.sum(x.astype(jnp.float32).reshape(B, K // GROUP, GROUP), axis=-1).T

    if nb:
        grid = (nb, N // bn, ks)
        kidx = lambda i, n, k: (i * ks + k,)
        out_specs = pl.BlockSpec((1, B, bn), lambda i, n, k: (i, 0, n),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nb, B, N), jnp.float32)
        kernel = _q4k_parts_kernel
        nidx = lambda i, n, k: (n,)
    else:
        grid = (N // bn, K // kt_blk)
        kidx = lambda n, k: (k,)
        out_specs = pl.BlockSpec((B, bn), lambda n, k: (0, n),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, N), jnp.float32)
        kernel = _q4k_pinned_kernel
        nidx = lambda n, k: (n,)
    in_specs = [
        pl.BlockSpec((kt_blk // GROUP, B), lambda *a: kidx(*a) + (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, kt_blk), lambda *a: (0,) + kidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kt_blk // 2, bn), lambda *a: kidx(*a) + nidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kt_blk // GROUP, bn), lambda *a: kidx(*a) + nidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kt_blk // GROUP, bn), lambda *a: kidx(*a) + nidx(*a),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * (len(grid) - 1) + ("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N // 2 + K * N // 4 + B * K * 4
            + max(nb, 1) * B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xg, x, w.codes, w.scales, w.mins)


def _a8s_tpb_call(x: jnp.ndarray, w: QuantTensor, nb: int, block_n: int,
                  kb: int = 4):
    """Shared SWAR-kernel dispatch for the tp_blocks paths (see _q4k_tpb_call)."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2 * 2, (x.shape, w.codes.shape)
    Kb = K // nb if nb else K
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    while Kb % (kb * KT) != 0:
        kb //= 2
    slab = kb * KT
    P = kb * 4
    xq, xsT, xsumT = _quant_acts(x)
    p_lo, p_hi = _a8s_planes(xq, kb)
    sxm = xsT * xsumT                                 # [K/32, B]
    ks = Kb // slab

    if nb:
        grid = (nb, N // bn, ks)
        kidx = lambda i, n, k: (i * ks + k,)
        nidx = lambda i, n, k: (n,)
        out_specs = pl.BlockSpec((1, B, bn), lambda i, n, k: (i, 0, n),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nb, B, N), jnp.float32)
        kernel = _a8s_parts_kernel
    else:
        grid = (N // bn, K // slab)
        kidx = lambda n, k: (k,)
        nidx = lambda n, k: (n,)
        out_specs = pl.BlockSpec((B, bn), lambda n, k: (0, n),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, N), jnp.float32)
        kernel = _a8s_pinned_kernel
    in_specs = [
        pl.BlockSpec((P * B, slab // 2), lambda *a: (0,) + kidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P * B, slab // 2), lambda *a: (0,) + kidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((slab // GROUP, B), lambda *a: kidx(*a) + (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((slab // GROUP, B), lambda *a: kidx(*a) + (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((slab // 2, bn), lambda *a: kidx(*a) + nidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((slab // GROUP, bn), lambda *a: kidx(*a) + nidx(*a),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((slab // GROUP, bn), lambda *a: kidx(*a) + nidx(*a),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * (len(grid) - 1) + ("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N,
            bytes_accessed=K * N // 2 + (K // GROUP) * N * 4 + P * B * K
            + max(nb, 1) * B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(p_lo, p_hi, xsT, sxm, w.codes, w.scales, w.mins)


@partial(jax.jit, static_argnums=(2, 3))
def q4k_matmul_parts(x: jnp.ndarray, w: QuantTensor, nb: int,
                     block_n: int = TPB_BLOCK_N) -> jnp.ndarray:
    """x [B, K] @ packed W → per-K-block partials [nb, B, N] f32, min
    corrections folded per K-step in-kernel. Requires K % (nb·KT) == 0."""
    assert x.shape[1] % (nb * KT) == 0, (x.shape, nb)
    return _q4k_tpb_call(x, w, nb, block_n)


@partial(jax.jit, static_argnums=(2, 3))
def a8s_matmul_parts(x: jnp.ndarray, w: QuantTensor, nb: int,
                     block_n: int = TPB_BLOCK_N) -> jnp.ndarray:
    """SWAR int8-MXU variant of q4k_matmul_parts → [nb, B, N] f32."""
    assert x.shape[1] % (nb * KT) == 0, (x.shape, nb)
    return _a8s_tpb_call(x, w, nb, block_n)


@partial(jax.jit, static_argnums=(2,))
def q4k_matmul_pinned(x: jnp.ndarray, w: QuantTensor,
                      block_n: int = TPB_BLOCK_N) -> jnp.ndarray:
    """Exact kernel with pinned lane blocks and in-kernel min correction:
    identical per-column-block arithmetic at any output sharding."""
    return _q4k_tpb_call(x, w, 0, block_n)


@partial(jax.jit, static_argnums=(2,))
def w4a8_swar_pinned(x: jnp.ndarray, w: QuantTensor,
                     block_n: int = TPB_BLOCK_N) -> jnp.ndarray:
    """SWAR kernel with pinned lane blocks and in-kernel min correction."""
    return _a8s_tpb_call(x, w, 0, block_n)


@partial(jax.jit, static_argnums=(2, 3))
def w4a8_swar_fold(x: jnp.ndarray, w: QuantTensor, block_n: int = 4096,
                   kb: int = 4) -> jnp.ndarray:
    """Decode-path SWAR kernel, min correction folded in-kernel, lane block
    tuned on v5e (tools/autotune_a8s round 3)."""
    return _a8s_tpb_call(x, w, 0, block_n, kb)


# ---------------------------------------------------------------------------
# In-kernel activation quantization: the W4A8 prologue moves into the kernel
# ---------------------------------------------------------------------------
#
# The XLA prologue (_quant_acts + _a8s_planes + the sxm multiply) is ~10 small
# HLO ops per matmul call; at 4 quant matmuls x 32 layers the 8B decode step
# spends ~1.3 ms/step on that glue (device trace, BENCH_LOCAL.md round 3:
# broadcast_select/concatenate/reshape/reduce fusions + their operand
# slices) — more than some kernels spend reading weights. Every piece of the
# prologue is K-slab-local, so this variant takes the RAW activations and
# quantizes/plane-builds each K slab ONCE into VMEM scratch: the grid walks
# K on the outer axis and lane blocks inside, building the slab's planes at
# n == 0 and reusing them for every lane block. XLA sees one fused op per
# matmul: the pallas call itself.
#
# Arithmetic is IDENTICAL to _quant_acts/_a8s_planes/_a8s_tpb_body — same f32
# quantize formula, same int8 dot shapes, same combine order — so outputs are
# bit-identical to w4a8_swar_fold (asserted in tests/test_pallas_quant.py).


def _a8s_xin_kernel(x_ref, codes_ref, scales_ref, mins_ref, out_ref,
                    pl_scr, ph_scr, xs_scr, sxm_scr):
    # grid (n, k): n outer so out blocks are revisited CONSECUTIVELY over k
    # (Mosaic's supported accumulation pattern — a k-outer grid mis-
    # accumulates, caught on hardware by tools/ab_xin.py); the n == 0 sweep
    # quantizes every K slab into full-K scratch, later n reuse it.
    #
    # (An RMS-norm-in-prologue variant was tried and REVERTED in round 4:
    # it compiled pathologically in Mosaic — minutes per shape even after
    # moving the reduce to XLA — and bought only ~1% end-to-end; the norm
    # weights' scoped-prefetch stalls are attacked by storing them f32
    # instead, models/llama.py load path.)
    slab = x_ref.shape[1]
    n, k = pl.program_id(0), pl.program_id(1)
    B = x_ref.shape[0]
    assert B == 1, "in-kernel prologue is the B==1 decode path"
    kb = slab // KT
    P = kb * 4
    G = slab // GROUP
    R = 2 * kb  # 128-lane tile rows of the slab

    @pl.when(n == 0)
    def _():
        # quantize this K slab and build its SWAR planes (scratch persists
        # across the inner lane-block loop). Mosaic supports lane-dim
        # reshapes only at 128-lane granularity (tools/probe_casts.py), so
        # the per-32-group stats use masked lane reductions on [R, 128]
        # tiles instead of a (*, GROUP) reshape — same max/sum/round values,
        # element for element, as _quant_acts.
        x2 = x_ref[:].astype(jnp.float32).reshape(R, 128)
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1) // GROUP
        absx = jnp.abs(x2)
        m_cols = [jnp.max(jnp.where(lane_g == g, absx, 0.0), axis=1,
                          keepdims=True) for g in range(4)]        # amax [R,1]
        slanes = sum(jnp.where(lane_g == g, m_cols[g] / 127.0, 0.0)
                     for g in range(4))                            # [R,128]
        inv = jnp.where(slanes > 0,
                        1.0 / jnp.where(slanes > 0, slanes, 1.0), 0.0)
        xq2 = jnp.round(x2 * inv).astype(jnp.int8)
        xsum = jnp.concatenate(
            [jnp.sum(jnp.where(lane_g == g, xq2.astype(jnp.int32), 0),
                     axis=1, keepdims=True) for g in range(4)],
            axis=1).astype(jnp.float32)                            # [R,4]
        scale = jnp.concatenate(m_cols, axis=1) / 127.0            # [R,4]
        # scatter (row 2t+h, col g) -> group index q = t*8 + h*4 + g: since
        # q//4 == 2t+h, that's a 4x sublane repeat + diagonal column pick
        # (exact copies; a 0/1 selection MATMUL would run at the MXU's
        # default bf16 precision and round the values)
        gsel = (jax.lax.broadcasted_iota(jnp.int32, (G, 4), 1)
                == jax.lax.broadcasted_iota(jnp.int32, (G, 4), 0) % 4)

        def pick(mat):  # [R, 4] -> [G, 1] in q order
            rows = jnp.repeat(mat, 4, axis=0)  # rows[q] = mat[q // 4]
            return jnp.sum(jnp.where(gsel, rows, 0.0), axis=1, keepdims=True)

        xs_scr[pl.dslice(k * G, G), :] = pick(scale)
        sxm_scr[pl.dslice(k * G, G), :] = pick(scale * xsum)
        xq = xq2.reshape(1, slab)
        xr = xq.reshape(1, kb, 2, KT // 2)
        lo = xr[:, :, 0].reshape(1, slab // 2)
        hi = xr[:, :, 1].reshape(1, slab // 2)
        i = jax.lax.broadcasted_iota(jnp.int32, (1, slab // 2), 1)
        p_of_i = (i // (KT // 2)) * 4 + (i % (KT // 2)) // GROUP
        pl_scr[:, pl.dslice(k * (slab // 2), slab // 2)] = jnp.concatenate(
            [jnp.where(p_of_i == p, lo, jnp.int8(0)) for p in range(P)],
            axis=0)
        ph_scr[:, pl.dslice(k * (slab // 2), slab // 2)] = jnp.concatenate(
            [jnp.where(p_of_i == p, hi, jnp.int8(0)) for p in range(P)],
            axis=0)

    acc = _a8s_block_math(
        pl_scr[:, pl.dslice(k * (slab // 2), slab // 2)],
        ph_scr[:, pl.dslice(k * (slab // 2), slab // 2)],
        xs_scr[pl.dslice(k * G, G), :], codes_ref[:], scales_ref[:])
    neg = jax.lax.dot_general(
        sxm_scr[pl.dslice(k * G, G), :], mins_ref[:].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = acc - neg

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@partial(jax.jit, static_argnums=(2, 3))
def w4a8_swar_xin(x: jnp.ndarray, w: QuantTensor, block_n: int = 4096,
                  kb: int = 4) -> jnp.ndarray:
    """SWAR kernel with IN-KERNEL activation quantization + min fold.

    Bit-identical outputs to w4a8_swar_fold; removes the whole XLA-side
    prologue. x [1, K] float (B == 1 decode steps; larger batches fall back
    to the XLA-prologue fold kernel, whose glue amortizes over the batch).
    Returns [B, N] f32."""
    B, K = x.shape
    if B != 1 or K % KT != 0:
        return w4a8_swar_fold(x, w, block_n, kb)
    K2, N = w.codes.shape
    assert K == K2 * 2, (x.shape, w.codes.shape)
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    while K % (kb * KT) != 0:
        kb //= 2
    assert kb >= 1, (K,)
    slab = kb * KT
    P = kb * 4
    ks = K // slab
    grid = (N // bn, ks)
    return pl.pallas_call(
        _a8s_xin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, slab), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // 2, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab // GROUP, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P * B, K // 2), jnp.int8),
            pltpu.VMEM((P * B, K // 2), jnp.int8),
            pltpu.VMEM((K // GROUP, B), jnp.float32),
            pltpu.VMEM((K // GROUP, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # scratch written at n == 0 feeds later steps: both dims must
            # stay in submission order
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N,
            bytes_accessed=K * N // 2 + (K // GROUP) * N * 4 + B * K * 4
            + B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, w.codes, w.scales, w.mins)


# ---------------------------------------------------------------------------
# MoE expert banks: scalar-prefetch in-place expert indirection
# ---------------------------------------------------------------------------
#
# The routed-MoE decode path reads k selected experts' packed bytes per bank
# per layer. Gathering each expert's arrays first (QuantExperts.expert())
# doubles the quantized read (copy + kernel read — VERDICT r2 weak #5); here
# the routed expert ids ride scalar prefetch and the kernel's index maps pick
# which expert's blocks each grid step DMAs from the bank IN PLACE — the
# paged_attention.py page-table technique applied to expert weights. One
# dispatch computes every selected expert's [B, N] product (per-K-slab min
# correction folded in-kernel).


def _a8s_bank_kernel(eids_ref, planes_lo_ref, planes_hi_ref, xs_ref, sxm_ref,
                     codes_ref, scales_ref, mins_ref, out_ref):
    k = pl.program_id(2)
    pos = _a8s_block_math(planes_lo_ref[:], planes_hi_ref[:], xs_ref[:],
                          codes_ref[0], scales_ref[0])
    neg = jax.lax.dot_general(
        sxm_ref[:], mins_ref[0].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = pos - neg

    @pl.when(k == 0)
    def _():
        out_ref[0] = acc

    @pl.when(k != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _q4k_bank_kernel(eids_ref, xg_ref, x_ref, codes_ref, scales_ref, mins_ref,
                     out_ref):
    k = pl.program_id(2)
    pos = _q4k_block_math(x_ref[:], codes_ref[0], scales_ref[0])
    neg = jax.lax.dot_general(
        xg_ref[:], mins_ref[0].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = pos - neg

    @pl.when(k == 0)
    def _():
        out_ref[0] = acc

    @pl.when(k != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


@partial(jax.jit, static_argnums=(5, 6))
def _a8s_bank_call(x, codes, scales, mins, eids, block_n: int, kb: int):
    B, K = x.shape
    Ne, K2, N = codes.shape
    assert K == K2 * 2, (x.shape, codes.shape)
    n_sel = eids.shape[0]
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    while K % (kb * KT) != 0:
        kb //= 2
    slab = kb * KT
    P = kb * 4
    xq, xsT, xsumT = _quant_acts(x)
    p_lo, p_hi = _a8s_planes(xq, kb)
    sxm = xsT * xsumT
    grid = (n_sel, N // bn, K // slab)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P * B, slab // 2), lambda e, n, k, ei: (0, k)),
            pl.BlockSpec((P * B, slab // 2), lambda e, n, k, ei: (0, k)),
            pl.BlockSpec((slab // GROUP, B), lambda e, n, k, ei: (k, 0)),
            pl.BlockSpec((slab // GROUP, B), lambda e, n, k, ei: (k, 0)),
            pl.BlockSpec((1, slab // 2, bn), lambda e, n, k, ei: (ei[e], k, n)),
            pl.BlockSpec((1, slab // GROUP, bn), lambda e, n, k, ei: (ei[e], k, n)),
            pl.BlockSpec((1, slab // GROUP, bn), lambda e, n, k, ei: (ei[e], k, n)),
        ],
        out_specs=pl.BlockSpec((1, B, bn), lambda e, n, k, ei: (e, 0, n)),
    )
    return pl.pallas_call(
        _a8s_bank_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sel, B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * B * (K // 2) * N * n_sel,
            bytes_accessed=n_sel * (K * N // 2 + (K // GROUP) * N * 4)
            + P * B * K + n_sel * B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(eids, p_lo, p_hi, xsT, sxm, codes, scales, mins)


@partial(jax.jit, static_argnums=(5, 6))
def _q4k_bank_call(x, codes, scales, mins, eids, block_n: int, kb: int):
    B, K = x.shape
    Ne, K2, N = codes.shape
    assert K == K2 * 2, (x.shape, codes.shape)
    n_sel = eids.shape[0]
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    while K % (kb * KT) != 0:
        kb //= 2
    kt_blk = kb * KT
    xf = x.astype(jnp.float32)
    xg = jnp.sum(xf.reshape(B, K // GROUP, GROUP), axis=-1).T  # [K/32, B]
    grid = (n_sel, N // bn, K // kt_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt_blk // GROUP, B), lambda e, n, k, ei: (k, 0)),
            pl.BlockSpec((B, kt_blk), lambda e, n, k, ei: (0, k)),
            pl.BlockSpec((1, kt_blk // 2, bn), lambda e, n, k, ei: (ei[e], k, n)),
            pl.BlockSpec((1, kt_blk // GROUP, bn), lambda e, n, k, ei: (ei[e], k, n)),
            pl.BlockSpec((1, kt_blk // GROUP, bn), lambda e, n, k, ei: (ei[e], k, n)),
        ],
        out_specs=pl.BlockSpec((1, B, bn), lambda e, n, k, ei: (e, 0, n)),
    )
    return pl.pallas_call(
        _q4k_bank_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sel, B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N * n_sel,
            bytes_accessed=n_sel * (K * N // 2 + K * N // 4) + B * K * 4
            + n_sel * B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(eids, xg, xf, codes, scales, mins)


def bank_matmul(x: jnp.ndarray, codes, scales, mins, eids, a8: bool,
                block_n: int = 4096, kb: int = 4) -> jnp.ndarray:
    """x [B, K] @ bank[eids[j]] → [n_sel, B, N] f32, packed bytes read in
    place (no per-expert gather copy). Dispatch mirrors _quant_kernel_call's
    batch rule so routed decode (B small) and masked replay rows agree."""
    eids = eids.astype(jnp.int32)
    if a8 and x.shape[0] <= A8S_MAX_BATCH:
        return _a8s_bank_call(x, codes, scales, mins, eids, block_n, kb)
    return _q4k_bank_call(x, codes, scales, mins, eids, block_n, kb)


def _quant_parts_call(flat: jnp.ndarray, w, nb: int) -> jnp.ndarray:
    """K-blocked partials dispatch, mirroring _quant_kernel_call's
    batch-size rule so prover and verifier at the same batch agree."""
    if type(w) is QuantTensorA8S and flat.shape[0] <= A8S_MAX_BATCH:
        return a8s_matmul_parts(flat, w, nb)
    return q4k_matmul_parts(flat, w, nb)


def _quant_kernel_call_pinned(flat: jnp.ndarray, w) -> jnp.ndarray:
    if type(w) is QuantTensorA8S and flat.shape[0] <= A8S_MAX_BATCH:
        return w4a8_swar_pinned(flat, w)
    return q4k_matmul_pinned(flat, w)


def _qmm_quant_blocked(x: jnp.ndarray, w, nb: int) -> jnp.ndarray:
    """Unsharded K-blocked quantized matmul (the solo side of the contract)."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    parts = _quant_parts_call(flat, w, nb)
    out = _tree_combine(parts)
    return out[:, : w.n_out].reshape(*lead, -1).astype(x.dtype)


def _qmm_sharded_blocked_k(x: jnp.ndarray, w: ShardedQuant, nb: int) -> jnp.ndarray:
    """K-sharded ShardedQuant under tp_blocks: each device emits its own
    K-block partials from one kernel dispatch; the halving tree combines
    them in GSPMD-land with the graph-pinned association."""
    from jax.sharding import PartitionSpec as P

    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    leaves, treedef = jax.tree_util.tree_flatten(w.base)
    tp = w.tp
    tp_size = w.mesh.shape[tp]
    assert nb % tp_size == 0, (nb, tp_size)
    nb_local = nb // tp_size

    def f(xl, *wl):
        return _quant_parts_call(xl, treedef.unflatten(wl), nb_local)

    parts = jax.shard_map(
        f, mesh=w.mesh,
        in_specs=(P(None, tp), *[P(tp, None) for _ in leaves]),
        out_specs=P(tp, None, None), check_vma=False,
    )(flat, *leaves)                                  # [nb, B, N] block-sharded
    out = _tree_combine(parts)
    return out[:, : w.n_out].reshape(*lead, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Q8_0: int8 codes + per-32 f32 scales — exact fused engine (9 b/w)
# ---------------------------------------------------------------------------
#
# GGUF Q8_0 (gguf/quants.py dequantize_q8_0) stores 32-weight blocks of one
# f16 scale d + 32 int8 codes along the input dim; value = f32(d) * code —
# symmetric, no min term. BASELINE config #3 serves Llama-3-8B Q8_0 and the
# reference's own bundled default model is Q6_K/Q8_0-class
# (/root/reference/inference/test/t-integration.cpp:23); without a packed
# engine those ran dequantized to bf16 at 16 b/w (VERDICT r3 missing #2).
# This kernel streams the native codes at 8 (codes) + 1 (f32 scales) b/w and
# reconstructs f32(d)·code exactly (int8→f32 and f16→f32 are exact), so
# dequantized VALUES are bitwise identical to the host dequant path — the
# same verification-grade property as the exact Q4_K kernel.


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensorQ8:
    """int8-code packed weight for x @ W, shape semantics (n_in, n_out).

    One layout serves two GGUF formats: Q8_0 (native int8 codes, one f16
    scale per 32) and Q6_K expanded to int8 (codes = q−32, one exact
    f32(d)·sc scale per 16 — 10 b/w vs 16 dequantized)."""

    codes: jnp.ndarray    # int8 [K, N_pad]
    scales: jnp.ndarray   # f32  [K/group, N_pad]
    n_out: int = 0
    group: int = 32       # weights per scale along K (32 = Q8_0, 16 = Q6_K)

    def tree_flatten(self):
        return (self.codes, self.scales), (self.n_out, self.group)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_out=aux[0], group=aux[1])

    @property
    def shape(self):
        return (self.codes.shape[0], self.n_out)

    @property
    def dtype(self):
        return jnp.bfloat16


def repack_q8_0_for_tpu(data: np.ndarray, n_rows: int, row_len: int) -> QuantTensorQ8:
    """GGUF Q8_0 tensor bytes → TPU-layout QuantTensorQ8 (K-major)."""
    from ...gguf.quants import _f16_col

    blk = np.frombuffer(data, dtype=np.uint8).reshape(-1, 34)
    d = _f16_col(blk, 0, 2)                      # f32 (f16→f32 exact)
    q = blk[:, 2:].view(np.int8)
    K, N = row_len, n_rows
    codes = np.ascontiguousarray(q.reshape(N, K).T)                    # [K, N]
    scales = np.ascontiguousarray(
        d.astype(np.float32).reshape(N, K // GROUP).T)                 # [K/32, N]
    n_pad = -(-N // 256) * 256 - N               # zero scale ⇒ exact 0
    if n_pad:
        codes = np.pad(codes, ((0, 0), (0, n_pad)))
        scales = np.pad(scales, ((0, 0), (0, n_pad)))
    codes, scales = _widen_lanes(codes, scales)
    return QuantTensorQ8(jnp.asarray(codes), jnp.asarray(scales), n_out=n_rows)


def _q8_block_math(x, codes, scales) -> jnp.ndarray:
    """One K-slab: dequant (exact f32) + dot → [B, bn] f32. The scale group
    size is inferred from the block shapes (32 for Q8_0, 16 for Q6_K)."""
    slab, nt = codes.shape
    group = slab // scales.shape[0]
    w = (codes.astype(jnp.float32).reshape(slab // group, group, nt)
         * scales.astype(jnp.float32)[:, None, :]).reshape(slab, nt)
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)


def _q8_matmul_kernel(x_ref, codes_ref, scales_ref, out_ref):
    k = pl.program_id(2)
    acc = _q8_block_math(x_ref[:], codes_ref[:], scales_ref[:])

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@partial(jax.jit, static_argnums=(2,))
def q8_0_matmul(x: jnp.ndarray, w: QuantTensorQ8, block_n: int = 2048) -> jnp.ndarray:
    """x [B, K] @ packed Q8_0 W [K, N] → [B, N] f32."""
    B, K = x.shape
    K2, N = w.codes.shape
    assert K == K2, (x.shape, w.codes.shape)
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    kt_blk = KB * KT if K % (KB * KT) == 0 else (KT if K % KT == 0 else GROUP)
    bm = _pick_block_m(B)
    grid = (B // bm, N // bn, K // kt_blk)
    return pl.pallas_call(
        _q8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kt_blk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_blk // w.group, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=(B // bm) * (K * N + K * N // w.group * 4)
            + B * K * 4 + B * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, w.codes, w.scales)


def repack_q6_k_expanded(data: np.ndarray, n_rows: int, row_len: int) -> QuantTensorQ8:
    """GGUF Q6_K tensor bytes → int8-expanded QuantTensorQ8 (group=16).

    The 6-bit codes are widened to int8 (q−32, exactly llama.cpp's centered
    value) and the two-level scale d·sc is pre-multiplied in f32 (f16→f32 and
    the f32 product match the host dequant path bitwise —
    gguf/quants.py:dequantize_q6_k computes (d·sc)·(q−32) in the same
    association). 10 b/w streamed vs 16 dequantized; the packed 6.56 b/w
    native layout is left on the table deliberately — the Q4_K "k4" native
    kernel measured SLOWER end-to-end than its expanded-scale layout (the
    in-kernel bit decode is VPU-bound, BENCH_LOCAL round 1)."""
    from ...gguf.quants import _f16_col

    blk = np.frombuffer(data, dtype=np.uint8).reshape(-1, 210)
    nb = blk.shape[0]
    ql = blk[:, 0:128]
    qh = blk[:, 128:192]
    sc = blk[:, 192:208].view(np.int8).astype(np.float32)   # [nb, 16]
    d = _f16_col(blk, 208, 210)[:, None]                     # [nb, 1] f32
    q = np.empty((nb, 256), np.int8)
    for h in range(2):
        lql = ql[:, 64 * h: 64 * h + 32]
        lql2 = ql[:, 64 * h + 32: 64 * h + 64]
        lqh = qh[:, 32 * h: 32 * (h + 1)].astype(np.int32)
        q[:, 128 * h + 0: 128 * h + 32] = (
            (lql & 0xF).astype(np.int32) | ((lqh & 3) << 4)) - 32
        q[:, 128 * h + 32: 128 * h + 64] = (
            (lql2 & 0xF).astype(np.int32) | (((lqh >> 2) & 3) << 4)) - 32
        q[:, 128 * h + 64: 128 * h + 96] = (
            (lql >> 4).astype(np.int32) | (((lqh >> 4) & 3) << 4)) - 32
        q[:, 128 * h + 96: 128 * h + 128] = (
            (lql2 >> 4).astype(np.int32) | (((lqh >> 6) & 3) << 4)) - 32
    scales = (d * sc).astype(np.float32)                     # [nb, 16]
    K, N = row_len, n_rows
    codes = np.ascontiguousarray(q.reshape(N, K).T)                 # [K, N]
    scales = np.ascontiguousarray(scales.reshape(N, K // 16).T)     # [K/16, N]
    n_pad = -(-N // 256) * 256 - N
    if n_pad:
        codes = np.pad(codes, ((0, 0), (0, n_pad)))
        scales = np.pad(scales, ((0, 0), (0, n_pad)))
    codes, scales = _widen_lanes(codes, scales)
    return QuantTensorQ8(jnp.asarray(codes), jnp.asarray(scales),
                         n_out=n_rows, group=16)


# ---------------------------------------------------------------------------
# Ring-prefill composition: packed kernels under an `sp` sequence ring
# ---------------------------------------------------------------------------


def qmm_row_sharded(x: jnp.ndarray, w, mesh, axis: str = "sp") -> jnp.ndarray:
    """x [B, T, K] @ packed w with T sharded over `axis`, w REPLICATED.

    Everything except attention in a ring prefill is embarrassingly parallel
    over tokens, but a pallas_call is opaque to GSPMD — so the row
    parallelism is expressed as a shard_map island: each device runs the
    kernel on its local token rows (the ShardedQuant technique with the
    batch, not the weight, as the sharded operand). Lets the quantized
    production engines prefill beyond-chip prompts over the ring
    (VERDICT r3 missing #7)."""
    import jax
    from jax.sharding import PartitionSpec as P

    if not isinstance(w, (QuantTensor, QuantTensorA8, QuantTensorK4,
                          QuantTensorQ8)):
        return x @ w
    leaves, treedef = jax.tree_util.tree_flatten(w)

    def f(xl, *wl):
        B, Tl, K = xl.shape
        out = _quant_kernel_call(xl.reshape(B * Tl, K), treedef.unflatten(wl))
        return out[:, : w.n_out].reshape(B, Tl, -1)

    out = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis, None),
                  *[P(*([None] * l.ndim)) for l in leaves]),
        out_specs=P(None, axis, None), check_vma=False,
    )(x, *leaves)
    return out.astype(x.dtype)


def qmm_replicated(x: jnp.ndarray, w, mesh) -> jnp.ndarray:
    """x [M, K] @ packed w with everything replicated on the mesh — an
    island for small per-sequence matmuls (the lm head on the ring's single
    gathered row) where sharding M is impossible."""
    import jax
    from jax.sharding import PartitionSpec as P

    if not isinstance(w, (QuantTensor, QuantTensorA8, QuantTensorK4,
                          QuantTensorQ8)):
        return x @ w
    leaves, treedef = jax.tree_util.tree_flatten(w)

    def f(xl, *wl):
        return _quant_kernel_call(xl, treedef.unflatten(wl))[:, : w.n_out]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, None), *[P(*([None] * l.ndim)) for l in leaves]),
        out_specs=P(None, None), check_vma=False,
    )(x, *leaves)
