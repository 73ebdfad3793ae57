"""Mixture-of-Experts (Mixtral-family) transformer.

Extends the llama-family block with a routed expert FFN (GGUF tensors
blk.N.ffn_gate_inp.weight router + 3-D ffn_{gate,up,down}_exps.weight expert
banks). BASELINE.json config #4 (Mixtral-8x7B expert-sharded) is the target;
experts shard over the mesh's tp axis (acting as the expert-parallel axis),
with GSPMD inserting the cross-expert reduction.

Routing: top-k (n_expert_used) softmax-renormalized over the selected
experts, the standard Mixtral semantics. Two mixture computations:
* dense-with-masking (every expert computed, one-hot-weighted sum) —
  batch-invariant and GSPMD/expert-sharding-friendly; used when serving
  over a mesh and for batch-invariant scheduler rows.
* ragged (megablox-style): token copies sorted by routed expert, grouped
  matmuls via lax.ragged_dot — HBM reads only the ROUTED experts' weights
  (k/Ne of the bank per step), a ~Ne/k decode-throughput win on a single
  chip (Mixtral 8x2: ~3.6×). Selected by MoEStatic.ragged (default on for
  unsharded serving).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import attention
from ..ops.kv_cache import KVCache
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from .config import ModelConfig
from .llama import _act


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantExperts:
    """Expert bank kept 4-bit packed: stacked per-expert QuantTensor fields.

    Serving MoE experts dense-bf16 costs 16 b/w of HBM capacity AND streams
    at 16 b/w; packed banks cut both ~3x (5-6 b/w). `expert(e)` materializes
    one routed expert's packed view via a dynamic gather (reads only that
    expert's bytes + one copy) and hands it to the existing fused kernels —
    the decode path then reads k routed experts' QUANTIZED bytes per layer
    instead of the bf16 bank. (A scalar-prefetch in-kernel expert
    indirection, as in ops/pallas/paged_attention.py, would drop the copy —
    noted in NEXT.md.)"""

    codes: jnp.ndarray   # [Ne, K/2, N_pad] u8
    scales: jnp.ndarray  # [Ne, K/32, N_pad] f32 (exact) / bf16 (a8)
    mins: jnp.ndarray    # [Ne, K/32, N_pad]
    n_out: int = 0
    a8: bool = False     # dispatch: exact dequant kernel vs SWAR int8-MXU

    def tree_flatten(self):
        return (self.codes, self.scales, self.mins), (self.n_out, self.a8)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_out=aux[0], a8=aux[1])

    @property
    def n_expert(self) -> int:
        return self.codes.shape[0]

    def expert(self, e):
        from ..ops.pallas.quant_matmul import QuantTensor, QuantTensorA8S

        def take(a):
            return jax.lax.dynamic_index_in_dim(a, e, 0, keepdims=False)

        cls = QuantTensorA8S if self.a8 else QuantTensor
        return cls(take(self.codes), take(self.scales), take(self.mins),
                   n_out=self.n_out)


def _repack_bank(raw: np.ndarray, K: int, N: int, Ne: int, a8: bool):
    """All-experts-at-once Q4_K bank repack (NEXT.md perf #4).

    One threaded native repack over the concatenated (Ne*N, K) matrix and a
    single upload + on-device expert split, replacing Ne host repacks and
    3*Ne small tunnel uploads per bank (the per-dispatch tunnel overhead
    dominated a8 bank loads). Bit-identical to the per-expert path — expert
    e's rows are rows e*N..(e+1)*N-1 of the combined matrix, so column
    slices match; guarded by tests/test_moe.py. Returns None when per-expert
    lane padding would differ (caller falls back to the loop)."""
    from .. import native
    from ..ops.pallas.quant_matmul import _widen_target

    if N % 256 or _widen_target(N) != N or native.get_lib() is None:
        return None
    fast = native.native_repack_q4k(raw, Ne * N, K)
    if fast is None:
        return None
    codes, scales, mins, _ = fast  # [K/2, Ne*N] u8, [K/32, Ne*N] f32 x2

    def up(a, cast=None):
        if cast is not None:
            # host-side bf16 cast: the tunnel upload moves half the bytes
            # (same rationale as repack_q4k_a8s)
            import ml_dtypes

            a = a.astype(ml_dtypes.bfloat16)
        d = jnp.asarray(a)
        return d.reshape(d.shape[0], Ne, N).transpose(1, 0, 2)

    sdt = jnp.bfloat16 if a8 else None
    return QuantExperts(up(codes), up(scales, sdt), up(mins, sdt),
                        n_out=N, a8=a8)


def load_moe_params(reader: GGUFReader, cfg: ModelConfig, dtype=jnp.float32, mesh=None,
                    fused_quant: bool | str = False) -> dict[str, Any]:
    def get_t(name):
        return reader.tensor_float(name).T.copy()

    def get_v(name):
        return reader.tensor_float(name)

    def get_exps(name):
        # numpy shape (n_expert, F_out, F_in) → transpose per expert to (n_expert, F_in, F_out)
        w = reader.tensor_float(name)
        return np.ascontiguousarray(w.transpose(0, 2, 1))

    if fused_quant and mesh is None:
        return _load_moe_fused(reader, cfg, dtype, fused_quant, get_t, get_v,
                               get_exps)

    layers: dict[str, list] = {
        k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "ffn_norm",
                        "router", "w_gate_exps", "w_up_exps", "w_down_exps")
    }
    for i in range(cfg.n_layer):
        layers["attn_norm"].append(get_v(f"blk.{i}.attn_norm.weight"))
        layers["wq"].append(get_t(f"blk.{i}.attn_q.weight"))
        layers["wk"].append(get_t(f"blk.{i}.attn_k.weight"))
        layers["wv"].append(get_t(f"blk.{i}.attn_v.weight"))
        layers["wo"].append(get_t(f"blk.{i}.attn_output.weight"))
        layers["ffn_norm"].append(get_v(f"blk.{i}.ffn_norm.weight"))
        layers["router"].append(get_t(f"blk.{i}.ffn_gate_inp.weight"))  # (E, n_expert)
        layers["w_gate_exps"].append(get_exps(f"blk.{i}.ffn_gate_exps.weight"))
        layers["w_up_exps"].append(get_exps(f"blk.{i}.ffn_up_exps.weight"))
        layers["w_down_exps"].append(get_exps(f"blk.{i}.ffn_down_exps.weight"))

    params = {
        "tok_emb": get_v("token_embd.weight"),
        "out_norm": get_v("output_norm.weight"),
        "layers": {k: np.stack(v) for k, v in layers.items()},
    }
    if "output.weight" in reader.tensors:
        params["output"] = get_t("output.weight")
    else:
        params["output"] = params["tok_emb"].T.copy()
    v = params["output"].shape[1]
    v_pad = -(-v // 128) * 128
    if v_pad != v:
        params["output"] = np.pad(params["output"], ((0, 0), (0, v_pad - v)))
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def _load_moe_fused(reader, cfg, dtype, fused_quant, get_t, get_v, get_exps):
    """4-bit-packed MoE load: attention projections as QuantTensors, expert
    banks as stacked QuantExperts (list-of-dicts layers = unrolled layer loop,
    same rationale as load_llama_params' quantized modes). Single-chip
    serving only — the mesh path keeps dense dequant (caller gates)."""
    from ..gguf.constants import GGMLType
    from ..ops.pallas.quant_matmul import repack_q4k_a8s, repack_q4k_for_tpu

    a8 = fused_quant == "a8"
    repack = repack_q4k_a8s if a8 else repack_q4k_for_tpu

    def get_q(name):
        info = reader.tensors[name]
        if info.ggml_type != GGMLType.Q4_K:
            return jnp.asarray(get_t(name), dtype)
        return repack(reader.tensor_bytes(name), info.ne[1], info.ne[0])

    def get_bank(name):
        info = reader.tensors[name]
        if info.ggml_type != GGMLType.Q4_K:
            return jnp.asarray(get_exps(name), dtype)
        K, N, Ne = info.ne  # ggml order: (n_in, out_per_expert, n_expert)
        raw = np.frombuffer(reader.tensor_bytes(name), np.uint8)
        bank = _repack_bank(raw, K, N, Ne, a8)
        if bank is not None:
            return bank
        row_bytes = (K // 256) * 144  # Q4_K superblock = 144 B / 256 weights
        per = N * row_bytes
        parts = [repack(raw[e * per:(e + 1) * per], N, K) for e in range(Ne)]
        return QuantExperts(
            jnp.stack([p.codes for p in parts]),
            jnp.stack([p.scales for p in parts]),
            jnp.stack([p.mins for p in parts]),
            n_out=parts[0].n_out, a8=a8)

    layers = []
    for i in range(cfg.n_layer):
        layers.append({
            "attn_norm": jnp.asarray(get_v(f"blk.{i}.attn_norm.weight"), dtype),
            "wq": get_q(f"blk.{i}.attn_q.weight"),
            "wk": get_q(f"blk.{i}.attn_k.weight"),
            "wv": get_q(f"blk.{i}.attn_v.weight"),
            "wo": get_q(f"blk.{i}.attn_output.weight"),
            "ffn_norm": jnp.asarray(get_v(f"blk.{i}.ffn_norm.weight"), dtype),
            "router": jnp.asarray(get_t(f"blk.{i}.ffn_gate_inp.weight"), dtype),
            "w_gate_exps": get_bank(f"blk.{i}.ffn_gate_exps.weight"),
            "w_up_exps": get_bank(f"blk.{i}.ffn_up_exps.weight"),
            "w_down_exps": get_bank(f"blk.{i}.ffn_down_exps.weight"),
        })

    params = {
        "tok_emb": jnp.asarray(get_v("token_embd.weight"), dtype),
        "out_norm": jnp.asarray(get_v("output_norm.weight"), dtype),
        "layers": layers,
    }
    if "output.weight" in reader.tensors:
        params["output"] = get_q("output.weight")
    else:
        params["output"] = jnp.asarray(
            np.ascontiguousarray(get_v("token_embd.weight").T), dtype)
    if not hasattr(params["output"], "n_out"):
        v = params["output"].shape[1]
        v_pad = -(-v // 128) * 128
        if v_pad != v:
            params["output"] = jnp.pad(params["output"],
                                       ((0, 0), (0, v_pad - v)))
    return params


@dataclass(frozen=True)
class MoEStatic:
    n_head: int
    n_head_kv: int
    head_dim: int
    rope_dim: int
    freq_base: float
    rms_eps: float
    act_fn: str
    n_expert: int
    n_expert_used: int
    ragged: bool = False
    # fixed-topology blocking (see ops/pallas/quant_matmul.qmm_blocked):
    # pins matmul leaf shapes and combines the expert mixture through a
    # balanced tree so EP-sharded and solo logits are bit-identical
    tp_blocks: int = 0
    # jax Mesh (hashable) when serving sharded: the fixed-topology mixture
    # runs as a shard_map so each device computes only its local experts
    mesh: object = None

    @classmethod
    def of(cls, cfg: ModelConfig) -> "MoEStatic":
        return cls(cfg.n_head, cfg.n_head_kv, cfg.head_dim_, cfg.rope_dim_,
                   cfg.rope_freq_base, cfg.rms_norm_eps, cfg.act_fn,
                   cfg.n_expert, cfg.n_expert_used,
                   ragged=bool(getattr(cfg, "moe_ragged", False)),
                   tp_blocks=getattr(cfg, "tp_blocks", 0),
                   mesh=getattr(cfg, "mesh", None))


def moe_ffn_ragged(h: jnp.ndarray, p: dict, st: MoEStatic) -> jnp.ndarray:
    """Ragged routed FFN: grouped matmuls over expert-sorted token copies.

    Static shapes throughout (M = B·T·k rows, stable argsort), so the path
    is deterministic and replay-exact within the engine; it reads only the
    routed experts' weight rows from HBM (lax.ragged_dot skips empty
    groups), unlike the dense masked mixture which streams the whole bank."""
    act = _act(st.act_fn)
    B, T, E = h.shape
    k = st.n_expert_used
    router_logits = h @ p["router"]
    top_vals, top_idx = jax.lax.top_k(router_logits, k)
    gate_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)

    hf = h.reshape(B * T, E)
    eids = top_idx.reshape(-1)                       # [M] expert per copy
    order = jnp.argsort(eids, stable=True)           # deterministic grouping
    inv = jnp.argsort(order, stable=True)
    xs = jnp.repeat(hf, k, axis=0)[order]            # [M, E] expert-sorted
    gs = jnp.bincount(eids, length=st.n_expert).astype(jnp.int32)
    g = jax.lax.ragged_dot(xs, p["w_gate_exps"], gs,
                           preferred_element_type=jnp.float32)
    u = jax.lax.ragged_dot(xs, p["w_up_exps"], gs,
                           preferred_element_type=jnp.float32)
    y = jax.lax.ragged_dot((act(g) * u).astype(h.dtype), p["w_down_exps"], gs,
                           preferred_element_type=jnp.float32)  # [M, E]
    y = y[inv].reshape(B, T, k, E)
    return jnp.einsum("btke,btk->bte", y, gate_w).astype(h.dtype)


def _bank_mm(hf: jnp.ndarray, bank: "QuantExperts", eids) -> jnp.ndarray:
    """hf [R, K] against bank[eids[j]] → [n_sel, R, n_out] f32, read in place
    via scalar-prefetch expert indirection (no gather copy)."""
    from ..ops.pallas.quant_matmul import bank_matmul

    out = bank_matmul(hf, bank.codes, bank.scales, bank.mins, eids, bank.a8)
    return out[..., : bank.n_out]


def moe_ffn_quant(h: jnp.ndarray, p: dict, st: MoEStatic) -> jnp.ndarray:
    """Routed FFN over 4-bit-packed expert banks (QuantExperts).

    Solo decode (B·T == 1) runs the fused bank kernels directly on the k
    ROUTED experts' packed bytes (scalar-prefetch indirection — per layer it
    reads exactly k experts' quantized bytes from HBM, no gathered copy;
    Mixtral 8x2 at 5-6 b/w: ~10x less decode HBM traffic than
    dense-bf16-all-experts). Batched/prefill rows take the masked all-expert
    path (batch-invariant, streams each bank once per chunk, still
    quantized, same bank kernels at eids=[e]).

    Decode-vs-prefill bit-exactness: both accumulate per-expert outputs in
    ASCENDING expert order into an f32 accumulator; the masked path's
    unrouted terms are exactly 0.0·d_e == 0.0 and y + 0.0 == y bitwise, so a
    token's logits match whether it was decoded solo (routed) or replayed
    inside a teacher-forced chunk (masked) — the fillCtx verification
    contract (tested in tests/test_moe.py)."""
    act = _act(st.act_fn)
    B, T, E = h.shape
    k = st.n_expert_used
    # Routing must be REPRODUCIBLE across program contexts: the router dot is
    # the one non-kernel matmul on this path, and both bf16 dots (emulation
    # precision differs inside loop bodies vs straight-line code) and f32
    # dots (gemm M-blocking shifts row sums between T=1 decode and padded
    # T=8 steps) carry sub-ulp noise that can flip a near-tied top-k expert
    # choice. Computing in f32 and snapping the logits to the bf16 grid puts
    # selection (and gate_w) far above both noise floors, so a token routes
    # identically whether decoded solo, in a padded bucket, or in the fused
    # loop — the verification contract (tests/test_moe.py).
    router_logits = jnp.dot(
        h.astype(jnp.float32), p["router"].astype(jnp.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    top_vals, top_idx = jax.lax.top_k(router_logits, k)
    gate_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)  # [B,T,k]
    hf = h.reshape(B * T, E)

    if B * T == 1:
        eids = top_idx.reshape(k)
        gw = gate_w.reshape(k)
        order = jnp.argsort(eids)  # ascending ids = masked accumulation order
        eids, gw = eids[order], gw[order]
        # one dispatch per bank over all k routed experts, packed bytes read
        # in place: g/u rows share the token input; the down bank sees one
        # input row PER expert, so its kernel computes a [k, k, E] block and
        # row j of expert j is the routed product (B·T==1 ⇒ k extra tiny-dot
        # rows, zero extra HBM)
        g = _bank_mm(hf, p["w_gate_exps"], eids)        # [k, 1, F]
        u = _bank_mm(hf, p["w_up_exps"], eids)
        mid = (act(g) * u).astype(h.dtype)[:, 0, :]     # [k, F]
        d = _bank_mm(mid, p["w_down_exps"], eids)       # [k(expert), k(row), E]
        y = jnp.zeros((1, E), jnp.float32)
        for j in range(k):
            y = y + gw[j] * d[j, j][None].astype(jnp.float32)
        return y.reshape(B, T, E).astype(h.dtype)

    def expert_ffn(e):
        ei = jnp.full((1,), e, jnp.int32)
        g = _bank_mm(hf, p["w_gate_exps"], ei)[0]
        u = _bank_mm(hf, p["w_up_exps"], ei)[0]
        return _bank_mm((act(g) * u).astype(h.dtype), p["w_down_exps"], ei)[0]

    onehot = jax.nn.one_hot(top_idx, st.n_expert, dtype=jnp.float32)
    mix = jnp.einsum("btke,btk->bte", onehot, gate_w).reshape(B * T, st.n_expert)
    y = jnp.zeros((B * T, E), jnp.float32)
    for e in range(st.n_expert):
        y = y + mix[:, e:e + 1] * expert_ffn(e).astype(jnp.float32)
    return y.reshape(B, T, E).astype(h.dtype)


def moe_ffn(h: jnp.ndarray, p: dict, st: MoEStatic) -> jnp.ndarray:
    """Routed expert FFN: h [B, T, E] → [B, T, E]."""
    if isinstance(p["w_gate_exps"], QuantExperts):
        return moe_ffn_quant(h, p, st)
    if st.ragged:
        return moe_ffn_ragged(h, p, st)
    act = _act(st.act_fn)
    router_logits = h @ p["router"]  # [B, T, n_expert]
    top_vals, top_idx = jax.lax.top_k(router_logits, st.n_expert_used)
    gate_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)  # renormalized over selected

    # dense one-hot mixture weights [B, T, n_expert]
    onehot = jax.nn.one_hot(top_idx, st.n_expert, dtype=jnp.float32)  # [B,T,k,Ne]
    mix = jnp.einsum("btke,btk->bte", onehot, gate_w)

    if st.tp_blocks and st.n_expert & (st.n_expert - 1) == 0:
        return _moe_ffn_tpb(h, p, st, mix)

    # all-expert computation (masked mixture); expert dim shards over tp/ep
    g = jnp.einsum("btd,edf->btef", h, p["w_gate_exps"])
    u = jnp.einsum("btd,edf->btef", h, p["w_up_exps"])
    expert_out = jnp.einsum("btef,efd->bted", act(g) * u, p["w_down_exps"])
    return jnp.einsum("bte,bted->btd", mix.astype(h.dtype), expert_out)


def _moe_ffn_tpb(h: jnp.ndarray, p: dict, st: MoEStatic,
                 mix: jnp.ndarray) -> jnp.ndarray:
    """Fixed-topology dense mixture (VERDICT r1 #1, MoE leg).

    Each expert's FFN is an UNROLLED chain of full-shape dots — a batched
    einsum's per-leaf arithmetic varies with the LOCAL batch count on some
    backends (measured on XLA CPU), which would break solo-vs-EP exactness.
    Contributions then combine through a balanced halving tree over the
    expert axis, so every engine performs identical additions. On a mesh the
    unrolled chain runs inside a shard_map: each device computes only its
    local experts (the EP memory/compute win is preserved) and only the
    [Ne, B, T, E] contributions travel."""
    from jax.sharding import PartitionSpec as P

    act = _act(st.act_fn)

    def unrolled(h_l, mix_l, wg, wu, wd):
        outs = []
        for e in range(wg.shape[0]):
            g = h_l @ wg[e]
            u = h_l @ wu[e]
            y = (act(g) * u) @ wd[e]                 # [B, T, E]
            outs.append(y * mix_l[..., e, None].astype(y.dtype))
        return jnp.stack(outs)                       # [Ne(_local), B, T, E]

    mesh = st.mesh
    tp_size = mesh.shape["tp"] if mesh is not None else 1
    if mesh is not None and tp_size > 1 and st.n_expert % tp_size == 0:
        parts = jax.shard_map(
            unrolled, mesh=mesh,
            in_specs=(P("dp", None, None), P("dp", None, "tp"),
                      P("tp"), P("tp"), P("tp")),
            out_specs=P("tp", "dp", None, None), check_vma=False,
        )(h, mix, p["w_gate_exps"], p["w_up_exps"], p["w_down_exps"])
    else:
        parts = unrolled(h, mix, p["w_gate_exps"], p["w_up_exps"],
                         p["w_down_exps"])
    while parts.shape[0] > 1:                        # balanced tree over Ne
        parts = parts[0::2] + parts[1::2]
    return parts[0].astype(h.dtype)


def forward(params, st: MoEStatic, tokens, positions, slots, cache: KVCache, logits_index):
    H, Hkv, D = st.n_head, st.n_head_kv, st.head_dim
    eps = st.rms_eps

    x = params["tok_emb"][tokens]

    # paged mode (scheduler pool, ops/paged_kv.py): flat-slot scatter writes
    # + gathered per-row attention views, mirroring models/llama.py
    from ..ops import paged_kv as pkv

    paged = isinstance(cache, pkv.PagedKVCache)
    if paged:
        pool_shape = cache.positions.shape  # [P, G]
        new_positions = cache.positions.reshape(-1).at[
            slots.reshape(-1)].set(positions.reshape(-1), mode="drop"
        ).reshape(pool_shape)
        view_slots = pkv.view_slot_map(cache.page_table, cache.page_size)
        mapped = jnp.repeat(cache.page_table >= 0, cache.page_size, axis=1)
        pos_view = jnp.where(mapped, new_positions.reshape(-1)[view_slots], -1)
    else:
        new_positions = jax.vmap(lambda p, s, q: p.at[s].set(q, mode="drop"))(
            cache.positions, slots, positions
        )

    tpb = st.tp_blocks
    from ..ops.kv_cache import dequantize_kv, quantize_kv
    from ..ops.pallas.quant_matmul import qmm_blocked, qmm_nblocked

    quant_kv = cache.k_scale is not None

    def layer_fn(x, scanned):
        # INT8 KV quantizes on write / dequantizes on read like
        # models/llama.py (round 4: the MoE forward previously scattered
        # bf16 values straight into an int8 cache — a silent value cast)
        if quant_kv:
            p, k_l, v_l, ks_l, vs_l = scanned
        else:
            (p, k_l, v_l), ks_l, vs_l = scanned, None, None
        B, T, E = x.shape
        h = rms_norm(x, p["attn_norm"], eps)
        # tp_blocks pins leaf shapes so head-sharded attention projections
        # and the K-sharded wo match solo bit-exactly (see models/llama.py)
        q = qmm_nblocked(h, p["wq"], tpb).reshape(B, T, H, D)
        k = qmm_nblocked(h, p["wk"], tpb).reshape(B, T, Hkv, D)
        v = qmm_nblocked(h, p["wv"], tpb).reshape(B, T, Hkv, D)
        q = apply_rope(q, positions, st.rope_dim, st.freq_base, True)
        if quant_kv:
            k_w, k_sc = quantize_kv(k)
            v_w, v_sc = quantize_kv(v)
        else:
            k_w, k_sc, v_w, v_sc = k, None, v, None
        if paged:
            flat = slots.reshape(-1)
            k_l = k_l.reshape((-1,) + k_l.shape[2:]).at[flat].set(
                k_w.reshape((-1, Hkv, D)), mode="drop").reshape(k_l.shape)
            v_l = v_l.reshape((-1,) + v_l.shape[2:]).at[flat].set(
                v_w.reshape((-1, Hkv, D)), mode="drop").reshape(v_l.shape)
            if quant_kv:
                ks_l = ks_l.reshape((-1, Hkv)).at[flat].set(
                    k_sc.reshape((-1, Hkv)), mode="drop").reshape(ks_l.shape)
                vs_l = vs_l.reshape((-1, Hkv)).at[flat].set(
                    v_sc.reshape((-1, Hkv)), mode="drop").reshape(vs_l.shape)
            k_use, v_use, ksv, vsv = pkv.gather_view(cache, k_l, v_l,
                                                     ks_l, vs_l)
            if ksv is not None:
                k_use = dequantize_kv(k_use, ksv, x.dtype)
                v_use = dequantize_kv(v_use, vsv, x.dtype)
            attn = attention(q, k_use, v_use, positions, pos_view,
                             rope_dim=st.rope_dim, freq_base=st.freq_base)
        else:
            write = jax.vmap(lambda c, s, n: c.at[s].set(n, mode="drop"))
            k_l = write(k_l, slots, k_w)
            v_l = write(v_l, slots, v_w)
            if quant_kv:
                ks_l = write(ks_l, slots, k_sc)
                vs_l = write(vs_l, slots, v_sc)
                k_use = dequantize_kv(k_l, ks_l, x.dtype)
                v_use = dequantize_kv(v_l, vs_l, x.dtype)
            else:
                k_use, v_use = k_l, v_l
            attn = attention(q, k_use, v_use, positions, new_positions,
                             rope_dim=st.rope_dim, freq_base=st.freq_base)
        x = x + qmm_blocked(attn.reshape(B, T, H * D), p["wo"], tpb)

        h2 = rms_norm(x, p["ffn_norm"], eps)
        x = x + moe_ffn(h2, p, st)
        return x, (k_l, v_l, ks_l, vs_l)

    ks_new, vs_new = cache.k_scale, cache.v_scale
    if isinstance(params["layers"], (list, tuple)):
        # unrolled layer loop (quantized modes): per-layer packed weights stay
        # separate arrays so the Pallas kernels read codes in place — no
        # scan-slice copies (see load_llama_params)
        k_all, v_all = cache.k, cache.v
        ks_all, vs_all = ks_new, vs_new
        for li_, p_ in enumerate(params["layers"]):
            sc = ((p_, k_all[li_], v_all[li_], ks_all[li_], vs_all[li_])
                  if quant_kv else (p_, k_all[li_], v_all[li_]))
            x, (k_l, v_l, ks_l, vs_l) = layer_fn(x, sc)
            k_all = k_all.at[li_].set(k_l)
            v_all = v_all.at[li_].set(v_l)
            if quant_kv:
                ks_all = ks_all.at[li_].set(ks_l)
                vs_all = vs_all.at[li_].set(vs_l)
        k_new, v_new = k_all, v_all
        ks_new, vs_new = ks_all, vs_all
    else:
        if quant_kv:
            x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
                layer_fn, x, (params["layers"], cache.k, cache.v,
                              cache.k_scale, cache.v_scale))
        else:
            x, (k_new, v_new, _, _) = jax.lax.scan(
                layer_fn, x, (params["layers"], cache.k, cache.v))

    last_h = jax.vmap(lambda xb, i: xb[i])(x, logits_index)
    last_h = rms_norm(last_h, params["out_norm"], eps)
    from ..ops.pallas.quant_matmul import QuantTensor

    if isinstance(params["output"], QuantTensor):
        # packed lm head (covers the A8S subclass too)
        logits = qmm_nblocked(last_h.astype(jnp.float32), params["output"],
                              tpb)
    elif tpb:
        logits = qmm_nblocked(last_h.astype(jnp.float32),
                              params["output"].astype(jnp.float32), tpb,
                              out_dtype=jnp.float32)
    else:
        logits = last_h.astype(jnp.float32) @ params["output"].astype(jnp.float32)
    logits = logits[:, : params["tok_emb"].shape[0]]
    if paged:
        new_cache = pkv.PagedKVCache(k_new, v_new, new_positions,
                                     cache.page_table, ks_new, vs_new)
    else:
        new_cache = KVCache(k_new, v_new, new_positions, ks_new, vs_new)
    return logits, new_cache


@partial(jax.jit, static_argnums=(0,), donate_argnums=(5,))
def _moe_step(st, params, tokens, positions, slots, cache, logits_index):
    return forward(params, st, tokens, positions, slots, cache, logits_index)


def make_step_fn(cfg: ModelConfig):
    st = MoEStatic.of(cfg)

    def step(params, tokens, positions, slots, cache, logits_index):
        return _moe_step(st, params, tokens, positions, slots, cache, logits_index)

    return step


def moe_param_specs() -> dict:
    """Sharding: experts over the tp axis (expert parallelism)."""
    from jax.sharding import PartitionSpec as P

    return {
        "tok_emb": P(None, None),
        "out_norm": P(None),
        "output": P(None, "tp"),
        "layers": {
            "attn_norm": P(None, None),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "ffn_norm": P(None, None),
            "router": P(None, None, None),
            "w_gate_exps": P(None, "tp", None, None),  # [L, Ne, E, F]
            "w_up_exps": P(None, "tp", None, None),
            "w_down_exps": P(None, "tp", None, None),
        },
    }
