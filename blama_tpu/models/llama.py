"""Llama-family transformer: GGUF weight loading + jittable forward pass.

TPU-native equivalent of llama.cpp's llama-arch compute graph (consumed by the
reference through llama_decode, SURVEY.md §2.2 "Compute-graph executor").
Covers llama/mistral/qwen2-style decoder-only models (RMSNorm, RoPE, GQA,
SwiGLU); MoE (mixtral) lives in models/moe.py; gpt2 in models/gpt2.py.

Structure: per-layer weights are stacked on a leading [n_layer, ...] axis and
the layer loop is a lax.scan — one traced layer body, fast compiles, and a
natural target for pipeline sharding of the layer axis.
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
from ..ops.kv_cache import KVCache, dequantize_kv, quantize_kv
from ..ops.norms import rms_norm
from ..ops.pallas.quant_matmul import (
    LoraWrapped, QuantEmbedding, QuantTensor, QuantTensorA8, QuantTensorK4,
    QuantTensorQ8,
    ShardedQuant, emb_lookup, qmm, qmm_blocked, qmm_nblocked,
)
from ..ops.rope import apply_rope, rope_angles
from .config import ModelConfig

import os as _os

# perf-bound probe: skip every KV-cache write in the stacked decode body
# (results are WRONG — measurement only, tools/trace_step companions)
_PROBE_NO_KVWRITE = _os.environ.get("BLAMA_PROBE_NO_KVWRITE", "0") == "1"


def _act(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------

_LAYER_TENSORS = {
    "attn_norm": "blk.{i}.attn_norm.weight",
    "wq": "blk.{i}.attn_q.weight",
    "wk": "blk.{i}.attn_k.weight",
    "wv": "blk.{i}.attn_v.weight",
    "wo": "blk.{i}.attn_output.weight",
    "ffn_norm": "blk.{i}.ffn_norm.weight",
    "w_gate": "blk.{i}.ffn_gate.weight",
    "w_up": "blk.{i}.ffn_up.weight",
    "w_down": "blk.{i}.ffn_down.weight",
}

_OPTIONAL_BIASES = {
    "bq": "blk.{i}.attn_q.bias",
    "bk": "blk.{i}.attn_k.bias",
    "bv": "blk.{i}.attn_v.bias",
}


def load_llama_params(
    reader: GGUFReader, cfg: ModelConfig, dtype=jnp.float32,
    fused_quant: bool | str = False, fuse_proj: bool = False,
) -> dict[str, Any]:
    """Load llama-family weights into a stacked pytree.

    Matmul weights are stored transposed to (n_in, n_out) so forward is
    `x @ w` (ggml keeps (n_out, n_in) rows; we transpose once at load).

    fused_quant=True keeps Q4_K tensors 4-bit packed (QuantTensor consumed by
    the Pallas fused dequant-matmul) instead of dequantizing to `dtype` —
    ~2.7× less HBM traffic on the decode path.
    """
    from ..gguf.constants import GGMLType

    def get_t(name: str):
        if fused_quant and reader.tensors[name].ggml_type in (
                GGMLType.Q8_0, GGMLType.Q6_K):
            # Q8_0/Q6_K pack under EVERY fused mode (one engine each: the
            # exact int8-code kernel; no numerics variants). Mixed-type
            # GGUFs — e.g. a Q4_K_M file whose head is Q6_K — stream every
            # supported tensor packed instead of dequantizing the odd ones.
            from ..ops.pallas.quant_matmul import (
                repack_q6_k_expanded, repack_q8_0_for_tpu)

            info = reader.tensors[name]
            repack = (repack_q8_0_for_tpu
                      if info.ggml_type == GGMLType.Q8_0
                      else repack_q6_k_expanded)
            return repack(reader.tensor_bytes(name), info.ne[1], info.ne[0])
        if fused_quant and reader.tensors[name].ggml_type == GGMLType.Q4_K:
            from ..ops.pallas.quant_matmul import (
                repack_q4k_a8k4, repack_q4k_a8s, repack_q4k_for_tpu,
                repack_q4k_native, repack_q4k_w4a8,
            )

            info = reader.tensors[name]
            n_rows, row_len = info.ne[1], info.ne[0]
            # default fused path: expanded f32-scale layout (6 b/w) — the
            # decode loop is VPU-bound, so the smaller 4.5 b/w native layout
            # ("k4") measured SLOWER end-to-end (73 vs 87 tok/s at 8B: its
            # in-kernel 6-bit scale decode adds VPU work); it remains the
            # memory-tight option. "a8" = int8-MXU W4A8.
            repack = {"a8": repack_q4k_a8s,      # SWAR int8-MXU, 5 b/w
                      "a8k4": repack_q4k_a8k4,    # SWAR + native layout, 4.5 b/w
                      "a8x": repack_q4k_w4a8,     # pure-XLA W4A8 (9 b/w)
                      "k4": repack_q4k_native}.get(fused_quant, repack_q4k_for_tpu)
            return repack(reader.tensor_bytes(name), n_rows, row_len)
        return reader.tensor_float(name).T.copy()  # (n_in, n_out)

    def get_v(name: str) -> np.ndarray:
        return reader.tensor_float(name)

    layers: dict[str, list[np.ndarray]] = {k: [] for k in _LAYER_TENSORS}
    has_bias = all(
        _OPTIONAL_BIASES["bq"].format(i=i) in reader.tensors for i in range(cfg.n_layer)
    ) and cfg.n_layer > 0
    if has_bias:
        for k in _OPTIONAL_BIASES:
            layers[k] = []

    fused_qkv = "blk.0.attn_qkv.weight" in reader.tensors and cfg.n_layer > 0
    fused_gate_up = (
        "blk.0.ffn_gate.weight" not in reader.tensors
        and "blk.0.ffn_up.weight" in reader.tensors and cfg.n_layer > 0
    )
    for i in range(cfg.n_layer):
        for key, pat in _LAYER_TENSORS.items():
            name = pat.format(i=i)
            if key in ("attn_norm", "ffn_norm"):
                layers[key].append(get_v(name))
            elif fused_qkv and key in ("wq", "wk", "wv"):
                if key == "wq":  # split the fused [E, (H+2Hkv)·D] projection
                    qkv = reader.tensor_float(f"blk.{i}.attn_qkv.weight").T
                    hd = cfg.n_head * cfg.head_dim_
                    kvd = cfg.n_head_kv * cfg.head_dim_
                    layers["wq"].append(qkv[:, :hd].copy())
                    layers["wk"].append(qkv[:, hd: hd + kvd].copy())
                    layers["wv"].append(qkv[:, hd + kvd: hd + 2 * kvd].copy())
            elif fused_gate_up and key in ("w_gate", "w_up"):
                if key == "w_gate":  # phi3: ffn_up holds [gate; up] stacked
                    gu = reader.tensor_float(f"blk.{i}.ffn_up.weight").T
                    f_half = gu.shape[1] // 2
                    layers["w_gate"].append(gu[:, :f_half].copy())
                    layers["w_up"].append(gu[:, f_half:].copy())
            else:
                layers[key].append(get_t(name))
        if has_bias:
            for key, pat in _OPTIONAL_BIASES.items():
                layers[key].append(get_v(pat.format(i=i)))

    # Quantized modes keep per-layer weights as SEPARATE arrays and the layer
    # loop unrolled: a lax.scan over stacked codes forces XLA to copy each
    # layer's packed bytes before the Pallas call (custom-call operands can't
    # alias a dynamic slice), costing ~25% of decode HBM traffic (measured
    # 0.198 → 0.142 ms on the 8B FFN tile). Dense modes keep the stacked
    # scan: dynamic-slice fuses into plain dots for free and one traced body
    # compiles much faster.
    any_quant = any(
        isinstance(v, (QuantTensor, QuantTensorA8, QuantTensorK4,
                       QuantTensorQ8))
        for vs in layers.values() for v in vs
    )

    def stack(vs):
        return np.stack(vs)

    if any_quant:
        layer_list = [
            {k: layers[k][i] for k in layers} for i in range(cfg.n_layer)
        ]
        if fuse_proj:
            # fuse qkv and gate+up into single wide kernel dispatches (3
            # fewer pallas calls per layer; the narrow wk/wv tiles also gain
            # streaming efficiency). Plain unsharded serving only — the
            # tp_blocks verification modes keep the unfused layout so a solo
            # verifier matches a sharded prover's arithmetic exactly.
            from ..ops.pallas.quant_matmul import concat_quant

            def _fusable(ps):
                return (len({type(w) for w in ps}) == 1
                        and isinstance(ps[0], (QuantTensor, QuantTensorA8,
                                               QuantTensorK4, QuantTensorQ8))
                        and all(jax.tree_util.tree_leaves(w)[0].shape[1]
                                == w.n_out for w in ps))

            for p in layer_list:
                if fuse_proj == "kv":
                    # fuse ONLY k+v: the two narrow (E x Hkv*D) projections
                    # are dispatch-ramp-bound (2.6 MB of packed bytes each
                    # at 8B vs ~5 us kernel ramp); the full qkv fuse loses
                    # to the wide operand's VMEM staging stalls (round-5)
                    if _fusable([p["wk"], p["wv"]]):
                        p["wkv"] = concat_quant([p.pop("wk"), p.pop("wv")])
                    continue
                if _fusable([p["wq"], p["wk"], p["wv"]]):
                    p["wqkv"] = concat_quant(
                        [p.pop("wq"), p.pop("wk"), p.pop("wv")])
                if "w_gate" in p and _fusable([p["w_gate"], p["w_up"]]):
                    p["wgu"] = concat_quant([p.pop("w_gate"), p.pop("w_up")])
        # keep the embedding table packed too (dequant-on-gather): pure HBM
        # capacity win — the gather reads only B·T rows per step
        emb_info = reader.tensors["token_embd.weight"]
        if emb_info.ggml_type == GGMLType.Q4_K:
            from ..ops.pallas.quant_matmul import repack_q4k_embedding

            tok_emb = repack_q4k_embedding(
                reader.tensor_bytes("token_embd.weight"),
                emb_info.ne[1], emb_info.ne[0])
        else:
            tok_emb = get_v("token_embd.weight")
        params = {
            "tok_emb": tok_emb,  # (V, E)
            "out_norm": get_v("output_norm.weight"),
            "layers": layer_list,
        }
    else:
        params = {
            "tok_emb": get_v("token_embd.weight"),  # (V, E)
            "out_norm": get_v("output_norm.weight"),
            "layers": {k: stack(v) for k, v in layers.items()},
        }
    if "output.weight" in reader.tensors:
        params["output"] = get_t("output.weight")  # (E, V)
    elif isinstance(params["tok_emb"], QuantEmbedding):
        # tied embeddings, packed table: the lm head reads the same GGUF
        # bytes through the fused-matmul repack ((n_in=E, n_out=V) semantics)
        params["output"] = get_t("token_embd.weight")
    else:  # tied embeddings
        params["output"] = params["tok_emb"].T.copy()
    if "rope_freqs.weight" in reader.tensors:
        # llama-3.1 long-rope frequency factors [rope_dim/2]
        params["rope_freqs"] = get_v("rope_freqs.weight")

    # pad the vocab dim of the output head to a multiple of 128: TPU-friendly
    # lane tiling AND exact divisibility for vocab-sharded tensor parallelism.
    # forward() slices logits back to the true vocab size. (QuantTensors pad
    # internally at repack time.)
    if not isinstance(params["output"], (QuantTensor, QuantTensorA8,
                                         QuantTensorK4, QuantTensorQ8)):
        v = params["output"].shape[1]
        v_pad = -(-v // 128) * 128
        if v_pad != v:
            params["output"] = np.pad(params["output"], ((0, 0), (0, v_pad - v)))

    _packed = (QuantTensor, QuantTensorA8, QuantTensorK4, QuantTensorQ8,
               QuantEmbedding)

    def conv(a):
        return a if isinstance(a, _packed) else jnp.asarray(a, dtype)

    out = jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, _packed)
    )
    if any_quant:
        # norm weights stay f32 in the unrolled engines (ROUNDED through
        # `dtype` first, so values match the bf16 storage bit-for-bit):
        # rms_norm upcasts its weight every call, and XLA SINKS that convert
        # (+ a scoped-memory copy) into the decode while-loop instead of
        # hoisting it — ~0.8 ms/step of f32[E] copy stalls at 8B (device
        # trace round 4). Storing the upcast removes the per-step op.
        for p in out["layers"]:
            for k in ("attn_norm", "ffn_norm"):
                p[k] = p[k].astype(jnp.float32)
        out["out_norm"] = out["out_norm"].astype(jnp.float32)
        # ... and ALSO stacked into ONE [2L, E] parameter: the fused-attn
        # decode loop reads norms as static slices of a single loop input
        # instead of 64 tiny parameters, each of which XLA scope-prefetched
        # with ~61 us stalls behind the weight DMA queue (same bits — the
        # per-dict copies remain for the prefill/step paths)
        out["norm_stack"] = jnp.stack(
            [p[k] for p in out["layers"] for k in ("attn_norm", "ffn_norm")])
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LlamaStatic:
    """Hashable static subset of ModelConfig used by the jitted step, so all
    Instances of equal architecture share one XLA compilation cache entry."""

    n_head: int
    n_head_kv: int
    head_dim: int
    rope_dim: int
    freq_base: float
    rms_eps: float
    act_fn: str
    causal: bool
    emb_scale: float = 1.0
    norm_plus_one: bool = False
    rope_scale: float = 1.0   # 1/factor for linear/yarn rope scaling
    # fixed-topology contraction blocks for the tp-sharded matmuls (wo,
    # w_down); bit-exact logits at any tp | tp_blocks. 0 = plain contraction.
    tp_blocks: int = 0
    # YaRN NTK-by-parts (None unless rope.scaling.type == "yarn"):
    # (ext_factor, attn_factor, beta_fast, beta_slow, orig_ctx)
    yarn: tuple | None = None
    # Pallas fused decode attention (single-pass flash over the KV cache with
    # in-kernel rope + INT8 dequant) for T==1 steps; prefill stays XLA.
    attn_fused: bool = False
    # fold the KV quantize + cache-row write INTO the fused decode kernel
    # (aliased outputs; scales carried transposed [L, B, Hkv, S] across the
    # loop). Set by the fast loops (ops/generate_loop) for the dense stacked
    # unsharded path — the XLA write path spends ~0.45 ms/step at 8B in
    # dynamic-update-slices + quantize fusions + scale transposes (round-5
    # no-write probe: 126.7 -> 134.4 tok/s ceiling).
    attn_write: bool = False
    # INT8-KV scales carried stacked TRANSPOSED [L, B, Hkv, S] across the
    # fast loops (ops/generate_loop pre-transposes once at the loop
    # boundary): the fused decode kernel indexes the layer's scale block in
    # place instead of paying 2 slices + 2 swapaxes per layer per step
    # (round-5 trace glue). XLA-write mode only (mutually exclusive with
    # attn_write, which carries the same layout but writes in-kernel).
    attn_scales_t: bool = False
    # fresh-operand attention (INT8 KV, stacked unsharded): the fused decode
    # kernel takes the just-projected K/V row as an operand and patches it
    # in at the row's slot (exact quantize_kv numerics), so the XLA cache
    # writes drop off the critical path — nothing in the step depends on
    # them. Set by the fast loops with attn_scales_t (transposed scale
    # carry). No aliased outputs, unlike attn_write.
    attn_fresh: bool = False
    # device mesh (hashable) — enables the per-head shard_map island around
    # the fused decode kernel (decode_attention_sharded)
    mesh: object = None

    @classmethod
    def of(cls, cfg: ModelConfig) -> "LlamaStatic":
        rope_scale = 1.0
        yarn = None
        if cfg.rope_scaling_type in ("linear", "yarn") and cfg.rope_scale_factor:
            rope_scale = 1.0 / cfg.rope_scale_factor
        if cfg.rope_scaling_type == "yarn":
            # ggml defaults: ext_factor=1 for yarn models, beta_fast=32,
            # beta_slow=1, orig ctx from metadata (fallback train ctx)
            yarn = (1.0, cfg.rope_attn_factor, 32.0, 1.0,
                    cfg.rope_orig_ctx or cfg.n_ctx_train)
        return cls(
            cfg.n_head, cfg.n_head_kv, cfg.head_dim_, cfg.rope_dim_,
            cfg.rope_freq_base, cfg.rms_norm_eps, cfg.act_fn, cfg.causal,
            cfg.emb_scale, cfg.norm_plus_one, rope_scale,
            tp_blocks=getattr(cfg, "tp_blocks", 0), yarn=yarn,
            attn_fused=getattr(cfg, "attn_fused", False),
            mesh=getattr(cfg, "mesh", None),
        )


def forward(
    params: dict[str, Any],
    cfg: ModelConfig | LlamaStatic,
    tokens: jnp.ndarray,     # [B, T] int32 (padded)
    positions: jnp.ndarray,  # [B, T] int32 position of each token
    slots: jnp.ndarray,      # [B, T] int32 cache slot per token; >= n_slots → dropped (pad)
    cache: KVCache,
    logits_index: jnp.ndarray | None = None,  # [B] index into T of the logit token
    return_hidden: bool = False,
    all_positions: bool = False,  # logits for every position (perplexity path)
) -> tuple[jnp.ndarray, KVCache]:
    """One decode/prefill step. Returns (logits [B, V] f32, updated cache).

    Deterministic by construction: static shapes, fixed reduction orders, and
    slot-scatter writes — replaying the same token stream yields bit-identical
    logits (verification contract, SURVEY.md §3.3).
    """
    H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    rope_dim, freq_base = cfg.rope_dim, cfg.freq_base
    interleaved = True  # ggml NORM rope for llama family

    x = emb_lookup(params["tok_emb"], tokens)  # [B, T, E]
    if cfg.emb_scale != 1.0:
        x = x * jnp.asarray(cfg.emb_scale, x.dtype)  # gemma input scaling

    # paged mode (scheduler pool, ops/paged_kv.py): `slots` are FLAT pool
    # indices, K/V/position writes are single scatters into the shared pool,
    # reads go through the row's page table. Decided at trace time by the
    # cache's Python type, so dense callers compile exactly as before.
    from ..ops import paged_kv as pkv

    paged = isinstance(cache, pkv.PagedKVCache)
    if paged:
        pool_shape = cache.positions.shape  # [P, G]
        new_positions = cache.positions.reshape(-1).at[
            slots.reshape(-1)].set(positions.reshape(-1), mode="drop"
        ).reshape(pool_shape)
        # per-row logical view of the updated position map (for masks/rope)
        view_slots = pkv.view_slot_map(cache.page_table, cache.page_size)
        mapped = jnp.repeat(cache.page_table >= 0, cache.page_size, axis=1)
        pos_view = jnp.where(mapped, new_positions.reshape(-1)[view_slots], -1)
    else:
        new_positions = jax.vmap(
            lambda p, s, q: p.at[s].set(q, mode="drop")
        )(cache.positions, slots, positions)

    act = _act(cfg.act_fn)
    eps = cfg.rms_eps

    def norm(h, w):
        # gemma applies RMSNorm weight as (1 + w)
        return rms_norm(h, w + 1.0 if cfg.norm_plus_one else w, eps)

    # hoist RoPE trig out of the layer scan (computed once, reused L times)
    rs = getattr(cfg, "rope_scale", 1.0)
    yarn = getattr(cfg, "yarn", None)
    ff = params.get("rope_freqs")  # llama-3.1 per-dim frequency divisors
    q_rope = rope_angles(positions, rope_dim, freq_base, rs,
                         yarn=yarn, freq_factors=ff)

    # T==1 decode steps take the fused flash-attention kernel when enabled:
    # one pass over the stored (possibly int8) cache with in-kernel rope —
    # no rotated/dequantized cache copies (ops/pallas/decode_attention.py).
    from ..ops.pallas import decode_attention as dattn

    _mesh = getattr(cfg, "mesh", None)
    _fused_ok = (
        getattr(cfg, "attn_fused", False)
        and interleaved
        and cfg.causal
        # folding the YaRN magnitude scale into the score scale is only exact
        # when every head dim is rotated
        and not (yarn is not None and rope_dim < D)
    )
    if _fused_ok and _mesh is not None:
        # sharded fused decode: per-head shard_map island
        # (decode_attention_sharded). Needs whole kv-head slices per device
        # and whole batch rows per dp shard; T>1 prefill stays on the XLA
        # chain under a mesh.
        _tp, _dp = _mesh.shape["tp"], _mesh.shape["dp"]
        _fused_ok = (Hkv % _tp == 0 and H % _tp == 0
                     and tokens.shape[0] % _dp == 0)
    from ..ops.pallas import paged_attention as pattn

    if paged:
        use_fused_attn = (
            _fused_ok
            and tokens.shape[1] == 1
            and pattn.supports(cache.page_size, D, cache.k.dtype)
        )
        use_fused_prefill = (
            _fused_ok
            and pattn.prefill_supports(tokens.shape[1], cache.page_size, D,
                                       cache.k.dtype)
        )
    else:
        _b_local = tokens.shape[0] // (_mesh.shape["dp"] if _mesh is not None else 1)
        use_fused_attn = (
            _fused_ok
            and tokens.shape[1] == 1
            and dattn.supports(cache.n_slots, D, cache.k.dtype, _b_local)
        )
        # T > 1 chunks (prompt prefill) take the fused flash-prefill kernel:
        # one streaming pass of the stored cache per chunk instead of the XLA
        # chain's rotated/dequantized materializations
        # (ops/pallas/decode_attention.py, prefill section)
        use_fused_prefill = (
            _fused_ok
            and _mesh is None
            and dattn.prefill_supports(tokens.shape[1], cache.n_slots, D,
                                       cache.k.dtype, tokens.shape[0])
        )
    # in-kernel KV write (ops/generate_loop flips st.attn_write when it
    # pre-merged the cache AND pre-transposed the scales for this mode)
    use_fused_write = (
        use_fused_attn and not paged and _mesh is None
        and getattr(cfg, "attn_write", False)
        and dattn.write_supports(cache.n_slots, D, cache.k.dtype,
                                 tokens.shape[0])
    )
    if use_fused_attn or use_fused_prefill:
        inv_freq_e, rope_mscale = dattn.effective_inv_freq(
            rope_dim, D, freq_base, rs, yarn=yarn, freq_factors=ff)
        kv_rope = None
    else:
        kv_pos_for_rope = pos_view if paged else new_positions
        kv_rope = rope_angles(jnp.maximum(kv_pos_for_rope, 0), rope_dim,
                              freq_base, rs, yarn=yarn, freq_factors=ff)

    def layer_fn(x, scanned):
        p, k_l, v_l, ks_l, vs_l = scanned  # k_l/v_l: [B, S, Hkv, D]
        B, T, E = x.shape

        # tp_blocks mode pins every matmul's per-device leaf shape so logits
        # are bit-identical at any sharding (cross-sharding verification,
        # SURVEY.md §2.3): output-sharded projections get fixed-width column
        # blocks, contraction-sharded ones a fixed K-block add tree.
        tpb = getattr(cfg, "tp_blocks", 0)
        h = norm(x, p["attn_norm"])
        if "wqkv" in p:
            # fused projection: one wide kernel dispatch, split after
            qkv = qmm_nblocked(h, p["wqkv"], tpb)
            q, k, v = jnp.split(qkv, [H * D, H * D + Hkv * D], axis=-1)
        elif "wkv" in p:
            # k+v fused only (the two ramp-bound narrow dispatches)
            q = qmm_nblocked(h, p["wq"], tpb)
            k, v = jnp.split(qmm_nblocked(h, p["wkv"], tpb), 2, axis=-1)
        else:
            q = qmm_nblocked(h, p["wq"], tpb)
            k = qmm_nblocked(h, p["wk"], tpb)
            v = qmm_nblocked(h, p["wv"], tpb)
        if "bq" in p:
            q = q + p["bq"]
            k = k + p["bk"]
            v = v + p["bv"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)

        q = apply_rope(q, positions, rope_dim, freq_base, interleaved, cos_sin=q_rope)

        # write unrotated K and V into cache slots (pad slots are dropped)
        if paged:
            # pool scatter at flat slot indices (unique; pads dropped)
            flat = slots.reshape(-1)

            def write(c, n):
                shp = c.shape  # [P, G, ...] -> flat [P*G, ...]
                return c.reshape((-1,) + shp[2:]).at[flat].set(
                    n.reshape((-1,) + n.shape[2:]), mode="drop").reshape(shp)
        else:
            _vwrite = jax.vmap(lambda c, s, n: c.at[s].set(n, mode="drop"))

            def write(c, n):
                return _vwrite(c, slots, n)
        if ks_l is not None:
            # INT8 KV: per-(token, head) max-abs quantization on write,
            # dequant on read (deterministic; BASELINE.json north star)
            k_codes, k_sc = quantize_kv(k)
            v_codes, v_sc = quantize_kv(v)
            k_l = write(k_l, k_codes)
            v_l = write(v_l, v_codes)
            ks_l = write(ks_l, k_sc)
            vs_l = write(vs_l, v_sc)
        else:
            k_l = write(k_l, k)
            v_l = write(v_l, v)

        if paged:
            if use_fused_attn:
                if _mesh is not None:
                    attn = pattn.paged_decode_attention_sharded(
                        _mesh, q, k_l, v_l, new_positions, cache.page_table,
                        positions[:, 0], inv_freq_e,
                        k_scale=ks_l, v_scale=vs_l, mscale=rope_mscale,
                    )
                else:
                    attn = pattn.paged_decode_attention(
                        q, k_l, v_l, new_positions, cache.page_table,
                        positions[:, 0], inv_freq_e,
                        k_scale=ks_l, v_scale=vs_l, mscale=rope_mscale,
                    )
            elif use_fused_prefill:
                if _mesh is not None:
                    attn = pattn.paged_prefill_attention_sharded(
                        _mesh, q, k_l, v_l, new_positions, cache.page_table,
                        positions, inv_freq_e,
                        k_scale=ks_l, v_scale=vs_l, mscale=rope_mscale,
                    )
                else:
                    attn = pattn.paged_prefill_attention(
                        q, k_l, v_l, new_positions, cache.page_table,
                        positions, inv_freq_e,
                        k_scale=ks_l, v_scale=vs_l, mscale=rope_mscale,
                    )
            else:
                # XLA fallback: gather the logical row view (bit-identical to
                # a dense row; see ops/paged_kv.py) and run the dense chain
                kv, vv, ksv, vsv = pkv.gather_view(
                    cache, k_l, v_l, ks_l, vs_l)
                if ksv is not None:
                    k_use = dequantize_kv(kv, ksv, x.dtype)
                    v_use = dequantize_kv(vv, vsv, x.dtype)
                else:
                    k_use, v_use = kv, vv
                attn = attention(
                    q, k_use, v_use, positions, pos_view,
                    rope_dim=rope_dim, freq_base=freq_base,
                    interleaved=interleaved, causal=cfg.causal, kv_rope=kv_rope,
                )
        elif use_fused_attn:
            if _mesh is not None:
                attn = dattn.decode_attention_sharded(
                    _mesh, q, k_l, v_l, positions[:, 0], new_positions,
                    inv_freq_e, k_scale=ks_l, v_scale=vs_l,
                    mscale=rope_mscale,
                )
            else:
                attn = dattn.decode_attention(
                    q, k_l, v_l, positions[:, 0], new_positions, inv_freq_e,
                    k_scale=ks_l, v_scale=vs_l, mscale=rope_mscale,
                )
        elif use_fused_prefill:
            attn = dattn.prefill_attention(
                q, k_l, v_l, positions, new_positions, inv_freq_e,
                k_scale=ks_l, v_scale=vs_l, mscale=rope_mscale,
            )
        else:
            if ks_l is not None:
                k_use = dequantize_kv(k_l, ks_l, x.dtype)
                v_use = dequantize_kv(v_l, vs_l, x.dtype)
            else:
                k_use, v_use = k_l, v_l
            attn = attention(
                q, k_use, v_use, positions, new_positions,
                rope_dim=rope_dim, freq_base=freq_base,
                interleaved=interleaved, causal=cfg.causal, kv_rope=kv_rope,
            )
        x = x + qmm_blocked(attn.reshape(B, T, H * D), p["wo"], tpb)

        h2 = norm(x, p["ffn_norm"])
        if "wgu" in p:
            gu = qmm_nblocked(h2, p["wgu"], tpb)
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + qmm_blocked(act(gate) * up, p["w_down"], tpb)
        else:
            gate = act(qmm_nblocked(h2, p["w_gate"], tpb))
            x = x + qmm_blocked(gate * qmm_nblocked(h2, p["w_up"], tpb), p["w_down"], tpb)
        if "cvec" in p:
            # control-vector steering: per-layer residual bias
            # (llama_apply_adapter_cvec analog, Instance.cpp:73-84)
            x = x + p["cvec"]
        return x, (k_l, v_l, ks_l, vs_l)

    def layer_fn_stacked(x, p, li, k_all, v_all, ks_all, vs_all, barange,
                         norm_stack=None):
        """T==1 fused-attention decode body on the STACKED cache (dense
        rows): token writes are direct scatters into [L, B, S, ...] and the
        attention kernel reads its layer in place — the per-layer slice +
        set-back pattern costs ~0.5 ms/step in pure copies at 8B/S=2048
        because a pallas operand can't alias an XLA slice (BENCH_LOCAL
        round 3). Arithmetic mirrors layer_fn exactly (same kernels, same
        values per block) so logits are bit-identical to the sliced path."""
        B, T, E = x.shape
        tpb = getattr(cfg, "tp_blocks", 0)
        attn_nw = (norm_stack[2 * li] if norm_stack is not None
                   else p["attn_norm"])
        h = norm(x, attn_nw)
        if "wqkv" in p:
            qkv = qmm_nblocked(h, p["wqkv"], tpb)
            q, k, v = jnp.split(qkv, [H * D, H * D + Hkv * D], axis=-1)
        elif "wkv" in p:
            q = qmm_nblocked(h, p["wq"], tpb)
            k, v = jnp.split(qmm_nblocked(h, p["wkv"], tpb), 2, axis=-1)
        else:
            q = qmm_nblocked(h, p["wq"], tpb)
            k = qmm_nblocked(h, p["wk"], tpb)
            v = qmm_nblocked(h, p["wv"], tpb)
        if "bq" in p:
            q = q + p["bq"]
            k = k + p["bk"]
            v = v + p["bv"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        q = apply_rope(q, positions, rope_dim, freq_base, interleaved,
                       cos_sin=q_rope)
        if use_fused_write:
            # quantize + cache-row write + this step's attention in ONE
            # kernel (aliased outputs; scales carried [L, B, Hkv, S]) —
            # value-identical to the XLA write-then-read path below
            attn, k_all, v_all, ks_all, vs_all = \
                dattn.decode_attention_write(
                    q, k_all, v_all, positions[:, 0], new_positions,
                    inv_freq_e, k.reshape(B, Hkv * D), v.reshape(B, Hkv * D),
                    slots.reshape(-1), li, k_scale=ks_all, v_scale=vs_all,
                    mscale=rope_mscale)
            x = x + qmm_blocked(attn.reshape(B, T, H * D), p["wo"], tpb)
            ffn_nw = (norm_stack[2 * li + 1] if norm_stack is not None
                      else p["ffn_norm"])
            h2 = norm(x, ffn_nw)
            if "wgu" in p:
                gu = qmm_nblocked(h2, p["wgu"], tpb)
                gate, up = jnp.split(gu, 2, axis=-1)
                x = x + qmm_blocked(act(gate) * up, p["w_down"], tpb)
            else:
                gate = act(qmm_nblocked(h2, p["w_gate"], tpb))
                x = x + qmm_blocked(gate * qmm_nblocked(h2, p["w_up"], tpb),
                                    p["w_down"], tpb)
            if "cvec" in p:
                x = x + p["cvec"]
            return x, k_all, v_all, ks_all, vs_all
        scales_t = getattr(cfg, "attn_scales_t", False)
        fresh = getattr(cfg, "attn_fresh", False) and ks_all is not None \
            and _mesh is None
        # fresh mode: attention reads the PRE-write cache + the fresh row as
        # a kernel operand, so the writes below leave the critical path
        k_pre, v_pre, ks_pre, vs_pre = k_all, v_all, ks_all, vs_all
        if _PROBE_NO_KVWRITE:
            pass  # perf bound probe: skip all cache writes (WRONG results)
        elif ks_all is not None:
            k_codes, k_sc = quantize_kv(k)
            v_codes, v_sc = quantize_kv(v)
            if fresh:
                # grouped carry [L, B, S/32, 32, Hkv*D]: pad slots (>= S)
                # drop on the out-of-range group index
                k_all = k_all.at[li, barange, slots // 32, slots % 32].set(
                    k_codes.reshape(B, T, Hkv * D), mode="drop")
                v_all = v_all.at[li, barange, slots // 32, slots % 32].set(
                    v_codes.reshape(B, T, Hkv * D), mode="drop")
            else:
                k_all = k_all.at[li, barange, slots].set(
                    k_codes.reshape(B, T, Hkv * D), mode="drop")
                v_all = v_all.at[li, barange, slots].set(
                    v_codes.reshape(B, T, Hkv * D), mode="drop")
            if scales_t:
                # transposed carry [L, B, Hkv, S]: advanced indices split by
                # the head slice put the broadcast (b, t) dims first, so the
                # update value is k_sc's own [B, T, Hkv] layout
                ks_all = ks_all.at[li, barange, :, slots].set(
                    k_sc, mode="drop")
                vs_all = vs_all.at[li, barange, :, slots].set(
                    v_sc, mode="drop")
            else:
                ks_all = ks_all.at[li, barange, slots].set(k_sc, mode="drop")
                vs_all = vs_all.at[li, barange, slots].set(v_sc, mode="drop")
        else:
            k_all = k_all.at[li, barange, slots].set(
                k.reshape(B, T, Hkv * D), mode="drop")
            v_all = v_all.at[li, barange, slots].set(
                v.reshape(B, T, Hkv * D), mode="drop")
        if fresh:
            attn = dattn.decode_attention(
                q, k_pre, v_pre, positions[:, 0], new_positions, inv_freq_e,
                k_scale=ks_pre, v_scale=vs_pre, mscale=rope_mscale, layer=li,
                scales_t=scales_t, k_new=k.reshape(B, Hkv * D),
                v_new=v.reshape(B, Hkv * D), slot=slots.reshape(-1))
        elif _mesh is not None:
            attn = dattn.decode_attention_sharded(
                _mesh, q, k_all, v_all, positions[:, 0], new_positions,
                inv_freq_e, k_scale=ks_all, v_scale=vs_all,
                mscale=rope_mscale, layer=li)
        else:
            attn = dattn.decode_attention(
                q, k_all, v_all, positions[:, 0], new_positions, inv_freq_e,
                k_scale=ks_all, v_scale=vs_all, mscale=rope_mscale, layer=li,
                scales_t=scales_t)
        x = x + qmm_blocked(attn.reshape(B, T, H * D), p["wo"], tpb)
        ffn_nw = (norm_stack[2 * li + 1] if norm_stack is not None
                  else p["ffn_norm"])
        h2 = norm(x, ffn_nw)
        if "wgu" in p:
            gu = qmm_nblocked(h2, p["wgu"], tpb)
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + qmm_blocked(act(gate) * up, p["w_down"], tpb)
        else:
            gate = act(qmm_nblocked(h2, p["w_gate"], tpb))
            x = x + qmm_blocked(gate * qmm_nblocked(h2, p["w_up"], tpb),
                                p["w_down"], tpb)
        if "cvec" in p:
            x = x + p["cvec"]
        return x, k_all, v_all, ks_all, vs_all

    def layer_fn_paged_stacked(x, p, li, k_all, v_all, ks_t, vs_t, flat):
        """T==1 fused paged-attention decode body on the STACKED MERGED pool
        ([L, P, G, Hkv*D]; scales transposed [L, P, Hkv, G]): token writes
        are direct scatters into the stacked arrays and the paged kernel
        reads its layer in place — the per-layer slice + set-back pattern
        the sliced loop pays (2 pool copies per layer per step) is the bulk
        of the paged-vs-dense serving gap (VERDICT r4 #7). Arithmetic
        mirrors layer_fn exactly (same kernels, same per-page block order),
        so logits are bit-identical to the sliced paged path."""
        B, T, E = x.shape
        tpb = getattr(cfg, "tp_blocks", 0)
        G = k_all.shape[2]
        h = norm(x, p["attn_norm"])
        if "wqkv" in p:
            qkv = qmm_nblocked(h, p["wqkv"], tpb)
            q, k, v = jnp.split(qkv, [H * D, H * D + Hkv * D], axis=-1)
        elif "wkv" in p:
            q = qmm_nblocked(h, p["wq"], tpb)
            k, v = jnp.split(qmm_nblocked(h, p["wkv"], tpb), 2, axis=-1)
        else:
            q = qmm_nblocked(h, p["wq"], tpb)
            k = qmm_nblocked(h, p["wk"], tpb)
            v = qmm_nblocked(h, p["wv"], tpb)
        if "bq" in p:
            q = q + p["bq"]
            k = k + p["bk"]
            v = v + p["bv"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        q = apply_rope(q, positions, rope_dim, freq_base, interleaved,
                       cos_sin=q_rope)
        pg, gi = flat // G, flat % G                    # [B] page / in-page
        if ks_t is not None:
            k_codes, k_sc = quantize_kv(k)
            v_codes, v_sc = quantize_kv(v)
            k_all = k_all.at[li, pg, gi].set(
                k_codes.reshape(B, Hkv * D), mode="drop")
            v_all = v_all.at[li, pg, gi].set(
                v_codes.reshape(B, Hkv * D), mode="drop")
            ks_t = ks_t.at[li, pg, :, gi].set(k_sc.reshape(B, Hkv),
                                              mode="drop")
            vs_t = vs_t.at[li, pg, :, gi].set(v_sc.reshape(B, Hkv),
                                              mode="drop")
        else:
            k_all = k_all.at[li, pg, gi].set(
                k.reshape(B, Hkv * D), mode="drop")
            v_all = v_all.at[li, pg, gi].set(
                v.reshape(B, Hkv * D), mode="drop")
        attn = pattn.paged_decode_attention(
            q, k_all, v_all, new_positions, cache.page_table,
            positions[:, 0], inv_freq_e,
            k_scale=ks_t, v_scale=vs_t, mscale=rope_mscale, layer=li)
        x = x + qmm_blocked(attn.reshape(B, T, H * D), p["wo"], tpb)
        h2 = norm(x, p["ffn_norm"])
        if "wgu" in p:
            gu = qmm_nblocked(h2, p["wgu"], tpb)
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + qmm_blocked(act(gate) * up, p["w_down"], tpb)
        else:
            gate = act(qmm_nblocked(h2, p["w_gate"], tpb))
            x = x + qmm_blocked(gate * qmm_nblocked(h2, p["w_up"], tpb),
                                p["w_down"], tpb)
        if "cvec" in p:
            x = x + p["cvec"]
        return x, k_all, v_all, ks_t, vs_t

    if isinstance(params["layers"], (list, tuple)):
        # unrolled layer loop (quantized modes): per-layer weights stay
        # separate arrays so Pallas kernels read packed codes in place —
        # no scan-slice copies (see load_llama_params)
        k_all, v_all = cache.k, cache.v
        ks_all, vs_all = cache.k_scale, cache.v_scale
        if (use_fused_attn and paged and _mesh is None
                and tokens.shape[1] == 1):
            # stacked paged decode: merge the pool [L, P, G, Hkv*D] and
            # transpose scales [L, P, Hkv, G] for in-place layer reads.
            # Fast loops carry both PRE-TRANSFORMED across steps
            # (_fused_merge); a solo step transforms here (the scale
            # transpose is a real relayout — once per step, not per layer).
            L_ = k_all.shape[0]
            G_ = k_all.shape[2]
            premerged = k_all.ndim == 4
            if not premerged:
                k_all = k_all.reshape(L_, -1, G_, Hkv * D)
                v_all = v_all.reshape(L_, -1, G_, Hkv * D)
                if ks_all is not None:
                    ks_all = jnp.swapaxes(ks_all, 2, 3)
                    vs_all = jnp.swapaxes(vs_all, 2, 3)
            flat = slots.reshape(-1)
            for li_, p_ in enumerate(params["layers"]):
                x, k_all, v_all, ks_all, vs_all = layer_fn_paged_stacked(
                    x, p_, li_, k_all, v_all, ks_all, vs_all, flat)
            if not premerged:
                k_all = k_all.reshape(L_, -1, G_, Hkv, D)
                v_all = v_all.reshape(L_, -1, G_, Hkv, D)
                if ks_all is not None:
                    ks_all = jnp.swapaxes(ks_all, 2, 3)
                    vs_all = jnp.swapaxes(vs_all, 2, 3)
        elif use_fused_attn and not paged:
            # keep the stacked cache MERGED [L, B, S, Hkv*D] for the whole
            # loop: dense descending layouts make these reshapes bitcasts,
            # and the merged minor dims tile (32, 128) for int8 — a 5-D
            # [.., Hkv, D] pallas operand would pad the (8, 128) minor tile
            # 4x (measured 71.6 us/attention call vs 23.5 before).
            # Fast loops (ops/generate_loop) carry the cache PRE-MERGED
            # across steps (k.ndim == 4): inside a lax.scan the while-carry
            # layout XLA picks for the 5-D array made the per-step merge a
            # real relayout copy of the whole cache (~0.5 ms/step at
            # 8B/S=2048 int8, device trace round 4) — merging once outside
            # the loop removes it.
            L_ = k_all.shape[0]
            Scache = k_all.shape[2]
            # fresh-operand mode (set only by the fast loops): the carry is
            # GROUPED [L, B, S/32, 32, Hkv*D] — already merged
            premerged = k_all.ndim == 4 or getattr(cfg, "attn_fresh", False)
            if not premerged:
                k_all = k_all.reshape(L_, -1, Scache, Hkv * D)
                v_all = v_all.reshape(L_, -1, Scache, Hkv * D)
            barange = jnp.arange(tokens.shape[0], dtype=jnp.int32)[:, None]
            _ns = params.get("norm_stack")
            for li_, p_ in enumerate(params["layers"]):
                x, k_all, v_all, ks_all, vs_all = layer_fn_stacked(
                    x, p_, li_, k_all, v_all, ks_all, vs_all, barange,
                    norm_stack=_ns)
            if not premerged:
                k_all = k_all.reshape(L_, -1, Scache, Hkv, D)
                v_all = v_all.reshape(L_, -1, Scache, Hkv, D)
        else:
            for li_, p_ in enumerate(params["layers"]):
                x, (k_l, v_l, ks_l, vs_l) = layer_fn(
                    x, (p_, k_all[li_], v_all[li_],
                        None if ks_all is None else ks_all[li_],
                        None if vs_all is None else vs_all[li_]))
                k_all = k_all.at[li_].set(k_l)
                v_all = v_all.at[li_].set(v_l)
                if ks_all is not None:
                    ks_all = ks_all.at[li_].set(ks_l)
                    vs_all = vs_all.at[li_].set(vs_l)
        k_new, v_new, ks_new, vs_new = k_all, v_all, ks_all, vs_all
    else:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            layer_fn, x,
            (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale)
        )

    if paged:
        new_cache = pkv.PagedKVCache(k_new, v_new, new_positions,
                                     cache.page_table, ks_new, vs_new)
    else:
        new_cache = KVCache(k_new, v_new, new_positions, ks_new, vs_new)
    if all_positions:
        last_h = norm(x, params["out_norm"])                 # [B, T, E]
    else:
        if logits_index is None:
            logits_index = jnp.full((tokens.shape[0],), tokens.shape[1] - 1, jnp.int32)
        last_h = jax.vmap(lambda xb, i: xb[i])(x, logits_index)  # [B, E]
        last_h = norm(last_h, params["out_norm"])
    if return_hidden:
        return last_h, new_cache
    tpb_head = getattr(cfg, "tp_blocks", 0)
    if isinstance(params["output"], (QuantTensor, QuantTensorA8, QuantTensorK4,
                                     QuantTensorQ8, ShardedQuant, LoraWrapped)):
        # vocab-sharded packed head: tp_blocks pins lane blocks + the min
        # correction so logits match at any sharding (falls back to qmm
        # for unsupported layouts, mirrored by shard_quant_llama)
        logits = qmm_nblocked(last_h.astype(jnp.float32), params["output"],
                              tpb_head)
    elif tpb_head:
        # vocab-sharded head: fixed-width column blocks for cross-sharding
        # bit-exactness (see layer_fn comment)
        logits = qmm_nblocked(
            last_h.astype(params["output"].dtype), params["output"], tpb_head,
            out_dtype=jnp.float32,
        )
    else:
        # keep operands in weight dtype (bf16 reads from HBM), accumulate f32
        logits = jnp.dot(
            last_h.astype(params["output"].dtype), params["output"],
            preferred_element_type=jnp.float32,
        )
    n_vocab = params["tok_emb"].shape[0]
    logits = logits[..., :n_vocab]  # drop vocab padding (see load_llama_params)

    return logits, new_cache


@partial(jax.jit, static_argnums=(0,))
def all_logits(st: "LlamaStatic", params, tokens, positions, slots, cache):
    """Full-sequence logits [B, T, V] f32 (perplexity evaluation path)."""
    return forward(params, st, tokens, positions, slots, cache,
                   all_positions=True)


@partial(jax.jit, static_argnums=(0,))
def last_hidden(st: "LlamaStatic", params, tokens, positions, slots, cache, logits_index):
    """Final normed hidden state at logits_index (embeddings path for
    decoder-only models, InstanceEmbedding.cpp:129-157)."""
    return forward(params, st, tokens, positions, slots, cache, logits_index,
                   return_hidden=True)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(5,))
def _llama_step(st: LlamaStatic, params, tokens, positions, slots, cache, logits_index):
    return forward(params, st, tokens, positions, slots, cache, logits_index)


def make_step_fn(cfg: ModelConfig):
    """Step function sharing one jit cache per architecture (LlamaStatic)."""
    st = LlamaStatic.of(cfg)

    def step(params, tokens, positions, slots, cache, logits_index):
        return _llama_step(st, params, tokens, positions, slots, cache, logits_index)

    return step


# ---------------------------------------------------------------------------
# sequence-parallel (ring) prefill
# ---------------------------------------------------------------------------

def ring_forward(
    params: dict[str, Any],
    cfg: ModelConfig | LlamaStatic,
    tokens: jnp.ndarray,       # [B, T] int32, T sharded over mesh axis "sp"
    positions: jnp.ndarray,    # [B, T] int32 (pad rows may hold anything)
    kv_prompt_pos: jnp.ndarray,  # [B, T] int32, -1 on pads (ring mask)
    slots: jnp.ndarray,        # [B, T] int32; >= n_slots → dropped (pads)
    cache: KVCache,
    logits_index: jnp.ndarray,  # [B] global index of the last real token
    mesh,
) -> tuple[jnp.ndarray, KVCache]:
    """Whole-prompt prefill with the SEQUENCE dim sharded over an `sp` ring.

    The single-chip upgrade path for prompts larger than one chip
    (SURVEY.md §2.3 SP row; the reference's only long-context tools are
    single-device position edits, Session.cpp:324-368). Everything except
    attention is embarrassingly parallel over T (GSPMD row-parallelism);
    attention runs ops/ring_attention.py — K/V blocks rotate around the ring
    via ppermute while Q stays resident. The cache is written exactly like
    forward() (unrotated K, slot-scatter), so decode continues on the normal
    engines afterwards.

    Serves dense trees (lax.scan) AND the packed quantized engines
    (unrolled layer list; matmuls run as row-sharded shard_map islands —
    qmm_row_sharded — since a pallas_call is opaque to GSPMD), with float or
    INT8 KV caches (quantize-on-write like forward()). Ring prefill remains
    its own engine mode for verification (online-softmax numerics;
    prover/verifier must both use it, like flash attention).
    """
    from ..ops.pallas.quant_matmul import qmm_replicated, qmm_row_sharded
    from ..ops.ring_attention import ring_attention

    H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    rope_dim, freq_base = cfg.rope_dim, cfg.freq_base

    x = emb_lookup(params["tok_emb"], tokens)
    if cfg.emb_scale != 1.0:
        x = x * jnp.asarray(cfg.emb_scale, x.dtype)
    new_positions = jax.vmap(
        lambda p, s, q: p.at[s].set(q, mode="drop")
    )(cache.positions, slots, positions)

    act = _act(cfg.act_fn)
    eps = cfg.rms_eps

    def norm(h, w):
        return rms_norm(h, w + 1.0 if cfg.norm_plus_one else w, eps)

    rs = getattr(cfg, "rope_scale", 1.0)
    yarn = getattr(cfg, "yarn", None)
    ff = params.get("rope_freqs")
    rope = rope_angles(positions, rope_dim, freq_base, rs, yarn=yarn,
                       freq_factors=ff)

    write = jax.vmap(lambda c, s, n: c.at[s].set(n, mode="drop"))

    def mm(h, w):
        return qmm_row_sharded(h, w, mesh)

    def layer_body(x, p, k_l, v_l, ks_l, vs_l, dense):
        B, T, E = x.shape
        h = norm(x, p["attn_norm"])
        if not dense and "wqkv" in p:
            qkv = mm(h, p["wqkv"])
            q, k, v = jnp.split(qkv, [H * D, H * D + Hkv * D], axis=-1)
        else:
            q = mm(h, p["wq"]) if not dense else h @ p["wq"]
            k = mm(h, p["wk"]) if not dense else h @ p["wk"]
            v = mm(h, p["wv"]) if not dense else h @ p["wv"]
        if "bq" in p:
            q = q + p["bq"]
            k = k + p["bk"]
            v = v + p["bv"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        q_rot = apply_rope(q, positions, rope_dim, freq_base, True, cos_sin=rope)
        k_rot = apply_rope(k, positions, rope_dim, freq_base, True, cos_sin=rope)

        # cache stores UNROTATED K (rotate-on-read design, ops/attention.py);
        # INT8 mode quantizes on write exactly like forward()
        if ks_l is not None:
            k_codes, k_sc = quantize_kv(k)
            v_codes, v_sc = quantize_kv(v)
            k_l = write(k_l, slots, k_codes)
            v_l = write(v_l, slots, v_codes)
            ks_l = write(ks_l, slots, k_sc)
            vs_l = write(vs_l, slots, v_sc)
        else:
            k_l = write(k_l, slots, k)
            v_l = write(v_l, slots, v)

        attn = ring_attention(q_rot, k_rot, v, positions, kv_prompt_pos,
                              mesh, axis="sp", causal=cfg.causal)
        ar = attn.reshape(B, T, H * D)
        x = x + (ar @ p["wo"] if dense else mm(ar, p["wo"]))

        h2 = norm(x, p["ffn_norm"])
        if not dense and "wgu" in p:
            gu = mm(h2, p["wgu"])
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + mm(act(gate) * up, p["w_down"])
        elif dense:
            x = x + (act(h2 @ p["w_gate"]) * (h2 @ p["w_up"])) @ p["w_down"]
        else:
            x = x + mm(act(mm(h2, p["w_gate"])) * mm(h2, p["w_up"]),
                       p["w_down"])
        if "cvec" in p:
            x = x + p["cvec"]
        return x, (k_l, v_l, ks_l, vs_l)

    if isinstance(params["layers"], (list, tuple)):
        # unrolled packed engines (q4k_*/q8_0/q6_k): per-layer kernels as
        # row-sharded islands; cache stays the stacked [L, ...] arrays
        k_new, v_new = cache.k, cache.v
        ks_new, vs_new = cache.k_scale, cache.v_scale
        for li, p_l in enumerate(params["layers"]):
            x, (k_l, v_l, ks_l, vs_l) = layer_body(
                x, p_l, k_new[li], v_new[li],
                None if ks_new is None else ks_new[li],
                None if vs_new is None else vs_new[li], dense=False)
            k_new = k_new.at[li].set(k_l)
            v_new = v_new.at[li].set(v_l)
            if ks_new is not None:
                ks_new = ks_new.at[li].set(ks_l)
                vs_new = vs_new.at[li].set(vs_l)
    else:
        quant_kv = cache.k_scale is not None

        def layer_fn(x, scanned):
            if quant_kv:
                p, k_l, v_l, ks_l, vs_l = scanned
            else:
                (p, k_l, v_l), ks_l, vs_l = scanned, None, None
            x, out = layer_body(x, p, k_l, v_l, ks_l, vs_l, dense=True)
            return x, (out if quant_kv else out[:2])

        if quant_kv:
            x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
                layer_fn, x, (params["layers"], cache.k, cache.v,
                              cache.k_scale, cache.v_scale))
        else:
            x, (k_new, v_new) = jax.lax.scan(
                layer_fn, x, (params["layers"], cache.k, cache.v))
            ks_new = vs_new = None

    last_h = jax.vmap(lambda xb, i: xb[i])(x, logits_index)
    last_h = norm(last_h, params["out_norm"])
    out_w = params["output"]
    if isinstance(out_w, jnp.ndarray):
        logits = jnp.dot(last_h.astype(out_w.dtype), out_w,
                         preferred_element_type=jnp.float32)
    else:
        logits = qmm_replicated(last_h.astype(jnp.float32), out_w, mesh)
    logits = logits[..., : cfg_vocab_of(params)]
    return logits, KVCache(k_new, v_new, new_positions, ks_new, vs_new)


def cfg_vocab_of(params) -> int:
    """True vocab width: the (possibly packed) embedding table's row count."""
    return params["tok_emb"].shape[0]


def make_ring_prefill_fn(cfg: ModelConfig, mesh):
    """Jitted ring-prefill step bound to an `sp` mesh."""
    st = LlamaStatic.of(cfg)

    @partial(jax.jit, static_argnums=(), donate_argnums=(5,))
    def step(params, tokens, positions, kv_prompt_pos, slots, cache,
             logits_index):
        return ring_forward(params, st, tokens, positions, kv_prompt_pos,
                            slots, cache, logits_index, mesh)

    return step
