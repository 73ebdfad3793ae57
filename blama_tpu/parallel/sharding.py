"""Sharding rules: PartitionSpecs for params, KV cache, and step I/O.

Tensor-parallel layout for the llama family (Megatron-style, all collectives
on the tp axis ride ICI):

  wq/wk/wv : shard output dim (heads)        → attention fully local per shard
  wo       : shard input dim (heads)         → psum after projection
  w_gate/up: shard output dim (ffn width)
  w_down   : shard input dim (ffn width)     → psum after projection
  output   : shard output dim (vocab)        → logits all-gathered for top-k
  tok_emb, norms: replicated

KV cache shards on the kv-head axis; batch shards on dp. XLA/GSPMD inserts
the psums from these annotations — no hand-written collectives needed on the
XLA path (Pallas latency-optimized variants come separately).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def llama_param_specs(has_bias: bool = False) -> dict:
    layer = {
        "attn_norm": P(None, None),       # [L, E]
        "wq": P(None, None, "tp"),        # [L, E, H*D]
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),        # [L, H*D, E]
        "ffn_norm": P(None, None),
        "w_gate": P(None, None, "tp"),    # [L, E, F]
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),    # [L, F, E]
    }
    if has_bias:
        layer.update({"bq": P(None, "tp"), "bk": P(None, "tp"), "bv": P(None, "tp")})
    return {
        "tok_emb": P(None, None),         # [V, E] replicated (gathers are tiny)
        "out_norm": P(None),
        "output": P(None, "tp"),          # [E, V] vocab-sharded
        "layers": layer,
    }


def kv_cache_specs() -> dict:
    return {
        "k": P(None, "dp", None, "tp", None),    # [L, B, S, Hkv, D]
        "v": P(None, "dp", None, "tp", None),
        "positions": P("dp", None),               # [B, S]
    }


def step_io_specs() -> dict:
    return {
        "tokens": P("dp", None),
        "positions": P("dp", None),
        "slots": P("dp", None),
        "logits_index": P("dp"),
        "logits": P("dp", None),                  # [B, V] replicated over tp
    }


# role → shard axis for packed (QuantTensor-family) weights; "n" = output
# dim (local column slice), "k" = contraction dim (partial product + psum)
_QUANT_ROLE_AXIS = {
    "wq": "n", "wk": "n", "wv": "n", "w_gate": "n", "w_up": "n",
    "wo": "k", "w_down": "k",
}


def shard_quant_llama(w: dict, mesh: Mesh, tp: str = "tp",
                      tp_blocks: int = 0) -> dict:
    """Shard a quantized (list-layout) llama param tree over the tp axis.

    Packed weights become ShardedQuant wrappers (manual shard_map TP around
    the Pallas kernels — GSPMD cannot partition opaque custom calls); dense
    2-D tensors in the same tree get the matching GSPMD NamedSharding; 1-D
    tensors replicate. K-sharding requires superblock alignment
    (K % (tp·256) == 0); misaligned tensors stay replicated.

    tp_blocks > 0 tightens eligibility to exactly the tensors the
    fixed-topology quantized paths support (quant_matmul tp_blocks section),
    so a sharded prover and a solo verifier always run the same arithmetic:
    K-sharding needs K % (tp_blocks·256) == 0 and tp | tp_blocks; n-sharding
    needs the LOCAL width to be a multiple of TPB_BLOCK_N; unsupported
    variants (K4 layouts) replicate and run the plain kernel everywhere."""
    import jax.numpy as jnp

    from ..ops.pallas.quant_matmul import (
        TPB_BLOCK_N, QuantEmbedding, QuantTensor, QuantTensorA8,
        QuantTensorK4, QuantTensorQ8, ShardedQuant, _parts_supported,
        _pinned_supported,
    )

    tp_size = mesh.shape[tp]
    QT = (QuantTensor, QuantTensorA8, QuantTensorK4, QuantTensorQ8)

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    def rep(a):
        return put(a, P(*([None] * jnp.asarray(a).ndim)))

    def place(w_t, axis):
        if isinstance(w_t, QuantEmbedding):
            return jax.tree_util.tree_map(rep, w_t)  # replicated row gather
        if isinstance(w_t, QT):
            n_pad = jax.tree_util.tree_leaves(w_t)[0].shape[1]
            if axis == "k" and w_t.shape[0] % (tp_size * 256):
                axis = None
            if axis == "n" and n_pad % tp_size:
                axis = None
            if tp_blocks:
                if axis == "k" and not (_parts_supported(w_t, tp_blocks)
                                        and tp_blocks % tp_size == 0):
                    axis = None
                # local width must be a multiple of 256 (= 2 pinned lane
                # blocks, so the kernel grid never degenerates to a single
                # program — see TPB_BLOCK_N)
                if axis == "n" and not (_pinned_supported(w_t)
                                        and (n_pad // tp_size) % (2 * TPB_BLOCK_N) == 0):
                    axis = None
            if axis is None:
                return jax.tree_util.tree_map(rep, w_t)
            spec = P(None, tp) if axis == "n" else P(tp, None)
            sharded = jax.tree_util.tree_map(lambda a: put(a, spec), w_t)
            return ShardedQuant(sharded, mesh, axis, tp)
        a = jnp.asarray(w_t)
        if a.ndim == 2 and axis == "n" and a.shape[1] % tp_size == 0:
            return put(a, P(None, tp))
        if a.ndim == 2 and axis == "k" and a.shape[0] % tp_size == 0:
            return put(a, P(tp, None))
        return rep(a)

    layers = []
    for p in w["layers"]:
        layers.append({k: place(v, _QUANT_ROLE_AXIS.get(k)) for k, v in p.items()})
    out = {"layers": layers}
    for k, v in w.items():
        if k == "layers":
            continue
        out[k] = place(v, "n" if k == "output" else None)
    return out


def shard_params(params, mesh: Mesh, specs: dict):
    """device_put a param pytree with matching spec pytree."""

    def place(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


def specs_for_tree(params, specs: dict):
    """Match a spec pytree to a params pytree (specs may have extra keys)."""

    def pick(spec_node, param_node):
        return spec_node

    # prune spec keys not present in params (e.g. biases)
    if isinstance(params, dict):
        return {k: specs_for_tree(params[k], specs[k]) for k in params}
    return specs
