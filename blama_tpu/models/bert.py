"""BERT-family encoder (bge-small class models) for embeddings.

The reference serves embeddings from bge-small-en-v1.5 GGUF through
InstanceEmbedding (/root/reference/inference/code/llama/InstanceEmbedding.cpp,
test golden t-integration.cpp:511-530). Tensor names follow llama.cpp's bert
arch: token/type/position embeddings with a post-embedding layernorm,
post-LN encoder blocks with biases, GELU FFN, bidirectional attention.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm
from .config import ModelConfig

POOLING_NONE = 0
POOLING_MEAN = 1
POOLING_CLS = 2
POOLING_LAST = 3


def load_bert_params(reader: GGUFReader, cfg: ModelConfig, dtype=jnp.float32) -> dict[str, Any]:
    def get_t(name):
        return reader.tensor_float(name).T.copy()

    def get_v(name):
        return reader.tensor_float(name)

    keys = {
        "wq": ("blk.{i}.attn_q.weight", True),
        "bq": ("blk.{i}.attn_q.bias", False),
        "wk": ("blk.{i}.attn_k.weight", True),
        "bk": ("blk.{i}.attn_k.bias", False),
        "wv": ("blk.{i}.attn_v.weight", True),
        "bv": ("blk.{i}.attn_v.bias", False),
        "wo": ("blk.{i}.attn_output.weight", True),
        "bo": ("blk.{i}.attn_output.bias", False),
        "attn_out_norm": ("blk.{i}.attn_output_norm.weight", False),
        "attn_out_norm_b": ("blk.{i}.attn_output_norm.bias", False),
        "w_up": ("blk.{i}.ffn_up.weight", True),
        "b_up": ("blk.{i}.ffn_up.bias", False),
        "w_down": ("blk.{i}.ffn_down.weight", True),
        "b_down": ("blk.{i}.ffn_down.bias", False),
        "out_norm": ("blk.{i}.layer_output_norm.weight", False),
        "out_norm_b": ("blk.{i}.layer_output_norm.bias", False),
    }
    layers: dict[str, list] = {k: [] for k in keys}
    for i in range(cfg.n_layer):
        for key, (pat, transpose) in keys.items():
            name = pat.format(i=i)
            layers[key].append(get_t(name) if transpose else get_v(name))

    params = {
        "tok_emb": get_v("token_embd.weight"),
        "type_emb": get_v("token_types.weight"),
        "pos_emb": get_v("position_embd.weight"),
        "emb_norm": get_v("token_embd_norm.weight"),
        "emb_norm_b": get_v("token_embd_norm.bias"),
        "layers": {k: np.stack(v) for k, v in layers.items()},
    }
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


@dataclass(frozen=True)
class BertStatic:
    n_head: int
    head_dim: int
    ln_eps: float

    @classmethod
    def of(cls, cfg: ModelConfig) -> "BertStatic":
        return cls(cfg.n_head, cfg.head_dim_, cfg.layer_norm_eps)


@partial(jax.jit, static_argnums=(0,))
def bert_forward(st: BertStatic, params, tokens, valid_mask):
    """tokens [B, T], valid_mask [B, T] bool → token embeddings [B, T, E]."""
    H, D = st.n_head, st.head_dim
    eps = st.ln_eps
    B, T = tokens.shape

    positions = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    x = params["tok_emb"][tokens] + params["type_emb"][0] + params["pos_emb"][positions]
    x = layer_norm(x, params["emb_norm"], params["emb_norm_b"], eps)

    attn_bias = jnp.where(valid_mask[:, None, None, :], 0.0, -1e30)  # [B,1,1,T]

    def layer_fn(x, p):
        q = (x @ p["wq"] + p["bq"]).reshape(B, T, H, D)
        k = (x @ p["wk"] + p["bk"]).reshape(B, T, H, D)
        v = (x @ p["wv"] + p["bv"]).reshape(B, T, H, D)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores / (D**0.5) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32)).astype(x.dtype)
        x = x + attn.reshape(B, T, H * D) @ p["wo"] + p["bo"]
        x = layer_norm(x, p["attn_out_norm"], p["attn_out_norm_b"], eps)
        h = jax.nn.gelu(x @ p["w_up"] + p["b_up"], approximate=False)
        x = x + h @ p["w_down"] + p["b_down"]
        x = layer_norm(x, p["out_norm"], p["out_norm_b"], eps)
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x
