"""GPT-2 architecture: GGUF loading + jittable forward.

The reference's default/test model is a Q6_K GPT-2 117M
(/root/reference/server/code/http/HttpServerMain.cpp:379-381,
 t-integration.cpp:23), so gpt2 support is part of the parity surface.
Learned position embeddings, pre-LN blocks with biases, fused QKV, GELU MLP,
tied output head. Shares the Instance slot/cache protocol with the llama
family (ops/kv_cache.py).
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
from ..ops.norms import layer_norm
from .config import ModelConfig


def load_gpt2_params(reader: GGUFReader, cfg: ModelConfig, dtype=jnp.float32) -> dict[str, Any]:
    def get_t(name: str) -> np.ndarray:
        return reader.tensor_float(name).T.copy()

    def get_v(name: str) -> np.ndarray:
        return reader.tensor_float(name)

    keys_w = {
        "attn_norm": "blk.{i}.attn_norm.weight",
        "attn_norm_b": "blk.{i}.attn_norm.bias",
        "wqkv": "blk.{i}.attn_qkv.weight",
        "bqkv": "blk.{i}.attn_qkv.bias",
        "wo": "blk.{i}.attn_output.weight",
        "bo": "blk.{i}.attn_output.bias",
        "ffn_norm": "blk.{i}.ffn_norm.weight",
        "ffn_norm_b": "blk.{i}.ffn_norm.bias",
        "w_up": "blk.{i}.ffn_up.weight",
        "b_up": "blk.{i}.ffn_up.bias",
        "w_down": "blk.{i}.ffn_down.weight",
        "b_down": "blk.{i}.ffn_down.bias",
    }
    layers: dict[str, list[np.ndarray]] = {k: [] for k in keys_w}
    for i in range(cfg.n_layer):
        for key, pat in keys_w.items():
            name = pat.format(i=i)
            if key in ("wqkv", "wo", "w_up", "w_down"):
                layers[key].append(get_t(name))
            else:
                layers[key].append(get_v(name))

    params = {
        "tok_emb": get_v("token_embd.weight"),
        "pos_emb": get_v("position_embd.weight"),
        "out_norm": get_v("output_norm.weight"),
        "out_norm_b": get_v("output_norm.bias"),
        "layers": {k: np.stack(v) for k, v in layers.items()},
    }
    if "output.weight" in reader.tensors:
        params["output"] = get_t("output.weight")
    else:
        params["output"] = params["tok_emb"].T.copy()
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


@dataclass(frozen=True)
class GPT2Static:
    n_head: int
    head_dim: int
    ln_eps: float

    @classmethod
    def of(cls, cfg: ModelConfig) -> "GPT2Static":
        return cls(cfg.n_head, cfg.head_dim_, cfg.layer_norm_eps)


def forward(params, st: GPT2Static, tokens, positions, slots, cache: KVCache, logits_index):
    H, D = st.n_head, st.head_dim
    eps = st.ln_eps

    x = params["tok_emb"][tokens] + params["pos_emb"][positions]
    new_positions = jax.vmap(lambda p, s, q: p.at[s].set(q, mode="drop"))(
        cache.positions, slots, positions
    )

    def layer_fn(x, scanned):
        p, k_l, v_l = scanned
        B, T, E = x.shape
        h = layer_norm(x, p["attn_norm"], p["attn_norm_b"], eps)
        qkv = h @ p["wqkv"] + p["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        write = jax.vmap(lambda c, s, n: c.at[s].set(n, mode="drop"))
        k_l = write(k_l, slots, k)
        v_l = write(v_l, slots, v)
        attn = attention(
            q, k_l, v_l, positions, new_positions,
            rope_dim=0, freq_base=10000.0, causal=True,
        )
        x = x + attn.reshape(B, T, H * D) @ p["wo"] + p["bo"]
        h2 = layer_norm(x, p["ffn_norm"], p["ffn_norm_b"], eps)
        up = jax.nn.gelu(h2 @ p["w_up"] + p["b_up"], approximate=False)
        x = x + up @ p["w_down"] + p["b_down"]
        return x, (k_l, v_l)

    x, (k_new, v_new) = jax.lax.scan(layer_fn, x, (params["layers"], cache.k, cache.v))

    last_h = jax.vmap(lambda xb, i: xb[i])(x, logits_index)
    last_h = layer_norm(last_h, params["out_norm"], params["out_norm_b"], eps)
    logits = last_h.astype(jnp.float32) @ params["output"].astype(jnp.float32)
    return logits, KVCache(k_new, v_new, new_positions)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(5,))
def _gpt2_step(st, params, tokens, positions, slots, cache, logits_index):
    return forward(params, st, tokens, positions, slots, cache, logits_index)


def make_step_fn(cfg: ModelConfig):
    st = GPT2Static.of(cfg)

    def step(params, tokens, positions, slots, cache, logits_index):
        return _gpt2_step(st, params, tokens, positions, slots, cache, logits_index)

    return step
