"""T5 encoder–decoder architecture.

Closes the reference's encoder surface: Session::setInitialPrompt runs
llama_encode for encoder models and restarts the decoder from
decoderStartToken (/root/reference/inference/code/llama/Session.cpp:94-103,
Vocab.cpp:22-27); InstanceEmbedding encodes for encoder-only models
(InstanceEmbedding.cpp:129-133).

llama.cpp t5 tensor names: token_embd.weight shared; enc.blk.N.* /
dec.blk.N.* with attn_rel_b relative-position buckets on layer 0 of each
stack; dec.blk.N.cross_attn_* for cross-attention; RMSNorm; ReLU (or gated
GELU when ffn_gate is present) FFN; no positional embeddings (relative
bias only); logits scaled by 1/sqrt(d_model) unless tied embeddings... the
d_model scaling follows the HF convention of dividing hidden by sqrt(E)
when embeddings are tied.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.kv_cache import KVCache
from ..ops.norms import rms_norm
from .config import ModelConfig


def _t5_rel_bucket(rel_pos: jnp.ndarray, bidirectional: bool,
                   num_buckets: int, max_distance: int) -> jnp.ndarray:
    """Standard T5 relative-position bucketing (public T5 formula)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + jnp.where(n < 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def load_t5_params(reader: GGUFReader, cfg: ModelConfig, dtype=jnp.float32) -> dict[str, Any]:
    def get_t(name):
        return reader.tensor_float(name).T.copy()

    def get_v(name):
        return reader.tensor_float(name)

    def has(name):
        return name in reader.tensors

    def stack_layers(prefix, keys):
        layers = {k: [] for k, _ in keys}
        for i in range(cfg.n_layer):
            for key, (pat, transpose) in dict(keys).items():
                name = f"{prefix}.blk.{i}.{pat}"
                if not has(name):
                    layers.pop(key, None)
                    continue
                if key in layers:
                    layers[key].append(get_t(name) if transpose else get_v(name))
        return {k: np.stack(v) for k, v in layers.items()}

    attn = [
        ("attn_norm", ("attn_norm.weight", False)),
        ("wq", ("attn_q.weight", True)),
        ("wk", ("attn_k.weight", True)),
        ("wv", ("attn_v.weight", True)),
        ("wo", ("attn_o.weight", True)),
        ("ffn_norm", ("ffn_norm.weight", False)),
        ("w_up", ("ffn_up.weight", True)),
        ("w_down", ("ffn_down.weight", True)),
        ("w_gate", ("ffn_gate.weight", True)),
    ]
    cross = [
        ("cross_norm", ("cross_attn_norm.weight", False)),
        ("cwq", ("cross_attn_q.weight", True)),
        ("cwk", ("cross_attn_k.weight", True)),
        ("cwv", ("cross_attn_v.weight", True)),
        ("cwo", ("cross_attn_o.weight", True)),
    ]

    params = {
        "tok_emb": get_v("token_embd.weight"),
        "enc": stack_layers("enc", attn),
        "dec": stack_layers("dec", attn + cross),
        "enc_norm": get_v("enc.output_norm.weight"),
        "dec_norm": get_v("dec.output_norm.weight"),
        "enc_rel_b": get_v("enc.blk.0.attn_rel_b.weight"),  # [n_buckets, H] or [H, n_buckets]
        "dec_rel_b": get_v("dec.blk.0.attn_rel_b.weight"),
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


@dataclass(frozen=True)
class T5Static:
    n_head: int
    head_dim: int
    rms_eps: float
    rel_buckets: int
    rel_max_distance: int
    gated: bool

    @classmethod
    def of(cls, cfg: ModelConfig) -> "T5Static":
        return cls(
            cfg.n_head, cfg.head_dim_, cfg.rms_norm_eps,
            int(cfg.extra.get("rel_buckets", 32)),
            int(cfg.extra.get("rel_max_distance", 128)),
            bool(cfg.extra.get("gated_ffn", False)),
        )


def _mha(h, p, st, kv_h=None, bias=None, mask=None, prefix=""):
    """Multi-head attention without rope (T5). kv_h defaults to h."""
    B, T, E = h.shape
    H, D = st.n_head, st.head_dim
    wq, wk, wv, wo = (p[prefix + "wq"], p[prefix + "wk"], p[prefix + "wv"], p[prefix + "wo"])
    kv_h = h if kv_h is None else kv_h
    S = kv_h.shape[1]
    q = (h @ wq).reshape(B, T, H, D)
    k = (kv_h @ wk).reshape(B, S, H, D)
    v = (kv_h @ wv).reshape(B, S, H, D)
    # T5 uses unscaled dot products (no 1/sqrt(D))
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32))
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32)).astype(h.dtype)
    return out.reshape(B, T, H * D) @ wo


def _ffn(h, p, st):
    up = h @ p["w_up"]
    if st.gated and "w_gate" in p:
        up = jax.nn.gelu(h @ p["w_gate"], approximate=False) * up
    else:
        up = jnp.maximum(up, 0)  # ReLU
    return up @ p["w_down"]


def _rel_bias(rel_b, q_pos, k_pos, st, bidirectional):
    """rel_b [n_buckets, H] (numpy layout of ne=(H, n_buckets)) → [1, H, T, S]."""
    rel = k_pos[None, :] - q_pos[:, None]  # [T, S]
    buckets = _t5_rel_bucket(rel, bidirectional, st.rel_buckets, st.rel_max_distance)
    bias = rel_b[buckets]  # [T, S, H]
    return bias.astype(jnp.float32).transpose(2, 0, 1)[None]


@partial(jax.jit, static_argnums=(0,))
def t5_encode(st: T5Static, params, tokens, valid_mask):
    """Encoder: tokens [B, T] → hidden [B, T, E]."""
    eps = st.rms_eps
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    pos = jnp.arange(T)
    bias = _rel_bias(params["enc_rel_b"], pos, pos, st, bidirectional=True)
    mask = valid_mask[:, None, None, :]

    def layer(x, p):
        h = rms_norm(x, p["attn_norm"], eps)
        x = x + _mha(h, p, st, bias=bias, mask=mask)
        h2 = rms_norm(x, p["ffn_norm"], eps)
        x = x + _ffn(h2, p, st)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["enc"])
    return rms_norm(x, params["enc_norm"], eps)


@partial(jax.jit, static_argnums=(0,))
def t5_decode_step(st: T5Static, params, tokens, positions, slots, cache: KVCache,
                   enc_out, enc_mask, logits_index):
    """Decoder step over the position-mapped self-attn KV cache + encoder
    cross-attention. Same slot protocol as the llama family."""
    eps = st.rms_eps
    H, D = st.n_head, st.head_dim
    B, T = tokens.shape

    x = params["tok_emb"][tokens]
    new_positions = jax.vmap(lambda p, s, q: p.at[s].set(q, mode="drop"))(
        cache.positions, slots, positions
    )
    cross_mask = enc_mask[:, None, None, :]

    def layer(x, scanned):
        p, k_l, v_l = scanned
        h = rms_norm(x, p["attn_norm"], eps)
        q = (h @ p["wq"]).reshape(B, T, H, D)
        k = (h @ p["wk"]).reshape(B, T, H, D)
        v = (h @ p["wv"]).reshape(B, T, H, D)
        write = jax.vmap(lambda c, s, n: c.at[s].set(n, mode="drop"))
        k_l = write(k_l, slots, k)
        v_l = write(v_l, slots, v)
        # self-attn over cache with causal mask + relative bias by positions
        kv_pos = new_positions  # [B, S]
        valid = (kv_pos[:, None, None, :] >= 0) & (
            kv_pos[:, None, None, :] <= positions[:, None, None, :].transpose(0, 1, 3, 2)
        )
        rel = kv_pos[:, None, :] - positions[:, :, None]          # [B, T, S]
        buckets = _t5_rel_bucket(rel, False, st.rel_buckets, st.rel_max_distance)
        bias = params["dec_rel_b"][buckets].astype(jnp.float32).transpose(0, 3, 1, 2)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k_l.astype(jnp.float32)) + bias
        scores = jnp.where(valid, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(valid, probs, 0.0)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v_l.astype(jnp.float32)).astype(x.dtype)
        x = x + attn.reshape(B, T, H * D) @ p["wo"]

        h2 = rms_norm(x, p["cross_norm"], eps)
        x = x + _mha(h2, {"wq": p["cwq"], "wk": p["cwk"], "wv": p["cwv"], "wo": p["cwo"]},
                     st, kv_h=enc_out, mask=cross_mask)

        h3 = rms_norm(x, p["ffn_norm"], eps)
        x = x + _ffn(h3, p, st)
        return x, (k_l, v_l)

    x, (k_new, v_new) = jax.lax.scan(layer, x, (params["dec"], cache.k, cache.v))

    last_h = jax.vmap(lambda xb, i: xb[i])(x, logits_index)
    last_h = rms_norm(last_h, params["dec_norm"], eps)
    logits = last_h.astype(jnp.float32) @ params["output"].astype(jnp.float32)
    logits = logits[:, : params["tok_emb"].shape[0]]
    return logits, KVCache(k_new, v_new, new_positions)
