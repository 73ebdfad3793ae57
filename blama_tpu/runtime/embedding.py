"""InstanceEmbedding: embedding extraction with pooling + normalization.

Mirror of the reference InstanceEmbedding (/root/reference/inference/code/
llama/InstanceEmbedding.{hpp,cpp}): a dedicated embeddings context, encode
for encoder-only models / decode for decoder-only models
(InstanceEmbedding.cpp:129-137), per-token embeddings at the last token when
pooling is NONE else per-sequence pooling (cpp:147-157), and the exact
normalization modes of normalizeEmbedding (cpp:58-92):
  -1 none | 0 max-absolute scaled to int16 range | 2 euclidean | p ≥ 1 p-norm
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..models.bert import POOLING_CLS, POOLING_LAST, POOLING_MEAN, POOLING_NONE


def normalize_embedding(inp: np.ndarray, embd_norm: int) -> np.ndarray:
    """Reference: normalizeEmbedding (InstanceEmbedding.cpp:58-92)."""
    inp = np.asarray(inp, np.float64)
    if embd_norm == -1:
        s = 1.0
    elif embd_norm == 0:
        s = np.abs(inp).max(initial=0.0) / 32760.0  # int16 range
    elif embd_norm == 2:
        s = float(np.sqrt(np.sum(inp * inp)))
    else:
        s = float(np.sum(np.abs(inp) ** embd_norm) ** (1.0 / embd_norm))
    scale = 1.0 / s if s > 0.0 else 0.0
    return (inp * scale).astype(np.float32)


@dataclass
class EmbeddingInitParams:
    """Reference: InstanceEmbedding::InitParams (ctxSize/batchSize/ubatchSize)."""

    ctx_size: int = 0
    batch_size: int = 512


class InstanceEmbedding:
    def __init__(self, model, params: EmbeddingInitParams | None = None):
        self.model = model
        self.params = params or EmbeddingInitParams()
        cfg = model.config
        self._arch = cfg.arch
        if cfg.arch == "bert":
            from ..models.bert import BertStatic, bert_forward

            self._st = BertStatic.of(cfg)
            self._fwd = bert_forward
            self._pooling = cfg.pooling_type
        else:
            # decoder-only models embed via the final hidden state
            from ..models.llama import LlamaStatic

            self._st = LlamaStatic.of(cfg)
            self._pooling = POOLING_NONE

    def embedding_dim(self) -> int:
        return self.model.config.n_embd

    def get_embedding_vector(self, prompt: list[int], normalization: int = 2) -> np.ndarray:
        """Reference: getEmbeddingVector (InstanceEmbedding.cpp:113-164)."""
        cfg = self.model.config
        n = len(prompt)
        if n == 0:
            return np.zeros(cfg.n_embd, np.float32)

        if self._arch == "bert":
            T = max(8, 1 << (n - 1).bit_length())
            toks = np.zeros((1, T), np.int32)
            toks[0, :n] = prompt
            mask = np.zeros((1, T), bool)
            mask[0, :n] = True
            hidden = np.asarray(
                self._fwd(self._st, self.model.weights, jnp.asarray(toks), jnp.asarray(mask))
            )[0]
            if self._pooling == POOLING_NONE:
                emb = hidden[n - 1]
            elif self._pooling == POOLING_MEAN:
                emb = hidden[:n].mean(axis=0)
            elif self._pooling == POOLING_LAST:
                emb = hidden[n - 1]
            else:  # CLS
                emb = hidden[0]
        else:
            # decoder path: run the causal model, take the last hidden state.
            from ..models.llama import forward
            from ..ops.kv_cache import KVCache

            T = max(8, 1 << (n - 1).bit_length())
            cache = KVCache.create(cfg.n_layer, 1, T, cfg.n_head_kv, cfg.head_dim_, jnp.float32)
            toks = np.zeros((1, T), np.int32)
            toks[0, :n] = prompt
            pos = np.zeros((1, T), np.int32)
            pos[0, :n] = np.arange(n)
            slots = np.full((1, T), T, np.int32)
            slots[0, :n] = np.arange(n)
            # reuse the hidden state via the logits head is lossy; instead run
            # forward with a hook: final hidden == rms_norm⁻¹ not available, so
            # use the pre-head hidden by calling the model's hidden fn
            emb = self._decoder_hidden(toks, pos, slots, cache, n)

        return normalize_embedding(emb, normalization)

    def _decoder_hidden(self, toks, pos, slots, cache, n) -> np.ndarray:
        """Last-token final (normed) hidden state for decoder-only models."""
        from ..models.llama import last_hidden

        hidden, _ = last_hidden(
            self._st, self.model.weights,
            jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(slots),
            cache, jnp.asarray([n - 1], jnp.int32),
        )
        return np.asarray(hidden)[0]
