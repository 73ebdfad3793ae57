"""Model: GGUF load → config + vocab + device weights.

Mirror of the reference Model facade (/root/reference/inference/code/llama/
Model.{hpp,cpp}): owns the loaded weights and vocab, answers metadata queries
(trainCtxLength, shouldAddBosToken, hasEncoder, getChatTemplateId). The
gpu/cpu device flag of the reference (Model.cpp:12-31) is replaced by a JAX
mesh/sharding spec.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..models.config import ModelConfig
from .vocab import Vocab

ModelLoadProgressCb = Callable[[float], None]


@dataclass
class ModelParams:
    """Reference: Model::Params (Model.hpp:28-34). `gpu` becomes a sharding
    spec name; dtype selects the on-device weight precision."""

    vocab_only: bool = False
    prefix_inputs_with_bos: bool = False
    dtype: str = "float32"           # float32 | bfloat16 | q4k_fused | q4k_fused_k4 | q4k_a8
    mesh: object = None              # jax Mesh for sharded load (parallel/)
    sharding_rules: object = None
    # Fixed-topology contraction blocking (sharding-invariant logits).
    # -1 = auto: 8 when a mesh is given, else 0 (plain contraction). A solo
    # verifier replaying a tp-sharded prover must set the prover's value.
    tp_blocks: int = -1
    # MoE mixture: ragged grouped matmuls (reads only routed experts — the
    # single-chip decode win) vs dense masked mixture (expert-sharding
    # friendly). None = auto: ragged when unsharded, dense on a mesh.
    moe_ragged: bool | None = None
    # Decode attention engine: "xla" (two-pass, shared with prefill) or
    # "fused" (Pallas flash-decode kernel; own numerics — prover and verifier
    # must pick the same mode, like the reference's CPU/CUDA backend split).
    attn: str = "xla"


class Model:
    def __init__(self, gguf_path: str, params: ModelParams | None = None,
                 progress_cb: ModelLoadProgressCb | None = None):
        self.params = params or ModelParams()
        self.reader = GGUFReader(gguf_path)
        self.config = ModelConfig.from_gguf(self.reader)
        tpb = self.params.tp_blocks
        self.config.tp_blocks = (8 if self.params.mesh is not None else 0) if tpb < 0 else tpb
        mr = self.params.moe_ragged
        self.config.moe_ragged = (self.params.mesh is None) if mr is None else mr
        if self.params.attn not in ("xla", "fused"):
            raise ValueError(
                f"ModelParams.attn must be 'xla' or 'fused', got {self.params.attn!r}")
        if self.params.attn == "fused" and self.config.is_moe:
            # The MoE forward doesn't route through the decode kernel. Since
            # fused attention is a verification *mode* (prover and verifier
            # must match numerics), refusing is safer than a silent fallback.
            raise ValueError(
                "attn='fused' is unsupported with a MoE model; "
                "use attn='xla' (the MoE forward is XLA-attention only)")
        if self.params.attn == "fused" and self.params.mesh is not None:
            # sharded fused decode runs as a per-head shard_map island
            # (ops/pallas/decode_attention.decode_attention_sharded); it
            # needs whole kv-head slices per tp device. Per-head arithmetic
            # is tp-invariant, so prover/verifier at different tp still
            # match bit-exactly (tests/test_parallel.py).
            tp = self.params.mesh.shape.get("tp", 1)
            if self.config.n_head_kv % tp or self.config.n_head % tp:
                raise ValueError(
                    f"attn='fused' on a tp={tp} mesh needs tp to divide "
                    f"n_head_kv={self.config.n_head_kv} and "
                    f"n_head={self.config.n_head}")
        self.config.attn_fused = self.params.attn == "fused"
        self.config.mesh = self.params.mesh  # MoE fixed-topology shard_map
        self.vocab = Vocab.from_gguf(self.reader)
        self.weights = None
        if not self.params.vocab_only:
            self.weights = self._load_weights(progress_cb)

    def _load_weights(self, progress_cb: ModelLoadProgressCb | None):
        # q4k_fused = f32-scale layout (6 b/w, VPU-cheapest); q4k_fused_k4 =
        # native 4.5 b/w layout (lowest memory); q4k_a8 = int8-MXU W4A8
        fused = {"q4k_fused": True, "q4k_fused_k4": "k4",
                 "q4k_a8": "a8", "q4k_a8_k4": "a8k4",
                 "q4k_a8_xla": "a8x",
                 # q8_0_fused: Q8_0 tensors stream packed (int8 codes +
                 # per-32 f32 scales, 9 b/w vs 16 dequantized); Q4_K tensors
                 # in the same file take the exact fused kernel. The Q8_0
                 # kernel is value-exact vs host dequant, so this is a
                 # verification-grade engine like q4k_fused.
                 "q8_0_fused": True, "q6_k_fused": True}.get(
                     self.params.dtype, False)
        dtype = (jnp.bfloat16
                 if self.params.dtype in ("bfloat16", "q4k_fused",
                                          "q4k_fused_k4", "q4k_a8",
                                          "q4k_a8_k4", "q4k_a8_xla",
                                          "q8_0_fused", "q6_k_fused")
                 else jnp.float32)
        arch = self.config.arch
        if progress_cb:
            progress_cb(0.0)
        if arch in ("llama", "mistral", "qwen2", "mixtral", "gemma", "gemma2", "phi3"):
            if self.config.is_moe:
                from ..models.moe import load_moe_params

                # MoE packed serving supports the exact (q4k_fused) and SWAR
                # (q4k_a8) engines on a single chip; the mesh path and exotic
                # layouts (k4/a8x) fall back to dense dequant
                moe_fused = fused if fused in (True, "a8") else False
                if fused and not moe_fused:
                    from ..utils.logging import scope_logger

                    scope_logger("model").warning(
                        "dtype=%s unsupported for MoE expert banks; loading "
                        "dense %s", self.params.dtype, dtype)
                w = load_moe_params(self.reader, self.config, dtype,
                                    mesh=self.params.mesh,
                                    fused_quant=moe_fused)
            else:
                from ..models.llama import load_llama_params

                # BLAMA_FUSE_PROJ=1 fuses qkv/gate-up into single wide
                # dispatches. Default OFF: at 8B decode the wide wqkv
                # operand's VMEM staging stalls cost more than the extra
                # dispatches save (122.0 vs 112.8 tok/s, round-5 trace);
                # tp_blocks (verification) modes always keep the unfused
                # layout so solo and sharded engines share identical
                # arithmetic
                import os as _os

                _fusable_cfg = (bool(fused) and self.params.mesh is None
                                and self.config.tp_blocks == 0)
                if _fusable_cfg and _os.environ.get(
                        "BLAMA_FUSE_PROJ", "0") == "1":
                    _fp = True
                elif _fusable_cfg and _os.environ.get(
                        "BLAMA_FUSE_KV", "0") == "1":
                    # fuse only the two narrow k/v projections (see
                    # load_llama_params) — A/B knob, default off
                    _fp = "kv"
                else:
                    _fp = False
                w = load_llama_params(
                    self.reader, self.config, dtype, fused_quant=fused,
                    fuse_proj=_fp)
        elif arch == "gpt2":
            from ..models.gpt2 import load_gpt2_params

            w = load_gpt2_params(self.reader, self.config, dtype)
        elif arch == "bert":
            from ..models.bert import load_bert_params

            w = load_bert_params(self.reader, self.config, dtype)
        elif arch == "t5":
            from ..models.t5 import load_t5_params

            self.config.extra["gated_ffn"] = (
                "dec.blk.0.ffn_gate.weight" in self.reader.tensors
            )
            w = load_t5_params(self.reader, self.config, dtype)
        else:
            raise NotImplementedError(f"architecture {arch!r}")
        if self.params.mesh is not None:
            w = self._shard(w)
        if progress_cb:
            progress_cb(1.0)
        return w

    def _shard(self, w):
        """Place weights on the mesh per the sharding rules (TP/EP serving)."""
        from ..parallel import sharding as sh

        mesh = self.params.mesh
        if isinstance(w.get("layers"), (list, tuple)):
            # quantized (list-layout) tree: manual shard_map TP around the
            # Pallas kernels (GSPMD can't partition opaque custom calls);
            # tp_blocks aligns eligibility with the fixed-topology paths
            return sh.shard_quant_llama(w, mesh,
                                        tp_blocks=self.config.tp_blocks)
        if self.config.is_moe:
            from ..models.moe import moe_param_specs

            specs = sh.specs_for_tree(w, moe_param_specs())
        else:
            specs = sh.specs_for_tree(w, sh.llama_param_specs(has_bias="bq" in w["layers"]))
        return sh.shard_params(w, mesh, specs)

    # -- reference Model API -------------------------------------------------

    def train_ctx_length(self) -> int:
        return self.config.n_ctx_train

    def should_add_bos_token(self) -> bool:
        return self.vocab.should_add_bos()

    def has_encoder(self) -> bool:
        return self.config.has_encoder

    def get_chat_template_id(self) -> str:
        return self.config.chat_template_id()

    def prefix_inputs_with_bos(self) -> bool:
        return self.params.prefix_inputs_with_bos

    def close(self) -> None:
        self.reader.close()
