"""Instance: execution context binding a Model to device KV state.

Mirror of the reference Instance (/root/reference/inference/code/llama/
Instance.{hpp,cpp}): owns the context-length/batch configuration, enforces
exactly one active Session (Instance.cpp:121-131), provides warmup
(Instance.cpp:86-119), and — new here — owns the jitted step functions and
the KV slot allocator.

Decode requests are padded to a small set of bucket shapes (powers of two up
to ubatch_size) so XLA compiles a handful of programs; padding tokens scatter
to an out-of-range slot (dropped) and are masked out of attention, which
keeps logits bit-identical regardless of bucket choice for the real tokens'
slots — the batch-invariance requirement for verification replay.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kv_cache as kvc
from .session import Session, SessionInitParams


def _bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


@dataclass
class InstanceInitParams:
    """Reference: Instance::InitParams (Instance.hpp:21-26)."""

    ctx_size: int = 0            # 0 = train context length
    batch_size: int = 2048
    ubatch_size: int = 512
    flash_attn: bool = False     # Pallas fused attention (ops/pallas)
    kv_dtype: str = "float32"    # float32 | bfloat16 | int8 (quantized KV)
    fast_greedy: bool = True     # device-loop fast path for eligible complete()
    # Sequence-parallel (ring) prefill: initial prompts of >= ring_min_prompt
    # tokens run through models.llama.ring_forward over ring_mesh's "sp"
    # axis (K/V blocks rotate via ppermute). Dense llama-family weights and
    # float KV only; its own engine mode for verification (SURVEY.md §2.3
    # SP row / §5.7).
    ring_mesh: object = None     # jax Mesh with an "sp" axis; None = off
    ring_min_prompt: int = 32


class Instance:
    def __init__(self, model, params: InstanceInitParams | None = None):
        self.model = model
        self.params = params or InstanceInitParams()
        cfg = model.config
        self.ctx_len = self.params.ctx_size or cfg.n_ctx_train
        if self.ctx_len > cfg.n_ctx_train:
            import logging

            logging.getLogger("blama_tpu").warning(
                "Instance requested context length %d is greater than the "
                "model's training context length %d", self.ctx_len, cfg.n_ctx_train,
            )
        self.batch_size = self.params.batch_size
        self.ubatch_size = min(self.params.ubatch_size, self.batch_size)

        kv_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": "int8"}[self.params.kv_dtype]
        self.cache = kvc.KVCache.create(
            cfg.n_layer, 1, self.ctx_len, cfg.n_head_kv, cfg.head_dim_, kv_dtype
        )
        mesh = model.params.mesh
        if mesh is not None:
            # shard the KV cache over the mesh to match the weight layout
            from jax.sharding import NamedSharding

            from ..parallel import sharding as sh

            kv = sh.kv_cache_specs()
            from jax.sharding import PartitionSpec as _P

            scale_spec = _P(*tuple(kv["k"])[:-1])  # [L, B, S, Hkv]: drop head-dim axis
            self.cache = kvc.KVCache(
                jax.device_put(self.cache.k, NamedSharding(mesh, kv["k"])),
                jax.device_put(self.cache.v, NamedSharding(mesh, kv["v"])),
                jax.device_put(self.cache.positions, NamedSharding(mesh, kv["positions"])),
                jax.device_put(self.cache.k_scale, NamedSharding(mesh, scale_spec))
                if self.cache.k_scale is not None else None,
                jax.device_put(self.cache.v_scale, NamedSharding(mesh, scale_spec))
                if self.cache.v_scale is not None else None,
            )
        self.allocator = kvc.SlotAllocator(self.ctx_len)
        # step-input shardings: required under multi-process SPMD (a host-
        # local array can't feed a jit spanning other processes' devices);
        # harmless single-process
        self._io_shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel import sharding as sh

            io = sh.step_io_specs()
            self._io_shardings = {
                k: NamedSharding(mesh, io[k])
                for k in ("tokens", "positions", "slots", "logits_index")
            }

        self._enc_out = None
        self._enc_mask = None
        if cfg.arch in ("llama", "mistral", "qwen2", "mixtral", "gemma", "gemma2", "phi3"):
            if cfg.is_moe:
                from ..models.moe import make_step_fn
            else:
                from ..models.llama import make_step_fn
            step_cfg = cfg
            if self.params.flash_attn or getattr(cfg, "attn_fused", False):
                # reference Instance::InitParams::flashAttn (Instance.hpp:24);
                # here it selects the Pallas flash-decode attention kernel.
                # Fused attention is an engine *mode* (prover/verifier must
                # match numerics), so a request that can't be honored is
                # loudly reported rather than silently downgraded to XLA.
                import logging

                from ..ops.pallas import decode_attention as dattn

                log = logging.getLogger("blama_tpu")
                _tp = mesh.shape.get("tp", 1) if mesh is not None else 1
                if cfg.is_moe or (mesh is not None and (
                        cfg.n_head_kv % _tp or cfg.n_head % _tp)):
                    log.warning(
                        "flash_attn requested but unsupported with %s; "
                        "using XLA attention",
                        "MoE" if cfg.is_moe else
                        f"tp={_tp} not dividing the head counts")
                elif not dattn.supports(self.ctx_len, cfg.head_dim_,
                                        self.cache.k.dtype):
                    log.warning(
                        "flash_attn requested but the fused kernel rejects this "
                        "geometry (ctx_size=%d head_dim=%d kv_dtype=%s); "
                        "using XLA attention",
                        self.ctx_len, cfg.head_dim_, self.params.kv_dtype)
                else:
                    from dataclasses import replace as _dc_replace

                    step_cfg = _dc_replace(cfg, attn_fused=True)
            self.step_config = step_cfg  # session fast paths derive statics from this
            self._step = make_step_fn(step_cfg)
        elif cfg.arch == "gpt2":
            from ..models.gpt2 import make_step_fn

            self._step = make_step_fn(cfg)
        elif cfg.arch == "t5":
            from ..models.t5 import T5Static, t5_decode_step

            st = T5Static.of(cfg)

            def step(params, tokens, positions, slots, cache, logits_index):
                assert self._enc_out is not None, "t5: encode() must run first"
                return t5_decode_step(
                    st, params, tokens, positions, slots, cache,
                    self._enc_out, self._enc_mask, logits_index,
                )

            self._step = step
        else:
            raise NotImplementedError(cfg.arch)

        self._ring_step = None
        if self.params.ring_mesh is not None:
            import logging

            # round 4: ring prefill composes with the PRODUCTION engine —
            # packed quantized weights (row-sharded shard_map islands,
            # qmm_row_sharded) and INT8 KV (quantize-on-write) both serve;
            # only a tp mesh (different parallelism of the same weights) and
            # MoE remain out of scope
            if (cfg.arch in ("llama", "mistral", "qwen2", "gemma", "gemma2",
                             "phi3")
                    and not cfg.is_moe and mesh is None):
                from ..models.llama import make_ring_prefill_fn

                self._ring_step = make_ring_prefill_fn(cfg, self.params.ring_mesh)
            else:
                logging.getLogger("blama_tpu").warning(
                    "ring_mesh requested but unsupported for this "
                    "configuration (needs a llama-family model, no tp "
                    "mesh); using chunked prefill")

        self._session: Session | None = None
        self._loras: list = []

    # -- session lifecycle (single active session, Instance.cpp:121-131) -----

    def start_session(self, params: SessionInitParams | None = None) -> Session:
        if self._session is not None:
            raise RuntimeError("Another session is currently active")
        self._session = Session(self, params)
        return self._session

    def stop_session(self) -> None:
        self._session = None

    # -- adapters (Instance.cpp:52-84) ---------------------------------------

    def add_lora(self, adapter, scale: float = 1.0) -> None:
        """Fold a LoRA adapter into the weights (llama_set_adapter_lora)."""
        from .lora import apply_lora

        self.model.weights = apply_lora(self.model.weights, adapter, scale, +1.0)
        self._loras.append((adapter, scale))

    def clear_lora_state(self) -> None:
        """Remove all applied adapters (llama_clear_adapter_lora)."""
        from .lora import apply_lora

        for adapter, scale in self._loras:
            self.model.weights = apply_lora(self.model.weights, adapter, scale, -1.0)
        self._loras.clear()

    def apply_control_vector(self, cvec, layer_start: int = 1, layer_end: int | None = None) -> None:
        """Attach (or with cvec=None detach) a control vector
        (llama_apply_adapter_cvec, Instance.cpp:73-84)."""
        import jax.numpy as jnp

        layers = self.model.weights["layers"]
        dtype = self.model.weights["tok_emb"].dtype
        if cvec is not None:
            cfg = self.model.config
            end = layer_end if layer_end is not None else cfg.n_layer
            bias = cvec.as_layer_bias(cfg.n_layer, layer_start, end)
        if isinstance(layers, list):  # unrolled quantized modes (per-layer dicts)
            new_layers = []
            for li, p in enumerate(layers):
                p = dict(p)
                if cvec is None:
                    p.pop("cvec", None)
                else:
                    p["cvec"] = jnp.asarray(bias[li], dtype)
                new_layers.append(p)
            layers = new_layers
        else:
            layers = dict(layers)
            if cvec is None:
                layers.pop("cvec", None)
            else:
                layers["cvec"] = jnp.asarray(bias, dtype)
        self.model.weights = {**self.model.weights, "layers": layers}

    def warmup(self) -> None:
        """Single decode of [BOS, EOS] then clear (Instance.cpp:86-119)."""
        vocab = self.model.vocab
        tokens = [t for t in (vocab.bos(), vocab.eos()) if t >= 0] or [0]
        if self.model.has_encoder():
            self.encode(tokens)
            tokens = [vocab.decoder_start_token()]
        self.decode(tokens, np.arange(len(tokens), dtype=np.int64))
        self.clear_cache()

    # -- KV management --------------------------------------------------------

    def clear_cache(self) -> None:
        self.cache = kvc.clear(self.cache)
        self.allocator.clear()

    def kv_seq_rm(self, p0: int, p1: int) -> None:
        self.cache = kvc.seq_rm(self.cache, jnp.int32(p0), jnp.int32(p1))
        self.allocator.apply_rm(p0, p1)

    def kv_seq_add(self, p0: int, p1: int, delta: int) -> None:
        self.cache = kvc.seq_add(self.cache, jnp.int32(p0), jnp.int32(p1), jnp.int32(delta))
        self.allocator.apply_add(p0, p1, delta)

    def kv_seq_div(self, p0: int, p1: int, divisor: int) -> None:
        self.cache = kvc.seq_div(self.cache, jnp.int32(p0), jnp.int32(p1), jnp.int32(divisor))
        self.allocator.apply_div(p0, p1, divisor)

    def cache_host(self):
        c = self.cache
        scales = (
            (np.asarray(c.k_scale), np.asarray(c.v_scale)) if c.quantized else (None, None)
        )
        return (np.asarray(c.k), np.asarray(c.v), np.asarray(c.positions)) + scales

    def restore_cache(self, k, v, pos, k_scale=None, v_scale=None) -> None:
        self.cache = kvc.KVCache(
            jnp.asarray(k, self.cache.k.dtype),
            jnp.asarray(v, self.cache.v.dtype),
            jnp.asarray(pos, jnp.int32),
            jnp.asarray(k_scale, jnp.float32) if k_scale is not None else None,
            jnp.asarray(v_scale, jnp.float32) if v_scale is not None else None,
        )

    # -- decode ---------------------------------------------------------------

    def decode(self, tokens: list[int], positions: np.ndarray) -> np.ndarray:
        """Decode ≤ ubatch tokens (chunking above that is the Session's job),
        returning the last real token's full-vocab logits as host float32."""
        n = len(tokens)
        assert n > 0
        out = None
        off = 0
        while off < n:
            chunk = tokens[off: off + self.ubatch_size]
            pos = positions[off: off + self.ubatch_size]
            out = self._decode_chunk(chunk, pos)
            off += len(chunk)
        return out

    def _decode_chunk(self, tokens: list[int], positions: np.ndarray) -> np.ndarray:
        n = len(tokens)
        T = _bucket(n, self.ubatch_size)
        slots = self.allocator.allocate(n)
        self.allocator.record(slots, positions)

        tok_pad = np.zeros((1, T), np.int32)
        tok_pad[0, :n] = tokens
        pos_pad = np.full((1, T), 0, np.int32)
        pos_pad[0, :n] = positions
        slot_pad = np.full((1, T), self.ctx_len, np.int32)  # out-of-range → dropped
        slot_pad[0, :n] = slots
        logits_index = np.array([n - 1], np.int32)

        if self._io_shardings is not None:
            sh = self._io_shardings
            args = (jax.device_put(tok_pad, sh["tokens"]),
                    jax.device_put(pos_pad, sh["positions"]),
                    jax.device_put(slot_pad, sh["slots"]),
                    jax.device_put(logits_index, sh["logits_index"]))
        else:
            args = (jnp.asarray(tok_pad), jnp.asarray(pos_pad),
                    jnp.asarray(slot_pad), jnp.asarray(logits_index))
        logits, self.cache = self._step(
            self.model.weights, args[0], args[1], args[2], self.cache, args[3],
        )
        if jax.process_count() > 1:
            # multi-host: the logits span non-addressable devices; allgather
            # to host on every process (each runs the same call sequence)
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(logits[0], tiled=True)
            ).astype(np.float32)
        return np.asarray(logits[0]).astype(np.float32)

    @property
    def ring_enabled(self) -> bool:
        return self._ring_step is not None

    def ring_prefill(self, tokens: list[int], positions: np.ndarray) -> np.ndarray:
        """Whole-prompt sequence-parallel prefill over the sp ring; returns
        the last real token's full-vocab logits (host f32). The cache ends
        in the same state layout as chunked prefill (unrotated K at the same
        slots), so decode continues on the normal engines."""
        n = len(tokens)
        sp = self.params.ring_mesh.shape["sp"]
        T = _bucket(-(-n // sp), 1 << 30) * sp  # pow2 per-device block × sp
        slots = self.allocator.allocate(n)
        self.allocator.record(slots, positions)

        tok_pad = np.zeros((1, T), np.int32)
        tok_pad[0, :n] = tokens
        pos_pad = np.zeros((1, T), np.int32)
        pos_pad[0, :n] = positions
        kvp_pad = np.full((1, T), -1, np.int32)  # pads masked out of the ring
        kvp_pad[0, :n] = positions
        slot_pad = np.full((1, T), self.ctx_len, np.int32)
        slot_pad[0, :n] = slots
        logits_index = np.array([n - 1], np.int32)

        logits, self.cache = self._ring_step(
            self.model.weights,
            jnp.asarray(tok_pad), jnp.asarray(pos_pad), jnp.asarray(kvp_pad),
            jnp.asarray(slot_pad), self.cache, jnp.asarray(logits_index),
        )
        return np.asarray(logits[0]).astype(np.float32)

    def encode(self, tokens: list[int]) -> None:
        """Run the encoder stack; its output feeds decoder cross-attention
        (llama_encode analog, Session.cpp:94-103)."""
        cfg = self.model.config
        if cfg.arch != "t5":
            raise NotImplementedError(f"encoder not supported for {cfg.arch}")
        from ..models.t5 import T5Static, t5_encode

        n = len(tokens)
        T = max(8, 1 << (n - 1).bit_length())
        toks = np.zeros((1, T), np.int32)
        toks[0, :n] = tokens
        mask = np.zeros((1, T), bool)
        mask[0, :n] = True
        self._enc_out = t5_encode(
            T5Static.of(cfg), self.model.weights, jnp.asarray(toks), jnp.asarray(mask)
        )
        self._enc_mask = jnp.asarray(mask)
