"""KV-cache with position-map editing.

TPU-native replacement for llama.cpp's KV cell store and the sequence-edit
API the reference uses (llama_kv_self_clear/seq_rm/seq_add/seq_div,
/root/reference/inference/code/llama/Session.cpp:53,341-361).

Design: fixed-shape per-layer K/V arrays [L, B, S, H_kv, D] plus an explicit
`positions` array [B, S] (int32, -1 = empty slot). K is stored UNROTATED;
attention rotates K by the position array on read (see ops/rope.py), so every
position edit (context-shift, Self-Extend grouped attention) is a pure
elementwise update of `positions` — no KV data movement, fully jittable, and
identical in semantics to llama.cpp's cell-position edits.

Slot allocation is host-side and strictly sequential per sequence, which keeps
replay deterministic: the same token stream always lands in the same slots,
producing bit-identical XLA programs and logits (verification requirement,
SURVEY.md §3.3).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """KV store. In float mode k/v hold values directly; in INT8 mode they
    hold int8 codes with per-(slot, head) max-abs scales (k_scale/v_scale,
    f32 [L, B, S, H_kv]) — deterministic symmetric quantization, the
    north-star INT8 KV-cache (BASELINE.json)."""

    k: jnp.ndarray          # [L, B, S, H_kv, D] unrotated keys (values or int8 codes)
    v: jnp.ndarray          # [L, B, S, H_kv, D]
    positions: jnp.ndarray  # [B, S] int32; -1 = empty
    k_scale: jnp.ndarray | None = None  # [L, B, S, H_kv] f32 (int8 mode)
    v_scale: jnp.ndarray | None = None

    def tree_flatten(self):
        return (self.k, self.v, self.positions, self.k_scale, self.v_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_slots(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(cls, n_layer: int, batch: int, n_slots: int, n_kv_head: int, head_dim: int, dtype=jnp.bfloat16):
        shape = (n_layer, batch, n_slots, n_kv_head, head_dim)
        if dtype in (jnp.int8, "int8"):
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                positions=jnp.full((batch, n_slots), -1, jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            positions=jnp.full((batch, n_slots), -1, jnp.int32),
        )


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, H, D] → (int8 codes, f32 scales [B, T, H]); max-abs symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    codes = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return codes, scale


def dequantize_kv(codes: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return (codes.astype(jnp.float32) * scale[..., None]).astype(dtype)


def clear(cache: KVCache) -> KVCache:
    """llama_kv_self_clear: mark all slots empty (data left in place)."""
    return replace(cache, positions=jnp.full_like(cache.positions, -1))


@partial(jax.jit, donate_argnums=(0,))
def seq_rm(cache: KVCache, p0: jnp.ndarray, p1: jnp.ndarray) -> KVCache:
    """Remove entries with position in [p0, p1) (negative bounds = open)."""
    pos = cache.positions
    p0 = jnp.where(p0 < 0, jnp.iinfo(jnp.int32).min, p0)
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0)
    return replace(cache, positions=jnp.where(hit, -1, pos))


@partial(jax.jit, donate_argnums=(0,))
def seq_add(cache: KVCache, p0: jnp.ndarray, p1: jnp.ndarray, delta: jnp.ndarray) -> KVCache:
    """Shift positions in [p0, p1) by delta; entries shifted below 0 are
    removed (llama.cpp semantics)."""
    pos = cache.positions
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0)
    shifted = jnp.where(hit, pos + delta, pos)
    shifted = jnp.where(shifted < 0, -1, shifted)
    return replace(cache, positions=shifted)


@partial(jax.jit, donate_argnums=(0,))
def seq_div(cache: KVCache, p0: jnp.ndarray, p1: jnp.ndarray, divisor: jnp.ndarray) -> KVCache:
    """Integer-divide positions in [p0, p1) (Self-Extend grouped attention)."""
    pos = cache.positions
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0)
    return replace(cache, positions=jnp.where(hit, pos // divisor, pos))


class SlotAllocator:
    """Host-side sequential slot allocator for one sequence.

    Slots are assigned in ring order; `sync_positions` refreshes the host view
    after device-side position edits so freed slots become reusable.
    """

    def __init__(self, n_slots: int):
        self.n_slots = n_slots
        self.host_positions = np.full(n_slots, -1, np.int64)
        self._cursor = 0

    def allocate(self, n: int) -> np.ndarray:
        free = np.flatnonzero(self.host_positions < 0)
        # rotate free list so allocation continues after the last cursor
        order = np.argsort((free - self._cursor) % self.n_slots, kind="stable")
        free = free[order]
        if len(free) < n:
            raise RuntimeError(f"KV cache full: need {n} slots, have {len(free)}")
        slots = free[:n]
        if len(slots):
            self._cursor = int(slots[-1]) + 1
        return slots.astype(np.int32)

    def record(self, slots: np.ndarray, positions: np.ndarray) -> None:
        self.host_positions[slots] = positions

    def apply_rm(self, p0: int, p1: int) -> None:
        hp = self.host_positions
        hit = (hp >= p0) & (hp < (p1 if p1 >= 0 else np.iinfo(np.int64).max)) & (hp >= 0)
        hp[hit] = -1

    def apply_add(self, p0: int, p1: int, delta: int) -> None:
        hp = self.host_positions
        hit = (hp >= p0) & (hp < (p1 if p1 >= 0 else np.iinfo(np.int64).max)) & (hp >= 0)
        hp[hit] += delta
        hp[hp < 0] = -1  # entries shifted below zero are removed

    def apply_div(self, p0: int, p1: int, divisor: int) -> None:
        hp = self.host_positions
        hit = (hp >= p0) & (hp < (p1 if p1 >= 0 else np.iinfo(np.int64).max)) & (hp >= 0)
        hp[hit] //= divisor

    def clear(self) -> None:
        self.host_positions[:] = -1
        self._cursor = 0
