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

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jnp.ndarray          # [L, B, S, H_kv, D] unrotated keys
    v: jnp.ndarray          # [L, B, S, H_kv, D]
    positions: jnp.ndarray  # [B, S] int32; -1 = empty

    def tree_flatten(self):
        return (self.k, self.v, self.positions), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_slots(self) -> int:
        return self.k.shape[2]

    @classmethod
    def create(cls, n_layer: int, batch: int, n_slots: int, n_kv_head: int, head_dim: int, dtype=jnp.bfloat16):
        shape = (n_layer, batch, n_slots, n_kv_head, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            positions=jnp.full((batch, n_slots), -1, jnp.int32),
        )


def clear(cache: KVCache) -> KVCache:
    """llama_kv_self_clear: mark all slots empty (data left in place)."""
    return KVCache(cache.k, cache.v, jnp.full_like(cache.positions, -1))


@partial(jax.jit, donate_argnums=(0,))
def seq_rm(cache: KVCache, p0: jnp.ndarray, p1: jnp.ndarray) -> KVCache:
    """Remove entries with position in [p0, p1) (negative bounds = open)."""
    pos = cache.positions
    p0 = jnp.where(p0 < 0, jnp.iinfo(jnp.int32).min, p0)
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0)
    return KVCache(cache.k, cache.v, jnp.where(hit, -1, pos))


@partial(jax.jit, donate_argnums=(0,))
def seq_add(cache: KVCache, p0: jnp.ndarray, p1: jnp.ndarray, delta: jnp.ndarray) -> KVCache:
    """Shift positions in [p0, p1) by delta; entries shifted below 0 are
    removed (llama.cpp semantics)."""
    pos = cache.positions
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0)
    shifted = jnp.where(hit, pos + delta, pos)
    shifted = jnp.where(shifted < 0, -1, shifted)
    return KVCache(cache.k, cache.v, shifted)


@partial(jax.jit, donate_argnums=(0,))
def seq_div(cache: KVCache, p0: jnp.ndarray, p1: jnp.ndarray, divisor: jnp.ndarray) -> KVCache:
    """Integer-divide positions in [p0, p1) (Self-Extend grouped attention)."""
    pos = cache.positions
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0)
    return KVCache(cache.k, cache.v, jnp.where(hit, pos // divisor, pos))


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
        hp[hp < 0] = -1
        hp[hit & (hp < 0)] = -1

    def apply_div(self, p0: int, p1: int, divisor: int) -> None:
        hp = self.host_positions
        hit = (hp >= p0) & (hp < (p1 if p1 >= 0 else np.iinfo(np.int64).max)) & (hp >= 0)
        hp[hit] //= divisor

    def clear(self) -> None:
        self.host_positions[:] = -1
        self._cursor = 0
