"""Paged KV-cache: a shared page pool with per-sequence page tables.

North-star upgrade of the fixed-row cache (BASELINE.json "paged sharded
KV-cache"; VERDICT r1 missing #6): the continuous-batching scheduler's
admission was bound to `max_batch` rows x `ctx_size` slots each — a row
reserved its whole context window in HBM whether it used 40 tokens or 4000
(the reference has the same shape: one llama_context sized at ctxSize,
/root/reference/inference/code/llama/Instance.cpp:24-31). Here the physical
store is ONE pool of `n_pages` pages of `page_size` slots shared by every
row; a sequence holds only the pages its context actually covers, and
admission is bound by free pages, not rows.

Design (keeps every invariant of ops/kv_cache.py):

  * physical K/V: [L, n_pages, page_size, Hkv, D], page-major so both the
    XLA gather fallback and the Pallas paged-attention index map address
    whole pages. K stays UNROTATED; positions live in the pool
    ([n_pages, page_size], -1 = empty) and are edited in place
    (ctx-shift / Self-Extend stay pure metadata edits).
  * logical view: `page_table` [B, max_pages] int32 (-1 = unmapped) maps a
    row's page index p to a physical page. Slot s of a row lives at
    (page_table[b, s // G], s % G). Because rows allocate logical pages in
    order, the gathered view of a row is ELEMENT-IDENTICAL to a dense
    [S, Hkv, D] cache row no matter where its pages sit physically — so
    logits are bit-exact vs the dense layout (verification contract,
    SURVEY.md §3.3; tested in tests/test_paged_kv.py with scrambled
    physical placement).
  * writes are flat scatters: the host allocator hands the forward FLAT pool
    slot indices (page * G + offset), one scatter per layer, unique indices.

The attention read path has two engines, mirroring the dense cache:
  * XLA: gather the row view (same bytes attention reads anyway) and run
    ops.attention — the correctness/fallback path.
  * Pallas: ops/pallas/paged_attention.py streams pages straight from the
    pool via a scalar-prefetch index map (no gathered copy), block size ==
    page size, so its online-softmax accumulation order matches the dense
    fused kernel's exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    """Pool-backed KV store. In float mode k/v hold values; in INT8 mode
    int8 codes with per-(slot, head) max-abs scales (same quantizer as the
    dense cache, ops/kv_cache.py:quantize_kv)."""

    k: jnp.ndarray           # [L, P, G, Hkv, D] unrotated keys
    v: jnp.ndarray           # [L, P, G, Hkv, D]
    positions: jnp.ndarray   # [P, G] int32; -1 = empty slot
    page_table: jnp.ndarray  # [B, MP] int32 physical page per logical page; -1 = unmapped
    k_scale: jnp.ndarray | None = None  # [L, P, G, Hkv] f32 (int8 mode)
    v_scale: jnp.ndarray | None = None

    def tree_flatten(self):
        return (self.k, self.v, self.positions, self.page_table,
                self.k_scale, self.v_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def n_slots(self) -> int:
        """Total pool slots (the scatter-index space for writes)."""
        return self.k.shape[1] * self.k.shape[2]

    @property
    def view_slots(self) -> int:
        """Per-row logical window (max_pages * page_size)."""
        return self.page_table.shape[1] * self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(cls, n_layer: int, batch: int, n_pages: int, page_size: int,
               max_pages: int, n_kv_head: int, head_dim: int,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (n_layer, n_pages, page_size, n_kv_head, head_dim)
        table = jnp.full((batch, max_pages), -1, jnp.int32)
        pos = jnp.full((n_pages, page_size), -1, jnp.int32)
        if dtype in (jnp.int8, "int8"):
            return cls(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                positions=pos, page_table=table,
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   positions=pos, page_table=table)

    def with_table(self, table: np.ndarray) -> "PagedKVCache":
        return replace(self, page_table=jnp.asarray(table, jnp.int32))


def view_slot_map(page_table: jnp.ndarray, page_size: int) -> jnp.ndarray:
    """[B, MP] page table -> [B, MP*G] flat pool slot per logical slot.

    Unmapped pages map to slot 0; callers must mask them via `view_positions`
    (which forces their positions to -1, the empty-slot sentinel attention
    already honors)."""
    pt = jnp.maximum(page_table, 0)
    off = jnp.arange(page_size, dtype=jnp.int32)
    flat = pt[:, :, None] * page_size + off[None, None, :]
    return flat.reshape(page_table.shape[0], -1)


def view_positions(cache: PagedKVCache) -> jnp.ndarray:
    """Per-row position map [B, MP*G] of the logical view (-1 on unmapped)."""
    G = cache.page_size
    slot_map = view_slot_map(cache.page_table, G)
    pos = cache.positions.reshape(-1)[slot_map]
    mapped = jnp.repeat(cache.page_table >= 0, G, axis=1)
    return jnp.where(mapped, pos, -1)


def gather_view(cache: PagedKVCache, layer_k, layer_v, layer_ks=None,
                layer_vs=None):
    """Materialize the dense per-row view of one layer's pool slices.

    XLA fallback read path: [P, G, Hkv, D] pool -> [B, MP*G, Hkv, D] rows.
    Bandwidth-equivalent to reading a dense cache row (attention reads every
    view slot anyway); the Pallas kernel avoids even this copy."""
    G = cache.page_size
    slot_map = view_slot_map(cache.page_table, G)
    Hkv, D = layer_k.shape[-2], layer_k.shape[-1]
    k = layer_k.reshape(-1, Hkv, D)[slot_map]
    v = layer_v.reshape(-1, Hkv, D)[slot_map]
    if layer_ks is not None:
        ks = layer_ks.reshape(-1, Hkv)[slot_map]
        vs = layer_vs.reshape(-1, Hkv)[slot_map]
        return k, v, ks, vs
    return k, v, None, None


# -- position edits (llama_kv_self_* analogs over the pool) ------------------
# Pool positions are global, but edits must touch only ONE row's slots: the
# mask is the row's slot membership (from its page table), matching the
# per-sequence semantics of llama.cpp's seq_rm/add/div.

def _row_mask(cache: PagedKVCache, row: int) -> jnp.ndarray:
    """[P, G] bool: slots owned by `row`."""
    P = cache.n_pages
    owned = jnp.zeros((P,), bool).at[jnp.maximum(cache.page_table[row], 0)].set(
        cache.page_table[row] >= 0, mode="drop")
    return owned[:, None] & jnp.ones((1, cache.page_size), bool)


def seq_rm(cache: PagedKVCache, row: int, p0, p1) -> PagedKVCache:
    pos = cache.positions
    p0 = jnp.where(p0 < 0, jnp.iinfo(jnp.int32).min, p0)
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0) & _row_mask(cache, row)
    return replace(cache, positions=jnp.where(hit, -1, pos))


def seq_add(cache: PagedKVCache, row: int, p0, p1, delta) -> PagedKVCache:
    pos = cache.positions
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0) & _row_mask(cache, row)
    shifted = jnp.where(hit, pos + delta, pos)
    return replace(cache, positions=jnp.where(shifted < 0, -1, shifted))


def seq_div(cache: PagedKVCache, row: int, p0, p1, divisor) -> PagedKVCache:
    pos = cache.positions
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = (pos >= p0) & (pos < p1) & (pos >= 0) & _row_mask(cache, row)
    return replace(cache, positions=jnp.where(hit, pos // divisor, pos))


class PageAllocator:
    """Host-side page pool bookkeeping for the scheduler.

    Deterministic: free pages are handed out lowest-physical-index first
    (a sorted free set), so a given admission order always produces the same
    physical placement — replay then recompiles nothing and logits are
    reproducible run-to-run (placement does not affect logits at all — the
    logical view is placement-invariant — but determinism here keeps traces
    and profiles stable too)."""

    def __init__(self, n_pages: int, page_size: int, max_pages_per_row: int,
                 n_rows: int):
        self.n_pages = n_pages
        self.G = page_size
        self.MP = max_pages_per_row
        self._free = list(range(n_pages - 1, -1, -1))  # pop() -> lowest idx
        self.tables = np.full((n_rows, max_pages_per_row), -1, np.int64)
        self._row_len = np.zeros(n_rows, np.int64)  # slots in use per row

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def pages_for(self, n_slots: int) -> int:
        return -(-n_slots // self.G)

    def can_admit(self, n_slots: int) -> bool:
        """Enough pool for `n_slots` new slots on a fresh row (+1 headroom
        page so the first decode steps cannot stall immediately)."""
        return self.free_pages >= self.pages_for(n_slots) + 1

    def allocate_slots(self, row: int, n: int) -> np.ndarray | None:
        """Extend `row` by n slots; returns FLAT pool indices [n] (for the
        forward's scatter writes) or None if the pool/window is exhausted."""
        start = int(self._row_len[row])
        end = start + n
        if end > self.MP * self.G:
            return None  # logical window exhausted
        first_page, last_page = start // self.G, (end - 1) // self.G
        for lp in range(first_page, last_page + 1):
            if self.tables[row, lp] < 0:
                if not self._free:
                    return None  # pool exhausted
                self.tables[row, lp] = self._free.pop()
        self._row_len[row] = end
        logical = np.arange(start, end)
        phys = self.tables[row, logical // self.G] * self.G + logical % self.G
        return phys.astype(np.int32)

    def max_extend(self, row: int, n: int, free_budget: int | None = None) -> int:
        """Largest m <= n for which allocate_slots(row, m) would succeed
        (logical-window + free-pool bound). Allocates nothing — the
        scheduler's horizon loop uses it to clamp a multi-step plan before
        committing pages. `free_budget` caps the free pages this row may
        claim (the scheduler threads a shrinking budget through a multi-row
        plan so rows do not all count the same last free pages)."""
        start = int(self._row_len[row])
        n = min(n, self.MP * self.G - start)
        if n <= 0:
            return 0
        lp = start // self.G
        while lp < self.MP and self.tables[row, lp] >= 0:
            lp += 1
        covered = max(0, lp * self.G - start)  # slots on already-mapped pages
        free = len(self._free)
        if free_budget is not None:
            free = min(free, max(0, free_budget))
        return min(n, covered + free * self.G)

    def free_row(self, row: int) -> list[int]:
        """Release a finished row's pages back to the pool (sorted re-insert
        keeps allocation deterministic). Returns the freed physical pages so
        the caller can clear their pool positions (stale positions would
        leak into the next owner's masks)."""
        pages = [int(p) for p in self.tables[row] if p >= 0]
        self.tables[row] = -1
        self._row_len[row] = 0
        self._free = sorted(set(self._free) | set(pages), reverse=True)
        return pages

    def row_len(self, row: int) -> int:
        return int(self._row_len[row])
