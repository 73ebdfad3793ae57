"""On-device generation loop: N decode steps fused into one XLA program.

The reference's decode loop crosses the host boundary every token
(llama_decode + host-side sampling, Session.cpp:204-210). On TPU that
roundtrip dominates latency, so the fast path runs the whole loop on device
with lax.scan: argmax (greedy) or temperature/top-k sampling with a
counter-based threefry key, capturing each step's top-10 logits on device via
lax.top_k (replacing the reference's host-side full-vocab sort,
Session.cpp:254-260).

Semantics match the Session host path exactly for greedy decode without
context-shift: same slots (sequential), same reduction orders, same captured
top-10 — so fillCtx replay of fast-path output verifies bit-identically.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

import os as _os

from ..models import llama as llama_mod
from .kv_cache import KVCache

# BLAMA_ATTN_WRITE=1: fold the KV quantize + cache-row writes into the fused
# decode attention kernel. The write kernel itself is cheap (+0.05 ms/step
# at 8B) and removes ~0.45 ms of XLA write glue, but with it enabled the
# NEIGHBORING matmul kernels slow ~13% (device trace round 5: xin 5.94 ->
# 6.65 ms/step — the cache aliasing appears to degrade XLA's scheduling
# around the pallas call), a net loss. OFF by default until that
# interaction is solved; the kernel stays bit-exact vs the XLA write path
# (tests) for future rounds.
_WRITE_IN_KERNEL = _os.environ.get("BLAMA_ATTN_WRITE", "0") == "1"

# BLAMA_ATTN_FRESH=1: in the INT8-KV stacked unsharded fast loops, the fused
# decode kernel takes the fresh K/V row as an OPERAND (patched into the
# streamed block with exact quantize_kv numerics) instead of reading it back
# from the just-written cache, re-routing the attention->write data
# dependency without the write-mode kernel's aliasing. Bit-exact vs
# write-then-read (tests). OFF by default: on hardware every variant LOST
# (round-5 A/Bs at 8B — where-patch 120.6, group-patch 120.4, grouped carry
# 111.8 vs 126.7 baseline); removing the dependency reclaims nothing (the
# scheduler already hides the write latency) and the patch/layout overheads
# are real. Kept as a tested probe for future XLA/Mosaic versions.
_FRESH_OPERAND = _os.environ.get("BLAMA_ATTN_FRESH", "0") == "1"


def _fused_merge(st, params, cache):
    """Pre-merge a stacked cache for the loop's in-place fused attention.

    Dense: [L, B, S, Hkv, D] → [L, B, S, Hkv*D]. The unrolled
    fused-attention forward reads/writes the cache merged; if the scan
    carry stays 5-D, XLA's while-carry layout turns the per-step merge into
    a full-cache relayout copy (~0.5 ms/step at 8B/S=2048 — device trace
    round 4). Merging once before the scan (a bitcast at the jit boundary:
    the input layout is descending) and unmerging after makes the in-loop
    reshapes disappear.

    Paged: pool [L, P, G, Hkv, D] → [L, P, G, Hkv*D] AND scales
    [L, P, G, Hkv] → [L, P, Hkv, G] (a real relayout — once per loop, so
    the per-layer-per-step swapaxes copies the sliced paged path paid
    disappear; VERDICT r4 #7). Returns (cache, token | None)."""
    import dataclasses

    from . import paged_kv as pkv
    from .pallas import paged_attention as pattn

    if not (getattr(st, "attn_fused", False)
            and isinstance(params.get("layers"), (list, tuple))):
        return cache, None
    if isinstance(cache, pkv.PagedKVCache):
        if cache.k.ndim != 5 or getattr(st, "mesh", None) is not None:
            return cache, None
        L, P, G, Hkv, D = cache.k.shape
        yarn = getattr(st, "yarn", None)
        # mirror forward's paged use_fused_attn gate exactly — a merged
        # carry reaching the sliced fallback loop is a trace-time error
        if (not pattn.supports(G, D, cache.k.dtype) or not st.causal
                or (yarn is not None and st.rope_dim < st.head_dim)):
            return cache, None
        return dataclasses.replace(
            cache, k=cache.k.reshape(L, P, G, Hkv * D),
            v=cache.v.reshape(L, P, G, Hkv * D),
            k_scale=None if cache.k_scale is None
            else jnp.swapaxes(cache.k_scale, 2, 3),
            v_scale=None if cache.v_scale is None
            else jnp.swapaxes(cache.v_scale, 2, 3)), ("paged", Hkv, D)
    if cache.k.ndim == 5:
        L, B, S, Hkv, D = cache.k.shape
        # merge ONLY when forward's own T==1 decode gate will take the
        # fused kernel at this geometry — otherwise the unrolled fallback
        # loop indexes the cache as [B, S, Hkv, D] and a pre-merged 4-D
        # carry is a trace-time shape error (ADVICE r4 medium).
        if not _decode_fused_ok(st, S, D, cache.k.dtype, B):
            return cache, None
        merged = dataclasses.replace(
            cache, k=cache.k.reshape(L, B, S, Hkv * D),
            v=cache.v.reshape(L, B, S, Hkv * D))
        from .pallas import decode_attention as dattn

        if (_WRITE_IN_KERNEL and getattr(st, "mesh", None) is None
                and hasattr(st, "attn_write")
                and dattn.write_supports(S, D, cache.k.dtype, B)):
            # in-kernel KV write mode: scales carried TRANSPOSED
            # [L, B, Hkv, S] (one relayout per loop instead of per layer
            # per step); callers flip st.attn_write on this token.
            return dataclasses.replace(
                merged,
                k_scale=None if cache.k_scale is None
                else jnp.swapaxes(cache.k_scale, 2, 3),
                v_scale=None if cache.v_scale is None
                else jnp.swapaxes(cache.v_scale, 2, 3)), ("write", Hkv, D)
        if (cache.k_scale is not None
                and getattr(st, "mesh", None) is None
                and hasattr(st, "attn_scales_t")):
            # INT8-KV XLA-write mode: carry the scales TRANSPOSED
            # [L, B, Hkv, S] too, so the kernel indexes the layer's scale
            # block in place instead of paying 2 slices + 2 swapaxes per
            # layer per step (round-5 trace glue); callers flip
            # st.attn_scales_t on this token. When the geometry admits it,
            # upgrade to fresh-operand mode: attention takes the fresh K/V
            # row as an operand and the cache writes leave the critical
            # path entirely (st.attn_fresh).
            if (_FRESH_OPERAND and hasattr(st, "attn_fresh")
                    and dattn.fresh_supports(S, D, cache.k.dtype, B)):
                # fresh carry is GROUPED [L, B, S/32, 32, Hkv*D] so the
                # kernel's group-aligned patch store needs no in-loop
                # reshape (which re-materialized the cache every step)
                return dataclasses.replace(
                    merged,
                    k=merged.k.reshape(L, B, S // 32, 32, Hkv * D),
                    v=merged.v.reshape(L, B, S // 32, 32, Hkv * D),
                    k_scale=jnp.swapaxes(cache.k_scale, 2, 3),
                    v_scale=jnp.swapaxes(cache.v_scale, 2, 3)), \
                    ("fresh", Hkv, D)
            return dataclasses.replace(
                merged,
                k_scale=jnp.swapaxes(cache.k_scale, 2, 3),
                v_scale=jnp.swapaxes(cache.v_scale, 2, 3)), \
                ("scalest", Hkv, D)
        return merged, (Hkv, D)
    return cache, None


def _decode_fused_ok(st, S: int, D: int, kv_dtype, B: int) -> bool:
    """Mirror of models/llama.forward's `use_fused_attn` gate for a dense
    cache at T==1 (llama.py:394-429) — the single predicate that decides
    whether the scan body will run the merged-cache fused path."""
    from .pallas import decode_attention as dattn

    yarn = getattr(st, "yarn", None)
    if not st.causal or (yarn is not None and st.rope_dim < st.head_dim):
        return False
    mesh = getattr(st, "mesh", None)
    if mesh is not None:
        tp, dp = mesh.shape["tp"], mesh.shape["dp"]
        if st.n_head_kv % tp or st.n_head % tp or B % dp:
            return False
        b_local = B // dp
    else:
        b_local = B
    return dattn.supports(S, D, kv_dtype, b_local)


def _st_for(st, hd):
    """Upgrade the static config for the loop body per the merge token."""
    import dataclasses

    if hd is not None and hd[0] == "write":
        return dataclasses.replace(st, attn_write=True)
    if hd is not None and hd[0] == "scalest":
        return dataclasses.replace(st, attn_scales_t=True)
    if hd is not None and hd[0] == "fresh":
        return dataclasses.replace(st, attn_scales_t=True, attn_fresh=True)
    return st


def _fused_unmerge(cache, hd):
    import dataclasses

    if hd is None:
        return cache
    if hd[0] in ("write", "scalest", "fresh"):
        _, Hkv, D = hd
        if hd[0] == "fresh":
            L, B, SG, _, _ = cache.k.shape
            S = SG * 32
        else:
            L, B, S, _ = cache.k.shape
        return dataclasses.replace(
            cache, k=cache.k.reshape(L, B, S, Hkv, D),
            v=cache.v.reshape(L, B, S, Hkv, D),
            k_scale=None if cache.k_scale is None
            else jnp.swapaxes(cache.k_scale, 2, 3),
            v_scale=None if cache.v_scale is None
            else jnp.swapaxes(cache.v_scale, 2, 3))
    if hd[0] == "paged":
        _, Hkv, D = hd
        L, P, G, _ = cache.k.shape
        return dataclasses.replace(
            cache, k=cache.k.reshape(L, P, G, Hkv, D),
            v=cache.v.reshape(L, P, G, Hkv, D),
            k_scale=None if cache.k_scale is None
            else jnp.swapaxes(cache.k_scale, 2, 3),
            v_scale=None if cache.v_scale is None
            else jnp.swapaxes(cache.v_scale, 2, 3))
    Hkv, D = hd
    L, B, S, _ = cache.k.shape
    return dataclasses.replace(
        cache, k=cache.k.reshape(L, B, S, Hkv, D),
        v=cache.v.reshape(L, B, S, Hkv, D))


def _forward_for(st):
    """Pick the model forward by static type (resolved at trace time) so the
    fused loop serves MoE (Mixtral-family) models too."""
    from ..models import moe as moe_mod

    if isinstance(st, moe_mod.MoEStatic):
        return moe_mod.forward
    return llama_mod.forward


@partial(jax.jit, static_argnums=(0, 4, 5))
def greedy_generate(
    st: "llama_mod.LlamaStatic",
    params,
    prompt_tokens: jnp.ndarray,   # [B, P] int32, already-tokenized prompt
    cache: KVCache,
    n_prompt: int,                # static: true prompt length (P)
    n_steps: int,                 # static: number of tokens to generate
):
    """Prefill the prompt then generate n_steps greedily, fully on device.

    Returns (tokens [B, n_steps], top_ids [B, n_steps, 10],
             top_vals [B, n_steps, 10], cache).
    Top-10 capture follows the reference convention: the logits recorded for
    generated token i are the ones computed AFTER decoding it (the
    distribution token i+1 is sampled from) — see Session.cpp:186-189.
    """
    fwd = _forward_for(st)
    B, P = prompt_tokens.shape
    positions = jnp.tile(jnp.arange(P, dtype=jnp.int32), (B, 1))
    slots = positions
    li = jnp.full((B,), n_prompt - 1, jnp.int32)

    logits, cache = fwd(params, st, prompt_tokens, positions, slots, cache, li)
    cache, _hd = _fused_merge(st, params, cache)
    st = _st_for(st, _hd)

    def body(carry, _):
        cache, logits, pos = carry
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        logits2, cache = fwd(
            params, st,
            tok[:, None], pos[:, None], pos[:, None],  # slot = position (sequential)
            cache, jnp.zeros((B,), jnp.int32),
        )
        top_vals, top_ids = jax.lax.top_k(logits2, 10)
        return (cache, logits2, pos + 1), (tok, top_ids, top_vals)

    (cache, _, _), (tokens, top_ids, top_vals) = jax.lax.scan(
        body, (cache, logits, jnp.full((B,), n_prompt, jnp.int32)), None, length=n_steps
    )
    # scan stacks on axis 0 → [n_steps, B, ...]; transpose to [B, n_steps, ...]
    return (
        tokens.swapaxes(0, 1),
        top_ids.swapaxes(0, 1),
        top_vals.swapaxes(0, 1),
        _fused_unmerge(cache, _hd),
    )


@partial(jax.jit, static_argnums=(0, 7), donate_argnums=(2, 3))
def scheduler_loop(
    st,
    params,
    cache: KVCache,
    logits0: jnp.ndarray,      # [B, V] f32 — stays ON DEVICE between horizons
    start_pos: jnp.ndarray,    # [B] int32 next position (= slot, dense rows)
    forced_toks: jnp.ndarray,  # [B, H] int32; -1 = greedy-argmax this row/step
    claimed_ids: jnp.ndarray,  # [B, H, 10] int32 ids to gather (verify rows)
    n_steps: int,
):
    """H decode steps for the continuous-batching scheduler in ONE dispatch.

    The per-token scheduler round-trips the host every step — and pulls the
    full [B, V] logits back each time, which through a tunneled TPU costs
    more than the compute. This horizon loop keeps the logits ON the device
    (carried in/out as a device array), mixes greedy rows (argmax) and
    teacher-forced verification rows (forced_toks >= 0) per step, and
    returns only small per-step outputs: sampled tokens, top-10 capture,
    and the logit values at each verify row's claimed top-10 ids. Inactive
    rows pass slot = n_slots (writes dropped) via forced_toks == -2.

    Per-row arithmetic is the batched T==1 step the per-token path runs, in
    a lax.scan — same program shape as the Session fast path, so greedy
    tokens match the per-token scheduler (tested in test_scheduler.py).
    """
    from . import paged_kv as pkv

    fwd = _forward_for(st)
    B = logits0.shape[0]
    cache, _hd = _fused_merge(st, params, cache)
    st = _st_for(st, _hd)
    paged = isinstance(cache, pkv.PagedKVCache)
    if paged:
        G = cache.page_size
        n_slots = cache.n_slots  # pool slots; >= n_slots → dropped write
    else:
        n_slots = cache.k.shape[2] if not isinstance(cache.k, (list, tuple)) else cache.k[0].shape[1]

    def body(carry, step_in):
        cache, logits, pos = carry
        forced, cids = step_in             # [B], [B, 10]
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(forced >= 0, jnp.maximum(forced, 0), greedy)
        inactive = forced == -2
        if paged:
            # flat pool slot via the row's page table (pages pre-allocated
            # host-side for the whole horizon before dispatch)
            page = jnp.take_along_axis(
                cache.page_table, (pos // G)[:, None], axis=1)[:, 0]
            slot = jnp.where(inactive, n_slots, page * G + pos % G)
        else:
            slot = jnp.where(inactive, n_slots, pos)  # dropped writes for idle rows
        logits2, cache = fwd(
            params, st, tok[:, None], pos[:, None], slot[:, None],
            cache, jnp.zeros((B,), jnp.int32),
        )
        top_vals, top_ids = jax.lax.top_k(logits2, 10)
        cvals = jnp.take_along_axis(logits2, cids, axis=-1)  # [B, 10]
        return (cache, logits2, pos + 1), (tok, top_ids, top_vals, cvals)

    (cache, logits, _), (toks, tids, tvals, cvals) = jax.lax.scan(
        body, (cache, logits0, start_pos),
        (forced_toks.swapaxes(0, 1), claimed_ids.swapaxes(0, 1)),
        length=n_steps)
    return (toks.swapaxes(0, 1), tids.swapaxes(0, 1), tvals.swapaxes(0, 1),
            cvals.swapaxes(0, 1), logits, _fused_unmerge(cache, _hd))


@partial(jax.jit, static_argnums=(0,))
def teacher_forced(
    st: "llama_mod.LlamaStatic",
    params,
    cache: KVCache,
    tokens: jnp.ndarray,    # [B, n] claimed tokens to force
    start_pos: jnp.ndarray, # [B] next position (= slot) per row
):
    """Teacher-forced decode loop: feed the given tokens one per step and
    capture each step's full logits — fillCtx (Session.cpp:231-244) as ONE
    device program. The scan body is continue_greedy's with the argmax
    replaced by indexing, so a verifier replaying a fast-loop prover's
    claim executes the same per-step program shape (loop-context numerics
    match, unlike replaying through the step path on backends whose fusion
    differs between loop and straight-line code). Returns
    (all_logits [B, n, V] f32, cache)."""
    B, n = tokens.shape
    fwd = _forward_for(st)
    cache, _hd = _fused_merge(st, params, cache)
    st = _st_for(st, _hd)

    def body(carry, tok):
        cache, pos = carry
        logits2, cache = fwd(
            params, st, tok[:, None], pos[:, None], pos[:, None],
            cache, jnp.zeros((B,), jnp.int32),
        )
        return (cache, pos + 1), logits2

    (cache, _), all_logits = jax.lax.scan(
        body, (cache, start_pos), tokens.swapaxes(0, 1))
    return all_logits.swapaxes(0, 1), _fused_unmerge(cache, _hd)


@partial(jax.jit, static_argnums=(0, 5))
def continue_greedy(
    st: "llama_mod.LlamaStatic",
    params,
    cache: KVCache,
    logits0: jnp.ndarray,   # [B, V] current logits (host-pulled state re-fed)
    start_pos: jnp.ndarray, # [B] next position (= slot) per row
    n_steps: int,
):
    """Continue greedy generation from an existing session state.

    Per step: argmax current logits → decode token at the next sequential
    slot → capture new logits. Returns (tokens [B, n], full_logits
    [B, n, V] f32, cache). Used as the Session's device-loop fast path:
    sequential slots match the SlotAllocator so the cache state after
    truncation-rollback is identical to the step-by-step path.
    """
    B = logits0.shape[0]
    fwd = _forward_for(st)
    cache, _hd = _fused_merge(st, params, cache)
    st = _st_for(st, _hd)

    def body(carry, _):
        cache, logits, pos = carry
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, cache = fwd(
            params, st, tok[:, None], pos[:, None], pos[:, None],
            cache, jnp.zeros((B,), jnp.int32),
        )
        return (cache, logits2, pos + 1), (tok, logits2)

    (cache, _, _), (tokens, all_logits) = jax.lax.scan(
        body, (cache, logits0, start_pos), None, length=n_steps
    )
    return tokens.swapaxes(0, 1), all_logits.swapaxes(0, 1), _fused_unmerge(cache, _hd)
