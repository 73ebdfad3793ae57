"""Paged KV-cache tests: kernel/view bit-exactness vs the dense layout,
physical-placement invariance, paged scheduler == dense scheduler == solo
Session, page recycling under a tight pool, and pool-dry semantics
(ops/paged_kv.py, ops/pallas/paged_attention.py, server/scheduler.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blama_tpu.gguf import GGMLType
from blama_tpu.ops.kv_cache import KVCache, quantize_kv
from blama_tpu.ops.paged_kv import PagedKVCache, PageAllocator
from blama_tpu.ops.pallas import decode_attention as da
from blama_tpu.ops.pallas import paged_attention as pa
from blama_tpu.runtime.model import Model, ModelParams
from blama_tpu.runtime.sampler import SamplerParams
from blama_tpu.server.scheduler import (ContinuousBatchingScheduler,
                                        GenRequest, VerifyRequest)
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pg") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    yield m
    m.close()


# -- op level -----------------------------------------------------------------

def _scrambled_pool(rng, B, Hkv, D, G, MP, P, lens, int8=False):
    """Pool with rows on non-contiguous physical pages + its dense mirror."""
    kp = jnp.asarray(rng.standard_normal((P, G, Hkv, D)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((P, G, Hkv, D)), jnp.float32)
    pool_pos = np.full((P, G), -1, np.int32)
    tables = np.full((B, MP), -1, np.int32)
    tables[0, :3] = [7, 3, 11]
    tables[1, :2] = [2, 9]
    for b in range(B):
        for s in range(lens[b]):
            pool_pos[tables[b, s // G], s % G] = s
    S = MP * G
    kd = np.zeros((B, S, Hkv, D), np.float32)
    vd = np.zeros((B, S, Hkv, D), np.float32)
    posd = np.full((B, S), -1, np.int32)
    for b in range(B):
        for lp in range(MP):
            if tables[b, lp] >= 0:
                kd[b, lp * G:(lp + 1) * G] = np.asarray(kp[tables[b, lp]])
                vd[b, lp * G:(lp + 1) * G] = np.asarray(vp[tables[b, lp]])
        posd[b, :lens[b]] = np.arange(lens[b])
    return (kp, vp, jnp.asarray(pool_pos), jnp.asarray(tables),
            jnp.asarray(kd), jnp.asarray(vd), jnp.asarray(posd))


def test_paged_decode_bitexact_vs_dense_scrambled_pages():
    """Page size == the dense kernel's sequence block -> identical online-
    softmax walk, so paged output is BIT-exact vs dense no matter where the
    row's pages sit physically (placement invariance)."""
    rng = np.random.default_rng(0)
    B, H, Hkv, D, G, MP, P = 2, 8, 2, 64, 128, 3, 16  # S=384 -> dense block 128
    lens = [300, 160]
    kp, vp, pool_pos, tables, kd, vd, posd = _scrambled_pool(
        rng, B, Hkv, D, G, MP, P, lens)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    q_pos = jnp.asarray([lens[0] - 1, lens[1] - 1], jnp.int32)
    invf, ms = da.effective_inv_freq(D, D, 10000.0)

    out_p = pa.paged_decode_attention(q, kp, vp, pool_pos, tables, q_pos,
                                      invf, mscale=ms)
    out_d = da.decode_attention(q, kd, vd, q_pos, posd, invf, mscale=ms)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_d))


def test_paged_decode_int8_bitexact():
    rng = np.random.default_rng(1)
    B, H, Hkv, D, G, MP, P = 2, 8, 2, 64, 128, 3, 16
    lens = [300, 160]
    kp, vp, pool_pos, tables, kd, vd, posd = _scrambled_pool(
        rng, B, Hkv, D, G, MP, P, lens)
    kc, ks = quantize_kv(kp.reshape(1, P * G, Hkv, D))
    vc, vs = quantize_kv(vp.reshape(1, P * G, Hkv, D))
    kc, ks = kc.reshape(P, G, Hkv, D), ks.reshape(P, G, Hkv)
    vc, vs = vc.reshape(P, G, Hkv, D), vs.reshape(P, G, Hkv)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    q_pos = jnp.asarray([lens[0] - 1, lens[1] - 1], jnp.int32)
    invf, ms = da.effective_inv_freq(D, D, 10000.0)

    out_p = pa.paged_decode_attention(q, kc, vc, pool_pos, tables, q_pos,
                                      invf, k_scale=ks, v_scale=vs, mscale=ms)
    # dense mirror of codes + scales
    S = MP * G
    kdq = np.zeros((B, S, Hkv, D), np.int8)
    vdq = np.zeros((B, S, Hkv, D), np.int8)
    ksd = np.zeros((B, S, Hkv), np.float32)
    vsd = np.zeros((B, S, Hkv), np.float32)
    tb = np.asarray(tables)
    for b in range(B):
        for lp in range(MP):
            if tb[b, lp] >= 0:
                kdq[b, lp * G:(lp + 1) * G] = np.asarray(kc[tb[b, lp]])
                vdq[b, lp * G:(lp + 1) * G] = np.asarray(vc[tb[b, lp]])
                ksd[b, lp * G:(lp + 1) * G] = np.asarray(ks[tb[b, lp]])
                vsd[b, lp * G:(lp + 1) * G] = np.asarray(vs[tb[b, lp]])
    out_d = da.decode_attention(q, jnp.asarray(kdq), jnp.asarray(vdq), q_pos,
                                posd, invf, k_scale=jnp.asarray(ksd),
                                v_scale=jnp.asarray(vsd), mscale=ms)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_d))


def test_paged_prefill_bitexact_vs_dense():
    rng = np.random.default_rng(2)
    B, H, Hkv, D, G, MP, P = 2, 8, 2, 64, 128, 3, 16
    lens = [300, 160]
    kp, vp, pool_pos, tables, kd, vd, posd = _scrambled_pool(
        rng, B, Hkv, D, G, MP, P, lens)
    T = 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    qpos = np.stack([np.arange(lens[b] - T, lens[b]) for b in range(B)])
    invf, ms = da.effective_inv_freq(D, D, 10000.0)

    out_p = pa.paged_prefill_attention(q, kp, vp, pool_pos, tables,
                                       jnp.asarray(qpos), invf, mscale=ms)
    out_d = da.prefill_attention(q, kd, vd, jnp.asarray(qpos), posd, invf,
                                 mscale=ms)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_d))


def test_paged_decode_edited_position_map():
    """Context-shift-style position edits live in the POOL position map; the
    paged kernel must honor them exactly like the dense kernel (ADVICE r1 #4
    analog for the paged path)."""
    rng = np.random.default_rng(3)
    B, H, Hkv, D, G, MP, P = 2, 8, 2, 64, 128, 3, 16
    lens = [300, 160]
    kp, vp, pool_pos, tables, kd, vd, posd = _scrambled_pool(
        rng, B, Hkv, D, G, MP, P, lens)
    # simulate seq_rm(5,20) + seq_add(20,300,-15) on row 0 in both layouts
    pp = np.asarray(pool_pos).copy()
    pd = np.asarray(posd).copy()
    tb = np.asarray(tables)
    for s in range(lens[0]):
        page, off = tb[0, s // G], s % G
        v = pp[page, off]
        if 5 <= v < 20:
            pp[page, off] = -1
        elif v >= 20:
            pp[page, off] = v - 15
    m1 = (pd[0] >= 5) & (pd[0] < 20)
    m2 = pd[0] >= 20
    pd[0][m1] = -1
    pd[0][m2] -= 15
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    q_pos = jnp.asarray([lens[0] - 1 - 15, lens[1] - 1], jnp.int32)
    invf, ms = da.effective_inv_freq(D, D, 10000.0)
    out_p = pa.paged_decode_attention(q, kp, vp, jnp.asarray(pp), tables,
                                      q_pos, invf, mscale=ms)
    out_d = da.decode_attention(q, kd, vd, q_pos, jnp.asarray(pd), invf,
                                mscale=ms)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_d))


# -- allocator ----------------------------------------------------------------

def test_page_allocator_recycles_deterministically():
    a = PageAllocator(n_pages=4, page_size=128, max_pages_per_row=2, n_rows=2)
    s0 = a.allocate_slots(0, 130)   # pages 0,1
    assert list(a.tables[0][:2]) == [0, 1]
    s1 = a.allocate_slots(1, 10)    # page 2
    assert a.tables[1][0] == 2
    assert a.free_pages == 1
    # row window cap: row 1 may grow to 2 pages only
    assert a.allocate_slots(1, 128 * 2) is None
    freed = a.free_row(0)
    assert sorted(freed) == [0, 1] and a.free_pages == 3
    # lowest-physical-first reuse
    s2 = a.allocate_slots(0, 1)
    assert a.tables[0][0] == 0
    # flat indices are page*G + offset
    assert s0[0] == 0 and s0[129] == 1 * 128 + 1 and s1[0] == 2 * 128


def test_pool_exhaustion_returns_none():
    a = PageAllocator(n_pages=2, page_size=128, max_pages_per_row=4, n_rows=1)
    assert a.allocate_slots(0, 256) is not None
    assert a.allocate_slots(0, 1) is None  # pool dry
    assert not a.can_admit(1)              # needs 1 page + 1 headroom


# -- scheduler ----------------------------------------------------------------

PROMPTS = ["hello world", "the quick brown fox", "a",
           "verification is the product"]


def _run_sched(model, paged, n_pages=0, max_tokens=8):
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=256,
                                        paged=paged, n_pages=n_pages)
    outs = {}
    for i, pr in enumerate(PROMPTS):
        toks = model.vocab.tokenize(pr, True, True)
        sched.submit(GenRequest(
            prompt=toks, max_tokens=max_tokens,
            sampler_params=SamplerParams(temp=0.0),
            on_done=lambda g, i=i: outs.__setitem__(i, [x.token for x in g])))
    sched.run_until_idle()
    return outs


def test_paged_scheduler_matches_dense(model):
    dense = _run_sched(model, paged=False)
    paged = _run_sched(model, paged=True)
    assert dense == paged


def test_paged_scheduler_tight_pool_recycles(model):
    """A pool SMALLER than max_batch x ctx_size still serves every request
    (admission by pages, page recycling across requests) with identical
    greedy output — the capability the fixed-row layout lacks."""
    dense = _run_sched(model, paged=False)
    tight = _run_sched(model, paged=True, n_pages=5)  # 2 rows x 2 pages + 1
    assert tight == dense


def test_paged_verify_row_scores_one(model):
    """Dense-scheduler prover -> paged-scheduler verifier replay: 1.0."""
    toks = model.vocab.tokenize(PROMPTS[1], True, True)
    holder = {}
    sd = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=256)
    sd.submit(GenRequest(prompt=toks, max_tokens=8,
                         sampler_params=SamplerParams(temp=0.0),
                         on_done=lambda g: holder.__setitem__("p", g)))
    sd.run_until_idle()
    sp = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=256,
                                     paged=True)
    sp.submit(VerifyRequest(prompt=toks, predictions=holder["p"],
                            on_done=lambda s: holder.__setitem__("s", s)))
    sp.run_until_idle()
    assert holder["s"] == 1.0


def test_paged_pool_dry_finishes_early(model):
    """When the pool runs out mid-decode the starved row returns what it has
    instead of raising (class docstring policy)."""
    toks = model.vocab.tokenize("hello world", True, True)
    # 1 row, 2-page pool, 128-slot pages; prompt fits page 1, decode crosses
    # into page 2, then the pool is dry at slot 256 -> early finish
    sched = ContinuousBatchingScheduler(model, max_batch=1, ctx_size=256,
                                        paged=True, n_pages=2)
    holder = {}
    sched.submit(GenRequest(prompt=toks, max_tokens=10_000,
                            sampler_params=SamplerParams(temp=0.0),
                            on_done=lambda g: holder.__setitem__(0, g)))
    sched.run_until_idle()
    n = len(holder[0])
    assert 0 < n < 10_000
    # row's slots are bounded by the pool: prompt + generated <= 256
    assert len(toks) + n <= 256


def test_paged_scheduler_moe(tmp_path):
    """MoE models serve through the paged scheduler too (moe.forward paged
    branch): paged greedy == dense greedy."""
    from blama_tpu.testing import write_tiny_moe

    p = str(tmp_path / "moe.gguf")
    write_tiny_moe(p)
    m = Model(p)
    try:
        dense = _run_sched(m, paged=False, max_tokens=6)
        paged = _run_sched(m, paged=True, max_tokens=6)
        assert dense == paged
    finally:
        m.close()


def test_paged_oversized_prompt_rejected(model):
    sched = ContinuousBatchingScheduler(model, max_batch=1, ctx_size=256,
                                        paged=True, n_pages=2)
    holder = {}
    sched.submit(GenRequest(prompt=list(range(5, 300)), max_tokens=4,
                            sampler_params=SamplerParams(temp=0.0),
                            on_done=lambda g: holder.__setitem__(0, g)))
    # needs 3 pages (+1 headroom) > 2-page pool -> rejected, empty result
    sched.run_until_idle()
    assert holder[0] == []


def test_paged_pool_dry_reports_evicted(model):
    """Pool starvation is observable: the truncated request carries
    finish_reason == "evicted" (VERDICT r3 next #8), while an oversized
    prompt is "rejected" and a normal completion is "stop"/"length"."""
    toks = model.vocab.tokenize("hello world", True, True)
    sched = ContinuousBatchingScheduler(model, max_batch=1, ctx_size=256,
                                        paged=True, n_pages=2)
    holder = {}
    starved = GenRequest(prompt=toks, max_tokens=10_000,
                         sampler_params=SamplerParams(temp=0.0),
                         on_done=lambda g: holder.__setitem__(0, g))
    sched.submit(starved)
    sched.run_until_idle()
    assert 0 < len(holder[0]) < 10_000
    assert starved.finish_reason in ("evicted", "length")
    # 2-page pool = 256-slot window = ctx: here the window and pool coincide,
    # so either reason is honest; with a pool smaller than the window the
    # reason must be "evicted":
    sched2 = ContinuousBatchingScheduler(model, max_batch=1, ctx_size=512,
                                         paged=True, n_pages=2)
    starved2 = GenRequest(prompt=toks, max_tokens=10_000,
                          sampler_params=SamplerParams(temp=0.0),
                          on_done=lambda g: holder.__setitem__(1, g))
    sched2.submit(starved2)
    sched2.run_until_idle()
    assert starved2.finish_reason == "evicted"

    rejected = GenRequest(prompt=list(range(5, 300)), max_tokens=4,
                          sampler_params=SamplerParams(temp=0.0),
                          on_done=lambda g: holder.__setitem__(2, g))
    sched2.submit(rejected)
    sched2.run_until_idle()
    assert rejected.finish_reason == "rejected" and holder[2] == []


def test_paged_horizon_pool_dry_finishes_early(model):
    """The horizon loop under paged KV also honors the pool-dry policy."""
    toks = model.vocab.tokenize("hello world", True, True)
    sched = ContinuousBatchingScheduler(model, max_batch=1, ctx_size=512,
                                        paged=True, n_pages=2, horizon=8)
    holder = {}
    req = GenRequest(prompt=toks, max_tokens=10_000,
                     sampler_params=SamplerParams(temp=0.0),
                     on_done=lambda g: holder.__setitem__(0, g))
    sched.submit(req)
    sched.run_until_idle()
    n = len(holder[0])
    assert 0 < n < 10_000
    assert len(toks) + n <= 256  # bounded by the 2-page pool
    assert req.finish_reason == "evicted"


def test_scheduler_server_finish_reason_in_response(model):
    """SchedulerServer responses carry finish_reason (HTTP extension)."""
    import threading

    from blama_tpu.server.scheduler_server import SchedulerServer
    from blama_tpu.server.server import CompleteRequestParams

    srv = SchedulerServer(model, max_batch=2)
    try:
        done = threading.Event()
        box = {}
        srv.complete_text(
            CompleteRequestParams(prompt="the cat sat", max_tokens=4,
                                  temperature=0.0, seed=1),
            lambda r: (box.setdefault("r", r), done.set()))
        assert done.wait(120)
        assert getattr(box["r"], "finish_reason", None) in ("stop", "length")
    finally:
        srv.close()


def test_paged_preempt_and_resume_completes(model):
    """Pool contention no longer truncates: a starved row is PREEMPTED
    (pages released, request requeued) and completes by re-prefilling its
    prompt + generated prefix once pages free up (round 4). Every request
    gets its full token budget; only a request that cannot fit the pool
    even solo is evicted."""
    # pool of 3 pages (384 slots), window 256: two growing requests cannot
    # both stay resident, but each fits solo
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=256,
                                        paged=True, n_pages=3)
    outs = {}
    reqs = []
    for i, pr in enumerate(["hello world", "the quick brown fox"]):
        toks = model.vocab.tokenize(pr, True, True)
        r = GenRequest(prompt=toks, max_tokens=180,
                       sampler_params=SamplerParams(temp=0.0),
                       on_done=lambda g, i=i: outs.__setitem__(i, g))
        reqs.append(r)
        sched.submit(r)
    sched.run_until_idle()
    assert set(outs) == {0, 1}
    for i, r in enumerate(reqs):
        # both complete their FULL budget (or stop at the ctx window)
        assert r.finish_reason in ("stop", "length"), r.finish_reason
        assert len(outs[i]) == 180 or r.finish_reason == "stop"
    # pool fully recycled
    assert sched._alloc.free_pages == 3


def test_paged_preempt_resume_matches_uncontended(model):
    """A preempted-and-resumed greedy request produces the same tokens as
    the same request on an uncontended pool (re-prefill numerics: greedy
    argmaxes on this fixture are stable across the chunked re-prefill)."""
    toks = model.vocab.tokenize("the cat sat", True, True)

    def run(n_pages, with_noise):
        sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=256,
                                            paged=True, n_pages=n_pages)
        outs = {}
        if with_noise:
            sched.submit(GenRequest(
                prompt=model.vocab.tokenize("hello world", True, True),
                max_tokens=150, sampler_params=SamplerParams(temp=0.0),
                on_done=lambda g: outs.__setitem__("n", g)))
        sched.submit(GenRequest(prompt=toks, max_tokens=120,
                                sampler_params=SamplerParams(temp=0.0),
                                on_done=lambda g: outs.__setitem__("t", g)))
        sched.run_until_idle()
        return [x.token for x in outs["t"]]

    contended = run(3, True)     # forces at least one preemption
    solo = run(8, False)
    assert contended == solo


def test_resume_admission_gates_on_resume_length(model):
    """ADVICE r4 high: a preempted request re-prefills prompt+GENERATED, so
    paged admission must gate on the resume length — the old len(prompt)
    check admitted into a pool too small for the resume and tripped the
    allocate_slots assert, killing the scheduler thread."""
    from blama_tpu.runtime.sampler import Sampler

    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64,
                                        paged=True, page_size=8, n_pages=6)
    base = model.vocab.tokenize("the cat sat on the mat", True, True)
    req = GenRequest(prompt=base[:4], max_tokens=30,
                     sampler_params=SamplerParams(temp=0.0))
    # craft the post-preemption state: 20 resume tokens (3 pages + headroom)
    resume = (base * 6)[:20]
    sampler = Sampler(model.vocab, req.sampler_params)
    for t in resume:
        sampler.accept(t, False)
    req._resume = (resume, sampler, [])
    # row 1 pins 4 of the 6 pages → 2 free: enough for the 4-token prompt
    # (1 page + headroom) but NOT for the 20-token resume (3 pages + headroom)
    assert sched._alloc.allocate_slots(1, 4 * 8) is not None
    sched.submit(req)
    sched._admit()  # old code: AssertionError here
    assert all(s.request is None for s in sched._slots)  # parked, not admitted
    sched._alloc.free_row(1)
    sched.run_until_idle()
    assert req.finish_reason in ("stop", "length")


@pytest.mark.parametrize("horizon", [8])
def test_horizon_plan_budget_last_free_page(model, horizon):
    """ADVICE r4 high: two rows at page boundaries planning a horizon must
    not both count the same last free page — the plan threads a shrinking
    page budget; the loser is preempted and later completes instead of the
    scheduler thread dying on the allocation assert."""
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64,
                                        paged=True, page_size=8, n_pages=3,
                                        horizon=horizon)
    base = model.vocab.tokenize("the cat sat on the mat hello world", True, True)
    prompt = (base * 3)[:8]  # exactly one page → next token needs a fresh page
    outs = {}
    for i in range(2):
        sched.submit(GenRequest(prompt=list(prompt), max_tokens=10,
                                sampler_params=SamplerParams(temp=0.0),
                                on_done=lambda g, i=i: outs.__setitem__(i, g)))
    sched.run_until_idle()  # old code: AssertionError in _horizon_iteration
    assert set(outs) == {0, 1}
    assert all(len(outs[i]) == 10 or
               model.vocab.is_eog(outs[i][-1].token) for i in range(2))
    # identical prompts → identical greedy streams, and vs the dense path
    dense = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64)
    ref = {}
    dense.submit(GenRequest(prompt=list(prompt), max_tokens=10,
                            sampler_params=SamplerParams(temp=0.0),
                            on_done=lambda g: ref.__setitem__(0, g)))
    dense.run_until_idle()
    want = [p.token for p in ref[0]]
    for i in range(2):
        assert [p.token for p in outs[i]] == want
    assert sched._alloc.free_pages == 3  # pool fully recycled


# -- sharded paged pool (VERDICT r4 #3) --------------------------------------

@pytest.fixture(scope="module")
def quant_paged_gguf(tmp_path_factory):
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path_factory.mktemp("qpm") / "q.gguf")
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))
    return p


def test_paged_fused_attention_sharded_bit_exact(quant_paged_gguf):
    """Pallas paged attention under a tp mesh (per-head shard_map island,
    pool sharded on the kv-head axis): scheduler greedy streams with
    paged + fused attention are IDENTICAL solo vs tp=2, and match the
    dense-cache scheduler (placement-invariant logical view)."""
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.sampler import SamplerParams

    prompts = ["hello world", "the cat sat"]

    def run(mesh, paged, attn="fused"):
        m = Model(quant_paged_gguf, ModelParams(
            dtype="q4k_a8", mesh=mesh, tp_blocks=4, attn=attn))
        try:
            sched = ContinuousBatchingScheduler(
                m, max_batch=2, ctx_size=256,
                **(dict(paged=True, page_size=128) if paged else {}))
            outs = {}
            for i, p in enumerate(prompts):
                sched.submit(GenRequest(
                    prompt=m.vocab.tokenize(p, True, True), max_tokens=6,
                    sampler_params=SamplerParams(temp=0.0),
                    on_done=lambda g, i=i: outs.__setitem__(
                        i, [x.token for x in g])))
            sched.run_until_idle()
            return [outs[i] for i in range(len(prompts))]
        finally:
            m.close()

    solo_paged = run(None, True)
    tp2_paged = run(make_mesh(1, 2), True)
    tp2_dense = run(make_mesh(1, 2), False)
    assert solo_paged == tp2_paged == tp2_dense


def test_sharded_fused_kernels_actually_dispatch(quant_paged_gguf, monkeypatch):
    """Guard against silent XLA-attention fallback: at a kernel-supported
    geometry, the mesh path must call the SHARDED Pallas wrappers (the
    round-5 inv_freq_e spec-rank bug hid behind exactly this fallback)."""
    import blama_tpu.ops.pallas.decode_attention as dattn
    import blama_tpu.ops.pallas.paged_attention as pattn
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.sampler import SamplerParams

    calls = {"dense": 0, "paged": 0}
    orig_d = dattn.decode_attention_sharded
    orig_p = pattn.paged_decode_attention_sharded

    def spy_d(*a, **k):
        calls["dense"] += 1
        return orig_d(*a, **k)

    def spy_p(*a, **k):
        calls["paged"] += 1
        return orig_p(*a, **k)

    monkeypatch.setattr(dattn, "decode_attention_sharded", spy_d)
    monkeypatch.setattr(pattn, "paged_decode_attention_sharded", spy_p)

    for paged in (False, True):
        m = Model(quant_paged_gguf, ModelParams(
            dtype="q4k_a8", mesh=make_mesh(1, 2), tp_blocks=4, attn="fused"))
        try:
            sched = ContinuousBatchingScheduler(
                m, max_batch=2, ctx_size=256,
                **(dict(paged=True, page_size=128) if paged else {}))
            done = {}
            sched.submit(GenRequest(
                prompt=m.vocab.tokenize("hello", True, True), max_tokens=2,
                sampler_params=SamplerParams(temp=0.0),
                on_done=lambda g: done.__setitem__("g", g)))
            sched.run_until_idle()
            assert len(done["g"]) == 2
        finally:
            m.close()
    assert calls["dense"] > 0, "dense sharded fused kernel never dispatched"
    assert calls["paged"] > 0, "paged sharded fused kernel never dispatched"


def test_paged_horizon_stacked_pool_matches_per_token(quant_paged_gguf,
                                                      monkeypatch):
    """Horizon mode carries the paged pool MERGED ([L, P, G, Hkv*D], scales
    transposed) across scheduler_loop and the kernel reads each layer in
    place (paged analog of the dense pre-merged carry; VERDICT r4 #7).
    Greedy streams must equal the per-token paged scheduler's, and the
    stacked kernel (layer=...) must actually dispatch."""
    from blama_tpu.ops.pallas import paged_attention as pattn

    layers_seen = []
    real = pattn.paged_decode_attention

    def spy(*a, **kw):
        layers_seen.append(kw.get("layer"))
        return real(*a, **kw)

    monkeypatch.setattr(pattn, "paged_decode_attention", spy)

    def run(horizon):
        m = Model(quant_paged_gguf, ModelParams(dtype="q4k_a8", attn="fused"))
        try:
            sched = ContinuousBatchingScheduler(
                m, max_batch=2, ctx_size=256, paged=True, page_size=128,
                horizon=horizon)
            outs = {}
            for i, p in enumerate(["hello world", "the cat sat"]):
                sched.submit(GenRequest(
                    prompt=m.vocab.tokenize(p, True, True), max_tokens=6,
                    sampler_params=SamplerParams(temp=0.0),
                    on_done=lambda g, i=i: outs.__setitem__(
                        i, [x.token for x in g])))
            sched.run_until_idle()
            return [outs[i] for i in range(2)]
        finally:
            m.close()

    per_token = run(0)
    layers_seen.clear()
    horizon = run(4)
    assert horizon == per_token
    # the stacked in-place path dispatched for every layer
    assert set(x for x in layers_seen if x is not None) == {0, 1}, layers_seen


def test_paged_pool_contention_stress(model):
    """Threaded stress of the PAGED scheduler under pool oversubscription —
    the regime both round-4 ADVICE-high crashes lived in (resume admission
    sized by prompt only; horizon planning ignoring same-plan page draws).
    Producer threads race submits of mixed-size requests against a pool far
    smaller than the aggregate demand while a saboteur cancels; every
    request must reach a terminal state exactly once with a legal
    finish_reason, the scheduler thread must survive (no assert death /
    deadlock), and the pool must drain back to fully free."""
    import random
    import threading
    import time

    for horizon in (0, 3):
        sched = ContinuousBatchingScheduler(
            model, max_batch=3, ctx_size=512, paged=True, page_size=32,
            n_pages=10, horizon=horizon)  # 10 pages << 3 rows x 16 pages
        sched.start()
        try:
            lock = threading.Lock()
            done = {}
            requests = []

            def producer(t):
                rng = random.Random(1000 + t)
                for i in range(5):
                    key = (t, i)
                    # mix: small prompts that decode long (cross pages,
                    # force preempt/resume), and mid prompts near the
                    # admission edge; max_tokens large enough to contend
                    n_prompt = rng.choice([3, 20, 40, 90])
                    req = GenRequest(
                        prompt=list(range(5, 5 + n_prompt)),
                        max_tokens=rng.choice([4, 30, 80]),
                        sampler_params=SamplerParams(temp=0.0),
                        on_done=lambda g, key=key: _mark(key))
                    with lock:
                        done.setdefault(key, 0)
                        requests.append(req)
                    sched.submit(req)
                    time.sleep(rng.random() * 0.005)

            def _mark(key):
                with lock:
                    done[key] += 1

            threads = [threading.Thread(target=producer, args=(t,))
                       for t in range(3)]
            for th in threads:
                th.start()
            sab = random.Random(7)
            deadline = time.time() + 120
            for th in threads:
                th.join(timeout=60)
            while time.time() < deadline:
                with lock:
                    snap = list(requests)
                for req in snap:
                    if sab.random() < 0.15:
                        ContinuousBatchingScheduler.cancel(req)
                with lock:
                    if (len(done) == 15
                            and all(v == 1 for v in done.values())):
                        break
                # a dead worker thread would hang here forever without this
                assert sched._thread.is_alive(), \
                    "scheduler thread died under paged contention"
                time.sleep(0.05)
            with lock:
                assert len(done) == 15 and all(
                    v == 1 for v in done.values()), done
            for req in requests:
                assert req.finish_reason in (
                    "stop", "length", "evicted", "cancelled", "rejected"), \
                    req.finish_reason
        finally:
            sched.stop()
        # pool fully recycled, rows free, nothing parked
        assert sched._alloc.free_pages == sched._alloc.n_pages
        assert all(s.request is None for s in sched._slots)
        assert sched._queue.empty() and sched._head is None
