"""Continuous-batching scheduler tests: multi-request correctness, per-request
seeds, batch-vs-solo agreement, and metrics (SURVEY.md §7.2 step 8)."""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.sampler import SamplerParams
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.server.scheduler import ContinuousBatchingScheduler, GenRequest
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("s") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    yield m
    m.close()


def greedy_params():
    return SamplerParams(temp=0.0)


def _solo_reference(model, prompt_text, n):
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    s = inst.start_session(SessionInitParams(seed=0, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize(prompt_text, True, True))
    preds = s.complete(CompleteParams(max_tokens=n))
    inst.stop_session()
    return [p.token for p in preds]


def test_multi_request_matches_solo(model):
    """Batched decode of several concurrent prompts produces the same greedy
    tokens as solo Sessions (batch independence of cache rows)."""
    prompts = ["hello world", "the cat sat", "president george"]
    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    results = {}

    def make_done(p):
        def done(preds):
            results[p] = [t.token for t in preds]
        return done

    for p in prompts:
        sched.submit(GenRequest(
            prompt=model.vocab.tokenize(p, True, True),
            max_tokens=6,
            sampler_params=greedy_params(),
            on_done=make_done(p),
        ))
    sched.run_until_idle()

    for p in prompts:
        solo = _solo_reference(model, p, 6)
        assert results[p] == solo, f"prompt {p!r}: batched {results[p]} != solo {solo}"


def test_more_requests_than_batch(model):
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64)
    done = []
    for i in range(5):
        sched.submit(GenRequest(
            prompt=model.vocab.tokenize("hello", True, True),
            max_tokens=3,
            sampler_params=greedy_params(),
            on_done=lambda preds, i=i: done.append((i, [t.token for t in preds])),
        ))
    sched.run_until_idle()
    assert len(done) == 5
    outs = [toks for _, toks in done]
    assert all(o == outs[0] for o in outs)  # identical prompts → identical greedy


def test_per_request_seeds(model):
    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    res = {}
    for name, seed in [("a", 1), ("b", 1), ("c", 2)]:
        sched.submit(GenRequest(
            prompt=model.vocab.tokenize("hello", True, True),
            max_tokens=8,
            sampler_params=SamplerParams(temp=1.5, top_p=1.0, rng_seed=seed),
            on_done=lambda p, n=name: res.__setitem__(n, [t.token for t in p]),
        ))
    sched.run_until_idle()
    assert res["a"] == res["b"]
    assert res["a"] != res["c"]


def test_streaming_callbacks_and_metrics(model):
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64)
    streamed = []
    sched.submit(GenRequest(
        prompt=model.vocab.tokenize("hello world", True, True),
        max_tokens=4,
        sampler_params=greedy_params(),
        on_token=lambda p: streamed.append(p.token),
    ))
    sched.run_until_idle()
    assert len(streamed) >= 1
    snap = sched.metrics.snapshot()
    assert snap["tokens_decoded"] >= len(streamed)
    assert snap["tokens_prefilled"] > 0
    assert "decode_step" in snap["timers"]
    assert len(streamed[: 4]) == len(streamed)
    # top-10 capture present on streamed predictions
    sched2 = ContinuousBatchingScheduler(model, max_batch=1, ctx_size=64)
    caught = []
    sched2.submit(GenRequest(
        prompt=model.vocab.tokenize("hello", True, True),
        max_tokens=2,
        sampler_params=greedy_params(),
        on_token=lambda p: caught.append(p),
    ))
    sched2.run_until_idle()
    assert all(len(p.logits) == 10 for p in caught)


# --- batched teacher-forced verification (VERDICT r1 #7 / SURVEY §7.2.8) ----

def _gen_on_scheduler(model, sched, prompt, n=6):
    out = {}
    sched.submit(GenRequest(
        prompt=model.vocab.tokenize(prompt, True, True), max_tokens=n,
        sampler_params=greedy_params(),
        on_done=lambda preds: out.setdefault("p", preds)))
    sched.run_until_idle()
    return out["p"]


def _verify_on_scheduler(model, sched, prompt, preds, noise=0):
    """Submit a VerifyRequest (optionally alongside `noise` concurrent
    generation rows) and return (score, replayed predictions)."""
    from blama_tpu.server.scheduler import VerifyRequest

    out = {}
    for i in range(noise):
        sched.submit(GenRequest(
            prompt=model.vocab.tokenize(f"noise prompt {i}", True, True),
            max_tokens=8, sampler_params=greedy_params(),
            on_done=lambda _: None))
    sched.submit(VerifyRequest(
        prompt=model.vocab.tokenize(prompt, True, True),
        predictions=preds,
        on_done=lambda s: out.setdefault("score", s),
        on_replayed=lambda r: out.setdefault("rep", r)))
    sched.run_until_idle()
    return out["score"], out["rep"]


def test_batched_verify_bit_exact_same_engine(model):
    """Scheduler prover → scheduler verifier: the teacher-forced batch row
    recomputes bit-identical top-10 logits (score exactly 1.0), the
    e-verify.cpp flow with both sides on the batched engine."""
    prompt = "the cat sat on"
    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    preds = _gen_on_scheduler(model, sched, prompt)
    score, rep = _verify_on_scheduler(model, sched, prompt, preds)
    assert score == 1.0
    for o, r in zip(preds, rep):
        assert [l.token for l in o.logits] == [l.token for l in r.logits]
        assert [l.logit for l in o.logits] == [l.logit for l in r.logits]


def test_batched_verify_batch_invariant(model):
    """The verify row's score and replayed logits do not depend on what else
    shares the batch (SURVEY §7.3 hardest-part #2: batch invariance)."""
    prompt = "hello world again"
    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    preds = _gen_on_scheduler(model, sched, prompt)
    score_alone, rep_alone = _verify_on_scheduler(model, sched, prompt, preds)
    score_noisy, rep_noisy = _verify_on_scheduler(model, sched, prompt, preds,
                                                  noise=3)
    assert score_alone == score_noisy == 1.0
    for a, b in zip(rep_alone, rep_noisy):
        assert [l.logit for l in a.logits] == [l.logit for l in b.logits]


def test_batched_verify_cross_engine_threshold(model):
    """Solo-Session prover → scheduler verifier: cross-engine replay holds at
    the reference's cross-backend thresholds (t-LogitComparer.cpp:78),
    and flags tampered responses."""
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.runtime.token_data import TokenData, TokenPrediction

    prompt = "the dog ran over"
    inst = Instance(model, InstanceInitParams(ctx_size=64, fast_greedy=False))
    s = inst.start_session(SessionInitParams(seed=0, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize(prompt, True, True))
    preds = s.complete(CompleteParams(max_tokens=6))
    inst.stop_session()

    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    score, _ = _verify_on_scheduler(model, sched, prompt, preds)
    assert score >= 0.95

    # tampered response: fabricated logit values must crater the score
    bad = [TokenPrediction(p.token,
                           [TokenData(td.token, td.logit + 7.5)
                            for td in p.logits]) for p in preds]
    score_bad, _ = _verify_on_scheduler(model, sched, prompt, bad)
    assert score_bad < 0.95


def test_scheduler_server_verify_endpoint(model):
    """SchedulerServer routes /verify_completion through the batched path."""
    import threading

    from blama_tpu.server.scheduler_server import SchedulerServer
    from blama_tpu.server.server import CompleteRequestParams

    srv = SchedulerServer(model, max_batch=4)
    try:
        done = threading.Event()
        resp_box = {}
        srv.complete_text(
            CompleteRequestParams(prompt="the cat sat", max_tokens=5,
                                  temperature=0.0, seed=1),
            lambda r: (resp_box.setdefault("r", r), done.set()))
        assert done.wait(120)
        done2 = threading.Event()
        srv.verify(CompleteRequestParams(prompt="the cat sat", temperature=0.0,
                                         seed=1),
                   resp_box["r"], lambda s: (resp_box.setdefault("s", s), done2.set()))
        assert done2.wait(120)
        assert resp_box["s"] == 1.0
    finally:
        srv.close()


def test_thread_stress_concurrent_submit_and_cancel(model):
    """Race-focused stress of the threaded scheduler (VERDICT r2 next #8 /
    §5.2 sanitizer analog): many producer threads submit while the worker
    thread decodes, a saboteur cancels a random half mid-flight. Every
    request's on_done must fire exactly once, nothing deadlocks, and all
    rows/queue state drain clean."""
    import random
    import threading
    import time

    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    sched.start()
    try:
        N_THREADS, N_REQ = 4, 6
        lock = threading.Lock()
        done_counts = {}
        requests = []

        def producer(t):
            rng = random.Random(t)
            for i in range(N_REQ):
                key = (t, i)
                req = GenRequest(
                    prompt=model.vocab.tokenize(f"stress {t} {i}", True, True),
                    max_tokens=6, sampler_params=greedy_params(),
                    on_done=lambda preds, key=key: _mark(key))
                with lock:
                    done_counts.setdefault(key, 0)
                    requests.append(req)
                sched.submit(req)
                time.sleep(rng.random() * 0.01)

        def _mark(key):
            with lock:
                done_counts[key] += 1

        threads = [threading.Thread(target=producer, args=(t,))
                   for t in range(N_THREADS)]
        for th in threads:
            th.start()
        # saboteur: cancel a random half while the worker is busy
        saboteur_rng = random.Random(99)
        deadline = time.time() + 30
        for th in threads:
            th.join(timeout=30)
        while time.time() < deadline:
            with lock:
                snapshot = list(requests)
            for req in snapshot:
                if saboteur_rng.random() < 0.3:
                    ContinuousBatchingScheduler.cancel(req)
            with lock:
                if (len(done_counts) == N_THREADS * N_REQ
                        and all(v == 1 for v in done_counts.values())):
                    break
            time.sleep(0.05)
        with lock:
            assert len(done_counts) == N_THREADS * N_REQ
            assert all(v == 1 for v in done_counts.values()), done_counts
    finally:
        sched.stop()
    # all rows freed, queue drained
    assert all(s.request is None and s.verify is None for s in sched._slots)
    assert sched._queue.empty() and sched._head is None


def test_horizon_matches_per_token_and_solo(model):
    """Horizon mode (multi-step device loop, logits kept on device) produces
    the same greedy tokens as the per-token scheduler and solo Sessions."""
    prompts = ["the cat sat", "hello world how", "one two three four"]
    results = {}
    for horizon in (0, 6):
        sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64,
                                            horizon=horizon)
        outs = {}
        for i, p in enumerate(prompts):
            sched.submit(GenRequest(
                prompt=model.vocab.tokenize(p, True, True), max_tokens=8,
                sampler_params=greedy_params(),
                on_done=lambda preds, i=i: outs.__setitem__(
                    i, [pr.token for pr in preds])))
        sched.run_until_idle()
        results[horizon] = outs
    assert results[0] == results[6]
    for i, p in enumerate(prompts):
        assert results[6][i] == _solo_reference(model, p, 8)


def test_horizon_verify_row_scores_one(model):
    """A verify row replayed through the horizon loop scores 1.0 against a
    prover generated by the same horizon scheduler (same-engine replay)."""
    from blama_tpu.server.scheduler import VerifyRequest

    prompt = model.vocab.tokenize("the dog ran over", True, True)
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64,
                                        horizon=4)
    got = {}
    sched.submit(GenRequest(prompt=prompt, max_tokens=7,
                            sampler_params=greedy_params(),
                            on_done=lambda preds: got.__setitem__("p", preds)))
    sched.run_until_idle()
    sched.submit(VerifyRequest(prompt=prompt, predictions=got["p"],
                               on_done=lambda s: got.__setitem__("s", s)))
    sched.run_until_idle()
    assert got["s"] == 1.0, got["s"]


def test_horizon_mode_transition(model):
    """A non-greedy request arriving mid-flight drops the scheduler to the
    per-token path; the stale-logits sync must keep greedy rows correct."""
    prompt_a = model.vocab.tokenize("the cat sat on", True, True)
    prompt_b = model.vocab.tokenize("hello there", True, True)
    ref = _solo_reference(model, "the cat sat on", 10)

    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64,
                                        horizon=4)
    outs = {}
    sched.submit(GenRequest(prompt=prompt_a, max_tokens=10,
                            sampler_params=greedy_params(),
                            on_done=lambda p: outs.__setitem__("a", [x.token for x in p])))
    # run a few horizon iterations, then inject a sampled (non-greedy) req
    sched._iteration()
    sched.submit(GenRequest(prompt=prompt_b, max_tokens=4,
                            sampler_params=SamplerParams(temp=0.7, rng_seed=3),
                            on_done=lambda p: outs.__setitem__("b", [x.token for x in p])))
    sched.run_until_idle()
    assert outs["a"] == ref, (outs["a"], ref)
    assert len(outs["b"]) == 4


def test_finish_reason_stop_length_cancelled(model):
    """finish_reason surfaces why a request ended (VERDICT r3 weak #4 /
    next #8): max_tokens → "length"; explicit cancel → "cancelled"."""
    sched = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64)
    reqs = {}
    r1 = GenRequest(prompt=model.vocab.tokenize("hello world", True, True),
                    max_tokens=3, sampler_params=greedy_params(),
                    on_done=lambda p: reqs.__setitem__("len", p))
    sched.submit(r1)
    sched.run_until_idle()
    assert r1.finish_reason == "length"
    assert len(reqs["len"]) == 3

    r2 = GenRequest(prompt=model.vocab.tokenize("the cat", True, True),
                    max_tokens=64, sampler_params=greedy_params(),
                    on_done=lambda p: reqs.__setitem__("c", p))
    ContinuousBatchingScheduler.cancel(r2)
    sched.submit(r2)
    sched.run_until_idle()
    assert r2.finish_reason == "cancelled"


def test_prefill_packs_concurrent_admissions(model):
    """Concurrent admissions prefill in SHARED [B, T] dispatches: with equal
    prompt-length buckets, 3 admitted rows cost 1 prefill dispatch, not 3
    full passes + 3 logit-recovery passes (VERDICT r3 #7)."""
    sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64)
    calls = []
    real = sched._step
    sched._step = lambda *a: (calls.append(a[1].shape), real(*a))[1]
    prompts = ["hello world", "the cat sat", "hello there cat"]
    toks = [model.vocab.tokenize(p, True, True) for p in prompts]
    # same power-of-2 bucket → rows must share one dispatch
    assert len({max(8, 1 << (len(t) - 1).bit_length()) for t in toks}) == 1
    outs = {}
    for i, t in enumerate(toks):
        sched.submit(GenRequest(
            prompt=t, max_tokens=2,
            sampler_params=greedy_params(),
            on_done=lambda g, i=i: outs.__setitem__(i, [x.token for x in g])))
    sched._iteration()  # one iteration: admits all three + first decode
    prefill_calls = [s for s in calls if s[1] > 1]
    assert len(prefill_calls) == 1, prefill_calls  # one shared prefill pass
    sched.run_until_idle()
    for i, p in enumerate(prompts):
        assert outs[i] == _solo_reference(model, p, 2)


def test_horizon_paged_matches_dense(model):
    """Horizon mode composes with paged KV (VERDICT r3 #6): greedy tokens
    match the dense per-token scheduler and solo Sessions."""
    prompts = ["the cat sat", "hello world how", "one two three four"]
    results = {}
    for key, kw in (("dense", {}),
                    ("hp", dict(paged=True, horizon=6)),
                    ("hp_tight", dict(paged=True, horizon=6, n_pages=5))):
        sched = ContinuousBatchingScheduler(model, max_batch=4, ctx_size=64,
                                            **kw)
        outs = {}
        for i, p in enumerate(prompts):
            sched.submit(GenRequest(
                prompt=model.vocab.tokenize(p, True, True), max_tokens=8,
                sampler_params=greedy_params(),
                on_done=lambda preds, i=i: outs.__setitem__(
                    i, [pr.token for pr in preds])))
        sched.run_until_idle()
        results[key] = outs
    assert results["dense"] == results["hp"] == results["hp_tight"]
    for i, p in enumerate(prompts):
        assert results["hp"][i] == _solo_reference(model, p, 8)


def test_horizon_paged_verify_scores_one(model):
    """Verify rows replay correctly through the paged horizon loop."""
    from blama_tpu.server.scheduler import VerifyRequest

    prompt = model.vocab.tokenize("the dog ran over", True, True)
    got = {}
    sp = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64)
    sp.submit(GenRequest(prompt=prompt, max_tokens=7,
                         sampler_params=greedy_params(),
                         on_done=lambda preds: got.__setitem__("p", preds)))
    sp.run_until_idle()
    sv = ContinuousBatchingScheduler(model, max_batch=2, ctx_size=64,
                                     paged=True, horizon=4)
    sv.submit(VerifyRequest(prompt=prompt, predictions=got["p"],
                            on_done=lambda s: got.__setitem__("s", s)))
    sv.run_until_idle()
    assert got["s"] == 1.0, got["s"]


# -- scheduler under a device mesh (VERDICT r4 #2) ---------------------------

@pytest.fixture(scope="module")
def quant_gguf_sched(tmp_path_factory):
    """tp_blocks=4-eligible geometry (contraction dims multiples of 4*256)."""
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path_factory.mktemp("qs") / "q.gguf")
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))
    return p


def _sched_tokens(model, prompts, n, **kw):
    sched = ContinuousBatchingScheduler(model, **kw)
    outs = {}
    for i, p in enumerate(prompts):
        sched.submit(GenRequest(
            prompt=model.vocab.tokenize(p, True, True), max_tokens=n,
            sampler_params=greedy_params(),
            on_done=lambda preds, i=i: outs.__setitem__(
                i, [pr.token for pr in preds])))
    sched.run_until_idle()
    return [outs[i] for i in range(len(prompts))]


def test_scheduler_on_tp_mesh_matches_solo(quant_gguf_sched):
    """Continuous batching drives the tp-sharded PACKED engine: batched
    greedy streams on a tp=2 mesh equal solo sharded Sessions AND the solo
    unsharded engine (tp_blocks fixed topology is sharding-invariant)."""
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.model import Model, ModelParams

    prompts = ["hello world", "the cat sat", "president george"]
    m = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8",
                                            mesh=make_mesh(1, 2),
                                            tp_blocks=4))
    try:
        batched = _sched_tokens(m, prompts, 6, max_batch=4, ctx_size=64)
        # solo sharded Sessions on the same model
        from blama_tpu.runtime.instance import Instance, InstanceInitParams
        from blama_tpu.runtime.session import CompleteParams, SessionInitParams

        for i, p in enumerate(prompts):
            inst = Instance(m, InstanceInitParams(ctx_size=64,
                                                  fast_greedy=False))
            s = inst.start_session(SessionInitParams(seed=0, temperature=0.0))
            s.set_initial_prompt(m.vocab.tokenize(p, True, True))
            solo = [pr.token for pr in s.complete(CompleteParams(max_tokens=6))]
            inst.stop_session()
            assert batched[i] == solo, f"prompt {p!r}"
    finally:
        m.close()
    # solo UNSHARDED engine at the same tp_blocks: bit-exact across shardings
    m1 = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8", tp_blocks=4))
    try:
        solo1 = _sched_tokens(m1, prompts, 6, max_batch=4, ctx_size=64)
        assert batched == solo1
    finally:
        m1.close()


def test_scheduler_mesh_horizon_and_paged(quant_gguf_sched):
    """Horizon mode and the paged pool compose with the tp mesh: all four
    scheduler modes produce identical greedy streams on the sharded engine."""
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.model import Model, ModelParams

    prompts = ["hello world", "one two three"]
    m = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8",
                                            mesh=make_mesh(1, 2),
                                            tp_blocks=4))
    try:
        plain = _sched_tokens(m, prompts, 6, max_batch=2, ctx_size=64)
        horizon = _sched_tokens(m, prompts, 6, max_batch=2, ctx_size=64,
                                horizon=4)
        paged = _sched_tokens(m, prompts, 6, max_batch=2, ctx_size=64,
                              paged=True, page_size=16)
        hp = _sched_tokens(m, prompts, 6, max_batch=2, ctx_size=64,
                           paged=True, page_size=16, horizon=4)
        assert plain == horizon == paged == hp
    finally:
        m.close()


def test_scheduler_mesh_prover_solo_verifier(quant_gguf_sched):
    """A tp=2 scheduler prover's claim verifies on the UNSHARDED engine:
    bit-exact through a solo-engine scheduler at the same max_batch (the
    tp_blocks fixed topology makes sharding invisible; batch geometry is
    the remaining numerics knob, as for the dense scheduler contract), and
    at the reference cross-backend thresholds on a solo Session
    (t-LogitComparer.cpp:76-78)."""
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.runtime.session import SessionInitParams
    from blama_tpu.server.scheduler import VerifyRequest

    prompt = "the dog ran over"
    m = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8",
                                            mesh=make_mesh(1, 2),
                                            tp_blocks=4))
    got = {}
    try:
        sched = ContinuousBatchingScheduler(m, max_batch=2, ctx_size=64)
        sched.submit(GenRequest(
            prompt=m.vocab.tokenize(prompt, True, True), max_tokens=5,
            sampler_params=greedy_params(),
            on_done=lambda preds: got.__setitem__("p", preds)))
        sched.run_until_idle()
    finally:
        m.close()
    mv = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8", tp_blocks=4))
    try:
        # bit-exact leg: solo-engine scheduler verifier, same max_batch
        sv = ContinuousBatchingScheduler(mv, max_batch=2, ctx_size=64)
        sv.submit(VerifyRequest(
            prompt=mv.vocab.tokenize(prompt, True, True),
            predictions=got["p"],
            on_done=lambda s: got.__setitem__("score", s)))
        sv.run_until_idle()
        assert got["score"] == 1.0, got["score"]
        # threshold leg: solo Session replay within reference bounds
        from blama_tpu.runtime.verify import LogitComparer, MetricsAggregator

        inst = Instance(mv, InstanceInitParams(ctx_size=64, fast_greedy=False))
        s = inst.start_session(SessionInitParams(seed=0, temperature=0.0))
        s.set_initial_prompt(mv.vocab.tokenize(prompt, True, True))
        replayed = s.fill_ctx(got["p"])
        agg = MetricsAggregator()
        score = 0.0
        for orig, rep in zip(got["p"], replayed):
            assert rep.token == orig.token
            score = agg.push_and_verify(
                LogitComparer.compare(orig.logits, rep.logits))
        assert score >= 0.95, score
        inst.stop_session()
    finally:
        mv.close()


def test_scheduler_dp_tp_mesh(quant_gguf_sched):
    """dp x tp mesh: the batch axis rides dp (max_batch divisible by dp)."""
    from blama_tpu.parallel.mesh import make_mesh
    from blama_tpu.runtime.model import Model, ModelParams

    prompts = ["hello world", "the cat sat", "one two", "president george"]
    m = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8",
                                            mesh=make_mesh(2, 2),
                                            tp_blocks=4))
    try:
        batched = _sched_tokens(m, prompts, 5, max_batch=4, ctx_size=64)
    finally:
        m.close()
    m1 = Model(quant_gguf_sched, ModelParams(dtype="q4k_a8", tp_blocks=4))
    try:
        solo = _sched_tokens(m1, prompts, 5, max_batch=4, ctx_size=64)
        assert batched == solo
    finally:
        m1.close()


def test_horizon_write_kernel_idle_rows(tmp_path):
    """Dense horizon scheduling on a write-kernel-eligible geometry
    (D=128, fused attention): the in-kernel KV write clamps idle rows'
    pad slot (S) to the last row GROUP and writes identity, so a row going
    idle mid-horizon cannot corrupt a neighbor. Streams must match the
    per-token scheduler; the write kernel must actually dispatch."""
    from blama_tpu.gguf import GGMLType
    from blama_tpu.ops import generate_loop as gl
    from blama_tpu.ops.pallas import decode_attention as dattn
    from blama_tpu.runtime.model import Model, ModelParams
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path / "wk.gguf")
    write_tiny_llama(p, GGMLType.Q4_K,
                     spec=dict(n_layer=2, n_embd=1024, n_ff=2048,
                               n_head=8, n_head_kv=4))
    calls = []
    real = dattn.decode_attention_write
    dattn.decode_attention_write = (
        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])
    gl_prev = gl._WRITE_IN_KERNEL
    gl._WRITE_IN_KERNEL = True  # opt-in mode (off by default, round 5)
    try:
        def run(horizon):
            m = Model(p, ModelParams(dtype="q4k_a8", attn="fused"))
            try:
                sched = ContinuousBatchingScheduler(
                    m, max_batch=2, ctx_size=256, horizon=horizon)
                outs = {}
                # max_tokens 3 vs 9: row 0 idles while row 1 keeps decoding
                for i, (pr, n) in enumerate([("hello world", 3),
                                             ("the cat sat on", 9)]):
                    sched.submit(GenRequest(
                        prompt=m.vocab.tokenize(pr, True, True),
                        max_tokens=n, sampler_params=greedy_params(),
                        on_done=lambda g, i=i: outs.__setitem__(
                            i, [x.token for x in g])))
                sched.run_until_idle()
                return [outs[i] for i in range(2)]
            finally:
                m.close()

        per_token = run(0)
        calls.clear()
        horizon = run(4)
        assert horizon == per_token
        assert calls, "write kernel never dispatched"
    finally:
        dattn.decode_attention_write = real
        gl._WRITE_IN_KERNEL = gl_prev
