"""Generate-then-verify round trip (reference: inference/example/e-verify.cpp).

The prover generates with top-10 logit capture; a fresh verifier session
replays the claimed tokens (teacher-forced), recomputes the logits restricted
to the claimed token set, and scores agreement. Same-backend the score is 1.0
(bit-exact); the reference's cross-backend acceptance threshold is ≥ 0.95
(t-LogitComparer.cpp:78).
"""

import sys

from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.runtime.verify import LogitComparer, MetricsAggregator


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        import tempfile

        from blama_tpu.testing import write_tiny_llama

        path = tempfile.mktemp(suffix=".gguf")
        write_tiny_llama(path)
    prompt = sys.argv[2] if len(sys.argv) > 2 else "hello world"

    model = Model(path)
    instance = Instance(model, InstanceInitParams())

    # -- prover
    session = instance.start_session(SessionInitParams(seed=7, temperature=0.0))
    session.set_initial_prompt(model.vocab.tokenize(prompt, True, True))
    predictions = session.complete(CompleteParams(max_tokens=20))
    instance.stop_session()
    text = model.vocab.detokenize([p.token for p in predictions])
    print(f"prover generated: {text!r}")

    # -- verifier (fresh session, replays the claim)
    verifier = instance.start_session(SessionInitParams(seed=7, temperature=0.0))
    verifier.set_initial_prompt(model.vocab.tokenize(prompt, True, True))
    replayed = verifier.fill_ctx(predictions)
    instance.stop_session()

    agg = MetricsAggregator()
    score = 0.0
    sims = []
    for orig, rep in zip(predictions, replayed):
        m = LogitComparer.compare(orig.logits, rep.logits)
        score = agg.push_and_verify(m)
        sims.append(LogitComparer.logit_similarity(orig.logits, rep.logits))

    print(f"aggregate verification score: {score:.6f}")
    print(f"mean per-token similarity:    {sum(sims)/len(sims):.6f}")
    print("verdict:", "ACCEPT" if score >= 0.95 else "REJECT")


if __name__ == "__main__":
    main()
