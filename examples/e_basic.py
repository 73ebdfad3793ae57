"""Basic streaming generation (reference: inference/example/e-basic.cpp).

Usage: python examples/e_basic.py <model.gguf> [prompt]
Without a model argument, a tiny synthetic fixture is generated.
"""

import sys

from blama_tpu import init_library
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams


def progress_bar(p: float) -> None:
    print(f"\rloading: {p * 100:5.1f}%", end="", flush=True)


def main() -> None:
    init_library()
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        import tempfile

        from blama_tpu.testing import write_tiny_llama

        path = tempfile.mktemp(suffix=".gguf")
        write_tiny_llama(path)
        print(f"(no model given; using tiny synthetic fixture {path})")
    prompt = sys.argv[2] if len(sys.argv) > 2 else "The president of the United States"

    model = Model(path, progress_cb=progress_bar)
    print()
    instance = Instance(model, InstanceInitParams())
    instance.warmup()

    session = instance.start_session(SessionInitParams(seed=42))
    session.set_initial_prompt(model.vocab.tokenize(prompt, True, True))

    print(prompt, end="", flush=True)
    for pred in session.complete_stream(CompleteParams(max_tokens=100)):
        print(model.vocab.token_to_string(pred.token), end="", flush=True)
    print()
    instance.stop_session()


if __name__ == "__main__":
    main()
