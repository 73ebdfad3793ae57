"""Server-facade usage with a synchronization latch
(reference: server/example/e-server-cli.cpp)."""

import sys
import threading

from blama_tpu.runtime.model import Model
from blama_tpu.server.server import CompleteRequestParams, Server


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        import tempfile

        from blama_tpu.testing import write_tiny_llama

        path = tempfile.mktemp(suffix=".gguf")
        write_tiny_llama(path)

    model = Model(path)
    server = Server(model)

    latch = threading.Event()
    result = {}

    def on_complete(resp):
        result["resp"] = resp
        latch.set()

    server.complete_text(
        CompleteRequestParams(prompt="hello world", max_tokens=20, seed=42, temperature=0.0),
        on_complete,
    )
    latch.wait()
    text = "".join(t.token_str for t in result["resp"])
    print(f"completion: {text!r}")
    print(f"tokens: {[t.token_id for t in result['resp']]}")
    server.close()


if __name__ == "__main__":
    main()
