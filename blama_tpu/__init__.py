"""blama_tpu — a TPU-native verifiable-inference framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
blocksense-network/blama (verifiable GGUF inference: every generated token is
recorded with its top-10 logits, and completions can be replayed and scored
deterministically), redesigned for TPU: sharded weights/KV over a device mesh,
Pallas fused dequant-matmul and attention kernels, and deterministic
cross-sharding replay.

Layers (mirror of the reference layer map, SURVEY.md §1):
  gguf/      GGUF container + GGML block-quant formats (host)
  models/    model configs, weight loading, JAX forward passes
  ops/       Pallas/XLA kernels: quantized matmul, attention, rope, top-k
  parallel/  mesh construction + sharding rules
  runtime/   Session/Instance/Sampler/verification/chat/antiprompt
  server/    async HTTP server with /complete + /verify_completion et al.
"""

__version__ = "0.1.0"


def init_library() -> None:
    """One-time library init (reference: initLibrary(), Init.cpp:34-38).

    JAX initializes platforms lazily; this exists for API parity and logs the
    available device platform.
    """
    import jax
    import logging

    logging.getLogger("blama_tpu").info(
        "blama_tpu %s: jax %s, devices: %s", __version__, jax.__version__, jax.devices()
    )
