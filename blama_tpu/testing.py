"""Deterministic tiny-model fixtures for tests and benchmarks.

The reference tests against small real GGUF models fetched from HuggingFace
(/root/reference/CMakeLists.txt:62-68, t-integration.cpp:23). This environment
has no network, so we generate tiny-but-real GGUF models (genuine K-quant
tensors, SPM-style vocab with byte fallback) with seeded weights. Golden
outputs are pinned against these fixtures, giving the same regression power.
"""

from __future__ import annotations

import numpy as np

from .gguf import GGMLType, GGUFWriter
from .runtime.vocab import TT_BYTE, TT_CONTROL, TT_NORMAL, TT_UNKNOWN


def tiny_spm_vocab() -> tuple[list[str], list[float], list[int]]:
    """SPM-style vocab: specials + 256 byte tokens + merge chains for a few
    words, so 'hello world' tokenizes to whole-word pieces and anything else
    falls back to bytes."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TT_UNKNOWN, TT_CONTROL, TT_CONTROL]
    scores = [-1e9, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TT_BYTE)
        scores.append(-1e6)

    words = ["hello", "world", "president", "george", "bush", "the", "cat", "sat"]
    for w in words:
        piece = "▁" + w
        for ln in range(2, len(piece) + 1):
            sub = piece[:ln]
            if sub not in tokens:
                tokens.append(sub)
                types.append(TT_NORMAL)
                scores.append(-float(ln))
    # common suffix fragments for multi-token words
    for frag in ["ing", "ed", "er", "s"]:
        if frag not in tokens:
            tokens.append(frag)
            types.append(TT_NORMAL)
            scores.append(-20.0)
    # FIM (fill-in-middle) control tokens
    for t in ["<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>"]:
        tokens.append(t)
        types.append(TT_CONTROL)
        scores.append(0.0)
    return tokens, scores, types


TINY_LLAMA_SPEC = dict(
    n_layer=2,
    n_embd=256,
    n_head=4,
    n_head_kv=2,
    n_ff=512,
    n_ctx=512,
    rope_freq_base=10000.0,
    rms_eps=1e-5,
)


def write_tiny_llama(
    path: str,
    quant: GGMLType = GGMLType.Q4_K,
    seed: int = 1234,
    chat_template: str = "",
    spec: dict | None = None,
) -> None:
    """Write a deterministic tiny llama-architecture GGUF model."""
    s = dict(TINY_LLAMA_SPEC)
    if spec:
        s.update(spec)
    tokens, scores, types = tiny_spm_vocab()
    n_vocab = len(tokens)
    E, H, HKV, F, L = s["n_embd"], s["n_head"], s["n_head_kv"], s["n_ff"], s["n_layer"]
    D = E // H

    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "llama")
    g.add_kv("general.name", "tiny-llama-fixture")
    g.add_kv("llama.block_count", L)
    g.add_kv("llama.embedding_length", E)
    g.add_kv("llama.feed_forward_length", F)
    g.add_kv("llama.attention.head_count", H)
    g.add_kv("llama.attention.head_count_kv", HKV)
    g.add_kv("llama.attention.layer_norm_rms_epsilon", float(s["rms_eps"]))
    g.add_kv("llama.context_length", s["n_ctx"])
    g.add_kv("llama.rope.freq_base", float(s["rope_freq_base"]))
    g.add_kv("llama.rope.dimension_count", D)
    g.add_kv("llama.vocab_size", n_vocab)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)
    g.add_kv("tokenizer.ggml.add_space_prefix", True)
    g.add_kv("tokenizer.ggml.fim_pre_token_id", tokens.index("<|fim_pre|>"))
    g.add_kv("tokenizer.ggml.fim_suf_token_id", tokens.index("<|fim_suf|>"))
    g.add_kv("tokenizer.ggml.fim_mid_token_id", tokens.index("<|fim_mid|>"))
    if chat_template:
        g.add_kv("tokenizer.chat_template", chat_template)

    # norms stay f32 (as real GGUF files do)
    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05), quant)
    g.add_tensor("output_norm.weight", np.ones(E, np.float32) + w((E,), 0.01), GGMLType.F32)
    if not s.get("tie_output"):  # tied-embedding models omit output.weight
        g.add_tensor("output.weight", w((n_vocab, E)), quant)
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_norm.weight", np.ones(E, np.float32) + w((E,), 0.01), GGMLType.F32)
        g.add_tensor(f"blk.{i}.attn_q.weight", w((H * D, E)), quant)
        g.add_tensor(f"blk.{i}.attn_k.weight", w((HKV * D, E)), quant)
        g.add_tensor(f"blk.{i}.attn_v.weight", w((HKV * D, E)), quant)
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, H * D)), quant)
        g.add_tensor(f"blk.{i}.ffn_norm.weight", np.ones(E, np.float32) + w((E,), 0.01), GGMLType.F32)
        g.add_tensor(f"blk.{i}.ffn_gate.weight", w((F, E)), quant)
        g.add_tensor(f"blk.{i}.ffn_up.weight", w((F, E)), quant)
        g.add_tensor(f"blk.{i}.ffn_down.weight", w((E, F)), quant)
    g.write()


# ---------------------------------------------------------------------------
# fast direct-packed synthesis (for benchmarks: no float source material)
# ---------------------------------------------------------------------------

MODEL_PRESETS = {
    # TinyLlama-1.1B geometry (BASELINE.json config #1)
    "tinyllama-1.1b": dict(n_layer=22, n_embd=2048, n_head=32, n_head_kv=4,
                           n_ff=5632, n_ctx=2048, n_vocab=32000),
    # Llama-3-8B geometry (BASELINE.json configs #2/#3)
    "llama3-8b": dict(n_layer=32, n_embd=4096, n_head=32, n_head_kv=8,
                      n_ff=14336, n_ctx=8192, n_vocab=128256,
                      rope_freq_base=500000.0),
    # ~0.3B debug size
    "debug-0.3b": dict(n_layer=8, n_embd=1024, n_head=16, n_head_kv=4,
                       n_ff=2816, n_ctx=2048, n_vocab=32000),
}

MOE_PRESETS = {
    # Mixtral-8x7B geometry (BASELINE.json config #4) scaled to fit one 16GB
    # chip in bf16: same expert structure (8 experts, top-2, SwiGLU, GQA with
    # head_dim 128), ~5.1B params (~10.2GB bf16) vs the real 46.7B.
    "mixtral-scaled": dict(n_layer=12, n_embd=2048, n_head=16, n_head_kv=4,
                           n_ff=8192, n_ctx=4096, n_vocab=32000,
                           n_expert=8, n_expert_used=2,
                           rope_freq_base=1000000.0),
    # tiny variant for CPU-mesh tests of the same synthesis path
    "mixtral-debug": dict(n_layer=2, n_embd=256, n_head=4, n_head_kv=2,
                          n_ff=512, n_ctx=512, n_vocab=512,
                          n_expert=4, n_expert_used=2,
                          rope_freq_base=10000.0),
}


def synthesize_moe_gguf(path: str, preset: str = "mixtral-scaled",
                        seed: int = 11) -> dict:
    """Write a realistic-size Mixtral-family GGUF with direct-packed Q4_K
    expert banks (random codes, plausible scales — throughput benchmarking
    does not depend on weight values, but the full load path does on layout).
    """
    s = dict(MOE_PRESETS[preset])
    E, H, HKV, F, L, V = (s["n_embd"], s["n_head"], s["n_head_kv"],
                          s["n_ff"], s["n_layer"], s["n_vocab"])
    Ne, K = s["n_expert"], s["n_expert_used"]
    D = E // H
    rng = np.random.default_rng(seed)

    tokens = ["<unk>", "<s>", "</s>"]
    types = [TT_UNKNOWN, TT_CONTROL, TT_CONTROL]
    scores = [-1e9, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TT_BYTE)
        scores.append(-1e6)
    for i in range(V - len(tokens)):
        tokens.append(f"▁tok{i}")
        types.append(TT_NORMAL)
        scores.append(-10.0)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "llama")
    g.add_kv("general.name", f"synthetic-{preset}")
    g.add_kv("llama.block_count", L)
    g.add_kv("llama.embedding_length", E)
    g.add_kv("llama.feed_forward_length", F)
    g.add_kv("llama.attention.head_count", H)
    g.add_kv("llama.attention.head_count_kv", HKV)
    g.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    g.add_kv("llama.context_length", s["n_ctx"])
    g.add_kv("llama.rope.freq_base", float(s.get("rope_freq_base", 10000.0)))
    g.add_kv("llama.rope.dimension_count", D)
    g.add_kv("llama.expert_count", Ne)
    g.add_kv("llama.expert_used_count", K)
    g.add_kv("llama.vocab_size", V)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)

    def q(name, ne, sigma=None):
        # ne is the ggml dim order (innermost first); rows = prod(ne[1:])
        n_rows = int(np.prod(ne[1:]))
        sigma = sigma if sigma is not None else 1.0 / np.sqrt(ne[0])
        g.add_tensor(name, None, GGMLType.Q4_K,
                     raw_bytes=_pack_q4_k_direct(rng, n_rows, ne[0], sigma),
                     ne=tuple(ne))

    def norm(name, n):
        data, ne = _pack_f32_norm(n)
        g.add_tensor(name, None, GGMLType.F32, raw_bytes=data, ne=ne)

    q("token_embd.weight", (E, V), 0.02)
    norm("output_norm.weight", E)
    q("output.weight", (E, V))
    for i in range(L):
        norm(f"blk.{i}.attn_norm.weight", E)
        q(f"blk.{i}.attn_q.weight", (E, H * D))
        q(f"blk.{i}.attn_k.weight", (E, HKV * D))
        q(f"blk.{i}.attn_v.weight", (E, HKV * D))
        q(f"blk.{i}.attn_output.weight", (H * D, E))
        norm(f"blk.{i}.ffn_norm.weight", E)
        g.add_tensor(f"blk.{i}.ffn_gate_inp.weight",
                     (rng.standard_normal((Ne, E)) / np.sqrt(E)).astype(np.float32))
        q(f"blk.{i}.ffn_gate_exps.weight", (E, F, Ne))
        q(f"blk.{i}.ffn_up_exps.weight", (E, F, Ne))
        q(f"blk.{i}.ffn_down_exps.weight", (F, E, Ne))
    g.write()
    return s


def _pack_q4_k_direct(rng: np.random.Generator, n_rows: int, row_len: int,
                      sigma: float) -> bytes:
    """Directly synthesize packed Q4_K superblocks with plausible statistics:
    random 4-bit codes, fixed mid scales, and d chosen so dequantized values
    have std ≈ sigma. ~100x faster than quantizing random floats."""
    n_blocks = (n_rows * row_len) // 256
    out = np.zeros((n_blocks, 144), dtype=np.uint8)
    # std of uniform q in [0,15] is ~4.61; effective scale = d*sc with sc=32
    d = np.float16(sigma / (32 * 4.61))
    dmin = np.float16(float(d) * 32 * 7.5 / 32)  # centers E[q]=7.5
    out[:, 0:2] = np.frombuffer(d.tobytes(), dtype=np.uint8)
    out[:, 2:4] = np.frombuffer(dmin.tobytes(), dtype=np.uint8)
    from .gguf.quants import _pack_scale_min_k4

    sc = np.full((1, 8), 32, np.int64)
    out[:, 4:16] = _pack_scale_min_k4(sc, sc)[0]
    out[:, 16:] = rng.integers(0, 256, size=(n_blocks, 128), dtype=np.uint8)
    return out.tobytes()


def _pack_q8_0_direct(rng: np.random.Generator, n_rows: int, row_len: int,
                      sigma: float) -> bytes:
    """Directly synthesize packed Q8_0 blocks (34 B: f16 d + 32 int8 codes)
    with plausible statistics — BASELINE config #3 benches Llama-3-8B Q8_0
    and the load path depends on the real byte layout."""
    n_blocks = (n_rows * row_len) // 32
    out = np.zeros((n_blocks, 34), dtype=np.uint8)
    # std of uniform int8 codes in [-127, 127] is ~73.3
    d = np.float16(sigma / 73.3)
    out[:, 0:2] = np.frombuffer(d.tobytes(), dtype=np.uint8)
    codes = rng.integers(-127, 128, size=(n_blocks, 32), dtype=np.int64)
    out[:, 2:] = codes.astype(np.int8).view(np.uint8)
    return out.tobytes()


def _pack_f32_norm(n: int) -> tuple[bytes, tuple[int, ...]]:
    return np.ones(n, np.float32).tobytes(), (n,)


def synthesize_llama_gguf(path: str, preset: str = "tinyllama-1.1b",
                          seed: int = 7, quant: GGMLType = GGMLType.Q4_K) -> dict:
    """Write a realistic-size llama GGUF with direct-packed quantized tensors.

    Weight *values* are random (throughput benchmarking does not depend on
    them) but every byte layout, metadata key, and tensor name is real, so the
    full load path (parse → dequant/repack → upload) is exercised.
    """
    if quant not in (GGMLType.Q4_K, GGMLType.Q8_0):
        raise NotImplementedError("direct synthesis packs Q4_K or Q8_0")
    s = dict(MODEL_PRESETS[preset])
    E, H, HKV, F, L, V = (s["n_embd"], s["n_head"], s["n_head_kv"],
                          s["n_ff"], s["n_layer"], s["n_vocab"])
    D = E // H
    rng = np.random.default_rng(seed)

    tokens = ["<unk>", "<s>", "</s>"]
    types = [TT_UNKNOWN, TT_CONTROL, TT_CONTROL]
    scores = [-1e9, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TT_BYTE)
        scores.append(-1e6)
    for i in range(V - len(tokens)):
        tokens.append(f"▁tok{i}")
        types.append(TT_NORMAL)
        scores.append(-10.0)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "llama")
    g.add_kv("general.name", f"synthetic-{preset}")
    g.add_kv("llama.block_count", L)
    g.add_kv("llama.embedding_length", E)
    g.add_kv("llama.feed_forward_length", F)
    g.add_kv("llama.attention.head_count", H)
    g.add_kv("llama.attention.head_count_kv", HKV)
    g.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    g.add_kv("llama.context_length", s["n_ctx"])
    g.add_kv("llama.rope.freq_base", float(s.get("rope_freq_base", 10000.0)))
    g.add_kv("llama.rope.dimension_count", D)
    g.add_kv("llama.vocab_size", V)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)

    def q(name, n_out, n_in, sigma=None):
        sigma = sigma if sigma is not None else 1.0 / np.sqrt(n_in)
        pack = (_pack_q8_0_direct if quant == GGMLType.Q8_0
                else _pack_q4_k_direct)
        g.add_tensor(name, None, quant,
                     raw_bytes=pack(rng, n_out, n_in, sigma),
                     ne=(n_in, n_out))

    def norm(name, n):
        data, ne = _pack_f32_norm(n)
        g.add_tensor(name, None, GGMLType.F32, raw_bytes=data, ne=ne)

    q("token_embd.weight", V, E, 0.02)
    norm("output_norm.weight", E)
    q("output.weight", V, E)
    for i in range(L):
        norm(f"blk.{i}.attn_norm.weight", E)
        q(f"blk.{i}.attn_q.weight", H * D, E)
        q(f"blk.{i}.attn_k.weight", HKV * D, E)
        q(f"blk.{i}.attn_v.weight", HKV * D, E)
        q(f"blk.{i}.attn_output.weight", E, H * D)
        norm(f"blk.{i}.ffn_norm.weight", E)
        q(f"blk.{i}.ffn_gate.weight", F, E)
        q(f"blk.{i}.ffn_up.weight", F, E)
        q(f"blk.{i}.ffn_down.weight", E, F)
    g.write()
    return s


def write_tiny_bert(path: str, seed: int = 99, pooling_type: int = 2) -> None:
    """Tiny BERT-architecture GGUF for embeddings tests (bge-small stand-in)."""
    E, H, F, L = 64, 4, 128, 2
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    types = [TT_CONTROL, TT_UNKNOWN, TT_CONTROL, TT_CONTROL]
    scores = [0.0] * 4
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TT_BYTE)
        scores.append(-1e6)
    for w in ["▁hello", "▁world", "▁the"]:
        tokens.append(w)
        types.append(TT_NORMAL)
        scores.append(-5.0)
    n_vocab = len(tokens)

    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "bert")
    g.add_kv("bert.block_count", L)
    g.add_kv("bert.embedding_length", E)
    g.add_kv("bert.feed_forward_length", F)
    g.add_kv("bert.attention.head_count", H)
    g.add_kv("bert.attention.layer_norm_epsilon", 1e-12)
    g.add_kv("bert.context_length", 512)
    g.add_kv("bert.vocab_size", n_vocab)
    g.add_kv("bert.pooling_type", pooling_type)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 2)
    g.add_kv("tokenizer.ggml.eos_token_id", 3)
    g.add_kv("tokenizer.ggml.unknown_token_id", 1)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("token_types.weight", w((2, E), 0.02))
    g.add_tensor("position_embd.weight", w((512, E), 0.02))
    g.add_tensor("token_embd_norm.weight", np.ones(E, np.float32))
    g.add_tensor("token_embd_norm.bias", np.zeros(E, np.float32))
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_q.weight", w((E, E)))
        g.add_tensor(f"blk.{i}.attn_q.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_k.weight", w((E, E)))
        g.add_tensor(f"blk.{i}.attn_k.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_v.weight", w((E, E)))
        g.add_tensor(f"blk.{i}.attn_v.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, E)))
        g.add_tensor(f"blk.{i}.attn_output.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_output_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_output_norm.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_up.weight", w((F, E)))
        g.add_tensor(f"blk.{i}.ffn_up.bias", np.zeros(F, np.float32))
        g.add_tensor(f"blk.{i}.ffn_down.weight", w((E, F)))
        g.add_tensor(f"blk.{i}.ffn_down.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.layer_output_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.layer_output_norm.bias", np.zeros(E, np.float32))
    g.write()


def write_tiny_moe(path: str, seed: int = 77, n_expert: int = 4,
                   n_expert_used: int = 2) -> None:
    """Tiny Mixtral-architecture GGUF (llama arch + expert FFN tensors)."""
    E, H, HKV, F, L = 256, 4, 2, 512, 2
    tokens, scores, types = tiny_spm_vocab()
    n_vocab = len(tokens)
    D = E // H
    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "llama")
    g.add_kv("general.name", "tiny-moe-fixture")
    g.add_kv("llama.block_count", L)
    g.add_kv("llama.embedding_length", E)
    g.add_kv("llama.feed_forward_length", F)
    g.add_kv("llama.attention.head_count", H)
    g.add_kv("llama.attention.head_count_kv", HKV)
    g.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    g.add_kv("llama.context_length", 512)
    g.add_kv("llama.rope.freq_base", 10000.0)
    g.add_kv("llama.rope.dimension_count", D)
    g.add_kv("llama.expert_count", n_expert)
    g.add_kv("llama.expert_used_count", n_expert_used)
    g.add_kv("llama.vocab_size", n_vocab)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("output_norm.weight", np.ones(E, np.float32))
    g.add_tensor("output.weight", w((n_vocab, E)))
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_q.weight", w((H * D, E)))
        g.add_tensor(f"blk.{i}.attn_k.weight", w((HKV * D, E)))
        g.add_tensor(f"blk.{i}.attn_v.weight", w((HKV * D, E)))
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, H * D)))
        g.add_tensor(f"blk.{i}.ffn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_gate_inp.weight", w((n_expert, E)))
        g.add_tensor(f"blk.{i}.ffn_gate_exps.weight", w((n_expert, F, E)))
        g.add_tensor(f"blk.{i}.ffn_up_exps.weight", w((n_expert, F, E)))
        g.add_tensor(f"blk.{i}.ffn_down_exps.weight", w((n_expert, E, F)))
    g.write()


def tiny_bpe_vocab() -> tuple[list[str], list[str], list[int]]:
    """GPT-2 style byte-level BPE vocab: 256 byte-unicode chars + merge chains
    for 'hello'/'world' (with and without leading space)."""
    from .runtime.vocab import _bytes_to_unicode

    byte_enc = _bytes_to_unicode()
    tokens = [byte_enc[b] for b in range(256)]
    types = [TT_NORMAL] * 256
    merges = []

    def add_word(word: str):
        """Add merge rules until `word` tokenizes to one piece, simulating
        BPE with the rules added so far (keeps ranks globally consistent)."""
        mapped = "".join(byte_enc[b] for b in word.encode())
        ranks = {tuple(m.split(" ")): i for i, m in enumerate(merges)}
        parts = list(mapped)
        while len(parts) > 1:
            best = min(
                ((ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(parts, parts[1:]))
                 if (a, b) in ranks),
                default=None,
            )
            if best is None:
                merges.append(f"{parts[0]} {parts[1]}")
                ranks[(parts[0], parts[1])] = len(merges) - 1
                best = (len(merges) - 1, 0)
            _, i = best
            merged = parts[i] + parts[i + 1]
            parts[i: i + 2] = [merged]
            if merged not in tokens:
                tokens.append(merged)
                types.append(TT_NORMAL)

    for w in ["hello", "world", " hello", " world", "he", " the"]:
        add_word(w)
    tokens.append("<|endoftext|>")
    types.append(TT_CONTROL)
    return tokens, merges, types


def write_tiny_gpt2(path: str, seed: int = 55) -> None:
    """Tiny GPT-2 architecture GGUF (the reference's default model family is
    gpt2-117m Q6_K, HttpServerMain.cpp:379-381)."""
    E, H, L = 128, 4, 2
    F = 4 * E
    n_ctx = 128
    tokens, merges, types = tiny_bpe_vocab()
    n_vocab = len(tokens)
    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "gpt2")
    g.add_kv("gpt2.block_count", L)
    g.add_kv("gpt2.embedding_length", E)
    g.add_kv("gpt2.feed_forward_length", F)
    g.add_kv("gpt2.attention.head_count", H)
    g.add_kv("gpt2.attention.layer_norm_epsilon", 1e-5)
    g.add_kv("gpt2.context_length", n_ctx)
    g.add_kv("gpt2.vocab_size", n_vocab)
    g.add_kv("tokenizer.ggml.model", "gpt2")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.merges", merges)
    g.add_kv("tokenizer.ggml.bos_token_id", n_vocab - 1)
    g.add_kv("tokenizer.ggml.eos_token_id", n_vocab - 1)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("position_embd.weight", w((n_ctx, E), 0.02))
    g.add_tensor("output_norm.weight", np.ones(E, np.float32))
    g.add_tensor("output_norm.bias", np.zeros(E, np.float32))
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_norm.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_qkv.weight", w((3 * E, E)))
        g.add_tensor(f"blk.{i}.attn_qkv.bias", np.zeros(3 * E, np.float32))
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, E)))
        g.add_tensor(f"blk.{i}.attn_output.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_norm.bias", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_up.weight", w((F, E)))
        g.add_tensor(f"blk.{i}.ffn_up.bias", np.zeros(F, np.float32))
        g.add_tensor(f"blk.{i}.ffn_down.weight", w((E, F)))
        g.add_tensor(f"blk.{i}.ffn_down.bias", np.zeros(E, np.float32))
    g.write()


def write_tiny_qwen2(path: str, seed: int = 31) -> None:
    """Tiny qwen2-architecture GGUF (llama family + Q/K/V biases)."""
    E, H, HKV, F, L = 256, 4, 2, 512, 2
    tokens, scores, types = tiny_spm_vocab()
    n_vocab = len(tokens)
    D = E // H
    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "qwen2")
    g.add_kv("qwen2.block_count", L)
    g.add_kv("qwen2.embedding_length", E)
    g.add_kv("qwen2.feed_forward_length", F)
    g.add_kv("qwen2.attention.head_count", H)
    g.add_kv("qwen2.attention.head_count_kv", HKV)
    g.add_kv("qwen2.attention.layer_norm_rms_epsilon", 1e-6)
    g.add_kv("qwen2.context_length", 512)
    g.add_kv("qwen2.rope.freq_base", 1e6)
    g.add_kv("qwen2.rope.dimension_count", D)
    g.add_kv("qwen2.vocab_size", n_vocab)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("output_norm.weight", np.ones(E, np.float32))
    # no output.weight → tied embeddings path
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_q.weight", w((H * D, E)))
        g.add_tensor(f"blk.{i}.attn_q.bias", w((H * D,), 0.02))
        g.add_tensor(f"blk.{i}.attn_k.weight", w((HKV * D, E)))
        g.add_tensor(f"blk.{i}.attn_k.bias", w((HKV * D,), 0.02))
        g.add_tensor(f"blk.{i}.attn_v.weight", w((HKV * D, E)))
        g.add_tensor(f"blk.{i}.attn_v.bias", w((HKV * D,), 0.02))
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, H * D)))
        g.add_tensor(f"blk.{i}.ffn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_gate.weight", w((F, E)))
        g.add_tensor(f"blk.{i}.ffn_up.weight", w((F, E)))
        g.add_tensor(f"blk.{i}.ffn_down.weight", w((E, F)))
    g.write()


def write_tiny_gemma(path: str, seed: int = 41) -> None:
    """Tiny gemma-architecture GGUF: tied embeddings, sqrt(E) input scaling,
    (1+w) RMSNorm, GELU, large head_dim."""
    E, H, HKV, F, L, D = 128, 2, 1, 256, 2, 64
    tokens, scores, types = tiny_spm_vocab()
    n_vocab = len(tokens)
    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "gemma")
    g.add_kv("gemma.block_count", L)
    g.add_kv("gemma.embedding_length", E)
    g.add_kv("gemma.feed_forward_length", F)
    g.add_kv("gemma.attention.head_count", H)
    g.add_kv("gemma.attention.head_count_kv", HKV)
    g.add_kv("gemma.attention.key_length", D)
    g.add_kv("gemma.attention.layer_norm_rms_epsilon", 1e-6)
    g.add_kv("gemma.context_length", 512)
    g.add_kv("gemma.rope.dimension_count", D)
    g.add_kv("gemma.vocab_size", n_vocab)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("output_norm.weight", np.zeros(E, np.float32))  # (1+w) → 1.0
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_norm.weight", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_q.weight", w((H * D, E)))
        g.add_tensor(f"blk.{i}.attn_k.weight", w((HKV * D, E)))
        g.add_tensor(f"blk.{i}.attn_v.weight", w((HKV * D, E)))
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, H * D)))
        g.add_tensor(f"blk.{i}.ffn_norm.weight", np.zeros(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_gate.weight", w((F, E)))
        g.add_tensor(f"blk.{i}.ffn_up.weight", w((F, E)))
        g.add_tensor(f"blk.{i}.ffn_down.weight", w((E, F)))
    g.write()


def write_tiny_phi3(path: str, seed: int = 43) -> None:
    """Tiny phi3-architecture GGUF: fused attn_qkv + fused [gate;up] ffn_up."""
    E, H, HKV, F, L = 256, 4, 2, 512, 2
    D = E // H
    tokens, scores, types = tiny_spm_vocab()
    n_vocab = len(tokens)
    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "phi3")
    g.add_kv("phi3.block_count", L)
    g.add_kv("phi3.embedding_length", E)
    g.add_kv("phi3.feed_forward_length", F)
    g.add_kv("phi3.attention.head_count", H)
    g.add_kv("phi3.attention.head_count_kv", HKV)
    g.add_kv("phi3.attention.layer_norm_rms_epsilon", 1e-5)
    g.add_kv("phi3.context_length", 512)
    g.add_kv("phi3.rope.dimension_count", D)
    g.add_kv("phi3.vocab_size", n_vocab)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", True)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("output_norm.weight", np.ones(E, np.float32))
    g.add_tensor("output.weight", w((n_vocab, E)))
    for i in range(L):
        g.add_tensor(f"blk.{i}.attn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.attn_qkv.weight", w(((H + 2 * HKV) * D, E)))
        g.add_tensor(f"blk.{i}.attn_output.weight", w((E, H * D)))
        g.add_tensor(f"blk.{i}.ffn_norm.weight", np.ones(E, np.float32))
        g.add_tensor(f"blk.{i}.ffn_up.weight", w((2 * F, E)))
        g.add_tensor(f"blk.{i}.ffn_down.weight", w((E, F)))
    g.write()


def write_tiny_t5(path: str, seed: int = 61, gated: bool = False) -> None:
    """Tiny T5 encoder-decoder GGUF (relative position buckets, cross-attn)."""
    E, H, F, L, D = 64, 4, 128, 2, 16
    n_buckets = 8
    tokens, scores, types = tiny_spm_vocab()
    n_vocab = len(tokens)
    rng = np.random.default_rng(seed)

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    g = GGUFWriter(path)
    g.add_kv("general.architecture", "t5")
    g.add_kv("t5.block_count", L)
    g.add_kv("t5.embedding_length", E)
    g.add_kv("t5.feed_forward_length", F)
    g.add_kv("t5.attention.head_count", H)
    g.add_kv("t5.attention.key_length", D)
    g.add_kv("t5.attention.layer_norm_rms_epsilon", 1e-6)
    g.add_kv("t5.attention.relative_buckets_count", n_buckets)
    g.add_kv("t5.context_length", 512)
    g.add_kv("t5.vocab_size", n_vocab)
    g.add_kv("t5.decoder_start_token_id", 0)
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", scores)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.bos_token_id", 1)
    g.add_kv("tokenizer.ggml.eos_token_id", 2)
    g.add_kv("tokenizer.ggml.unknown_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", False)

    g.add_tensor("token_embd.weight", w((n_vocab, E), 0.05))
    g.add_tensor("enc.output_norm.weight", np.ones(E, np.float32))
    g.add_tensor("dec.output_norm.weight", np.ones(E, np.float32))
    g.add_tensor("output.weight", w((n_vocab, E)))
    for prefix in ("enc", "dec"):
        for i in range(L):
            g.add_tensor(f"{prefix}.blk.{i}.attn_norm.weight", np.ones(E, np.float32))
            g.add_tensor(f"{prefix}.blk.{i}.attn_q.weight", w((H * D, E)))
            g.add_tensor(f"{prefix}.blk.{i}.attn_k.weight", w((H * D, E)))
            g.add_tensor(f"{prefix}.blk.{i}.attn_v.weight", w((H * D, E)))
            g.add_tensor(f"{prefix}.blk.{i}.attn_o.weight", w((E, H * D)))
            g.add_tensor(f"{prefix}.blk.{i}.ffn_norm.weight", np.ones(E, np.float32))
            g.add_tensor(f"{prefix}.blk.{i}.ffn_up.weight", w((F, E)))
            g.add_tensor(f"{prefix}.blk.{i}.ffn_down.weight", w((E, F)))
            if gated:
                g.add_tensor(f"{prefix}.blk.{i}.ffn_gate.weight", w((F, E)))
            if prefix == "dec":
                g.add_tensor(f"dec.blk.{i}.cross_attn_norm.weight", np.ones(E, np.float32))
                g.add_tensor(f"dec.blk.{i}.cross_attn_q.weight", w((H * D, E)))
                g.add_tensor(f"dec.blk.{i}.cross_attn_k.weight", w((H * D, E)))
                g.add_tensor(f"dec.blk.{i}.cross_attn_v.weight", w((H * D, E)))
                g.add_tensor(f"dec.blk.{i}.cross_attn_o.weight", w((E, H * D)))
        g.add_tensor(f"{prefix}.blk.0.attn_rel_b.weight", w((n_buckets, H), 0.1))
    g.write()
