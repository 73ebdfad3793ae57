"""Tokenizer byte-exactness vs an independent canonical implementation.

VERDICT r1 missing #1 / SURVEY §7.3 hard-part #5: the BPE tokenizer had only
synthetic fixtures — nothing pinned the merge loop, byte-encoder, or
pre-tokenizer against the behavior llama.cpp's GPT-2-class vocabs require
(the reference's own golden is exact GPT-2 tokenization,
/root/reference/inference/test/t-integration.cpp:41-42).

No network in this environment, so instead of the reference's pinned HF
model we train a REAL byte-level BPE with the HuggingFace `tokenizers`
library (the canonical implementation llama.cpp's BPE is written to match,
and the library GPT-2's own vocab was built with), write its vocab/merges
into a GGUF, and require OUR tokenizer to reproduce `tokenizers`' ids
byte-for-byte on an adversarial string battery. Any divergence in the merge
order, byte↔unicode table, or GPT-2 pre-tokenizer regex fails this test.
"""

import os
import tempfile

import pytest

tokenizers = pytest.importorskip("tokenizers")

from blama_tpu.gguf.writer import GGUFWriter
from blama_tpu.runtime.vocab import Vocab


CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "President George W. Bush was the 43rd president of the United States.",
    "I can't believe it's not butter! Don't you think so?",
    "def tokenize(text: str) -> list[int]:\n    return [ord(c) for c in text]",
    "for (int i = 0; i < 100; ++i) { printf(\"%d\\n\", i * 2 + 1); }",
    "In 2024, revenue grew 12.5% to $1,234,567.89 (up from €987,654).",
    "  leading spaces and   multiple    internal     spaces  ",
    "\t\ttabs\tand\nnewlines\r\nmixed\n\n\n",
    "naïve café résumé — em-dash… ellipsis “smart quotes” ‘single’",
    "日本語のテキストもあります。中文文本也在这里。한국어 텍스트.",
    "Привет мир! Ελληνικά. العربية. עברית.",
    "emoji 😀🎉🚀 and skin tones 👍🏽 and flags 🇺🇸🇯🇵",
    "mixedCASE WoRdS and ALLCAPS and lowercase and CamelCaseWords",
    "hyphen-ated words, under_scores, dot.separated.names",
    "https://example.com/path?query=value&other=123#fragment",
    "a" * 50 + " " + "b" * 30,
    "numbers 0 1 22 333 4444 55555 666666 7777777",
    "'s 't 're 've 'm 'll 'd contraction suffixes",
    "the cat sat on the mat and the dog ran over the hill again and again",
] * 3


TEST_STRINGS = [
    "Hello, world!",
    "President George W.",
    " leading space",
    "   three spaces",
    "trailing spaces   ",
    "I can't don't won't it's we're they've I'll he'd I'm",
    "I CAN'T DON'T (uppercase contractions)",
    "tab\tnewline\nreturn\r mixed \t\n",
    "numbers: 1 12 123 1234 12345 3.14159 1,000,000",
    "code: def f(x): return x**2  # comment",
    "punct !@#$%^&*()_+-=[]{}|;':\",./<>?",
    "unicode: naïve café — “quoted” …",
    "日本語テスト",
    "mixed English and 中文 in one sentence",
    "Привет, мир",
    "emoji 😀 in 🎉 text 🚀",
    "👍🏽",
    "\n",
    " ",
    "\t\t",
    "a",
    "",
    "word",
    " word",
    "word ",
    "ALLCAPS lowercase MixedCase",
    "don't'st've weird't suffix chains",
    "x" * 100,
    "    indented code block\n        deeper indent",
    "1st 2nd 3rd 42nd 100th",
    "hyphen-ated multi-word-expression",
    "trailing newline\n",
    "\nleading newline",
    "🇺🇸 flags 🇯🇵",
    "½ ¾ ± × ÷ math symbols ∑ ∫ ≈",
    "zero​width and non breaking spaces",
]


@pytest.fixture(scope="module")
def trained():
    """Train a real byte-level BPE; return (hf tokenizer, gguf path)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False,
                                                 use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=1200,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)

    # export vocab (id-ordered) + merges into a GGUF
    d = tempfile.mkdtemp()
    files = tok.model.save(d)
    merges_path = [f for f in files if f.endswith("merges.txt")][0]
    with open(merges_path, encoding="utf-8") as f:
        merges = [ln.rstrip("\n") for ln in f
                  if ln.strip() and not ln.startswith("#")]
    vocab_map = tok.get_vocab()
    tokens = [""] * len(vocab_map)
    for t, i in vocab_map.items():
        tokens[i] = t
    # token types: 3 (CONTROL) for the special token, 1 (NORMAL) otherwise
    types = [3 if t == "<|endoftext|>" else 1 for t in tokens]

    path = os.path.join(d, "hfbpe.gguf")
    g = GGUFWriter(path)
    g.add_kv("general.architecture", "gpt2")
    g.add_kv("general.name", "hf-parity-fixture")
    g.add_kv("gpt2.embedding_length", 64)
    g.add_kv("gpt2.block_count", 1)
    g.add_kv("gpt2.context_length", 128)
    g.add_kv("gpt2.attention.head_count", 2)
    g.add_kv("gpt2.attention.layer_norm_epsilon", 1e-5)
    g.add_kv("tokenizer.ggml.model", "gpt2")
    g.add_kv("tokenizer.ggml.pre", "gpt2")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.merges", merges)
    g.add_kv("tokenizer.ggml.bos_token_id", 0)
    g.add_kv("tokenizer.ggml.eos_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", False)
    import numpy as np
    g.add_tensor("token_embd.weight", np.zeros((len(tokens), 64), np.float32))
    g.write()
    return tok, path


@pytest.fixture(scope="module")
def vocab(trained):
    from blama_tpu.gguf.reader import GGUFReader

    _, path = trained
    r = GGUFReader(path)
    v = Vocab.from_gguf(r)
    r.close()
    return v


def test_vocab_loads_real_bpe(trained, vocab):
    tok, _ = trained
    assert vocab.model in ("gpt2", "bpe")
    assert len(vocab.tokens) == tok.get_vocab_size()
    assert len(vocab.merges) > 400


@pytest.mark.parametrize("idx", range(len(TEST_STRINGS)))
def test_encode_matches_hf(trained, vocab, idx):
    """Exact id-sequence parity with HuggingFace tokenizers (the canonical
    byte-level BPE implementation) on adversarial inputs."""
    tok, _ = trained
    text = TEST_STRINGS[idx]
    expected = tok.encode(text, add_special_tokens=False).ids
    got = vocab.tokenize(text, add_special=False, parse_special=False)
    assert got == expected, (
        f"tokenization diverged on {text!r}:\n"
        f"  ours: {got}\n  hf:   {expected}\n"
        f"  ours pieces: {[vocab.token_to_string(t) for t in got]}\n"
        f"  hf pieces:   {[vocab.token_to_string(t) for t in expected]}")


def test_encode_matches_hf_corpus(trained, vocab):
    """Whole-corpus sweep (longer, mixed-content lines)."""
    tok, _ = trained
    for line in CORPUS[:19]:
        assert vocab.tokenize(line, False, False) == \
            tok.encode(line, add_special_tokens=False).ids, line


def test_detokenize_round_trip(trained, vocab):
    tok, _ = trained
    for text in TEST_STRINGS:
        ids = tok.encode(text, add_special_tokens=False).ids
        ours = vocab.detokenize(ids, special=True)
        assert ours == text, f"round trip diverged on {text!r}: {ours!r}"


# --- llama-3 pre-tokenizer variant ------------------------------------------

LLAMA3_REGEX = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


@pytest.fixture(scope="module")
def trained_llama3():
    """Byte-level BPE with the llama-3 split regex (how llama-3's own
    tokenizer.json composes Split(regex) + ByteLevel(use_regex=False))."""
    from tokenizers import (
        Regex, Tokenizer, decoders, models, pre_tokenizers, trainers,
    )

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_REGEX), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=1200, special_tokens=["<|end_of_text|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False)
    tok.train_from_iterator(CORPUS, trainer)

    d = tempfile.mkdtemp()
    files = tok.model.save(d)
    merges_path = [f for f in files if f.endswith("merges.txt")][0]
    with open(merges_path, encoding="utf-8") as f:
        merges = [ln.rstrip("\n") for ln in f
                  if ln.strip() and not ln.startswith("#")]
    vocab_map = tok.get_vocab()
    tokens = [""] * len(vocab_map)
    for t, i in vocab_map.items():
        tokens[i] = t
    types = [3 if t == "<|end_of_text|>" else 1 for t in tokens]

    import numpy as np
    path = os.path.join(d, "hfbpe_l3.gguf")
    g = GGUFWriter(path)
    g.add_kv("general.architecture", "gpt2")
    g.add_kv("general.name", "hf-parity-llama3-pre")
    g.add_kv("gpt2.embedding_length", 64)
    g.add_kv("gpt2.block_count", 1)
    g.add_kv("gpt2.context_length", 128)
    g.add_kv("gpt2.attention.head_count", 2)
    g.add_kv("gpt2.attention.layer_norm_epsilon", 1e-5)
    g.add_kv("tokenizer.ggml.model", "gpt2")
    g.add_kv("tokenizer.ggml.pre", "llama3")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.token_type", types)
    g.add_kv("tokenizer.ggml.merges", merges)
    g.add_kv("tokenizer.ggml.bos_token_id", 0)
    g.add_kv("tokenizer.ggml.eos_token_id", 0)
    g.add_kv("tokenizer.ggml.add_bos_token", False)
    g.add_tensor("token_embd.weight", np.zeros((len(tokens), 64), np.float32))
    g.write()
    return tok, path


@pytest.mark.parametrize("idx", range(len(TEST_STRINGS)))
def test_llama3_pre_encode_matches_hf(trained_llama3, idx):
    from blama_tpu.gguf.reader import GGUFReader

    tok, path = trained_llama3
    r = GGUFReader(path)
    v = Vocab.from_gguf(r)
    r.close()
    text = TEST_STRINGS[idx]
    expected = tok.encode(text, add_special_tokens=False).ids
    got = v.tokenize(text, add_special=False, parse_special=False)
    assert got == expected, f"llama3-pre diverged on {text!r}"
