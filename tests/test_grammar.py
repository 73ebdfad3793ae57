"""GBNF grammar engine tests: parsing, incremental matching, token masking,
and constrained generation through the Session (mirrors the reference's
commented-out grammar integration cases, t-integration.cpp:424-509)."""

import numpy as np
import pytest

from blama_tpu.runtime.grammar import GBNFParser, GrammarMatcher, GrammarSampler


def match_str(grammar: str, s: str) -> tuple[bool, bool]:
    """Return (all chars consumed OK, can_end)."""
    m = GrammarMatcher(GBNFParser(grammar).parse())
    ok = m.consume_bytes(s.encode())
    return ok, m.can_end


def test_literal():
    g = 'root ::= "hello"'
    assert match_str(g, "hello") == (True, True)
    assert match_str(g, "hell") == (True, False)
    assert match_str(g, "help")[0] is False


def test_alternation():
    g = 'root ::= "yes" | "no"'
    assert match_str(g, "yes") == (True, True)
    assert match_str(g, "no") == (True, True)
    assert match_str(g, "maybe")[0] is False


def test_char_class_and_ranges():
    g = "root ::= [a-z]"
    assert match_str(g, "q") == (True, True)
    assert match_str(g, "Q")[0] is False
    g2 = "root ::= [^0-9]"
    assert match_str(g2, "x") == (True, True)
    assert match_str(g2, "5")[0] is False


def test_star_plus_opt():
    g = 'root ::= "a"* "b"'
    assert match_str(g, "b") == (True, True)
    assert match_str(g, "aaab") == (True, True)
    g2 = 'root ::= "a"+ "b"'
    assert match_str(g2, "b")[0] is False
    assert match_str(g2, "ab") == (True, True)
    g3 = 'root ::= "a"? "b"'
    assert match_str(g3, "ab") == (True, True)
    assert match_str(g3, "b") == (True, True)
    assert match_str(g3, "aab")[0] is False


def test_bounded_repeat():
    g = 'root ::= [0-9]{2,4}'
    assert match_str(g, "1")[1] is False
    assert match_str(g, "12") == (True, True)
    assert match_str(g, "1234") == (True, True)
    ok, _ = match_str(g, "12345")
    assert ok is False


def test_rule_refs_and_recursion():
    g = '''
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+
'''
    assert match_str(g, "1+2+34") == (True, True)
    assert match_str(g, "1+") == (True, False)
    assert match_str(g, "+1")[0] is False


def test_json_like_grammar():
    g = r'''
root ::= object
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}"
value ::= object | array | string | number | "true" | "false" | "null"
array ::= "[" ws ( value ("," ws value)* )? "]"
string ::= "\"" [^"]* "\""
number ::= "-"? [0-9]+ ("." [0-9]+)?
ws ::= [ \t\n]*
'''
    assert match_str(g, '{"a": 1, "b": [true, null]}')[0] is True
    assert match_str(g, '{"a": }')[0] is False


def test_escapes():
    g = r'root ::= "\n" "\x41" "B"'
    assert match_str(g, "\nAB") == (True, True)


def test_comments_ignored():
    g = '''
# a comment
root ::= "x"  # trailing comment
'''
    assert match_str(g, "x") == (True, True)


def test_missing_root_raises():
    with pytest.raises(ValueError, match="root"):
        GBNFParser('start ::= "x"').parse()


class FakeVocab:
    def __init__(self, pieces):
        self.pieces = pieces

    def is_eog(self, t):
        return t == 0

    def token_piece(self, t, special=False):
        return self.pieces[t].encode()


def test_grammar_sampler_token_mask():
    vocab = FakeVocab({0: "", 1: "a", 2: "b", 3: "ab"})
    gs = GrammarSampler('root ::= "ab"', vocab)
    assert gs.token_allowed(1)       # 'a' is a valid prefix
    assert not gs.token_allowed(2)   # 'b' is not
    assert gs.token_allowed(3)       # 'ab' completes
    assert not gs.token_allowed(0)   # EOG not allowed before completion
    gs.accept(1)
    assert gs.token_allowed(2)
    gs.accept(2)
    assert gs.token_allowed(0)       # now at end → EOG allowed


def test_grammar_constrained_session(tmp_path):
    """End-to-end: a grammar forcing lowercase words constrains generation."""
    from blama_tpu.gguf import GGMLType
    from blama_tpu.runtime.instance import Instance, InstanceInitParams
    from blama_tpu.runtime.model import Model
    from blama_tpu.runtime.session import CompleteParams, SessionInitParams
    from blama_tpu.testing import write_tiny_llama

    p = str(tmp_path / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    s = inst.start_session(
        SessionInitParams(seed=3, temperature=0.0, grammar='root ::= [ a-z]+')
    )
    s.set_initial_prompt(m.vocab.tokenize("hello", True, True))
    preds = s.complete(CompleteParams(max_tokens=8))
    text = m.vocab.detokenize([pr.token for pr in preds])
    assert all(c.islower() or c == " " for c in text), text
    inst.stop_session()
    m.close()


def test_token_mask_cache_reuses_state():
    """Recurring matcher states reuse memoized token masks (NEXT.md #11:
    lazy grammars were O(V·stacks) per step on host)."""
    tiny_vocab = FakeVocab({0: "", 1: "a", 2: "b", 3: "ab", 4: "c"})
    tiny_vocab.n_tokens = lambda: 5
    g = GrammarSampler('root ::= [ab]*', tiny_vocab)
    calls = {"n": 0}
    orig = g.matcher._trial

    def counting(data):
        calls["n"] += 1
        return orig(data)

    g.matcher._trial = counting
    ids = list(range(5))
    m1 = [g.token_allowed(t) for t in ids]
    first = calls["n"]
    m2 = [g.token_allowed(t) for t in ids]
    assert m1 == m2
    assert calls["n"] == first  # all cache hits, zero new trials

    # consuming a token that changes state must not reuse the stale mask
    a_tok = 1
    g.accept(a_tok)
    m3 = [g.token_allowed(t) for t in ids]
    assert m3 == m1  # [ab]* is state-invariant here — semantics unchanged

    g2 = GrammarSampler('root ::= "ab"', tiny_vocab)
    allowed_first = [t for t in ids if g2.token_allowed(t)]
    g2.accept(a_tok)
    b_tok = 2
    allowed_second = [t for t in ids if g2.token_allowed(t)]
    assert allowed_first != allowed_second  # new state computed fresh
    assert b_tok in allowed_second
