"""GBNF grammar tests (test-grammar-parser / test-grammar-integration analogs)."""

import pytest

from rrs_tpu.runtime.grammar import Grammar, GrammarParseError


def test_literal_sequence():
    g = Grammar('root ::= "ab" "c"')
    assert g.accepts_text("abc")
    assert g.accepts_text("ab")          # prefix ok
    assert not g.accepts_text("abd")
    assert not g.accepts_text("x")


def test_alternates():
    g = Grammar('root ::= "yes" | "no"')
    assert g.accepts_text("yes")
    assert g.accepts_text("no")
    assert not g.accepts_text("maybe")


def test_char_class_and_ranges():
    g = Grammar("root ::= [a-z0-9]+")
    assert g.accepts_text("abc123")
    assert not g.accepts_text("ABC")
    g2 = Grammar('root ::= [^"]* "\\""')
    assert g2.accepts_text('hello"')
    assert g2.accepts_text("hello")


def test_repetition_star_plus_question():
    g = Grammar('root ::= "a"* "b"')
    for s in ("b", "ab", "aaab"):
        assert g.accepts_text(s), s
    g = Grammar('root ::= "a"+ "b"')
    assert not _complete(g, "b")
    assert _complete(g, "ab")
    g = Grammar('root ::= "a"? "b"')
    assert _complete(g, "b") and _complete(g, "ab")
    assert not g.accepts_text("aab")


def test_bounded_repetition():
    g = Grammar('root ::= "a"{2,3}')
    assert not _complete(g, "a")
    assert _complete(g, "aa") and _complete(g, "aaa")
    assert not g.accepts_text("aaaa")


def test_rule_refs_and_grouping():
    g = Grammar('''
root ::= greeting " " name
greeting ::= "hello" | "hi"
name ::= ("world" | "there")
''')
    assert _complete(g, "hello world")
    assert _complete(g, "hi there")
    assert not g.accepts_text("hello  ")


def test_recursive_balanced_parens():
    g = Grammar('root ::= "(" inner ")"\ninner ::= root | ""')
    assert _complete(g, "()")
    assert _complete(g, "(())")
    assert not g.accepts_text(")")


def test_json_like_grammar():
    g = Grammar(r'''
root ::= object
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
value ::= object | array | string | number | ("true" | "false" | "null") ws
array ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\"" [^"\\]* "\"" ws
number ::= ("-"? [0-9]+ ("." [0-9]+)?) ws
ws ::= [ \t\n]*
''')
    assert _complete(g, '{"a": 1, "b": [true, null], "c": {"d": "x"}}')
    assert g.accepts_text('{"a": ')
    assert not g.accepts_text('{"a" 1')
    assert not g.accepts_text("[1]")     # root must be an object


def test_done_and_must_end():
    g = Grammar('root ::= "hi"')
    assert not g.done
    assert g.accept_text("hi")
    assert g.done and g.must_end
    # rejected text leaves state unchanged
    g2 = Grammar('root ::= "hi"')
    assert not g2.accept_text("xx")
    assert g2.accept_text("hi")


def test_missing_root_raises():
    with pytest.raises(GrammarParseError):
        Grammar('start ::= "a"')


def test_token_mask():
    g = Grammar('root ::= "yes" | "no"')
    mask = g.allowed_mask(["y", "n", "x", "yes", "no!", ""])
    assert mask == [True, True, False, True, False, False]


def _complete(g: Grammar, s: str) -> bool:
    c = g.copy()
    return c.accept_text(s) and c.done


def test_lazy_trigger_word():
    """Lazy grammars buffer unconstrained output until a trigger pattern
    fires, then constrain from the match start (llama-grammar.h:119-143)."""
    from rrs_tpu.runtime.grammar import Grammar

    g = Grammar('root ::= "<tool_call>" [a-z]+ "</tool_call>"',
                lazy=True, trigger_words=["<tool_call>"])
    assert g.awaiting_trigger
    # anything goes while awaiting
    assert all(g.allowed_mask(["xyz", "!!!", "<tool"]))
    g.feed_token(1, "free text ")
    assert g.awaiting_trigger
    # trigger inside a token piece: constrained replay starts at the match
    g.feed_token(2, "ok <tool_call>ab")
    assert not g.awaiting_trigger
    assert g.accept_text("c")
    assert not g.accepts_text("9")       # now constrained
    assert g.accept_text("</tool_call>")
    assert g.done


def test_lazy_trigger_token():
    from rrs_tpu.runtime.grammar import Grammar

    g = Grammar('root ::= "{" [a-z]* "}"', lazy=True, trigger_tokens=[42])
    g.feed_token(7, "anything at all")
    assert g.awaiting_trigger
    g.feed_token(42, "{")                # trigger token consumes its piece
    assert not g.awaiting_trigger
    assert g.accept_text("ab}")
    assert g.done
    # copy() resets to awaiting
    g2 = Grammar('root ::= "x"', lazy=True, trigger_words=["x"]).copy()
    assert g2.awaiting_trigger


def test_trie_mask_matches_naive_and_is_fast():
    """Trie-DFS mask == naive per-token mask; and on a realistic vocab size
    the trie path prunes instead of walking every piece."""
    import time

    import numpy as np

    from rrs_tpu.runtime.grammar import Grammar, build_token_trie

    g = Grammar('root ::= "{" ws "\\"a\\"" ws ":" ws [0-9]+ ws "}" '
                '\nws ::= [ \\t]*')
    # synthetic vocab: json-ish pieces + lots of irrelevant words
    pieces = ['{', '}', '"a"', ':', ' ', '\t'] + \
             [f"{i}" for i in range(10)] + \
             [f"word{i}" for i in range(5000)] + ['{"', '{ "a', '": 1}']
    trie = build_token_trie(pieces)

    naive = g.allowed_mask(pieces)
    fast = g.allowed_mask(pieces, trie=trie)
    assert fast == naive
    assert fast[0] and fast[pieces.index('{"')]    # '{' and '{"' admissible
    assert not fast[pieces.index("word0")]

    g.accept_text('{"a"')
    naive = g.allowed_mask(pieces)
    t0 = time.perf_counter()
    fast = g.allowed_mask(pieces, trie=trie)
    dt_fast = time.perf_counter() - t0
    assert fast == naive
    # mid-grammar the DFS must prune the 5000 word* tokens at 'w'
    assert dt_fast < 0.05, dt_fast
