"""GBNF parser tests (reference: examples/grammar-parser.cpp)."""

import pytest

from whisper_tpu.decoding.grammar import (GType, Grammar, accept_token,
                                          grammar_init)
from whisper_tpu.decoding.grammar_parser import GrammarParseError, parse

COLORS = '''
# voice-command color grammar
root   ::= init color "."
prompt ::= init "."

init ::= " pick a color"
color ::= ", " ("red" | "green" | "blue")
'''


def test_parse_colors():
    st = parse(COLORS)
    assert {"root", "prompt", "init", "color"} <= set(st.symbol_ids)
    root = st.rules[st.symbol_ids["root"]]
    # root ::= init color "." -> REF REF CHAR('.') END
    assert [e.type for e in root] == [GType.RULE_REF, GType.RULE_REF,
                                      GType.CHAR, GType.END]
    assert root[2].value == ord(".")
    # the group ("red"|"green"|"blue") synthesized a sub-rule with two ALTs
    color = st.rules[st.symbol_ids["color"]]
    sub_id = color[-2].value
    sub = st.rules[sub_id]
    assert sum(1 for e in sub if e.type == GType.ALT) == 2


def test_char_classes_and_escapes():
    st = parse(r'root ::= [a-z0-9_] [^x] "\n\t\x41B"' + "\n")
    rule = st.rules[st.symbol_ids["root"]]
    types = [e.type for e in rule]
    # [a-z0-9_]: CHAR a, RNG z, ALT 0, RNG 9, ALT _
    assert types[0] == GType.CHAR and rule[0].value == ord("a")
    assert types[1] == GType.CHAR_RNG_UPPER and rule[1].value == ord("z")
    assert types[2] == GType.CHAR_ALT and rule[2].value == ord("0")
    assert types[3] == GType.CHAR_RNG_UPPER
    assert types[4] == GType.CHAR_ALT and rule[4].value == ord("_")
    # [^x]
    i = types.index(GType.CHAR_NOT)
    assert rule[i].value == ord("x")
    # escapes: \n \t \x41='A' B='B'
    vals = [e.value for e in rule if e.type == GType.CHAR]
    assert vals[-4:] == [ord("\n"), ord("\t"), ord("A"), ord("B")]


def test_repetitions():
    st = parse('root ::= "a"* "b"+ "c"?\n')
    root = st.rules[st.symbol_ids["root"]]
    # each repetition becomes a rule ref
    assert [e.type for e in root] == [GType.RULE_REF] * 3 + [GType.END]
    # a*: S' ::= 'a' S' |      (empty alternate)
    star = st.rules[root[0].value]
    assert [e.type for e in star] == [GType.CHAR, GType.RULE_REF, GType.ALT,
                                      GType.END]
    # b+: S' ::= 'b' S' | 'b'
    plus = st.rules[root[1].value]
    assert [e.type for e in plus] == [GType.CHAR, GType.RULE_REF, GType.ALT,
                                      GType.CHAR, GType.END]
    # c?: S' ::= 'c' |
    opt = st.rules[root[2].value]
    assert [e.type for e in opt] == [GType.CHAR, GType.ALT, GType.END]


def test_parse_errors():
    with pytest.raises(GrammarParseError):
        parse("root = bad\n")  # missing ::=
    with pytest.raises(GrammarParseError):
        parse('root ::= "unterminated\n')
    with pytest.raises(GrammarParseError):
        parse("root ::= undefined-rule\n")
    with pytest.raises(GrammarParseError):
        parse('root ::= *"a"\n')  # repetition without preceding item


def test_parsed_grammar_drives_engine():
    """Parsed rules feed grammar_init and constrain accept order."""
    st = parse('root ::= "ab" | "cd"\n')
    g = grammar_init(st.rules, st.symbol_ids["root"])
    assert g.stacks

    class FakeVocab:
        token_beg = 100
        token_sot = 98
        token_eot = 99

        def token_bytes(self, tid):
            return {1: b"a", 2: b"b", 3: b"c", 4: b"d"}[tid]

    v = FakeVocab()
    accept_token(v, g, 1)  # 'a' is a valid first char
    assert g.stacks
    accept_token(v, g, 2)  # 'b' completes "ab"
    # grammar is now at end: stacks contain the empty completion
    assert any(not s for s in g.stacks)
