"""Query mini-language parser edge cases (docs/reference/query-language.md)."""

from __future__ import annotations

from quickwit_spark.plans.query import (
    Bool,
    Boost,
    MatchAll,
    Phrase,
    Range,
    Term,
    TermSet,
    parse_query,
)


def test_group_boost():
    n = parse_query("(w1 w2)^2.5")
    assert isinstance(n, Boost) and n.factor == 2.5
    assert isinstance(n.child, Bool) and len(n.child.must) == 2


def test_group_boost_in_disjunction():
    n = parse_query("(w1 OR w2)^2 OR w3")
    assert isinstance(n, Bool) and len(n.should) == 2
    assert isinstance(n.should[0], Boost)


def test_term_boost_and_phrase_boost():
    n = parse_query('term^3')
    assert isinstance(n, Boost) and isinstance(n.child, Term)
    n = parse_query('"a b"^1.5')
    assert isinstance(n, Boost) and isinstance(n.child, Phrase)


def test_core_forms():
    assert isinstance(parse_query("*"), MatchAll)
    n = parse_query("a -b +c")
    assert isinstance(n, Bool) and len(n.must) == 2 and len(n.must_not) == 1
    n = parse_query("f:IN [x y z]")
    assert isinstance(n, TermSet) and n.values == ["x", "y", "z"]
    n = parse_query("url:[10 TO 20]")
    assert isinstance(n, Range) and n.lo == "10" and n.hi_inc
    n = parse_query('"exact run"~2')
    assert isinstance(n, Phrase) and n.slop == 2


def test_parser_fuzz_never_crashes():
    """Random query strings must either parse or raise ValueError — never
    anything else (the driver-facing contract of parse_query)."""
    import random
    import string

    rng = random.Random(42)
    alphabet = string.ascii_lowercase + ' ()"~^:[]{}+-*.0123456789'
    for _ in range(3000):
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        try:
            parse_query(q)
        except ValueError:
            pass


def test_parser_roundtrip_shapes():
    import itertools

    pieces = ["w1", "f:w2", '"a b"~1', "f:IN [x y]", "url:[1 TO 2]", "-w3",
              "(w4 OR w5)^2", "*"]
    for combo in itertools.permutations(pieces, 2):
        q = " ".join(combo)
        try:
            parse_query(q)
        except ValueError:
            pass


def test_escaped_special_characters():
    r"""Backslash escaping of reserved characters (query-language.md
    "Escaping Special Characters"): `\c` is the literal character."""
    # escaped colon is part of the term, not a field separator
    n = parse_query(r"a\:b")
    assert isinstance(n, Term) and n.field is None and n.value == "a:b"
    # escaped caret is a literal, not a boost
    n = parse_query(r"a\^2")
    assert isinstance(n, Term) and n.value == "a^2"
    # real boost still binds after an escaped body character
    n = parse_query(r"a\:b^2")
    assert isinstance(n, Boost) and isinstance(n.child, Term)
    assert n.child.value == "a:b" and n.factor == 2.0
    # escaped star is a term, not match-all
    n = parse_query(r"\*")
    assert isinstance(n, Term) and n.value == "*"
    # escaped bracket does not open a range
    n = parse_query(r"f:\[1")
    assert isinstance(n, Term) and n.field == "f" and n.value == "[1"
    # escaped space joins two words into one atom
    n = parse_query(r"hello\ world")
    assert isinstance(n, Term) and n.value == "hello world"
    # escaped parens are literal characters
    n = parse_query(r"\(a\)")
    assert isinstance(n, Term) and n.value == "(a)"
    # escaped quote inside a phrase body
    n = parse_query(r'"say \"hi\""')
    assert isinstance(n, Phrase) and n.text == 'say "hi"'
    # escaped dot in a field name normalizes with the dotted form
    # (expand_dots: true default — both address the same path)
    n1 = parse_query(r"a\.b:v")
    n2 = parse_query(r"a.b:v")
    assert isinstance(n1, Term) and isinstance(n2, Term)
    assert n1.field == n2.field == "a.b" and n1.value == n2.value == "v"
    # escaped minus is not a negation
    n = parse_query(r"\-x")
    assert isinstance(n, Term) and n.value == "-x"
    # escapes inside term sets and range bounds resolve
    n = parse_query(r"f:IN [a\:1 b\:2]")
    assert isinstance(n, TermSet) and n.values == ["a:1", "b:2"]


def test_escape_fuzz_never_crashes():
    """Fuzz with backslashes in the alphabet — parse or ValueError only."""
    import random
    import string

    rng = random.Random(7)
    alphabet = string.ascii_lowercase + ' ()"~^:[]{}+-*.\\0123456789'
    for _ in range(3000):
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        try:
            parse_query(q)
        except ValueError:
            pass


def test_dangling_boost_rejected():
    import pytest

    with pytest.raises(ValueError):
        parse_query("a ^2")
    # adjacent forms still bind
    assert isinstance(parse_query("a^2"), Boost)
    assert isinstance(parse_query("(a b)^2"), Boost)
