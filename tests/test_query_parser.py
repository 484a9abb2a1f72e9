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


def test_dangling_boost_rejected():
    import pytest

    with pytest.raises(ValueError):
        parse_query("a ^2")
    # adjacent forms still bind
    assert isinstance(parse_query("a^2"), Boost)
    assert isinstance(parse_query("(a b)^2"), Boost)
