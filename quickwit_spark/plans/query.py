r"""Query mini-language -> AST.

Implements the reference grammar subset (docs/reference/query-language.md;
builder semantics from quickwit-doc-mapper/src/query_builder.rs):

- bare terms use the default search fields; ``field:term`` qualifies;
- **conjunction by default** (query_builder.rs:62-65);
- ``AND`` / ``OR`` / ``NOT`` (AND binds tighter), ``+``/``-`` prefixes,
  parenthesized groups;
- ``"a b"~slop`` phrases;
- ``field:IN [a b c]`` term sets (query-language.md:63-65);
- ranges ``field:[x TO y]`` / ``{x TO y}`` / ``>``, ``>=``, ``<``, ``<=``
  — only valid on fast (non-text) fields (query_builder.rs:125-175);
- ``*`` match-all; ``term^2.5`` boost;
- backslash escaping of reserved characters (query-language.md "Escaping
  Special Characters"): ``\ `` ``\:`` ``\^`` ``\[`` ``\(`` … become literal
  characters of the term/field. Note on ``a\.b:v`` vs ``a.b:v``: the
  reference only distinguishes them under ``expand_dots: false``; we
  implement the default ``expand_dots: true`` semantics where both address
  the dotted key, so the two forms normalize to the same lookup.

Parsed once on the driver; the plan compiler in operators/search.py turns the
AST into DataFrame joins/filters over the postings tables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field


class Node:
    pass


@dataclass
class MatchAll(Node):
    pass


@dataclass
class Term(Node):
    field: str | None
    value: str
    # True when `value` is already an analyzer output token: evaluation must
    # not re-run the analyzer (Porter2 is not idempotent for every input, so
    # re-stemming a stemmed token could query a term that was never indexed).
    pre_analyzed: bool = False


@dataclass
class Phrase(Node):
    field: str | None
    text: str
    slop: int = 0


@dataclass
class TermSet(Node):
    field: str | None
    values: list[str]


@dataclass
class Range(Node):
    field: str
    lo: str | None
    hi: str | None
    lo_inc: bool = True
    hi_inc: bool = True


@dataclass
class Boost(Node):
    child: Node
    factor: float


@dataclass
class Bool(Node):
    must: list[Node] = dc_field(default_factory=list)
    should: list[Node] = dc_field(default_factory=list)
    must_not: list[Node] = dc_field(default_factory=list)


_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<quoted>(?:(?:\\.|[\w.])+:)?"(?:\\.|[^"\\])*"(~\d+)?)  # incl. field-qualified phrases
  | (?P<space>\s+)
  | (?P<atom>(?:\\.|[^\s()])+)
    """,
    re.VERBOSE,
)


def _unesc(s: str) -> str:
    r"""Resolve ``\c`` escapes to the literal character (reference grammar's
    reserved-character escaping)."""
    return re.sub(r"\\(.)", r"\1", s)


def _lex(q: str) -> tuple[list[str], list[bool]]:
    """-> (tokens, adjacent) where adjacent[i] means token i starts exactly
    where token i-1 ended (no whitespace between) — boost `^N` binds only
    when adjacent, matching the reference grammar's tight `^` binding."""
    out: list[str] = []
    adj: list[bool] = []
    prev_end = -1
    for m in _TOKEN_RE.finditer(q):
        kind = m.lastgroup
        if kind == "space":
            continue
        if kind == "quoted" and m.group("quoted") is None:
            continue
        out.append(m.group(0))
        adj.append(m.start() == prev_end)
        prev_end = m.end()
    return out, adj


class _Parser:
    def __init__(self, tokens: list[str], adjacent: list[bool] | None = None):
        self.toks = tokens
        self.adj = adjacent or [False] * len(tokens)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            # e.g. an unterminated range/term-set: `f:[1 TO`
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"unexpected token {self.peek()!r}")
        return node

    def or_expr(self) -> Node:
        parts = [self.and_expr()]
        while self.peek() == "OR":
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return Bool(should=parts)

    def and_expr(self) -> Node:
        must: list[Node] = []
        must_not: list[Node] = []
        while True:
            t = self.peek()
            if t is None or t in (")", "OR"):
                break
            if t == "AND":
                self.next()
                continue
            if t == "NOT":
                self.next()
                must_not.append(self.clause_atom())
                continue
            node, neg = self.clause()
            (must_not if neg else must).append(node)
        if not must and not must_not:
            raise ValueError("empty clause")
        if len(must) == 1 and not must_not:
            return must[0]
        return Bool(must=must, must_not=must_not)

    def clause(self) -> tuple[Node, bool]:
        t = self.peek()
        neg = False
        if t and t.startswith("-") and len(t) > 1:
            neg = True
            self.toks[self.i] = t[1:]
        elif t and t.startswith("+") and len(t) > 1:
            self.toks[self.i] = t[1:]
        return self.clause_atom(), neg

    def clause_atom(self) -> Node:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t == "(":
            self.next()
            node = self.or_expr()
            if self.peek() != ")":
                raise ValueError("missing )")
            self.next()
            return self._maybe_boost(node)
        # phrase boost `"a b"^2` lexes as two tokens (quoted + ^2): the
        # trailing-boost check applies to any atom
        return self._maybe_boost(self.atom())

    def _maybe_boost(self, node: Node) -> Node:
        """Group boost ``(a b)^2`` — the ^N arrives as its own token after
        the closing paren (UserInputAst::Boost, query_builder.rs:102-113)."""
        t = self.peek()
        if t and t.startswith("^") and self.adj[self.i]:
            m = re.match(r"^\^([\d.]+)$", t)
            if not m:
                raise ValueError(f"bad boost {t!r}")
            self.next()
            return Boost(node, float(m.group(1)))
        return node

    def atom(self) -> Node:
        t = self.next()
        if t == "*":
            return MatchAll()
        if re.match(r"^\^[\d.]+$", t):
            # a whitespace-separated boost binds to nothing: `a ^2` is a
            # grammar error (the reference's ^ binds tightly)
            raise ValueError(f"dangling boost {t!r}")

        # quoted phrase (optionally field-qualified via previous handling)
        m = re.match(
            r'^(?:(?P<f>(?:\\.|[\w.])+):)?"(?P<body>(?:\\.|[^"\\])*)"'
            r"(?:~(?P<slop>\d+))?(?:\^(?P<boost>[\d.]+))?$",
            t,
        )
        if m and t.find('"') != -1:
            node: Node = Phrase(
                _unesc(m.group("f")) if m.group("f") else None,
                _unesc(m.group("body")),
                int(m.group("slop") or 0),
            )
            if m.group("boost"):
                node = Boost(node, float(m.group("boost")))
            return node

        # field-qualified forms; an escaped `\:` is part of the term, not a
        # field separator (the escape-aware field regex cannot consume a bare
        # `:`, so `a\:b` falls through to a single literal term `a:b`)
        fm = re.match(r"^(?P<f>(?:\\.|[\w.])+):(?P<rest>.*)$", t)
        f: str | None = None
        rest = t
        if fm:
            f, rest = _unesc(fm.group("f")), fm.group("rest")

        # IN [a b c]
        if rest == "IN" and self.peek() is not None and self.peek().startswith("["):
            vals: list[str] = []
            tok = self.next()[1:]
            while True:
                if tok.endswith("]"):
                    if tok[:-1]:
                        vals.append(tok[:-1])
                    break
                if tok:
                    vals.append(tok)
                tok = self.next()
            return TermSet(f, [_unesc(v) for v in vals])

        # range: [x TO y] / {x TO y}
        if rest and rest[0] in "[{":
            lo_inc = rest[0] == "["
            parts = [rest[1:]]
            while True:
                tok = self.next()
                parts.append(tok)
                if tok.endswith("]") or tok.endswith("}"):
                    break
            hi_inc = parts[-1].endswith("]")
            parts[-1] = parts[-1][:-1]
            body = [p for p in parts if p and p != "TO"]
            if len(body) != 2:
                raise ValueError(f"bad range {t!r}")
            lo = None if body[0] == "*" else _unesc(body[0])
            hi = None if body[1] == "*" else _unesc(body[1])
            if f is None:
                raise ValueError("range requires a field")
            return Range(f, lo, hi, lo_inc, hi_inc)

        # comparison ranges
        for op, (lo_inc, hi_inc, is_lo) in {
            ">=": (True, True, True),
            "<=": (True, True, False),
            ">": (False, True, True),
            "<": (True, False, False),
        }.items():
            if rest.startswith(op):
                v = _unesc(rest[len(op):])
                if f is None:
                    raise ValueError("range requires a field")
                if is_lo:
                    return Range(f, v, None, lo_inc, True)
                return Range(f, None, v, True, hi_inc)

        # plain term, optional boost; `\^` is a literal caret, not a boost
        bm = re.match(r"^(?P<body>.+?)(?<!\\)\^(?P<boost>[\d.]+)$", rest)
        if bm:
            return Boost(
                Term(f, _unesc(bm.group("body"))), float(bm.group("boost"))
            )
        return Term(f, _unesc(rest))


def parse_query(q: str) -> Node:
    """Parse a query string; raises ValueError on malformed input."""
    q = q.strip()
    if not q or q == "*":
        return MatchAll()
    toks, adj = _lex(q)
    return _Parser(toks, adj).parse()


def expand_default_fields(node: Node, fields: "tuple[str, ...]") -> Node:
    """Rewrite default-field leaves onto explicit ``search_field`` targets
    (rest-api.md search_field parameter; tantivy's QueryParser expands an
    unqualified term into a disjunction over the default fields, one OR per
    term — so ``a b`` over fields (f1, f2) is
    ``(f1:a OR f2:a) AND (f1:b OR f2:b)``). Qualified leaves are untouched."""
    from dataclasses import replace

    if not fields:
        return node
    if isinstance(node, (Term, Phrase, TermSet)) and node.field is None:
        if len(fields) == 1:
            return replace(node, field=fields[0])
        return Bool(should=[replace(node, field=f) for f in fields])
    if isinstance(node, Boost):
        return Boost(expand_default_fields(node.child, fields), node.factor)
    if isinstance(node, Bool):
        e = lambda ns: [expand_default_fields(n, fields) for n in ns]  # noqa: E731
        return Bool(e(node.must), e(node.should), e(node.must_not))
    return node
