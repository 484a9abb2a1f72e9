"""VRL-subset ingest transform compiled to Spark Column expressions.

The reference lets every source (but ingest-api) declare a ``transform:``
block holding a Vector Remap Language program that is run on each document
before doc-mapping (quickwit-indexing/src/actors/doc_processor.rs:369-399
``VrlProgram::transform_doc``; config surface
docs/configuration/source-config.md:195-212, whose example program is

    .message = downcase(string!(.message))
    .timestamp = now()
    del(.username)

). The reference embeds the whole VRL runtime and resolves the program
per-document on a JSON value; a per-row scripting VM is exactly the slow
path this engine forbids (BASELINE.json input_hint: no per-row Python), so
this module instead COMPILES the VRL statement forms quickwit documents —
field assignment, ``del(.field)``, and the common stdlib — into native
Column expressions that stay inside whole-stage codegen. A program using
syntax outside the subset fails loudly at compile time (``VrlCompileError``),
never silently per row.

Error semantics: VRL aborts a document when a fallible expression errors and
the doc is counted as a transform error (doc_processor.rs counters, the
``PrepareDocumentError::TransformError`` arm). The columnar analog: a
``!``-marked call (VRL's "abort on failure" marker, e.g. ``to_int!(.x)``)
that evaluates to NULL marks the row failed; ``apply`` returns the clean
rows and the rejected rows as two DataFrames (no driver action), mirroring
``DocMapper.map``'s error surface in quickwit_spark/schema.py. Un-marked
fallible calls follow VRL's infallible-assignment style: failures become
NULL and the document survives.

``timezone`` is accepted for config parity; date functions resolve in the
Spark session timezone, so it must agree with ``spark.sql.session.timeZone``
(the reference default is UTC, same as this engine's sessions).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.datetime_fmt import strptime_to_java

__all__ = ["VrlCompileError", "VrlTransform", "compile_vrl"]


class VrlCompileError(ValueError):
    """Program uses syntax or functions outside the compiled subset."""


# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>[\n;]+)
  | (?P<path>\.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*!?)
  | (?P<op>\?\?|==|!=|<=|>=|[=+\-*/<>(),])
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str
    pos: int


def _lex(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise VrlCompileError(f"unexpected character {src[i]!r} at {i}")
        kind = m.lastgroup or ""
        if kind not in ("ws", "comment"):
            toks.append(_Tok(kind, m.group(), i))
        i = m.end()
    toks.append(_Tok("eof", "", len(src)))
    return toks


# ---------------------------------------------------------------- parser

# AST: ("assign", path, expr) | ("del", path)
# expr: ("lit", v) | ("field", [seg..]) | ("call", name, fallible, [args])
#     | ("bin", op, l, r)


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise VrlCompileError(
                f"expected {text or kind} at {t.pos}, got {t.text!r}"
            )
        return t

    def program(self) -> list[tuple]:
        stmts: list[tuple] = []
        while True:
            while self.peek().kind == "nl":
                self.next()
            if self.peek().kind == "eof":
                return stmts
            stmts.append(self.statement())
            t = self.peek()
            if t.kind not in ("nl", "eof"):
                raise VrlCompileError(
                    f"expected end of statement at {t.pos}, got {t.text!r}"
                )

    def statement(self) -> tuple:
        t = self.peek()
        if t.kind == "ident" and t.text == "del":
            self.next()
            self.expect("op", "(")
            path = self.expect("path").text
            self.expect("op", ")")
            return ("del", path.lstrip(".").split("."))
        if t.kind == "path":
            path = self.next().text.lstrip(".").split(".")
            self.expect("op", "=")
            return ("assign", path, self.expr())
        raise VrlCompileError(
            f"expected `.field = ...` or `del(.field)` at {t.pos},"
            f" got {t.text!r}"
        )

    # precedence: ?? < comparison < additive < multiplicative < primary
    def expr(self) -> tuple:
        left = self.comparison()
        while self.peek().text == "??":
            self.next()
            left = ("bin", "??", left, self.comparison())
        return left

    def comparison(self) -> tuple:
        left = self.additive()
        while self.peek().text in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next().text
            left = ("bin", op, left, self.additive())
        return left

    def additive(self) -> tuple:
        left = self.multiplicative()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            left = ("bin", op, left, self.multiplicative())
        return left

    def multiplicative(self) -> tuple:
        left = self.primary()
        while self.peek().text in ("*", "/"):
            op = self.next().text
            left = ("bin", op, left, self.primary())
        return left

    def primary(self) -> tuple:
        t = self.next()
        if t.kind == "number":
            return ("lit", float(t.text) if "." in t.text else int(t.text))
        if t.kind == "string":
            # one left-to-right pass: sequential .replace() calls would turn
            # the two-char sequence `\\` + `n` into backslash-newline
            body = re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t"}.get(m.group(1), m.group(1)),
                t.text[1:-1],
            )
            return ("lit", body)
        if t.kind == "path":
            return ("field", t.text.lstrip(".").split("."))
        if t.kind == "ident":
            if t.text in ("true", "false"):
                return ("lit", t.text == "true")
            if t.text == "null":
                return ("lit", None)
            name = t.text
            fallible = name.endswith("!")
            self.expect("op", "(")
            args: list[tuple] = []
            if self.peek().text != ")":
                args.append(self.expr())
                while self.peek().text == ",":
                    self.next()
                    args.append(self.expr())
            self.expect("op", ")")
            return ("call", name.rstrip("!"), fallible, args)
        if t.text == "(":
            e = self.expr()
            self.expect("op", ")")
            return e
        raise VrlCompileError(f"unexpected {t.text!r} at {t.pos}")


# ------------------------------------------------------------- compiler


def _lit_str(node: tuple, fn: str) -> str:
    if node[0] != "lit" or not isinstance(node[1], str):
        raise VrlCompileError(f"{fn}() needs a string literal argument here")
    return node[1]


def _compile_call(name: str, args: list[tuple], argc: list[Column]) -> Column:
    def need(n: int) -> None:
        if len(argc) != n:
            raise VrlCompileError(f"{name}() takes {n} argument(s)")

    if name in ("downcase", "upcase", "trim", "strip_whitespace", "length",
                "abs", "floor", "ceil", "md5"):
        need(1)
        return {
            "downcase": F.lower,
            "upcase": F.upper,
            "trim": F.trim,
            "strip_whitespace": F.trim,
            "length": F.length,
            "abs": F.abs,
            "floor": F.floor,
            "ceil": F.ceil,
            "md5": F.md5,
        }[name](argc[0])
    if name in ("string", "to_string"):
        need(1)
        return argc[0].try_cast("string")
    if name == "to_int":
        need(1)
        return argc[0].try_cast("long")
    if name == "to_float":
        need(1)
        return argc[0].try_cast("double")
    if name == "to_bool":
        need(1)
        return argc[0].try_cast("boolean")
    if name == "now":
        need(0)
        return F.current_timestamp()
    if name == "sha256":
        need(1)
        return F.sha2(argc[0].try_cast("string"), 256)
    if name == "round":
        if len(argc) == 1:
            return F.round(argc[0])
        need(2)
        return F.round(argc[0], args[1][1])
    if name == "replace":  # literal substring replace (VRL default)
        need(3)
        return F.replace(argc[0], argc[1], argc[2])
    if name == "split":
        need(2)
        return F.split(argc[0], re.escape(_lit_str(args[1], name)))
    if name == "join":
        need(2)
        return F.array_join(argc[0], _lit_str(args[1], name))
    if name == "contains":
        need(2)
        return F.contains(argc[0], argc[1])
    if name == "starts_with":
        need(2)
        return F.startswith(argc[0], argc[1])
    if name == "ends_with":
        need(2)
        return F.endswith(argc[0], argc[1])
    if name == "parse_timestamp":  # strptime format, like VRL
        need(2)
        return F.try_to_timestamp(
            argc[0], F.lit(strptime_to_java(_lit_str(args[1], name)))
        )
    if name == "format_timestamp":
        need(2)
        return F.date_format(argc[0], strptime_to_java(_lit_str(args[1], name)))
    if name == "to_unix_timestamp":
        need(1)
        return F.unix_timestamp(argc[0])
    raise VrlCompileError(f"unsupported VRL function {name!r}")


_BIN = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "??": lambda a, b: F.coalesce(a, b),
}


class _Compiler:
    """Compiles one statement's expr; collects ``!``-marked subexpressions
    so the caller can fold them into the row's transform-error condition.

    ``schema`` (the DataFrame's schema AT this statement, i.e. reflecting
    prior assignments) lets ``+`` resolve VRL's string-concat overload for
    field operands, not just literals."""

    def __init__(self, schema=None) -> None:
        self.fallible: list[Column] = []
        self.schema = schema

    def expr(self, node: tuple) -> Column:
        kind = node[0]
        if kind == "lit":
            return F.lit(node[1])
        if kind == "field":
            col = F.col(node[1][0])
            for seg in node[1][1:]:
                col = col.getField(seg)
            return col
        if kind == "bin":
            _, op, ln, rn = node
            left, right = self.expr(ln), self.expr(rn)
            if op == "+":
                # VRL `+` is both arithmetic and string concat; let the
                # string case win when either side is string-typed (literal,
                # string-producing call, or a string column per the schema —
                # without the schema check, field+field on strings would be
                # numeric `+` and silently yield NULLs)
                if _is_stringy(ln, self.schema) or _is_stringy(rn, self.schema):
                    return F.concat(
                        left.try_cast("string"), right.try_cast("string")
                    )
                return left + right
            return _BIN[op](left, right)
        if kind == "call":
            _, name, fallible, args = node
            argc = [self.expr(a) for a in args]
            out = _compile_call(name, args, argc)
            if fallible:
                self.fallible.append(out)
            return out
        raise AssertionError(node)


def _is_stringy(node: tuple, schema=None) -> bool:
    if node[0] == "lit":
        return isinstance(node[1], str)
    if node[0] == "call":
        return node[1] in (
            "downcase", "upcase", "trim", "strip_whitespace", "string",
            "to_string", "replace", "join", "md5", "sha256",
            "format_timestamp",
        )
    if node[0] == "field" and schema is not None:
        from pyspark.sql import types as T

        cur = schema
        for seg in node[1]:
            if not isinstance(cur, T.StructType) or seg not in cur.fieldNames():
                return False
            cur = cur[seg].dataType
        return isinstance(cur, T.StringType)
    if node[0] == "bin" and node[1] in ("+", "??"):
        return _is_stringy(node[2], schema) or _is_stringy(node[3], schema)
    return False


# compile-time arity/argument spec: name -> (min_args, max_args,
# positions that must be string literals). Kept in sync with _compile_call.
_FN_SPEC: dict[str, tuple[int, int, tuple[int, ...]]] = {
    "downcase": (1, 1, ()), "upcase": (1, 1, ()), "trim": (1, 1, ()),
    "strip_whitespace": (1, 1, ()), "length": (1, 1, ()),
    "abs": (1, 1, ()), "floor": (1, 1, ()), "ceil": (1, 1, ()),
    "md5": (1, 1, ()), "string": (1, 1, ()), "to_string": (1, 1, ()),
    "to_int": (1, 1, ()), "to_float": (1, 1, ()), "to_bool": (1, 1, ()),
    "now": (0, 0, ()), "sha256": (1, 1, ()), "round": (1, 2, ()),
    "replace": (3, 3, ()), "split": (2, 2, (1,)), "join": (2, 2, (1,)),
    "contains": (2, 2, ()), "starts_with": (2, 2, ()),
    "ends_with": (2, 2, ()), "parse_timestamp": (2, 2, (1,)),
    "format_timestamp": (2, 2, (1,)), "to_unix_timestamp": (1, 1, ()),
}


def _validate(node: tuple) -> None:
    kind = node[0]
    if kind == "call":
        _, name, _, args = node
        spec = _FN_SPEC.get(name)
        if spec is None:
            raise VrlCompileError(f"unsupported VRL function {name!r}")
        lo, hi, lit_pos = spec
        if not (lo <= len(args) <= hi):
            raise VrlCompileError(
                f"{name}() takes {lo}"
                + (f"..{hi}" if hi != lo else "")
                + f" argument(s), got {len(args)}"
            )
        for p in lit_pos:
            _lit_str(args[p], name)
        if name == "round" and len(args) == 2 and not (
            args[1][0] == "lit" and isinstance(args[1][1], int)
        ):
            raise VrlCompileError("round() precision must be an int literal")
        for a in args:
            _validate(a)
    elif kind == "bin":
        _validate(node[2])
        _validate(node[3])


_ERR = "_vrl_err"


@dataclass
class VrlTransform:
    source: str
    timezone: str = "UTC"

    def __post_init__(self) -> None:
        self._stmts = _Parser(_lex(self.source)).program()
        if not self._stmts:
            raise VrlCompileError("empty VRL program")
        for st in self._stmts:
            if st[0] in ("assign", "del") and len(st[1]) != 1:
                raise VrlCompileError(
                    f"only top-level assignment/deletion targets are "
                    f"supported, got .{'.'.join(st[1])}"
                )
            if st[0] == "assign":
                _validate(st[2])

    def apply(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Run the program over ``df``. Returns ``(docs, rejected)``:
        transformed rows and rows failing a ``!``-marked expression
        (both lazy; the caller counts rejected like DocMapper errors)."""
        out = df.withColumn(_ERR, F.lit(False))
        for st in self._stmts:
            if st[0] == "del":
                out = out.drop(st[1][0])
                continue
            _, path, expr = st
            comp = _Compiler(schema=out.schema)
            value = comp.expr(expr)
            if comp.fallible:
                cond = comp.fallible[0].isNull()
                for c in comp.fallible[1:]:
                    cond = cond | c.isNull()
                # error state is decided against the SAME pre-assignment
                # row the expression reads, then the assignment lands
                out = out.withColumn(_ERR, F.col(_ERR) | cond)
            out = out.withColumn(path[0], value)
        docs = out.filter(~F.col(_ERR)).drop(_ERR)
        rejected = out.filter(F.col(_ERR)).drop(_ERR)
        return docs, rejected


def compile_vrl(source: str, timezone: str = "UTC") -> VrlTransform:
    """Compile a VRL-subset program (raises VrlCompileError outside the
    subset — the compile-time analog of the reference's VRL compilation
    error at source-config load, doc_processor.rs:402-420)."""
    return VrlTransform(source=source, timezone=timezone)
