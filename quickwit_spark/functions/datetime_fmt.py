"""Datetime input formats with ordered fallback (date_time_type.rs:34-67,
date_time_format.rs:123-127 analog).

The reference accepts per-field ``input_formats`` tried in order:
``iso8601``, ``rfc3339``, ``rfc2822``, ``unix_timestamp`` (precision
auto-detected from magnitude: secs/millis/micros/nanos), and custom
strptime patterns (``%Y-%m-%d %H:%M:%S``). Each is expressible with Spark
built-ins (``try_cast``/``try_to_timestamp``/``timestamp_seconds``), so the
whole fallback chain compiles to ONE ``coalesce`` inside whole-stage codegen
— no UDF, full pushdown survives.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime -> Java DateTimeFormatter pattern (the subset the reference's
# chrono strftime table shares with Spark; date_time_format.rs parse_strptime)
_STRPTIME = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%3f": "SSS",
    "%6f": "SSSSSS",
    "%b": "MMM",
    "%B": "MMMM",
    "%a": "EEE",
    "%A": "EEEE",
    "%p": "a",
    "%j": "DDD",
    "%z": "xx",
    "%:z": "xxx",
    "%Z": "zz",
    "%T": "HH:mm:ss",
    "%D": "MM/dd/yy",
    "%F": "yyyy-MM-dd",
    "%%": "'%'",
}

_STRPTIME_RE = re.compile("|".join(re.escape(k) for k in sorted(_STRPTIME, key=len, reverse=True)))


def strptime_to_java(fmt: str) -> str:
    """Translate a strptime pattern to a Java DateTimeFormatter pattern,
    quoting literal runs (Java treats bare letters as pattern chars)."""
    out: list[str] = []
    pos = 0
    for m in _STRPTIME_RE.finditer(fmt):
        lit = fmt[pos : m.start()]
        if lit:
            out.append(_quote_literal(lit))
        out.append(_STRPTIME[m.group(0)])
        pos = m.end()
    tail = fmt[pos:]
    if tail:
        out.append(_quote_literal(tail))
    return "".join(out)


def _quote_literal(lit: str) -> str:
    if re.search(r"[A-Za-z]", lit):
        return "'" + lit.replace("'", "''") + "'"
    return lit


def unix_timestamp_expr(col: Column) -> Column:
    """Numeric epoch with precision inferred from magnitude — the
    reference's unix_timestamp format accepts secs/millis/micros/nanos and
    guesses by range (date_time_format.rs parse_unix_timestamp)."""
    v = col.try_cast("long")
    av = F.abs(v)
    return F.when(av < F.lit(100_000_000_000), F.timestamp_seconds(v)).when(
        av < F.lit(100_000_000_000_000), F.timestamp_millis(v)
    ).when(
        av < F.lit(100_000_000_000_000_000), F.timestamp_micros(v)
    ).otherwise(
        # integer division: epoch-nanos (~1.7e18) exceed a double's 53-bit
        # mantissa, so `/ 1000` as double can flip a microsecond boundary
        F.timestamp_micros(F.floor(v.cast("decimal(38,0)") / 1000).cast("long"))
    )


# RFC 2822 arrives with or without the optional day-of-week (Spark's
# pattern engine forbids 'E' when PARSING, so the day name is stripped by
# regexp first) and with a numeric or obsolete named zone.
_RFC2822_PATTERNS = (
    "d MMM yyyy HH:mm:ss xx",
    "d MMM yyyy HH:mm:ss zzz",
    "d MMM yyyy HH:mm xx",
)


def datetime_input_expr(col: Column, input_formats: list[str]) -> Column:
    """Ordered-fallback coercion: first format that parses wins (the
    reference tries input_formats in declaration order). Unknown format
    strings are treated as strptime patterns."""
    cands: list[Column] = []
    for fmt in input_formats:
        f = fmt.lower()
        if f in ("iso8601", "rfc3339"):
            # Spark's native timestamp cast covers ISO-8601/RFC-3339 forms
            cands.append(col.try_cast("timestamp"))
        elif f == "unix_timestamp":
            cands.append(unix_timestamp_expr(col))
        elif f == "rfc2822":
            s = F.regexp_replace(
                col.try_cast("string"), r"^[A-Za-z]{3},\s*", ""
            )
            cands.extend(
                F.try_to_timestamp(s, F.lit(p)) for p in _RFC2822_PATTERNS
            )
        else:
            cands.append(
                F.try_to_timestamp(
                    col.try_cast("string"), F.lit(strptime_to_java(fmt))
                )
            )
    if not cands:
        return col.try_cast("timestamp")
    return cands[0] if len(cands) == 1 else F.coalesce(*cands)


def datetime_output_expr(col: Column, precision: str) -> Column:
    """Output precision truncation (date_time_format.rs output precision:
    seconds | milliseconds | microseconds)."""
    if precision == "seconds":
        return F.date_trunc("second", col).cast("timestamp")
    if precision == "milliseconds":
        us = F.unix_micros(col)
        return F.timestamp_micros((us / 1000).cast("long") * 1000)
    if precision == "microseconds":
        return col
    raise ValueError(f"unknown output precision {precision!r}")
