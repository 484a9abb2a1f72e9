"""Typed field mappings + DocMapper: the reference's doc-mapping system
re-expressed over DataFrames.

Reference semantics (SURVEY §1.2/§1.3):
- type registry i64/u64/f64/bool/ip/datetime/bytes/json/text
  (quickwit-doc-mapper/src/default_doc_mapper/field_mapping_type.rs:31-52,
  string ids :106-136);
- JSON value coercion with parse errors surfaced as counters, not crashes
  (mapping_tree.rs:44-123; doc_processor.rs:50-99 counters);
- three schema modes (default_mapper.rs:44-65): **lenient** (unmapped fields
  dropped), **strict** (unmapped fields are document errors), **dynamic**
  (unmapped fields funneled into a catch-all ``_dynamic`` JSON field,
  default_mapper.rs:220-224, searchable with path syntax ``a.b.c:v``,
  doc_mapper.rs:262-291).

Spark formulation: a mapping compiles to one ``select`` of coercion
expressions (whole-stage codegen; ``try_cast``-style so bad values become
nulls that are COUNTED per field, mirroring the reference's counters), and
dynamic mode packs the unmapped columns into a ``_dynamic`` JSON string
column queried with ``get_json_object`` — which Catalyst evaluates without
ever materializing a parsed map per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIELD_TYPES = (
    "text",
    "i64",
    "u64",
    "f64",
    "bool",
    "datetime",
    "bytes",
    "ip",
    "json",
)

_SPARK_TYPE = {
    "text": "string",
    "i64": "long",
    "u64": "long",  # kept in int64 domain (SURVEY §7.4 u64 note)
    "f64": "double",
    "bool": "boolean",
    "datetime": "timestamp",
    "bytes": "binary",
    "ip": "string",
    "json": "string",
}

# normalized-ish IPv4/IPv6 acceptance (the reference parses to IpAddr and
# stores IPv6 16-byte form; we validate + lowercase, string-keyed)
_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IP_RE = rf"^({_OCTET}\.){{3}}{_OCTET}$|^[0-9a-f:]+:[0-9a-f:]*$"


@dataclass
class FieldMapping:
    """One field's declaration (field_mapping_entry.rs)."""

    name: str
    type: str = "text"
    tokenizer: str = "default"  # text/json fields
    record: str = "position"  # text: "position" | "freq"
    stored: bool = True
    indexed: bool = True
    fast: bool = False
    # datetime input formats, tried in order (date_time_type.rs:34-67);
    # "iso8601" and "unix_timestamp" supported
    input_formats: list[str] = dc_field(default_factory=lambda: ["iso8601"])

    def __post_init__(self) -> None:
        if self.type not in FIELD_TYPES:
            raise ValueError(
                f"unknown field type {self.type!r}; expected one of {FIELD_TYPES}"
            )

    def coerce(self, col: Column) -> Column:
        """Source column -> typed column; invalid values become null via
        try_cast (they are counted by DocMapper.map, like the reference's
        error counters — never a job failure, even under ANSI mode)."""
        t = self.type
        if t == "text" or t == "json":
            return col.try_cast("string")
        if t == "i64":
            return col.try_cast("long")
        if t == "u64":
            v = col.try_cast("long")
            return F.when(v >= 0, v)  # negatives are coercion errors
        if t == "f64":
            return col.try_cast("double")
        if t == "bool":
            return col.try_cast("boolean")
        if t == "bytes":
            # base64 in JSON input (mapping_tree.rs:101-113); binary stays
            return F.when(
                col.try_cast("string").rlike(r"^[A-Za-z0-9+/=\s]*$"),
                F.unbase64(col.try_cast("string")),
            )
        if t == "ip":
            s = F.lower(col.try_cast("string"))
            return F.when(s.rlike(_IP_RE), s)
        if t == "datetime":
            out = None
            for fmt in self.input_formats:
                if fmt == "unix_timestamp":
                    cand = F.timestamp_seconds(col.try_cast("long"))
                else:  # iso8601 / rfc3339-ish via Spark's native cast
                    cand = col.try_cast("timestamp")
                out = cand if out is None else F.coalesce(out, cand)
            return out
        raise AssertionError(t)


@dataclass
class DocMapping:
    field_mappings: list[FieldMapping]
    mode: str = "lenient"  # lenient | strict | dynamic
    timestamp_field: str | None = None
    tag_fields: list[str] = dc_field(default_factory=list)

    def __post_init__(self) -> None:
        if self.mode not in ("lenient", "strict", "dynamic"):
            raise ValueError(f"unknown mode {self.mode!r}")

    def mapping(self, name: str) -> FieldMapping | None:
        for m in self.field_mappings:
            if m.name == name:
                return m
        return None


@dataclass
class MapResult:
    docs: DataFrame  # typed, mapped rows (strict-mode rejects removed)
    errors: DataFrame  # (field, n_errors) coercion-error counts
    rejected: int  # strict mode: rows dropped for carrying unmapped fields


class DocMapper:
    """Compiles a DocMapping into DataFrame transformations
    (doc_mapper.rs trait: doc_from_json_obj -> typed doc; schema())."""

    DYNAMIC_COL = "_dynamic"

    def __init__(self, mapping: DocMapping):
        self.mapping = mapping

    def map(self, df: DataFrame) -> MapResult:
        mapped_names = [m.name for m in self.mapping.field_mappings]
        missing = [n for n in mapped_names if n not in df.columns]
        if missing:
            raise ValueError(f"mapped fields absent from input: {missing}")
        unmapped = [c for c in df.columns if c not in mapped_names]

        rejected = 0
        if self.mapping.mode == "strict" and unmapped:
            # with a columnar source, an unmapped COLUMN would reject every
            # row; reject only rows actually carrying a value there
            cond = None
            for c in unmapped:
                cnd = F.col(c).isNotNull()
                cond = cnd if cond is None else (cond | cnd)
            rejected = df.filter(cond).count()
            df = df.filter(~cond)

        cols = [
            m.coerce(F.col(m.name)).alias(m.name)
            for m in self.mapping.field_mappings
        ]
        if self.mapping.mode == "dynamic" and unmapped:
            # catch-all JSON field (default_mapper.rs:220-224): unmapped
            # columns survive as a path-queryable JSON document
            cols.append(
                F.to_json(F.struct(*[F.col(c) for c in unmapped])).alias(
                    self.DYNAMIC_COL
                )
            )
        out = df.select(*cols)

        # per-field coercion-error counts: value present in input but null
        # after coercion (doc_processor.rs counters analog) — ONE aggregate
        err_exprs = [
            F.sum(
                (F.col(m.name).isNotNull() & out_null).cast("long")
            ).alias(m.name)
            for m, out_null in [
                (m, m.coerce(F.col(m.name)).isNull())
                for m in self.mapping.field_mappings
            ]
        ]
        err_wide = df.select(*err_exprs)
        errors = err_wide.unpivot(
            [], [m.name for m in self.mapping.field_mappings], "field", "n_errors"
        ).filter(F.col("n_errors") > 0)
        return MapResult(docs=out, errors=errors, rejected=rejected)


def dynamic_path_filter(col: Column, path: str, value: str) -> Column:
    """``a.b.c:v`` path-term predicate over a JSON field (doc_mapper.rs
    :262-291): string-compared, which also matches JSON numbers by their
    canonical rendering (the reference expands unqualified numeric terms to
    u64 OR str — string equality on the extracted scalar covers both)."""
    return F.get_json_object(col, f"$.{path}") == F.lit(value)
