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

from quickwit_spark.functions.datetime_fmt import (
    datetime_input_expr,
    datetime_output_expr,
)
from quickwit_spark.functions.ip import ip_canon_array_expr, ip_canon_expr

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
    # nested mapping node (field_mapping_type.rs:70-74 Object): children in
    # FieldMapping.object_mappings, addressed `parent.child`; stored as a
    # Spark STRUCT column so `parent.child` predicates are plain typed
    # column references (codegen + pushdown), never JSON re-parsing
    "object",
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
    # datetime input formats, tried in declaration order
    # (date_time_type.rs:34-67): iso8601 | rfc3339 | rfc2822 |
    # unix_timestamp (precision by magnitude) | strptime patterns
    input_formats: list[str] = dc_field(default_factory=lambda: ["iso8601"])
    # datetime output precision (date_time_format.rs:123-127):
    # seconds | milliseconds | microseconds
    output_precision: str = "microseconds"
    # MultiValues cardinality (mapping_tree.rs Cardinality): "single" |
    # "multi". Multi fields hold array<T>; a scalar arriving on a multi
    # field is wrapped, an array arriving on a single field is a
    # cardinality error (mapping_tree.rs:145) — counted, not fatal.
    cardinality: str = "single"
    # children for type="object" (field_mapping_type.rs:70-74)
    object_mappings: list["FieldMapping"] | None = None

    def __post_init__(self) -> None:
        if self.type not in FIELD_TYPES:
            raise ValueError(
                f"unknown field type {self.type!r}; expected one of {FIELD_TYPES}"
            )
        if self.cardinality not in ("single", "multi"):
            raise ValueError(f"unknown cardinality {self.cardinality!r}")
        if self.type == "object":
            if not self.object_mappings:
                raise ValueError("object mapping needs object_mappings")
            if self.cardinality == "multi":
                raise ValueError(
                    "object arrays are not supported; use a json field"
                )

    def _scalar_coerce(self, col: Column) -> Column:
        """One VALUE -> typed value (pure expressions so the same logic runs
        both top-level and inside F.transform for multi cardinality)."""
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
        if t == "datetime":
            return datetime_output_expr(
                datetime_input_expr(col, self.input_formats),
                self.output_precision,
            )
        raise AssertionError(t)

    def coerce(self, col: Column) -> Column:
        """Source column -> typed column; invalid values become null
        (counted by DocMapper.map like the reference's error counters —
        never a job failure, even under ANSI mode)."""
        if self.type == "object":
            children = self.object_mappings or []
            return F.when(
                col.isNotNull(),
                F.struct(
                    *[
                        c.coerce(col.getField(c.name)).alias(c.name)
                        for c in children
                    ]
                ),
            )
        if self.type == "ip":
            # canonical 16-byte (IPv6-mapped) hex: lexicographic order ==
            # numeric order, so ranges/equality are JVM string compares
            # (mapping_tree.rs:90-99; parse itself is an ingest-only UDF)
            if self.cardinality == "multi":
                return ip_canon_array_expr(col)
            return ip_canon_expr(col)
        if self.cardinality == "multi":
            arr = col.try_cast("array<string>")
            return F.transform(arr, lambda e: self._scalar_coerce(e))
        return self._scalar_coerce(col)


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

        def typed_col(m: FieldMapping) -> tuple[Column, Column | None]:
            """(typed output, cardinality-error condition or None).

            A scalar arriving on a multi-cardinality field is wrapped into a
            one-element array (the reference accepts it); an array arriving
            on a single field is a CARDINALITY error (mapping_tree.rs:145)
            — the whole value nulls and the row is counted. Array-vs-scalar
            is a schema-level fact here, so the mismatch is decided at plan
            time, not per row."""
            c = F.col(m.name)
            is_array = df.schema[m.name].dataType.typeName() == "array"
            if m.cardinality == "multi" and not is_array:
                return m.coerce(F.when(c.isNotNull(), F.array(c))), None
            if m.cardinality == "single" and is_array and m.type != "object":
                null_t = F.lit(None).cast(_SPARK_TYPE.get(m.type, "string"))
                return null_t, c.isNotNull()
            return m.coerce(c), None

        typed = {m.name: typed_col(m) for m in self.mapping.field_mappings}
        cols = [
            typed[m.name][0].alias(m.name)
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

        # per-field coercion-error counts, down to object LEAF paths: value
        # present in input but null after coercion, or a cardinality
        # mismatch (doc_processor.rs counters analog) — ONE aggregate over
        # leaf (path, error-condition) pairs
        leaves: list[tuple[str, Column]] = []

        def walk(m: FieldMapping, path: str, src: Column):
            if m.type == "object":
                for c in m.object_mappings or []:
                    walk(c, f"{path}.{c.name}", src.getField(c.name))
            else:
                leaves.append(
                    (path, src.isNotNull() & m.coerce(src).isNull())
                )

        for m in self.mapping.field_mappings:
            _, card_err = typed[m.name]
            if card_err is not None:
                leaves.append((m.name, card_err))
            elif m.type == "object":
                walk(m, m.name, F.col(m.name))
            else:
                out_c, _ = typed[m.name]
                leaves.append((m.name, F.col(m.name).isNotNull() & out_c.isNull()))

        err_exprs = [
            F.sum(cond.cast("long")).alias(path) for path, cond in leaves
        ]
        err_wide = df.select(*err_exprs)
        errors = err_wide.unpivot(
            [], [f"`{path}`" for path, _ in leaves], "field", "n_errors"
        ).filter(F.col("n_errors") > 0)
        return MapResult(docs=out, errors=errors, rejected=rejected)


def dynamic_path_filter(col: Column, path: str, value: str) -> Column:
    """``a.b.c:v`` path-term predicate over a JSON field (doc_mapper.rs
    :262-291): string-compared, which also matches JSON numbers by their
    canonical rendering (the reference expands unqualified numeric terms to
    u64 OR str — string equality on the extracted scalar covers both)."""
    return F.get_json_object(col, f"$.{path}") == F.lit(value)
