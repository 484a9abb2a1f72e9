"""HTML -> text extraction (pure Spark expressions, whole-stage codegen).

The graft's per-row invariant: extracted text must be byte-identical to the
stored ``text`` column per url (BASELINE.json input_hint). Extraction is the
analog of the reference's doc-processing stage (VRL transform slot,
quickwit-indexing/src/actors/doc_processor.rs:369-399) — a column expression,
not a row UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def html_to_text(html_col: Column) -> Column:
    """binary html -> extracted text: decode utf-8, strip tags, unescape the
    basic entities our corpus can contain. Inverse of the pages generator's
    escaping, and a reasonable generic extractor for tag-wrapped text."""
    s = F.decode(html_col, "UTF-8")
    s = F.regexp_replace(s, r"<[^>]*>", "")
    s = F.regexp_replace(s, r"&lt;", "<")
    s = F.regexp_replace(s, r"&gt;", ">")
    s = F.regexp_replace(s, r"&amp;", "&")
    return s
