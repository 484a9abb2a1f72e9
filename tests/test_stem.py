"""Snowball English (Porter2) stemmer + en_stem/raw analyzer registry.

Goldens: the published Snowball sample vocabulary (snowballstem.org english
demo pairs) + the algorithm's exceptional forms. The DuckDB correctness-gate
oracle embeds the hand-derived stem mapping for the synthetic corpus
vocabulary; ``test_corpus_vocab_mapping`` pins the python stemmer to exactly
that mapping so the two sides cannot drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickwit_spark.functions.stem import stem
from quickwit_spark.functions.tokenize import (
    analyzer_expr,
    analyzer_py,
    en_stem_tokenize_py,
    raw_tokenize_py,
)

GOLDEN = [
    # snowballstem.org sample vocabulary (spot set)
    ("consign", "consign"), ("consigned", "consign"), ("consigning", "consign"),
    ("consignment", "consign"), ("consist", "consist"), ("consistency", "consist"),
    ("consistent", "consist"), ("consistently", "consist"), ("consolation", "consol"),
    ("consolatory", "consolatori"), ("console", "consol"), ("consolidate", "consolid"),
    ("consolidating", "consolid"), ("consoling", "consol"), ("consols", "consol"),
    ("consonant", "conson"), ("consort", "consort"), ("conspicuous", "conspicu"),
    ("conspiracy", "conspiraci"), ("conspirator", "conspir"), ("conspire", "conspir"),
    ("constable", "constabl"), ("constance", "constanc"), ("constant", "constant"),
    ("knack", "knack"), ("knackeries", "knackeri"), ("knavish", "knavish"),
    ("kneaded", "knead"), ("kneeling", "kneel"), ("knees", "knee"),
    ("knell", "knell"), ("knife", "knife"), ("knightly", "knight"),
    ("knitted", "knit"), ("knives", "knive"), ("knocker", "knocker"),
    ("knocking", "knock"), ("knopp", "knopp"),
    # exceptional forms
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"), ("lying", "lie"),
    ("tying", "tie"), ("idly", "idl"), ("gently", "gentl"), ("ugly", "ugli"),
    ("early", "earli"), ("only", "onli"), ("singly", "singl"),
    ("sky", "sky"), ("news", "news"), ("howe", "howe"), ("atlas", "atlas"),
    ("cosmos", "cosmos"), ("bias", "bias"), ("andes", "andes"),
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"), ("proceed", "proceed"),
    ("exceed", "exceed"), ("succeed", "succeed"),
    # region special-casing
    ("generate", "generat"), ("generates", "generat"), ("generated", "generat"),
    ("generating", "generat"), ("general", "general"), ("generally", "general"),
    ("generic", "generic"), ("generically", "generic"), ("generous", "generous"),
    ("generously", "generous"),
    # assorted rules
    ("running", "run"), ("runs", "run"), ("easily", "easili"),
    ("happiness", "happi"), ("happily", "happili"),
    ("organization", "organ"), ("nationalization", "nation"),
    ("relational", "relat"), ("conditional", "condit"), ("hopeful", "hope"),
    ("goodness", "good"), ("radically", "radic"), ("cries", "cri"),
    ("flies", "fli"), ("dies", "die"), ("agreed", "agre"), ("feed", "feed"),
    ("owed", "owe"), ("owing", "owe"),
]


def test_stemmer_goldens():
    bad = [(w, stem(w), e) for w, e in GOLDEN if stem(w) != e]
    assert not bad, bad


# the synthetic documents vocabulary: only these five tokens change under
# Porter2; the gate's DuckDB oracle hard-codes the same mapping
CORPUS_VOCAB = {
    "join": "join", "hash": "hash", "row": "row", "batch": "batch",
    "scan": "scan", "customer": "custom", "column": "column",
    "filter": "filter", "small": "small", "slow": "slow", "merge": "merg",
    "order": "order", "vector": "vector", "line": "line", "data": "data",
    "table": "tabl", "agg": "agg", "value": "valu", "key": "key",
    "stream": "stream", "window": "window", "spark": "spark", "a": "a",
    "group": "group", "part": "part", "big": "big", "sort": "sort",
    "query": "queri", "fast": "fast", "the": "the", "dup": "dup",
}


def test_corpus_vocab_mapping():
    for w, e in CORPUS_VOCAB.items():
        assert stem(w) == e, (w, stem(w), e)
    # the query-side surface forms the gate uses
    assert stem("merging") == "merg"
    assert stem("tables") == "tabl"
    assert stem("queries") == "queri"


def test_en_stem_analyzer_py():
    assert en_stem_tokenize_py("Merging the TABLES, quickly!") == [
        "merg", "the", "tabl", "quick"
    ]
    assert analyzer_py("en_stem") is en_stem_tokenize_py


def test_raw_tokenizer():
    assert raw_tokenize_py("Some-Tag_Value") == ["Some-Tag_Value"]
    assert raw_tokenize_py("x" * 101) == []
    assert raw_tokenize_py("") == []


def test_analyzer_exprs_match_python(spark):
    rows = [
        ("Merging the TABLES quickly",),
        ("nationalization of generously-knitted consoles",),
        (None,),
        ("",),
    ]
    df = spark.createDataFrame(rows, "text string")
    for tok in ("en_stem", "raw"):
        got = [
            r["toks"]
            for r in df.select(
                analyzer_expr(F.col("text"), tok).alias("toks")
            ).collect()
        ]
        exp = [
            analyzer_py(tok)(t) if t is not None else []
            for (t,) in rows
        ]
        # raw_expr returns [] for null via otherwise-branch
        exp = [e if e is not None else [] for e in exp]
        assert got == exp, tok


def test_multi_token_atom_not_double_stemmed(spark, tmp_path):
    """A hyphenated atom like `data-university:` tokenizes to multiple
    tokens; the implicit-AND recursion must consume the ALREADY-analyzed
    tokens. Porter2 is not idempotent (university -> univers -> univ), so
    re-stemming would query a term that was never indexed and lose the doc."""
    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import IndexReader, SearchRequest, search

    assert stem("university") == "univers"
    assert stem("univers") == "univ"  # the non-idempotence this test pins

    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("u0", "the data university lecture hall", "en", ts),
        ("u1", "unrelated words entirely", "en", ts),
    ]
    pages = spark.createDataFrame(
        rows, "url string, text string, lang string, warc_ts timestamp"
    )
    d = str(tmp_path / "stemidx")
    build_index(
        spark, pages, d,
        IndexConfig(index_id="pages", num_splits=1, tokenizer="en_stem"),
    )
    reader = IndexReader(spark, d)
    hits = search(
        reader, SearchRequest(query="data-university", max_hits=10),
        fetch_fields=("url",),
    ).collect()
    assert [r["url"] for r in hits] == ["u0"]
