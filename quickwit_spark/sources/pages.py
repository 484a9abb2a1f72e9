"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §1).

Shape is exactly the graft ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generation is fully distributed: ``spark.range(n)`` + ``mapInPandas`` with a
counter-based hash RNG (splitmix64), so the same (n, seed) yields identical
bytes regardless of partitioning or executor count — required for the
build-determinism and resume invariants.

Content model:
- text: Zipfian (s=1.1) bag over a 10k-word vocabulary, doc length
  ~ lognormal(mu=5.2, sigma=0.6) tokens,
- 3 planted rare "needle" terms in known docs (i % 997 in {13, 14, 15}),
- ~2% docs carry a CJK snippet and lang='zh'; 8% de/fr/es; rest 'en',
- warc_ts = 2023-01-01 + i*37s +/- (i*7919 % 3600)s jitter,
- html = b"<html><body><p>" + escaped text + b"</p></body></html>" — the
  extraction invariant (byte-identical text per url) is testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
LOGNORM_MU = 5.2
LOGNORM_SIGMA = 0.6
NEEDLES = ("needleone", "needletwo", "needlethree")
CJK_SNIPPET = "你好 世界 好 搜索 引擎"
BASE_TS = np.datetime64("2023-01-01T00:00:00")

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return x ^ (x >> np.uint64(31))


def _uniform(key: np.ndarray) -> np.ndarray:
    return _splitmix64(key).astype(np.float64) / 2.0**64


def _vocab() -> np.ndarray:
    return np.array([f"w{k}" for k in range(VOCAB_SIZE)], dtype=object)


def _zipf_cdf() -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
    p /= p.sum()
    return np.cumsum(p)


def _gen_batch(ids: np.ndarray, seed: int, n_sites: int) -> pd.DataFrame:
    vocab = _vocab()
    cdf = _zipf_cdf()
    i = ids.astype(np.uint64)
    sd = np.uint64(seed)

    # doc length: lognormal via inverse normal CDF approximation of a uniform
    u_len = _uniform(i * np.uint64(0x9E3779B1) ^ sd)
    # Acklam-free: use erfinv via numpy polynomial? Keep simple: Box-Muller
    # with two hash-derived uniforms (deterministic, vectorized).
    u2 = _uniform(i * np.uint64(0xC2B2AE3D) ^ (sd + np.uint64(1)))
    z = np.sqrt(-2.0 * np.log(np.clip(u_len, 1e-12, 1.0))) * np.cos(
        2.0 * np.pi * u2
    )
    lens = np.exp(LOGNORM_MU + LOGNORM_SIGMA * z)
    lens = np.clip(lens, 8, 2048).astype(np.int64)

    # per-token Zipf draws, one flat vectorized pass over the ragged layout
    total = int(lens.sum())
    doc_of_tok = np.repeat(np.arange(len(i)), lens)
    pos_in_doc = np.arange(total) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    tok_key = (
        i[doc_of_tok] * np.uint64(0x100000001B3)
        ^ (pos_in_doc.astype(np.uint64) + np.uint64(0x9E37))
        ^ (sd << np.uint64(1))
    )
    ranks = np.searchsorted(cdf, _uniform(tok_key), side="right")
    tokens = vocab[np.clip(ranks, 0, VOCAB_SIZE - 1)]

    # join tokens per doc (the only python-level loop, over docs not tokens)
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(tokens, bounds)]

    ids_i = ids.astype(np.int64)
    mod997 = ids_i % 997
    mod50 = ids_i % 50
    out_texts: list[str] = []
    langs = np.where(
        mod50 == 7,
        "zh",
        np.where(
            mod50 == 11,
            "de",
            np.where(mod50 == 12, "fr", np.where(mod50 == 13, "es", "en")),
        ),
    )
    for k, t in enumerate(texts):
        extra = []
        if mod997[k] == 13:
            extra.append(NEEDLES[0])
        elif mod997[k] == 14:
            extra.append(NEEDLES[1])
        elif mod997[k] == 15:
            extra.append(NEEDLES[2])
        if mod50[k] == 7:
            extra.append(CJK_SNIPPET)
        out_texts.append(t + " " + " ".join(extra) if extra else t)

    jitter = (ids_i * 7919) % 3600
    sign = np.where(ids_i % 2 == 0, 1, -1)
    ts = BASE_TS + (ids_i * 37 + sign * jitter).astype("timedelta64[s]")

    esc = [
        t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        for t in out_texts
    ]
    html = [f"<html><body><p>{e}</p></body></html>".encode() for e in esc]
    urls = [f"https://site{int(v % n_sites)}.example/p/{int(v)}" for v in ids_i]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts),
            "html": html,
            "text": out_texts,
            "lang": langs,
        }
    )


def synth_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_sites: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table with ``n`` rows."""
    rng = spark.range(0, n, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), seed, n_sites)

    return rng.mapInPandas(gen, PAGES_SCHEMA)
