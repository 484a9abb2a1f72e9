"""Local replica of the driver's correctness gate: run every queries()[name]
under Spark and oracle_sql()[name] under DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash.

Usage: PYTHONPATH=. python tools/check_gate.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as E
    from quickwit_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    os_ = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows-only) rows={len(srows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            ores = con.execute(os_[name])
            ocols = [d[0].lower() for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {scols} vs {ocols}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if not problems:
            h1 = value_hash(srows, scols)
            h2 = value_hash(orows, ocols)
            if h1 != h2:
                problems.append("value hash mismatch")
                # show diff sample
                s_set = set(
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                )
                o_set = set(
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                only_s = list(s_set - o_set)[:3]
                only_o = list(o_set - s_set)[:3]
                problems.append(f"only_spark={only_s} only_oracle={only_o}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
