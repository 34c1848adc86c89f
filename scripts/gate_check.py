#!/usr/bin/env python
"""Local simulation of the driver's correctness gate.

Runs every `queries()` entry from __spark_entry__.py at sf0.01 in ONE JVM
(the same shared-heap regime the driver uses — the regime that died in
round 1), runs the matching `oracle_sql()` in DuckDB over the same parquet,
and value-compares: row count, schema column set, and an order-independent
value hash with columns sorted by name (mirroring the driver contract).

Usage: python scripts/gate_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from graphscope_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(r).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("gate", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["rows"] = len(sdf)
            rec["sec"] = round(time.monotonic() - t0, 1)
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                rec["oracle_rows"] = len(odf)
                sh, oh = value_hash(sdf), value_hash(odf)
                rec["match"] = bool(sh == oh)
                if not rec["match"]:
                    rec["spark_cols"] = sorted(sdf.columns)
                    rec["oracle_cols"] = sorted(odf.columns)
            else:
                rec["match"] = "rows-only"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["sec"] = round(time.monotonic() - t0, 1)
            traceback.print_exc()
        results[name] = rec
        status = rec.get("err") or ("OK" if rec.get("match") in (True, "rows-only") else "MISMATCH")
        print(f"{name:28s} {rec.get('rows', '-'):>8} rows  {rec['sec']:>7}s  {status}",
              flush=True)

    n_pass = sum(1 for r in results.values() if r.get("match") is True)
    n_rows = sum(1 for r in results.values() if r.get("match") == "rows-only")
    n_bad = sum(1 for r in results.values()
                if r.get("err") or r.get("match") is False)
    print(f"\n== {n_pass} hash-match, {n_rows} rows-only, {n_bad} bad, "
          f"of {len(results)} ==")
    with open("/tmp/gate_check.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
