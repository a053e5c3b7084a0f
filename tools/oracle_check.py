"""Driver-style correctness harness: run every ``queries()`` entry on Spark
and its ``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compare row count, schema (sorted column names) and a value hash.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
Default sf_dir is /root/testdata/sf0.01 (the driver's correctness scale).
With no query names, runs the full suite.  Exit code = number of failures.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonical value rendering: floats rounded so Spark/DuckDB ULP noise
    # does not flip the hash.  Float leniency applies ONLY when the column is
    # float on the side being canonicalized — we deliberately do NOT coerce
    # dtypes across sides, so an oracle that renders an integer aggregate as
    # float64 (e.g. an un-CAST DuckDB window SUM) fails here exactly like it
    # fails with the driver (r3 lesson: corpus_token_budget).
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6)
        elif s.dtype == object:
            def _norm(v):
                if isinstance(v, (dict, list, np.ndarray)):
                    return json.dumps(v, sort_keys=True, default=str)
                # Spark yields None, DuckDB NaN — same null, one rendering.
                return None if pd.isna(v) else v
            out[c] = s.map(_norm)
        else:
            out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from airbyte_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    report: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            fails.append(name)
            report[name] = {"status": "FAIL", "err": f"spark: {exc}"}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"PASS {name}: rows-only ({len(sdf)})")
            report[name] = {"status": "PASS", "mode": "rows-only", "spark_rows": len(sdf)}
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {exc}")
            fails.append(name)
            report[name] = {"status": "FAIL", "err": f"oracle: {exc}"}
            continue
        rows = len(sdf) == len(odf)
        schema = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
        if rows and schema:
            a, b = _canon(sdf), _canon(odf)
            b.columns = a.columns  # case-insensitive name match already checked
            # Driver-strict: NO cross-side dtype coercion.  int64 12 vs
            # float64 12.0 must hash-differ, like it does for the driver.
            hsh = _hash(a) == _hash(b)
        else:
            hsh = False
        status = "PASS" if (rows and schema and hsh) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{status} {name}: rows={len(sdf)}/{len(odf)} schema={schema} hash={hsh}")
        report[name] = {
            "status": status,
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": hsh,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
        }

    # Full-suite runs persist a committed local-correctness snapshot so a
    # future driver sample disagreement is immediately triangulable (the
    # driver samples a subset per round; this file covers ALL keys).
    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "CORRECTNESS_local.json")
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(report),
                       "n_failures": len(fails), "results": report}, f, indent=1)
        print(f"wrote {out}")

    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    return len(fails)


if __name__ == "__main__":
    raise SystemExit(main())
