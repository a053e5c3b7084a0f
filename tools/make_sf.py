#!/usr/bin/env python
"""Deterministic scale-factor multiplier for the driver testdata.

Builds sf(K*0.1) from /root/testdata/sf0.1 by unioning K key-shifted
copies of every table (DuckDB, no randomness): fact keys shift by
copy*range so FK joins stay intact; document/embedding payloads get a
tiny per-copy suffix/rotation so text and vectors stay distinct (exact
10x duplicate blow-ups would distort dedup-operator timings rather than
scale them); nation/region are genuine dimensions and stay as-is. Used
for the sf1 scale point in BASELINE.md — correctness is still gated at
sf0.01 against DuckDB; this data is for TIMING growth curves only.

    python tools/make_sf.py /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: key column -> shift stride (max key + 1 of the source table)
STRIDES = {
    "o_orderkey": 600_000,  # orders max key < 600k at sf0.1
    "l_orderkey": 600_000,
    "c_custkey": 15_000,
    "o_custkey": 15_000,
    "p_partkey": 20_000,
    "l_partkey": 20_000,
    "s_suppkey": 1_000,
    "l_suppkey": 1_000,
    "doc_id": 5_000,
    "vec_id": 2_000,
    "event_id": 100_000,
}


def _copy_select(table: str, cols: list[str], i: int) -> str:
    out = []
    for c in cols:
        if c in STRIDES:
            out.append(f"({c} + {i * STRIDES[c]}) AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            # distinct text per copy: dedup operators scale, not explode
            out.append(f"(text || ' c{i}') AS text")
        elif table == "embeddings" and c == "embedding" and i > 0:
            # deterministic distinctness: nudge one lane per copy
            out.append(
                f"list_transform(embedding, (x, j) -> CASE WHEN j = {(i % 8) + 1} "
                f"THEN CAST(x + {i} * 1e-3 AS FLOAT) ELSE x END) AS embedding"
            )
        else:
            out.append(c)
    return ", ".join(out)


def main(dst: str, k: int = 10, src: str = SRC) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        path = f"{src}/{t}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()]
        if t in ("region", "nation"):
            union = f"SELECT * FROM read_parquet('{path}')"
        else:
            union = " UNION ALL ".join(
                f"SELECT {_copy_select(t, cols, i)} FROM read_parquet('{path}')"
                for i in range(k)
            )
        out = f"{dst}/{t}.parquet"
        con.sql(f"COPY ({union}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(dst, k)
