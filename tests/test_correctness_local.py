"""The committed local-correctness snapshot must be fresh and all-green.

The driver samples a SUBSET of queries() per round; CORRECTNESS_local.json
(written by `python tools/oracle_check.py` full runs, driver-strict hashing)
covers every key so a future driver sample disagreement is immediately
triangulable. This gate fails when a query is added/renamed without
re-running the full local suite, or when the snapshot records any failure.
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_correctness_local_fresh_and_green():
    path = os.path.join(HERE, "CORRECTNESS_local.json")
    assert os.path.exists(path), "run: python tools/oracle_check.py"
    d = json.load(open(path))
    assert d["n_failures"] == 0, d
    import __spark_entry__ as entry

    keys = set(entry.queries())
    got = set(d["results"])
    assert got == keys, f"stale snapshot: missing={keys - got} extra={got - keys}"
    bad = {k: v for k, v in d["results"].items() if v["status"] != "PASS"}
    assert not bad, bad
