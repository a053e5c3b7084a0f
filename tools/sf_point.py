#!/usr/bin/env python
"""One scale point for the growth-curve record: time the full queries()
suite at an arbitrary sf dir (same warm+measure noop-sink protocol as
bench.py) and one bounded CDC replay, print ONE JSON line. Used for the
sf1 (10x bench-scale) point in BASELINE.md — catches superlinear
cardinality cliffs the sf0.1 suite hides.

    python tools/sf_point.py /tmp/sf1 [replay_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str, replay_events: int = 8_000_000) -> None:
    import __spark_entry__ as entry_mod
    from airbyte_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(
        app_name="sf-point", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    timings: dict[str, float] = {}
    t0 = time.monotonic()
    for name, q in entry_mod.queries().items():
        df = q(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warm
        t = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t, 3)
    suite_s = round(time.monotonic() - t0, 1)

    replay = None
    if replay_events > 0:
        import shutil
        import tempfile

        from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
        from airbyte_spark.config import EngineConfig, StreamConfig
        from airbyte_spark.engine import CdcEngine

        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        root = tempfile.mkdtemp(prefix="sfpoint_", dir=base)
        try:
            cfg = ChangelogConfig(
                n_events=replay_events, n_seed_docs=replay_events // 10,
                dup_pct=2.0, corrupt_pct=1.0, hot_keys=16, hot_pct=30,
                n_source_partitions=8, max_tokens=128,
            )
            write_changelog(spark, cfg, os.path.join(root, "cl"))
            eng = CdcEngine(
                spark, os.path.join(root, "lake"),
                StreamConfig(num_buckets=64),
                EngineConfig(batch_events=max(250_000, replay_events // 2),
                             compact_after_replay_max_files=None),
            )
            eng.create_table()
            t0 = time.monotonic()
            eng.bootstrap(seed_df(spark, cfg))
            boot_s = time.monotonic() - t0
            t0 = time.monotonic()
            eng.replay(os.path.join(root, "cl"))
            rep_s = time.monotonic() - t0
            replay = {
                "cores": cpus, "events": replay_events,
                "bootstrap_s": round(boot_s, 2), "replay_s": round(rep_s, 3),
                "events_per_sec": round(replay_events / rep_s, 1),
                "final_rows": eng.read_final().count(),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()

    out = {
        "sf_dir": sf_dir, "cpus": cpus,
        "suite_total_s": suite_s, "n_queries": len(timings),
        "queries": timings, "replay": replay,
    }
    with open(os.path.join(REPO, "SF_POINT.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(dict(out, queries={"suite_total_s": suite_s})))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000)
