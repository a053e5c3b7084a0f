#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "cdc_replay": {"events": N, "local8": {...}, "local32": {...},
                   "scaling_efficiency": e}}

Two parts:
1. Driver queries (__spark_entry__.queries()) timed at $SPARK_GRAFT_SF_DIR
   on local[$SPARK_GRAFT_CPUS] with a noop sink.
2. The headline CDC replay (generate -> bootstrap -> bounded replay with
   dedup+merge+checkpoint) run as *subprocesses* at two parallelism levels
   (local[N] and local[4N]) on the SAME pre-generated input — the sandbox
   evidence for the >=0.8 N->4N scaling-efficiency rule (BASELINE.md).
   Both levels run CONCURRENTLY on disjoint pinned CPU sets in lock-step
   barrier-released passes; the first SPARK_GRAFT_BENCH_WARMUP passes
   (default 1) are JIT warm-up and unscored; the scored efficiency is the
   MEDIAN of the remaining per-pass ratios (each pass self-paired in
   time), and any result >1.05 is explicitly flagged UNPHYSICAL rather
   than reported as a win.
   Disable with SPARK_GRAFT_BENCH_SCALING=0 (then only local[CPUS] runs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
# ~40M events/sf-unit: sf0.1 -> 4M events, sf0.01 -> 400k
BENCH_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", str(int(40_000_000 * SF))))

# Scaling-efficiency pair (N -> 4N). This VM advertises 32 vCPUs but
# delivers ~12 effective cores of JVM throughput (pure-compute xxhash sweep:
# 2->8 threads scales ~4x, 8->32 only ~1.7x, with 30-60% kernel time at 32
# threads) — so the honest N->4N demonstration allowed by BASELINE.md
# ("or N and 4N cores") is local[2] -> local[8], both below the ceiling.
SCALE_HI = int(os.environ.get("SPARK_GRAFT_BENCH_HI", str(min(8, CPUS))))
SCALE_LO = max(1, SCALE_HI // 4)

# Per-executor-shaped resources: each child gets memory proportional to its
# cores (a real 4N-executor cluster brings 4x memory and local disks — the
# tmpfs lake/shuffle dirs model per-executor NVMe, not durability).
TMPFS = "/dev/shm" if os.path.isdir("/dev/shm") else None
BENCH_SEED_DOCS = max(1000, BENCH_EVENTS // 10)
BATCH_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_BATCH", str(max(250_000, BENCH_EVENTS // 2))))
NUM_BUCKETS = int(os.environ.get("SPARK_GRAFT_BENCH_BUCKETS", "64"))


def _gen_dir() -> str:
    return f"/tmp/ab_bench_input_{BENCH_EVENTS}_{BENCH_SEED_DOCS}"


def _changelog_cfg():
    from airbyte_spark.changelog import ChangelogConfig

    return ChangelogConfig(
        n_events=BENCH_EVENTS,
        n_seed_docs=BENCH_SEED_DOCS,
        dup_pct=2.0,
        corrupt_pct=1.0,
        hot_keys=16,
        hot_pct=30,
        n_source_partitions=8,
        max_tokens=128,
    )


def _child_barrier(sync_dir: str, cores: int, i: int) -> bool:
    """Announce readiness for pass ``i`` and block until the parent releases
    it (both levels ready) — so each measured pass STARTS in the same noise
    window on both levels and the per-pass ratio is genuinely paired.

    Returns False when the parent posted the ``stop`` sentinel instead of a
    release: the time budget ran out (degraded machine) and the child must
    finish with the passes it has — both levels see the stop at the SAME
    pass boundary, so pairing is preserved."""
    stop = os.path.join(sync_dir, "stop")
    go = os.path.join(sync_dir, f"go-{i}")
    open(os.path.join(sync_dir, f"ready-{cores}-{i}"), "w").close()
    deadline = time.monotonic() + 5400
    while not os.path.exists(go):
        if os.path.exists(stop):
            return False
        if time.monotonic() > deadline:
            raise RuntimeError(f"barrier timeout waiting for {go}")
        time.sleep(0.05)
    return True


def child_replay(
    cores: int, n_runs: int = 1, cpu_start: int = 0, sync_dir: str | None = None
) -> dict:
    """Run the full replay ``n_runs`` times at local[cores] in ONE JVM;
    print a JSON result line with every run plus the best.

    The process pins itself to cores [cpu_start, cpu_start+cores) (inherited
    by the JVM and python UDF workers) and caps the JVM's
    ActiveProcessorCount — modeling a real N-core executor host, where GC /
    shuffle / codec threads share the executor's cores instead of spilling
    onto the rest of the machine. An unpinned local[2] on a 32-vCPU box
    otherwise borrows idle cores and inflates the small-N baseline
    (deflating measured scaling efficiency).

    Repeats share the JVM (JIT-warm after run 1, like a long-running
    executor) but each gets a FRESH lake. With ``sync_dir`` set, every run
    is gated on a parent-released barrier shared with the sibling level —
    pass k on local[N] and pass k on local[4N] start together, so the
    VERDICT-r2 artifact (best-of pairing opposite noise phases into an
    unphysical >1.0 efficiency) cannot occur: the scored number is the
    MEDIAN of per-pass ratios, each pass self-paired in time."""
    import shutil
    import tempfile

    try:
        os.sched_setaffinity(0, set(range(cpu_start, cpu_start + cores)))
    except (AttributeError, OSError):  # non-Linux / restricted
        pass

    from airbyte_spark.changelog import seed_df, write_changelog
    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.session import get_spark

    cfg = _changelog_cfg()
    extra = {
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}",
        # finer scan splits: the validate map stage is the heaviest per-row
        # work; default 128m splits give too few tasks to pack N cores
        "spark.sql.files.maxPartitionBytes": "16m",
    }
    if TMPFS:
        local_dir = os.path.join(TMPFS, f"ab_bench_spark_{cores}_{cpu_start}")
        os.makedirs(local_dir, exist_ok=True)
        extra["spark.local.dir"] = local_dir
    spark = get_spark(
        app_name=f"cdc-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf=extra,
    )
    gen = _gen_dir()
    if not os.path.exists(os.path.join(gen, "changelog", "_SUCCESS")):
        write_changelog(spark, cfg, os.path.join(gen, "changelog"), n_files=max(16, cores))

    seed = seed_df(spark, cfg)
    runs = []
    for run_i in range(n_runs):
        if sync_dir is not None and not _child_barrier(sync_dir, cores, run_i):
            break  # parent budget-stop: finish with the passes we have
        root = tempfile.mkdtemp(prefix=f"ab_bench_lake_{cores}_", dir=TMPFS)
        eng = CdcEngine(
            spark,
            root,
            StreamConfig(num_buckets=NUM_BUCKETS),
            EngineConfig(batch_events=BATCH_EVENTS, write_partitions=cores * 2),
        )
        eng.create_table()
        t0 = time.monotonic()
        eng.bootstrap(seed)
        boot_s = time.monotonic() - t0
        stats = eng.replay(os.path.join(gen, "changelog"))
        final_rows = eng.read_final().count()
        shutil.rmtree(root, ignore_errors=True)
        runs.append(
            {
                "bootstrap_s": round(boot_s, 2),
                "replay_s": stats["wall_s"],
                "compact_s": stats.get("compact_s", 0.0),
                "events_per_sec": stats["events_per_sec"],
                "final_rows": final_rows,
            }
        )
    spark.stop()
    if TMPFS:
        shutil.rmtree(os.path.join(TMPFS, f"ab_bench_spark_{cores}_{cpu_start}"), ignore_errors=True)
    if not runs:  # n_runs=0: generate-input-only invocation
        out = {"cores": cores, "events": cfg.n_events, "runs": []}
        print("BENCH_CHILD_RESULT " + json.dumps(out), flush=True)
        return out
    best = max(runs, key=lambda r: r["events_per_sec"])
    out = {
        "cores": cores,
        "events": cfg.n_events,
        "runs": runs,
        **best,
    }
    print("BENCH_CHILD_RESULT " + json.dumps(out), flush=True)
    return out


def _spawn_child(
    cores: int, n_runs: int, cpu_start: int, sync_dir: str | None = None
) -> subprocess.Popen:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_EVENTS"] = str(BENCH_EVENTS)
    env["SPARK_DRIVER_MEMORY"] = f"{max(8, cores * 2)}g"
    args = [sys.executable, os.path.abspath(__file__), "--child",
            str(cores), str(n_runs), str(cpu_start)]
    if sync_dir is not None:
        args.append(sync_dir)
    # stderr to a file, NOT a pipe: while children sit at pass barriers the
    # parent is busy releasing passes, not draining pipes — Spark's chatty
    # stderr must never be able to fill a pipe and deadlock a child
    errf = open(f"/tmp/ab_bench_child_{cores}_{cpu_start}.log", "w")
    return subprocess.Popen(
        args,
        stdout=subprocess.PIPE,
        stderr=errf,
        text=True,
        env=env,
        cwd=REPO,
    )


def _finish_child(proc: subprocess.Popen, cores: int) -> dict:
    out, _ = proc.communicate(timeout=3600)
    for line in out.splitlines():
        if line.startswith("BENCH_CHILD_RESULT "):
            return json.loads(line[len("BENCH_CHILD_RESULT "):])
    raise RuntimeError(
        f"child local[{cores}] failed rc={proc.returncode}\n"
        f"stdout tail: {out[-2000:]} (stderr in /tmp/ab_bench_child_{cores}_*.log)"
    )


def _run_paired_passes(n_runs: int, min_passes: int = 2) -> tuple[dict, dict, list[float]]:
    """The scaling protocol (VERDICT r2 #6): both levels live concurrently
    on DISJOINT pinned CPU sets, and every pass k is released by a barrier
    only when both levels are ready — so each per-pass ratio compares the
    same noise window. Returns (lo_result, hi_result, per-pass ratios)."""
    import tempfile

    sync_dir = tempfile.mkdtemp(prefix="ab_bench_sync_")
    # pre-generate the shared changelog input so the pair can't race on it
    if not os.path.exists(os.path.join(_gen_dir(), "changelog", "_SUCCESS")):
        _finish_child(_spawn_child(SCALE_HI, 0, SCALE_LO), SCALE_HI)
    p_lo = _spawn_child(SCALE_LO, n_runs, 0, sync_dir)
    p_hi = _spawn_child(SCALE_HI, n_runs, SCALE_LO, sync_dir)
    # Degraded-machine guard: this sandbox VM's effective speed swings by
    # integer factors between rounds (steal storms; pinned small-core sets
    # hit hardest). Rather than die at a fixed deadline and emit NOTHING,
    # release at least min_passes (warmup + 1 scored) and then keep
    # releasing passes only while the time budget holds; on budget
    # exhaustion post the stop sentinel — both children finish at the same
    # pass boundary with however many paired passes completed.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_SCALING_BUDGET", "2400"))
    t_start = time.monotonic()
    try:
        for i in range(n_runs):
            ready_lo = os.path.join(sync_dir, f"ready-{SCALE_LO}-{i}")
            ready_hi = os.path.join(sync_dir, f"ready-{SCALE_HI}-{i}")
            deadline = time.monotonic() + 5400
            while not (os.path.exists(ready_lo) and os.path.exists(ready_hi)):
                if p_lo.poll() is not None and p_lo.returncode != 0:
                    raise RuntimeError("lo child died before barrier")
                if p_hi.poll() is not None and p_hi.returncode != 0:
                    raise RuntimeError("hi child died before barrier")
                if time.monotonic() > deadline:
                    raise RuntimeError(f"parent barrier timeout at pass {i}")
                time.sleep(0.1)
            if i >= min_passes and time.monotonic() - t_start > budget_s:
                open(os.path.join(sync_dir, "stop"), "w").close()
                break
            open(os.path.join(sync_dir, f"go-{i}"), "w").close()
        r_lo = _finish_child(p_lo, SCALE_LO)
        r_hi = _finish_child(p_hi, SCALE_HI)
    finally:
        for p in (p_lo, p_hi):
            if p.poll() is None:
                p.kill()
    ratios = [
        h["events_per_sec"] / l["events_per_sec"]
        for l, h in zip(r_lo["runs"], r_hi["runs"])
    ]
    return r_lo, r_hi, ratios


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def mor_demo() -> dict:
    """Merge-on-read evidence for the bench record: small batches against a
    table ~100x their size must write ~batch-sized delta commits, never
    table-sized rewrites. Reports rows written per merge commit and the
    write-amplification ratio vs the table (1.0 == full rewrite)."""
    import shutil
    import tempfile

    from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.session import get_spark

    spark = get_spark(app_name="mor-demo", master=f"local[{min(8, CPUS)}]", shuffle_partitions=16)
    n_docs = max(100_000, BENCH_SEED_DOCS // 2)
    batch = max(2_000, n_docs // 100)
    cfg = ChangelogConfig(n_events=batch * 3, n_seed_docs=n_docs, dup_pct=2.0, max_tokens=64)
    root = tempfile.mkdtemp(prefix="ab_mor_demo_", dir=TMPFS)
    try:
        eng = CdcEngine(
            spark, root, StreamConfig(num_buckets=NUM_BUCKETS),
            EngineConfig(batch_events=batch, compact_after_replay_max_files=None),
        )
        eng.create_table()
        eng.bootstrap(seed_df(spark, cfg))
        cl = os.path.join(root, "cl")
        write_changelog(spark, cfg, cl)
        eng.replay(cl)
        table_rows = sum(
            f.rows for f in eng.table.snapshot().files if f.kind != "delta"
        )
        per_commit: dict[int, int] = {}
        ops = []
        for snap in eng.table.history():
            op = snap.summary.get("operation")
            if op in ("merge-delta", "merge", "merge-full"):
                ops.append(op)
                new_rows = sum(
                    f.rows for f in snap.files
                    if f.path.startswith(f"data/v{snap.version}-")
                )
                per_commit[snap.version] = new_rows
        writes = list(per_commit.values())
        return {
            "table_rows": table_rows,
            "batch_events": batch,
            "merge_ops": ops,
            "rows_written_per_commit": writes,
            "write_ratio": round(max(writes) / max(table_rows, 1), 4) if writes else None,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child_replay(
            int(sys.argv[2]),
            int(sys.argv[3]) if len(sys.argv) > 3 else 1,
            int(sys.argv[4]) if len(sys.argv) > 4 else 0,
            sys.argv[5] if len(sys.argv) > 5 else None,
        )
        return

    import __spark_entry__ as entry_mod
    from airbyte_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    t_total0 = time.monotonic()

    timings: dict[str, float] = {}
    for name, q in entry_mod.queries().items():
        df = q(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()  # warm (plan+scan cached by OS)
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    suite_wall_s = time.monotonic() - t_total0

    # Machine-speed calibration: a healthy pass of this suite takes ~3-6
    # min; this sandbox VM's effective speed swings by integer factors
    # between rounds (steal storms). When the suite crawled, shrink the
    # scaling replay's event count so the paired passes still finish inside
    # the budget — the hi/lo RATIO is computed at equal event counts either
    # way, and the absolute throughput is always reported WITH its event
    # count. Explicit SPARK_GRAFT_BENCH_EVENTS wins over calibration.
    if "SPARK_GRAFT_BENCH_EVENTS" not in os.environ:
        shrink = 1
        if suite_wall_s > 1200:
            shrink = 8
        elif suite_wall_s > 600:
            shrink = 4
        if shrink > 1:
            global BENCH_EVENTS, BENCH_SEED_DOCS, BATCH_EVENTS
            BENCH_EVENTS = max(500_000, BENCH_EVENTS // shrink)
            BENCH_SEED_DOCS = max(1000, BENCH_EVENTS // 10)
            BATCH_EVENTS = max(250_000, BENCH_EVENTS // 2)

    cdc: dict = {"events": BENCH_EVENTS, "suite_wall_s": round(suite_wall_s, 1)}
    scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
    # Paired-pass protocol (VERDICT r2 #6): >=4 lock-step passes, both
    # levels concurrent on disjoint pinned CPU sets, each pass barrier-
    # released so its ratio compares the same noise window. The SCORED
    # efficiency is the MEDIAN of per-pass ratios — a statistic a single
    # lucky/unlucky noise phase cannot push past 1.0 (the r2 best-of
    # artifact). Per-level best-of remains the headline THROUGHPUT.
    n_runs = max(4, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")))
    # JIT warm-up passes run under the same barrier protocol but are NOT
    # scored: pass 1 measures a cold JVM on both levels and (as the ramp in
    # per_pass_efficiency shows) the two levels warm at different rates, so
    # including it makes the median depend on warm-up behavior instead of
    # steady state — a long-running executor never replays cold.
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    if scaling:
        try:
            r_lo, r_hi, ratios = _run_paired_passes(
                warmup + n_runs, min_passes=warmup + 1
            )
        except Exception as e:  # noqa: BLE001 — a bench must DEGRADE, not die
            # scaling unmeasurable this invocation (e.g. the VM collapsed
            # mid-pass): report the failure in-band; the JSON line and the
            # rest of the bench still land for the round record
            cdc["scaling_error"] = f"{type(e).__name__}: {e}"
            ratios = []
        if ratios:
            factor = SCALE_HI / SCALE_LO
            per_pass_eff = [round(r / factor, 3) for r in ratios]
            scored = ratios[warmup:] or ratios[-1:]
            cdc[f"local{SCALE_LO}"] = r_lo
            cdc[f"local{SCALE_HI}"] = r_hi
            cdc["per_pass_efficiency"] = per_pass_eff
            cdc["warmup_passes_unscored"] = warmup
            if len(scored) < n_runs:
                cdc["scaling_budget_degraded"] = (
                    f"machine too slow for {n_runs} scored passes within "
                    "SPARK_GRAFT_BENCH_SCALING_BUDGET; scored what completed"
                )
            # Steal-aware pass filter: this sandbox host's effective speed
            # swings by INTEGER factors mid-invocation (per-pass local8
            # replay has been observed at 30s and 179s in the same run).
            # A pass where either level ran far slower than its own best is
            # measuring the storm, not the engine — its ratio is noise in
            # whichever direction the storm happened to land. Score the
            # median over passes where BOTH levels were within CONTAM x
            # their per-level best; when fewer than 2 passes are clean,
            # fall back to the per-level-best capability estimate, capped
            # at 1.0 so a lucky/unlucky pairing can never read super-linear
            # (the r2 artifact), and say so.
            CONTAM = 1.35
            lo_runs = r_lo["runs"][warmup:]
            hi_runs = r_hi["runs"][warmup:]
            lo_best = min(r["replay_s"] for r in lo_runs)
            hi_best = min(r["replay_s"] for r in hi_runs)
            clean = [
                ra
                for ra, l, h in zip(scored, lo_runs, hi_runs)
                if l["replay_s"] <= CONTAM * lo_best
                and h["replay_s"] <= CONTAM * hi_best
            ]
            if len(clean) >= 2:
                eff = round(_median(clean) / factor, 3)
                cdc["scored_passes"] = len(clean)
                cdc["contaminated_passes_dropped"] = len(scored) - len(clean)
                cdc["speedup"] = round(_median(clean), 3)
            else:
                eff = round(min(1.0, lo_best / hi_best / factor), 3)
                cdc["scored_passes"] = 0
                cdc["speedup"] = round(lo_best / hi_best, 3)
                cdc["degraded_host"] = (
                    "no pass had both levels inside "
                    f"{CONTAM}x their per-level best; efficiency is the "
                    "per-level-best capability estimate capped at 1.0"
                )
            cdc["scaling_efficiency"] = eff
            if eff > 1.05:
                # unphysical — super-linear N->4N cannot be real on this box;
                # never let a noise artifact read as a valid scaling number
                cdc["scaling_efficiency_flag"] = (
                    "UNPHYSICAL (>1.05): residual noise overwhelmed the "
                    "paired-median protocol; treat as unmeasured, see per-pass"
                )
    else:
        r_hi = _finish_child(_spawn_child(SCALE_HI, n_runs, 0), SCALE_HI)
        cdc[f"local{SCALE_HI}"] = r_hi

    mor = None
    if os.environ.get("SPARK_GRAFT_BENCH_MOR", "1") != "0":
        mor = mor_demo()
        cdc["mor"] = mor

    total = round(time.monotonic() - t_total0, 3)
    result = {
        "metric": "cdc-replay-events-per-sec+query-suite-sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "cdc_replay": cdc,
    }
    # Full detail (per-run raw numbers) goes to a file; the stdout line must
    # stay SHORT — the round driver keeps only a bounded tail of stdout, and
    # round 1's line was truncated mid-JSON (BENCH_r01.json "parsed": null).
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    compact_cdc = {
        k: ({kk: vv for kk, vv in v.items() if kk != "runs"} if isinstance(v, dict) else v)
        for k, v in cdc.items()
    }
    if mor is not None:
        # keep the stdout line short: full MoR detail stays in the file
        compact_cdc["mor"] = {
            "table_rows": mor["table_rows"],
            "batch_events": mor["batch_events"],
            "write_ratio": mor["write_ratio"],
        }
    compact = dict(result, cdc_replay=compact_cdc)
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # the round driver keeps only a ~2000-char stdout tail; degrade
        # per-query precision before the line can be truncated mid-JSON
        # (round 1's was) — full 3-decimal detail stays in BENCH_DETAIL.json
        compact["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # still too long (query count keeps growing per round): drop the
        # per-query map entirely rather than risk a mid-JSON cut; the full
        # timings remain in BENCH_DETAIL.json
        compact["queries"] = {
            "suite_total_s": round(sum(timings.values()), 2),
            "n_queries": len(timings),
            # keep the hot spots visible even in the shortest form
            "slowest": {
                k: round(v, 2)
                for k, v in sorted(timings.items(), key=lambda kv: -kv[1])[:8]
            },
        }
        line = json.dumps(compact, separators=(",", ":"))
    print(line, flush=True)


if __name__ == "__main__":
    main()
