"""Generator determinism + knob behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.changelog import ChangelogConfig, changelog_df, seed_df


def test_deterministic_across_parallelism(spark):
    cfg = ChangelogConfig(n_events=1000, n_seed_docs=100)
    a = changelog_df(spark, cfg).orderBy("lsn", "doc_id").collect()
    b = (
        changelog_df(spark, cfg)
        .repartition(13)
        .orderBy("lsn", "doc_id")
        .collect()
    )
    assert a == b


def test_op_mix_and_monotone_lsn(spark):
    cfg = ChangelogConfig(n_events=5000, n_seed_docs=500, dup_pct=0.0)
    df = changelog_df(spark, cfg)
    mix = {r.op: r.n for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()}
    total = sum(mix.values())
    assert total == 5000
    assert abs(mix["I"] / total - 0.60) < 0.05
    assert abs(mix["U"] / total - 0.30) < 0.05
    # no dups -> lsn strictly unique, dense in [1, n]
    assert df.select("lsn").distinct().count() == 5000
    lo, hi = df.agg(F.min("lsn"), F.max("lsn")).first()
    assert (lo, hi) == (1, 5000)


def test_duplicates_reemit_verbatim(spark):
    cfg = ChangelogConfig(n_events=3000, n_seed_docs=100, dup_pct=10.0)
    df = changelog_df(spark, cfg)
    assert df.count() == 3000
    n_distinct = df.distinct().count()
    assert n_distinct < 3000  # duplicates are full-row duplicates
    per_lsn = df.groupBy("lsn", "doc_id", "op").count()
    assert per_lsn.filter("count > 2").count() >= 0  # no partial dup rows
    # every duplicated lsn has exactly one distinct row image
    images = df.groupBy("lsn").agg(F.countDistinct(F.struct(*df.columns)).alias("k"))
    assert images.filter("k > 1").count() == 0


def test_deletes_carry_only_pk(spark):
    cfg = ChangelogConfig(n_events=2000, n_seed_docs=100)
    df = changelog_df(spark, cfg)
    bad = df.filter(
        (F.col("op") == "D")
        & (F.col("tokens").isNotNull() | F.col("n_tok").isNotNull() | F.col("source").isNotNull())
    )
    assert bad.count() == 0


def test_hot_key_skew(spark):
    cfg = ChangelogConfig(
        n_events=5000, n_seed_docs=1000, insert_pct=10, update_pct=80,
        hot_keys=4, hot_pct=80, dup_pct=0.0,
    )
    df = changelog_df(spark, cfg).filter(F.col("op") != "I")
    top = (
        df.groupBy("doc_id").count().orderBy(F.desc("count")).limit(4)
        .agg(F.sum("count")).first()[0]
    )
    assert top / df.count() > 0.6  # 4 docs absorb most non-insert traffic


def test_seed_invariants(spark):
    cfg = ChangelogConfig(n_seed_docs=200)
    seed = seed_df(spark, cfg)
    assert seed.count() == 200
    assert seed.filter(F.size("tokens") != F.col("n_tok")).count() == 0
    assert seed.select("doc_id").distinct().count() == 200
