"""Connected components over a near-duplicate pair graph.

Production dedup needs one canonical keeper per GROUP of near-duplicates,
not just verified pairs: the pair graph (e.g. from
``fuzzy_dedup.ngram_jaccard_pairs``) is closed into components and every
document labeled with its component id = the minimum doc id reachable from
it. No reference analog (rosecape/airbyte has no fuzzy dedup at all); the
algorithm is standard hash-min label propagation (the dataflow form of
connected components, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014).

Scale design (100 TB):
- per round: one join of labels against the (small, already-verified) edge
  set + one min aggregate — both hash-partition on id, partial-aggregated
  map-side; no windows, no driver-side graph.
- rounds needed = O(diameter) of the pair graph; near-dup graphs are
  overwhelmingly tiny cliques/chains, so convergence is 2-3 rounds. A
  bounded ``max_rounds`` plus a single-count convergence check per round
  keeps the driver loop honest (one action per round, nothing collected
  but a count).
- label state is checkpointed via localCheckpoint every few rounds so the
  lineage (and its re-execution cost on task retry) cannot grow unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component id
    (= min node id in the component). Returns (doc_id, component_id) for
    every node that appears in ``pairs``; isolated documents are simply
    absent (their component is themselves).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # initial label: the smallest neighbor (including self)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.min("src")).alias("label"))
        .persist()
    )

    for rnd in range(max_rounds):
        # propagate: candidate label of a node = min over (own label,
        # neighbors' labels); both legs partial-aggregate map-side
        via_edges = (
            edges.join(labels.withColumnRenamed("src", "dst"), "dst")
            .select(F.col("src"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(via_edges)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
        )
        if (rnd + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "src")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausted max_rounds with labels still moving: the graph's
        # diameter exceeds the round budget and the labeling is SPLIT —
        # downstream keep/drop lists would be wrong. Never return silently.
        edges.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds — rounds "
            "needed is O(graph diameter)"
        )

    edges.unpersist()
    return labels.select(
        F.col("src").alias("doc_id"), F.col("label").alias("component_id")
    )


def dedup_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Canonical-keeper view of the component labeling:
    (component_id, group_size, keep_doc_id) per near-dup group — keep the
    minimum id, drop the rest (group_size - 1 removals per group)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.groupBy("component_id").agg(
        F.count("*").alias("group_size"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def dedup_components_by_priority(
    pairs: DataFrame,
    priorities: DataFrame,
    priority_col: str = "priority",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Keeper selection by QUALITY, not by id: production pipelines keep the
    best copy of a near-dup group (highest quality score / longest /
    freshest), dropping the rest. ``priorities`` is (doc_id, priority);
    keeper = (priority DESC, doc_id ASC) — a total order, so the result is
    partitioning-independent; docs missing a priority lose to any scored
    doc. Returns (component_id, group_size, keep_doc_id, keep_priority).

    Plan shape: components labeling + ONE equi-join against the priority
    table + ONE partial-combined min_by aggregate — no windows, no
    per-group sorts; the ordering rides a struct key (negated priority,
    doc_id) inside the aggregate."""
    cc = connected_components(pairs, a_col, b_col)
    j = cc.join(
        priorities.select("doc_id", F.col(priority_col).alias("_pri")),
        "doc_id",
        "left",
    )
    key = F.struct(
        (-F.coalesce(F.col("_pri").cast("double"), F.lit(float("-inf")))).alias("_np"),
        F.col("doc_id").alias("_tie"),
    )
    return j.groupBy("component_id").agg(
        F.count("*").alias("group_size"),
        F.min_by("doc_id", key).alias("keep_doc_id"),
        F.min_by("_pri", key).alias("keep_priority"),
    )
