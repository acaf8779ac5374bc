"""Connected components — the cluster-formation step of near-dedup.

Pairwise similarity (q26/q28/q38) only yields EDGES; to actually drop
duplicates a pipeline needs components ("this group of documents is one
cluster; keep the canonical member"). This module implements min-label
propagation over the undirected pair graph:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint — each vertex ends with the smallest vertex id in
its component, a deterministic canonical representative.

Scale notes:
- Each iteration is one join (labels ⋈ edges) + one groupBy-min — both
  hash-partitioned on vertex id, partial-aggregated map-side. The edge
  set never grows (unlike closure-based formulations).
- Iteration count = component DIAMETER, and near-dup clusters are
  short-diameter by construction (dup groups, not long chains), so the
  loop converges in a handful of rounds; ``max_iter`` bounds
  pathological chains. The large-star/small-star algorithm (Kiveris et
  al., "Connected Components in MapReduce and Beyond") halves diameters
  per round and is the drop-in refinement if a corpus ever shows long
  chains.
- Labels are ``localCheckpoint``ed EVERY round. This is not optional
  hygiene: the labels plan references its predecessor three times
  (messages, union, convergence join), so the un-truncated logical
  plan grows ~3^i and Catalyst ANALYSIS — pure driver-side work —
  dominates by round 3 (measured 83 s/round at sf0.1 with truncation
  every 5 rounds; ~0.3 s/round truncating eagerly). Checkpointed
  state is bounded: one (id, label) row per vertex.
- Convergence is detected via a count of changed labels — one cheap
  job per iteration over (id, label) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every vertex of the undirected edge set;
    ``cluster_id`` is the minimum vertex id in the component."""
    sym = (
        edges.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbor messages: each edge forwards the source's current
        # label to the destination; min with own label per vertex
        msgs = sym.join(
            labels.withColumnRenamed("id", "a"), "a"
        ).select(F.col("b").alias("id"), "label")
        # eager localCheckpoint: materializes AND truncates lineage to a
        # LogicalRDD, keeping every round's analysis cost constant
        new_labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))
