"""J4 — iterative hash-min connected components over the candidate-pair graph.

Label propagation with the min label, DataFrame-only:

  labels(id, label=id)
  repeat:
    nbr_min(id)   = min label over neighbors (edges made symmetric once)
    labels'       = min(own label, nbr_min)
    converged     when no label changed
  localCheckpoint() every iteration cuts the lineage (SURVEY.md §4.3);
  the convergence count is a cheap aggregate on the already-checkpointed frame.

Dup-cluster graphs built from star+chain edges have tiny diameters, so this
converges in a handful of rounds; `max_iter` is a hard stop with an explicit
`converged` flag in the result so callers can surface non-convergence instead
of silently truncating. Propagating min labels THROUGH neighbors each round
gives the classic O(diameter) bound; star edges from the pair-expansion stage
keep diameter ~= 2-4 even for huge clusters.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CCResult:
    labels: DataFrame      # (id, cluster_id)
    iterations: int
    converged: bool


def connected_components(edges: DataFrame, vertices: DataFrame | None = None,
                         max_iter: int = 20) -> CCResult:
    """edges: (a, b) long ids; vertices: optional (id) frame for isolated nodes.

    Returns every vertex with cluster_id = min id reachable from it.
    """
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("id")).dropDuplicates(["id"])
    if vertices is not None:
        nodes = vertices.select("id").union(nodes).dropDuplicates(["id"])
    labels = nodes.withColumn("label", F.col("id")).localCheckpoint(eager=True)

    iterations, converged = 0, False
    for iterations in range(1, max_iter + 1):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    return CCResult(
        labels=labels.withColumnRenamed("label", "cluster_id"),
        iterations=iterations,
        converged=converged,
    )
