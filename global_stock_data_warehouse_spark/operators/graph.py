"""Iterative graph operators: connected components for dedup clustering.

Pairwise near-dup detection (dedup.py) yields EDGES; a training-data
pipeline needs GROUPS — "these 5 docs are all the same article, keep one".
That grouping is connected components over the similarity graph.

Implemented as distributed min-label propagation: each node's component
label is the smallest node id it can reach; per round every node takes the
min of its own and its neighbors' labels. Rounds = graph diameter, and
near-dup clusters are dense little cliques (diameter 1-3), so convergence
is a handful of rounds even at corpus scale. Each round is one
shuffle-join + one grouped min — all DataFrame ops; ``localCheckpoint``
truncates the plan lineage every round so the job graph stays flat
(an un-checkpointed loop doubles the plan each round and the 10th
iteration recompiles a 1000-node tree).

This is the standard "hash-to-min" scheme; for graphs with huge-diameter
paths (not similarity graphs) you'd switch to large-star/small-star
(Kiveris et al., 2014) — same building blocks, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node_id, component) where component = min node id in the component.

    Isolated nodes don't appear (no edges -> their component is
    themselves; union them in at the call site if needed).
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.s == labels.id)
            .select(F.col("d").alias("id"), F.col("comp"))
        )
        new_labels = (
            labels.select("id", "comp")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        # converged when no label decreased this round; one count action
        # per round on an already-checkpointed frame
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") < F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> one row per duplicate GROUP: the kept (min) doc
    id, group size, and the sorted member list. The canonical last step of
    a corpus dedup pipeline: everything not in ``members`` minus ``keep_id``
    survives."""
    cc = connected_components(pairs, id_a, id_b)
    return (
        cc.groupBy("comp")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.sort_array(F.collect_list("id")).alias("members"),
        )
        .select("keep_id", "group_size", "members")
    )
