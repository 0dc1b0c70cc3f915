"""Distributed connected components — duplicate-cluster consolidation.

At 100 TB the step after candidate-pair generation (MinHash bands,
SimHash bands, URL aliasing) is collapsing pairs into clusters:
connected components over the pair graph, each node labeled with the
minimum reachable id so every cluster elects one canonical keeper.
``operators/neardup.py`` ships a bounded one-hop-per-round variant
tuned for SimHash's shallow clusters; this module is the general
operator for graphs whose diameter is NOT known small.

Algorithm: min-label propagation with POINTER DOUBLING (the public
"hash-to-min" family, Rastogi et al. / Kiveris et al.'s two-phase
star contractions are the same idea). Each round runs

1. neighbor-min: ``L(v) <- min(L(v), min_{u~v} L(u))`` — one keyed
   shuffle over the (symmetrized) edge list, and
2. pointer jump: ``L(v) <- L(L(v))`` — one self-join on the label
   forest, which halves the depth of every label chain.

Together a round better-than-halves the un-converged depth, so a
diameter-``d`` component converges in ``O(log d)`` rounds instead of
the ``d`` rounds plain propagation needs — the difference between 40
and 1M-node chains at crawl scale. Each round ends with a
``localCheckpoint`` (lineage otherwise doubles per round and the plan
itself becomes the bottleneck) and an ``isEmpty`` convergence probe —
one cheap job per round, the standard price of iterative algorithms on
Spark; the loop exits at fixpoint, ``max_rounds`` only caps the
pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Label every node in the undirected graph ``edges`` with the
    minimum node id reachable from it.

    ``edges`` carries one row per (possibly directed, possibly
    duplicated) pair; it is symmetrized and deduplicated here. The node
    set is the edge endpoints, optionally unioned with ``nodes`` (one
    ``node`` column) so isolated nodes — docs with no duplicate pair,
    the overwhelming majority of a crawl — appear in the output as
    their own component. Returns ``(node, component)``, bigint keys.
    """
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    adj = fwd.union(rev).filter(F.col("node") != F.col("nbr")).distinct()
    # Edge list is re-consumed every round — cut its lineage once.
    adj = adj.localCheckpoint(eager=False)

    seed = adj.select("node")
    if nodes is not None:
        seed = seed.union(nodes.select("node"))
    labels = seed.distinct().select("node", F.col("node").alias("component"))
    for _ in range(max_rounds):
        # 1. neighbor-min over the edge list
        nbr_min = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("component").alias("_nc")
                ),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("_nc").alias("_nbr_min"))
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("_nbr_min"), F.col("component")),
            ).alias("component"),
        )
        # 2. pointer jump: follow my label's label
        jumped = stepped.alias("a").join(
            stepped.select(
                F.col("node").alias("component"), F.col("component").alias("_pj")
            ).alias("b"),
            "component",
            "left",
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("_pj"), F.col("component"))
            ).alias("component"),
        )
        jumped = jumped.localCheckpoint(eager=False)
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        converged = changed.isEmpty()
        labels = jumped
        if converged:
            break
    return labels
