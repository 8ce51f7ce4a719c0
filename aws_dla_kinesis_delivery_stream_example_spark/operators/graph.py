"""Graph operators over document-similarity edge lists.

Companion to dedup.duplicate_clusters (connected components): where
components answer "which docs are the same", centrality answers
"which copy is canonical" — the ranking signal behind keep-the-origin
dedup policies and crawl prioritization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staging import stage

# Fixed-point rank lattice: micro-unit BIGINT mass, damping 0.85 as
# exact integer ops. Float PageRank sums contributions in engine- and
# partitioning-specific order and is off-grid within one iteration;
# the integer lattice is order-independent, so the result is invariant
# under AQE re-planning, partition count, and engine.
PR_INIT = 1_000_000
PR_TELEPORT = 150_000


def pagerank_fixed_point(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = 3,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank on an UNDIRECTED pair list (each pair becomes two
    directed edges), in fixed-point micro-unit integer arithmetic:

        r'(v) = PR_TELEPORT + (85 * sum_{u->v} (r(u) // deg(u))) // 100

    Returns (doc, degree, rank_u). Nodes are pair members only; the
    symmetric graph has in-degree == out-degree >= 1, so there are no
    dangling nodes by construction.

    Scale shape: the symmetric edge list is staged as a NARROW
    (src, dst) frame and per-source degree lives on the NODE-sized
    rank frame, never on the edges — attaching dg to edges costs an
    extra edge-sized join pass before the loop (and doubles what the
    staging job must execute: the edges⋈deg probe re-derives the
    union's two pair branches on top of deg's own two), measured
    9.4 s -> 6.4 s at sf0.1 by carrying dg through the ranks instead.
    Each iteration is one shuffle join (edges x ranks on src, dg and r
    ride along) + one hash agg (contributions by dst) + one node-sized
    join — linear in edges. The per-iteration rank frame is staged:
    each iteration consumes the previous ranks TWICE (contribution
    join + rank rebuild), so an unstaged loop re-derives the previous
    iteration's lineage down both branches — measured 31 exchanges at
    3 iterations (~2x per round) vs a flat 5 staged. The input pair
    list is NOT staged: its own expensive prefix (the shingle join) is
    already staged inside the pair operator, and a second cache layer
    only adds a materialization barrier (measured slower).

    Lineage at iters >> 3: persisting per-iteration keeps the WORK
    linear but the logical plan tree still nests one level per
    iteration (an unbounded driver-side analysis/optimization cost and
    eventual StackOverflow at tens of iterations) — so every
    ``checkpoint_every`` iterations the rank frame is
    ``localCheckpoint``-ed, truncating lineage to the node-sized
    checkpoint (the q49 duplicate_clusters discipline; superseded
    checkpoints are freed by the ContextCleaner). Asserted by a
    plan-size test at iters=6 in tests/test_round9_ops.py.
    """
    sym = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionAll(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    edges = stage(sym)
    ranks = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("dg"))
        .select(F.col("src").alias("doc"), "dg")
        .withColumn("r", F.lit(PR_INIT).cast("long"))
    )
    for it in range(iters):
        if it and it % checkpoint_every == 0:
            # truncate lineage: the checkpoint replaces the nested
            # join/agg tree with a leaf scan of the materialized ranks
            ranks = ranks.localCheckpoint()
        ranks = stage(ranks)
        contrib = (
            edges.join(
                ranks.select(F.col("doc").alias("src"), "dg", "r"), "src"
            )
            .select("dst", F.expr("r div dg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = ranks.join(contrib, ranks["doc"] == contrib["dst"]).select(
            "doc",
            "dg",
            (F.lit(PR_TELEPORT) + F.expr("85 * contrib div 100"))
            .cast("long")
            .alias("r"),
        )
    return ranks.select(
        "doc", F.col("dg").cast("long").alias("degree"), F.col("r").alias("rank_u")
    )
