"""Graph analytics over DataFrame edge lists (SURVEY.md §2 —
round-5 addition): PageRank power iteration as the join-aggregate
shape GraphFrames' aggregateMessages lowers to.

Dataflow per iteration (the plan you'd want on a billion-edge graph):

    edges ⋈ pr (shuffle on the edge key)
          ⋈ broadcast outdeg
      → groupBy(dst) sum            (partial agg combines map-side)
      → left join back to the node set (isolated in-degree keeps
        teleport mass)

N (node count) rides a broadcast 1-row cross join — never a collect.
Fixed unrolled iterations keep everything one declarative plan; for
convergence-driven runs pass ``checkpoint_every`` so lineage is cut
with localCheckpoint the same way the CC loop in canon.py does.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: shared with the contract oracle (kg/contract.py interpolates these
#: same constants into its DuckDB SQL — one copy, nothing to drift)
DAMP = 0.85
TELEPORT = 0.15


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 3,
             checkpoint_every: int = 0) -> DataFrame:
    """``iters`` PageRank power iterations over ``edges`` (columns
    src, dst; every node listed in ``nodes.node`` — nodes without
    out-edges receive teleport mass only, their own mass is NOT
    redistributed, i.e. the simplified no-dangling-redistribution
    variant; feed a symmetrized edge list to avoid dangling mass
    loss). Returns (node, pr) unrounded."""
    ncnt = nodes.select(F.count("*").alias("n"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    pr = (nodes.crossJoin(F.broadcast(ncnt))
          .select("node", (F.lit(1.0) / F.col("n")).alias("pr")))
    for i in range(iters):
        contrib = (edges.join(pr, edges.src == pr.node)
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("pr") / F.col("outdeg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (nodes.join(summed, "node", "left")
              .crossJoin(F.broadcast(ncnt))
              .select("node",
                      (F.lit(TELEPORT) / F.col("n")
                       + DAMP * F.coalesce(F.col("s"), F.lit(0.0)))
                      .alias("pr")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and i + 1 < iters:
            pr = pr.localCheckpoint(eager=True)
    return pr
