"""Graph analytics over derived similarity graphs.

Green-field extension surface: the reference's product is pairwise
similarity (`/root/reference/main.go:89-184` — the k-NN answer); a
curation pipeline additionally needs *global* graph structure over those
similarities — which documents are central (hubs of near-duplicate /
semantic mass) and which are peripheral. Connected components already
lives in ``operators/dedup.py``; this module adds rank/centrality.

Determinism contract (the repo-wide oracle rule): all arithmetic is
integer — ranks are scaled BIGINTs, per-edge contributions use integer
floor division, and the damping factor is a ratio of integers — so a SQL
engine replays every iteration bit-for-bit and float summation order can
never flip a result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list, fixed-iteration
    form: every node starts at ``scale``; each round a node's new rank is

        base + (damping_num * Σ_{u→v} (r(u) DIV outdeg(u))) DIV damping_den

    with ``base = (scale * (damping_den - damping_num)) DIV damping_den``.
    All terms are BIGINT and the divisions are integer floor divisions, so
    the result is bit-identical in any engine — the fixed-point error this
    introduces (≤ outdeg ulps per node per round) is orders below anything
    that would reorder ranks, and in exchange the op is oracle-checkable.

    On a kNN graph this is the density/centrality curation signal: high
    rank = document sitting in a heavily-duplicated / semantically dense
    region (candidate for aggressive dedup or down-sampling), low rank =
    outlier (candidate for quality review).

    Scale shape: each iteration is one equi-join edges⋈ranks on the source
    id plus one sum-groupBy on the destination id — 8-byte key shuffles,
    partial aggregation map-side, no driver participation. Lineage grows
    linearly in ``iters``; each round is cached (fixed small ``iters`` —
    for long runs, checkpoint every few rounds instead). Dangling nodes
    (outdeg 0) simply leak their mass, the standard simplification; kNN
    graphs have none (every node emits k edges).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    base = scale * (damping_den - damping_num) // damping_den

    # cache the projected edge list: the caller may hand in an EXPENSIVE
    # derived graph (graph_pagerank_knn feeds the whole kNN-graph build),
    # and before r18 this function's plan evaluated it four times — twice
    # in the node-set union and twice under outdeg/ed. One cache + an
    # explode (not a self-union, which duplicates the subtree per branch)
    # evaluates it once.
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).cache()
    nodes = (
        e.select(F.explode(F.array("_s", "_d")).alias("node"))
        .distinct()
        .cache()
    )
    outdeg = e.groupBy(F.col("_s").alias("node")).agg(F.count("*").alias("outdeg"))
    # pre-join outdeg onto edges once: each iteration then touches one join
    ed = (
        e.join(outdeg, e["_s"] == outdeg["node"])
        .select("_s", "_d", "outdeg")
        .cache()
    )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        inc = (
            ed.join(ranks, ed["_s"] == ranks["node"])
            .select(F.col("_d").alias("node"), F.expr("r div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(inc, 0L)) div {damping_den}")
            ).cast("long").alias("r"),
        ).cache()
    return ranks.select(F.col("node"), F.col("r").alias("rank_scaled"))


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Global triangle count + edge/node tallies over an arbitrary
    directed edge list (treated as undirected, self-loops and duplicate
    edges collapsed) — the density/community signal next to PageRank in
    any graph-curation stack.

    Algorithm: canonicalize every edge to ``(lo, hi)`` with lo < hi, then
    count paths ``a<b<c`` with edges (a,b), (b,c) and close them against
    (a,c) — each triangle counted exactly once. Two equi-joins on vertex
    keys; at scale the classic refinement is degree-ordering the
    orientation so hub vertices don't fan out quadratically (the a<b<c id
    orientation here is the id-ordered special case; swap the comparator
    to (degree, id) for power-law graphs — same plan shape).
    """
    # cache the canonicalized edge set: it is referenced six times below
    # (three join legs, the node-set derivation, the edge tally) and each
    # reference re-ran the distinct's shuffle before r18
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .cache()
    )
    e1 = und.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = und.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = und.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(e3, ["a", "c"])
    n_nodes = und.select(
        F.explode(F.array("lo", "hi")).alias("v")
    ).distinct()
    return (
        tris.agg(F.count("*").cast("long").alias("n_triangles"))
        .crossJoin(und.agg(F.count("*").cast("long").alias("n_edges")))
        .crossJoin(n_nodes.agg(F.count("*").cast("long").alias("n_nodes")))
    )
