"""Graph centrality over entity graphs (SURVEY.md §2.11 extension).

PageRank is the corpus-curation centrality signal: web-scale pretraining
pipelines rank hosts/pages by link centrality to drive crawl frontiers
and quality priors (the classic web-graph quality prior). The operator
here is a pure INTEGER fixed-point PageRank — every iteration is
integer arithmetic only, so the result is a pure function of the edge
set and the whole iterative computation replays bit-exactly in a SQL
oracle (same family of tricks as the fixed-point Lloyd trainer in
extensions/similarity.py and the connected-components oracle).

Reference parity: no native analogue — corpus-hygiene extension beyond
the reference's per-table pipeline (fetch_and_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions.dedup import _spread


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 6,
) -> DataFrame:
    """Fixed-iteration integer PageRank over directed (src, dst) long
    edges. Returns (node, rank_scaled, pagerank) where rank_scaled is
    the exact integer state (rank ≈ rank_scaled / scale).

    The update is the textbook r' = (1-d)/N + d·Σ r(u)/outdeg(u), but
    every division is integer floor division and the damping factor is
    a percentage — ``r' = teleport + (damping_pct · Σ (r(u) div
    deg(u))) div 100`` with ``teleport = ((100-damping_pct)·scale div
    100) div N`` — so partial-aggregation order cannot perturb a single
    bit (long addition is associative; a float formulation differs
    between engines in last-ulp bits that compound across iterations).
    Dangling mass is dropped (nodes without out-edges redistribute
    nothing — the standard simplification; with symmetrized edges every
    node has outdeg ≥ 1 and no mass is lost).

    Scale shape per iteration: one join of the edge list against the
    N-row rank vector (shuffle on src), one map-side-combined sum into
    dst, one left join back onto nodes. Rounds CHAIN LAZILY — each
    round references the previous rank vector exactly once, so the
    plan grows linearly, and running all rounds as ONE job lets the
    scheduler pipeline stages instead of paying a blocking
    materialization barrier per round (guide §2.4/§1.2 — the former
    per-round localCheckpoint cost one eager job each: measured 5.6 s
    → 3.1 s for the 5-round bench query). ``checkpoint_every`` cuts
    lineage with localCheckpoint every that-many rounds so iters ≫ 5
    still cannot stack deep plans (connected_components' discipline;
    the default re-checkpoints only past round 6). The only
    driver-side values are N (one count) and the constant teleport —
    no rank data ever collects.

    Overflow headroom: Σ contribs ≤ N·scale and the damping multiply
    stays < 2^63 while N·scale·damping_pct < 9.2e18 — at scale=1e9
    that is ~10⁸ nodes; shrink ``scale`` for larger graphs.
    """
    # The edge list is materialized ONCE up front (guide §1.2 — don't
    # compute things twice): nd and ed_deg are both eager
    # localCheckpoints, and without this seam each re-derived the whole
    # upstream edge pipeline (for the supplier↔customer graph that is
    # the lineitem⋈orders distinct join) in its own job. Edges are two
    # longs per row — materializing them is the same safe trade the
    # ed_deg checkpoint below already makes.
    ed = _spread(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint()
    # Fused node-set + out-degree pass (guide §2.4): each edge emits
    # its endpoints row-locally (src tagged 1, dst tagged 0) and ONE
    # map-side-combined groupBy yields both the distinct node set and
    # every node's out-degree — the former shape paid two full passes
    # over the edge stream (a union+distinct for nodes, a separate
    # groupBy for deg) plus a third in the ed⋈deg join's deg side.
    # sum(tag) = count of src occurrences = the old count(*) per src.
    nd = (
        ed.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("node"), F.lit(1).alias("_o")),
                    F.struct(F.col("dst").alias("node"), F.lit(0).alias("_o")),
                )
            ).alias("_n")
        )
        .select("_n.node", "_n._o")
        .groupBy("node")
        .agg(F.sum("_o").cast("long").alias("deg"))
        .localCheckpoint()
    )
    n_nodes = nd.count()
    nodes = nd.select("node")
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("pagerank"),
        )
    deg = nd.filter(F.col("deg") > 0).select(F.col("node").alias("src"), "deg")
    ed_deg = ed.join(deg, "src").localCheckpoint()
    teleport = ((100 - damping_pct) * scale // 100) // n_nodes

    ranks = nodes.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("r")
    )
    for i in range(iters):
        contrib = ed_deg.join(ranks, ed_deg["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), F.expr("r div deg").alias("c")
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100"
                )
            ).cast("long").alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(scale))).alias("pagerank"),
    )


def triangles(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Per-node triangle counts over an undirected pair graph — the
    triadic-closure diagnostic (cliquish clusters vs chained ones) for
    the near-dup graph, and the standard distributed triangle-count
    shape for any entity graph.

    Classic degree-orientation optimization (node-iterator++): each
    undirected edge is directed from the lower (degree, id) endpoint
    to the higher, so every triangle {x,y,z} taken in orientation
    order has edges x→y, x→z, y→z and is found EXACTLY once by the
    wedge join (x→y)⋈(x→z) matched against the oriented edge y→z.
    Out-degrees under this orientation are O(√m) on arbitrary graphs,
    so the wedge stream is bounded by Σ outdeg² ≤ m^1.5 — the reason
    this formulation scales where the naive 3-way edge join does not.

    Returns (node, n_triangles) for nodes in at least one triangle.

    Materialization seams: the deduped pair set and the oriented edge
    frame are localCheckpoint()ed — ``und`` is consumed twice (both
    directions of ``sym``) and ``e`` three times (both wedge sides plus
    the closing join), and without the seams Catalyst re-derives the
    ENTIRE upstream pipeline (e.g. the MinHash/LSH near-dup cascade)
    once per reference: the static plan for dup_triangles was 265
    shuffles before, ~10 after. The edge list of a similarity graph is
    orders of magnitude smaller than the corpus it came from, so
    materializing it is the same safe trade pagerank() above and the
    fixed-point Lloyd trainer make.
    """
    und = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).distinct().localCheckpoint()
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    # orient by (degree, id): u→v iff (d_u, u) < (d_v, v)
    e = (
        sym.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
        )
        .filter(
            (F.col("d") < F.col("dv"))
            | ((F.col("d") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "d", "dv")
        .localCheckpoint()
    )
    e1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    e2 = e.select(F.col("u").alias("x"), F.col("v").alias("z"), F.col("dv").alias("dz"))
    wedges = (
        e1.join(e2, "x")
        .filter(
            (F.col("dy") < F.col("dz"))
            | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
        )
        .select("x", "y", "z")
    )
    tri = wedges.join(
        e.select(F.col("u").alias("y"), F.col("v").alias("z")), ["y", "z"]
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_node


def kcore(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 4,
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Bounded k-core peel over an undirected pair graph: ``rounds``
    iterations of "drop every node with degree < k, and every edge
    touching a dropped node". Returns (node, core_degree) for
    survivors — on the near-dup graph this separates dense duplicate
    cores (template farms, mirror sets: every member similar to many
    others) from incidental chains that triadic closure alone
    over-merges.

    A FIXED round count instead of a convergence test keeps the
    operator a pure function of the edge set, so the whole peel
    replays exactly in a SQL oracle (the same determinism contract as
    pagerank's fixed iterations and the Lloyd trainer); peeling
    removes at least one node per non-converged round inside any
    finite component, and the semantics tests assert the default has
    converged on the test graphs. Per-round localCheckpoint truncates
    lineage — degrees and the edge filter are re-aggregated from the
    materialized edge list (tiny next to the corpus), never re-derived
    through the upstream pipeline (the dup_triangles lesson).
    """
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .distinct()
        .localCheckpoint()
    )
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    for _ in range(rounds):
        keep = (
            edges.groupBy("u")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("u")
        )
        edges = (
            edges.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .localCheckpoint()
        )
    return edges.groupBy("u").agg(
        F.count("*").cast("long").alias("core_degree")
    ).select(F.col("u").alias("node"), "core_degree")


def label_propagation(
    pairs: DataFrame,
    rounds: int = 3,
    a: str = "id_a",
    b: str = "id_b",
    checkpoint_every: int = 6,
) -> DataFrame:
    """Synchronous frequency label propagation over an undirected pair
    graph — community detection that, unlike connected components
    (dedup.connected_components: min-label flood = one community per
    component), splits a component along its dense regions: each node
    repeatedly adopts the label held by the MOST of its neighbors. On
    the near-dup graph this separates two template farms that a single
    bridge pair glues into one connected component — the distinction a
    curation pipeline needs before per-cluster representative picking.

    Determinism contract (the registry parity rules): synchronous
    updates from labels(t) only, a FIXED round count, and ties broken
    by the smallest label — the labeling is a pure function of the
    edge set, so the whole computation replays round-for-round in a
    SQL oracle (fixed-iteration family: pagerank, kcore, Lloyd). The
    node's own label is not in the vote (pure neighbor majority);
    every node in a pair graph has degree ≥ 1, so the argmax is
    always defined.

    Scale shape per round: one shuffle join of the edge list against
    the N-row label vector (keyed on the neighbor endpoint), one
    map-side-combined (node, label) count, and one per-node window
    whose partition size is bounded by the node's degree — never by
    graph size. The symmetrized edge list is localCheckpoint()ed once
    up front so `rounds` iterations re-read a materialized frame
    instead of re-deriving the upstream near-dup cascade per round
    (the dup_triangles lesson). Rounds CHAIN LAZILY — each round
    references the previous label vector exactly once, so the former
    per-round eager localCheckpoint (one blocking job per round) is
    pure overhead (pagerank's r9 lesson, guide §2.4/§1.2);
    ``checkpoint_every`` bounds lineage for rounds ≫ the default.

    Returns (node, community) for every node in the pair graph.
    """
    # Row-local symmetrization (explode) — one pass over the upstream
    # pair pipeline instead of two union branches.
    sym = _spread(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a).alias("u"), F.col(b).alias("v")),
                    F.struct(F.col(b).alias("u"), F.col(a).alias("v")),
                )
            ).alias("_e")
        ).select("_e.u", "_e.v")
    ).localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint()
    )
    for i in range(rounds):
        votes = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "lbl")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (i + 1) < rounds:
            labels = labels.localCheckpoint()
    return labels.select("node", F.col("lbl").alias("community"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 6,
) -> DataFrame:
    """Personalized PageRank (the topic-sensitive variant, Haveliwala
    2002): teleport mass returns ONLY to the seed set, so ranks measure
    proximity to the seeds rather than global centrality — the
    "more like these" expansion primitive (seed domains → related
    domains; seed customers → similar customers). Same integer
    fixed-point discipline as pagerank(): every division is integer
    floor division, so the whole iteration replays bit-exactly in an
    unrolled SQL oracle.

    ``seeds`` is a one-column (node) frame; it is intersected with the
    graph's node set, counted once on the driver (a bounded count, like
    pagerank's N), and broadcast into the per-round teleport term.
    Initial rank: scale // n_seeds on seeds, 0 elsewhere — total mass
    conserved up to floor rounding exactly as the oracle computes it.

    Scale shape per round: identical to pagerank() — one edge⋈rank
    shuffle, one map-side-combined sum, one left join onto nodes, with
    rounds chaining lazily into one job and ``checkpoint_every``
    truncating lineage past round 6 (see pagerank's docstring for the
    measured per-round-barrier cost this removes).
    """
    # Edge list materialized once — see pagerank() above (nd, seed_nodes
    # and ed_deg all sit downstream of it).
    ed = _spread(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint()
    # Fused node-set + out-degree pass — see pagerank() above.
    nd = (
        ed.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("node"), F.lit(1).alias("_o")),
                    F.struct(F.col("dst").alias("node"), F.lit(0).alias("_o")),
                )
            ).alias("_n")
        )
        .select("_n.node", "_n._o")
        .groupBy("node")
        .agg(F.sum("_o").cast("long").alias("deg"))
        .localCheckpoint()
    )
    nodes = nd.select("node")
    seed_nodes = (
        nodes.join(seeds.select(F.col(seeds.columns[0]).alias("node")), "node")
        .select("node")
        .localCheckpoint()
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("pagerank"),
        )
    deg = nd.filter(F.col("deg") > 0).select(F.col("node").alias("src"), "deg")
    ed_deg = ed.join(deg, "src").localCheckpoint()
    teleport = ((100 - damping_pct) * scale // 100) // n_seeds

    flagged = nodes.join(
        seed_nodes.withColumn("_is_seed", F.lit(True)), "node", "left"
    ).select("node", F.coalesce("_is_seed", F.lit(False)).alias("_is_seed"))
    flagged = flagged.localCheckpoint()
    ranks = flagged.select(
        "node",
        F.when(F.col("_is_seed"), F.lit(scale // n_seeds))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for i in range(iters):
        contrib = ed_deg.join(ranks, ed_deg["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), F.expr("r div deg").alias("c")
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = flagged.join(sums, "node", "left").select(
            "node",
            (
                F.when(F.col("_is_seed"), F.lit(teleport)).otherwise(F.lit(0))
                + F.expr(
                    f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100"
                )
            )
            .cast("long")
            .alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(scale))).alias("pagerank"),
    )
