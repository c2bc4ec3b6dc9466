"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise near-dup detection (dedup.py) yields *edges*; corpus curation
needs *clusters* — if A~B and B~C, all three are one dup group even
when A~C misses the threshold. That closure is an iterative graph
computation Spark has no built-in operator for, so this module
implements min-label propagation as a driver-side loop of keyed
DataFrame joins:

    labels(node) ← min(labels(node), min over in-neighbors' labels)

repeated to fixpoint. Each iteration is one shuffle-keyed join + one
two-phase min-aggregate — fully distributed, nothing driver-side but
the (cheap, aggregated) convergence check. ``localCheckpoint`` after
every round truncates the lineage so the plan stays O(1) deep instead
of O(iterations).

Scale notes (100 TB): plain label propagation converges in O(graph
diameter) rounds; near-dup clusters are near-cliques (diameter ≤ ~3),
so the loop is 3-4 rounds in practice. For adversarial long-chain
graphs the same loop structure upgrades to large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which converges in O(log n) rounds; the hook is swapping the
one-hop propagation step, the surrounding fixpoint loop is unchanged.
The DuckDB oracle expresses the identical closure as a WITH RECURSIVE
reachability query — a differential check that the iterative plan
computes true transitive closure, not one-hop grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

MAX_ITERATIONS = 25


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Min-label connected components via iterative label propagation.

    ``nodes``: one column ``node``. ``edges``: columns ``src``/``dst``,
    treated as directed — pass both directions for an undirected graph.
    Returns (node, component) where component is the minimum node id
    reachable in the undirected closure.

    Eager: runs Spark jobs (one join + one aggregate per round, plus a
    count for the convergence test). Checkpoints each round.
    """
    edges = edges.localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint()
    for _ in range(MAX_ITERATIONS):
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "lbl")
        )
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("component"))


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM t a JOIN t b ON a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
    ),
    reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT e.dst AS node, r.lbl
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.lbl < e.dst
    )
    SELECT comp_id, count(*) AS n_docs FROM (
        SELECT node, min(lbl) AS comp_id FROM reach GROUP BY node
    ) GROUP BY comp_id HAVING count(*) >= 2
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster summary: connected components of the token-Jaccard
    ≥ 0.95 near-dup graph (same edge predicate as
    ``dedup_near_jaccard``), one row per multi-doc cluster with its
    size; component id = smallest doc_id in the cluster.

    Edges are O(n²) exact pairs here (oracle-scale tractable); at
    100 TB the edge stage swaps to ``dedup_minhash_lsh``'s band join
    while this closure stage is unchanged. The oracle's WITH RECURSIVE
    reachability propagates each label only while it is smaller than
    the receiving node (`r.lbl < e.dst`) — the component minimum is
    never blocked, so min(lbl) per node is exact and the recursion
    terminates (UNION-distinct over a finite label×node set).
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    a = t.select(F.col("doc_id").alias("src"), F.col("toks").alias("toks_a"))
    b = t.select(F.col("doc_id").alias("dst"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
    edges = (
        a.join(b, F.col("src") < F.col("dst"))
        .where(inter.cast("double") / union >= 0.95)
        .select("src", "dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = d.select(F.col("doc_id").alias("node"))
    return (
        connected_components(nodes, edges)
        .groupBy(F.col("component").alias("comp_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )


@query(
    "graph_cluster_keep_best",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM t a JOIN t b ON a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
    ),
    reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT e.dst AS node, r.lbl
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.lbl < e.dst
    ),
    comp AS (
        SELECT node AS doc_id, min(lbl) AS comp_id FROM reach GROUP BY node
    ),
    keep AS (
        SELECT comp_id,
               max_by(d.doc_id, d.n_chars * 1000000 - d.doc_id) AS kept_id
        FROM comp JOIN documents d ON comp.doc_id = d.doc_id
        GROUP BY comp_id
    )
    SELECT d.lang,
           count(*) AS n_survivors,
           sum(d.n_chars) AS total_chars
    FROM keep JOIN documents d ON d.doc_id = keep.kept_id
    GROUP BY d.lang
    """,
)
def graph_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production dedup composite: transitive dup CLUSTERS (connected
    components of the Jaccard ≥ 0.95 graph) reduced to one canonical
    representative each — the longest doc, ties to the smallest id
    (unique arithmetic score; max_by tie order is engine-specific) —
    then per-lang survivor stats.

    Pair-level keep-best (``dedup_keep_best``) under-dedups transitive
    chains (A~B, B~C, A≁C keeps two of the three); component-level
    selection is what production corpus dedup does (one survivor per
    cluster). Stages: the CC fixpoint loop (each round distributed,
    see :func:`connected_components`), a ``max_by`` per component, a
    keyed join back, one aggregate — every stage shuffle-keyed, no
    driver-side data.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    a = t.select(F.col("doc_id").alias("src"), F.col("toks").alias("toks_a"))
    b = t.select(F.col("doc_id").alias("dst"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
    edges = (
        a.join(b, F.col("src") < F.col("dst"))
        .where(inter.cast("double") / union >= 0.95)
        .select("src", "dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = connected_components(
        d.select(F.col("doc_id").alias("node")), edges
    ).withColumnRenamed("node", "doc_id")
    score = F.col("n_chars") * 1000000 - F.col("doc_id")
    keep = (
        comp.join(d.select("doc_id", "n_chars"), "doc_id")
        .groupBy("component")
        .agg(F.max_by("doc_id", score).alias("kept_id"))
    )
    return (
        keep.join(d, keep.kept_id == d.doc_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
