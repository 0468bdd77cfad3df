"""Connected components over a pair graph — dedup cluster resolution.

The near-dup ladder (operators/dedup.py) emits PAIRS: (a_id, b_id) edges
from LSH buckets, simhash bands, or an embedding threshold join.  A
training-data pipeline must turn those pairs into CLUSTERS and elect one
canonical document per cluster (the reference's analog is upsert-by-id
overwrite, TencentVDB.py:70 — last write wins; at corpus scale the
election must be explicit and deterministic).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), the standard
shuffle-based CC that converges in O(log^2 n) rounds regardless of
component diameter — a plain min-label propagation needs O(diameter)
rounds, which is unbounded on chain-shaped dup graphs (page A ~ B ~ C
~ ... from incremental crawls).

Spark mapping: each round is a partial-aggregable per-node MIN (one
shuffle, map-side combined — skew-safe at the hub node the algorithm
itself creates) plus one co-partitioned equi-join to emit the star
edges — no UDFs, no arrays (the r10 rewrite; the previous
collect_set-based round held the hub's whole neighborhood in one
aggregation buffer and measured 167 s/round on a converged 180k-node
star).  `localCheckpoint` truncates the iterative lineage so
the plan does not grow O(rounds) deep; convergence is detected by a
cheap order-insensitive edge fingerprint (count + sum of xxhash64),
one lightweight action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round.

    large-star: with m = min(N(u) + {u}) per node u of the symmetrized
    edge list, emit (v, m) for every neighbor v > u.
    small-star: with m over edges directed large->small, emit (v, m)
    for every neighbor v (all <= u) plus (u, m), dropping self-loops.

    Physical shape (r10 rewrite): per-node minima via `F.min` — a
    PARTIAL-AGGREGABLE scalar, so the hub node the algorithm itself
    creates (every edge of a converged component points at the
    component min) is map-side combined into one partial per input
    partition — then one co-partitioned equi-join back on u to emit the
    star edges.  The previous form built each node's full neighbor
    array (`collect_set` + array filter + explode); on a converged
    180k-node star the hub's single 180k-element aggregation buffer
    took 167 s PER ROUND (measured r10, SCALE.md round-10 instrumentation;
    fixpoint walls in CC_MODE_r10.json) versus ~3.5 s for the min+join
    form — the array was quadratic bookkeeping
    for a value (the min) and an emission (the group's rows) that
    Catalyst computes directly.  Both forms emit identical edge SETS;
    duplicate rows the array-dedup used to absorb are absorbed by the
    small-star distinct below, exactly as before."""
    if large:
        sym = edges.select("u", "v").unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    else:
        sym = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
    gmin = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    if large:
        out = (
            sym.where(F.col("v") > F.col("u"))
            .join(gmin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
    else:
        out = (
            sym.join(gmin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(gmin.select("u", F.col("m").alias("v")))
        )
    out = out.where(F.col("u") != F.col("v"))
    # Deduplicate only after the small-star round: the large-star output
    # feeds straight into small-star's min aggregate, which absorbs
    # duplicates for free — a distinct() there is one wasted shuffle per
    # round.  The small-star output must be distinct (it is the per-round
    # edge state the fingerprint and final labels read).
    return out.distinct() if not large else out


def _fingerprint_cols() -> list:
    # decimal(38,0) sum: order-insensitive and ANSI-safe (a long sum of
    # xxhash64 values overflows by design)
    return [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ]


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(*_fingerprint_cols()).first()
    return (row["n"], int(row["h"]))


def _checkpoint_with_fingerprint(
    edges: DataFrame, obs_name: str
) -> tuple[DataFrame, tuple[int, int]]:
    """localCheckpoint + edge fingerprint in ONE job: the fingerprint is an
    `observe()` metric computed as a side effect of the checkpoint
    materialization scan, not a separate aggregation action.  Falls back to
    the two-job path if the observed metric can't be read (API drift).
    r14: the observe-read fragility lives in one shared helper
    (operators/fusion.py, ADVICE r13)."""
    from crawling_vectordb_llm_spark.operators.fusion import (
        checkpoint_with_metrics,
    )

    cp, vals = checkpoint_with_metrics(edges, obs_name, *_fingerprint_cols())
    if vals is not None:
        return cp, (vals[0], vals[1])
    return cp, _fingerprint(cp)


def _driver_union_find(rows: list, spark) -> DataFrame:
    """Small-graph fast path: path-compressed union-find on the driver.
    Produces EXACTLY the labels the distributed fixpoint produces
    (component id = min node id), so callers and oracles can't tell the
    paths apart."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN root so the final label is the component min
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    import pandas as pd

    out = pd.DataFrame(
        {"node": list(parent.keys()), "component": [find(n) for n in parent]}
    ).astype("int64")
    # Arrow path: cheap even at ~1M nodes; explicit schema for the
    # empty-graph case (pandas inference has nothing to infer from)
    return spark.createDataFrame(out, "node long, component long")


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 12,
    max_driver_edges: int = 2_000_000,
) -> DataFrame:
    """Resolve an undirected pair list to (node, component) labels,
    component id = min node id in the component.

    Returns a DataFrame (node long, component long) covering every node
    that appears in `pairs`.  Nodes absent from `pairs` are singletons —
    callers attach them with a left join + coalesce(component, id)
    (see `dedup_clusters` in the suite), keeping this operator a pure
    graph kernel.

    Adaptive physical choice (the iterative analog of AQE's size-based
    join selection): a `limit(max_driver_edges + 1)` probe collect
    decides the mode and, for small graphs, already delivers the edges
    in the same job (r13); at or below `max_driver_edges` (~32 MB
    of longs at the 2M default — the same bound the incremental-dedup
    stream uses for its band-row collect, and far under the 100 TB-safe
    driver budget) the O(rounds) shuffle ladder costs more than
    collecting the edges and running path-compressed union-find on the
    driver, so small graphs take that path — byte-identical labels, ~6
    shuffle stages saved.  (r8: raised from 500k, which sat exactly
    between the fresh-fixture sf1 and sf3 bounded-graph sizes, so the
    three-point bench measured a mode switch instead of data growth;
    the distributed path's own slope is measured at fixed mode in
    SCALE.md round 8.)  Above it, the alternating large-star/small-star
    fixpoint runs distributed; dup graphs at 100 TB land there, but
    their SURVIVING edge lists after upstream near-dup pruning often do
    not."""
    canon = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # Small-graph detection via a limit probe (r13, guide §1/§5 — the
    # same pattern as bounded_random_sample): one collect decides the
    # mode AND delivers the edges, replacing the old
    # checkpoint-materialize + fingerprint + re-collect sequence (three
    # driver round-trips) on every small graph.  Graphs over the
    # threshold pay one early-exiting CollectLimit pass before the
    # distributed fixpoint — a constant next to O(rounds) shuffles.
    # r14 (ADVICE r13): the probe lands as ARROW (toPandas) instead of
    # 2M+1 Python Row objects — the large-graph branch now discards
    # ~32 MB of columnar longs, not hundreds of MB of boxed Rows
    # (measured: 5.5 s collect vs 0.9-1.6 s toPandas for a 2M+1-edge
    # probe), and the small-graph path still pays exactly one round-trip.
    probe = canon.limit(max_driver_edges + 1).toPandas()
    if len(probe) <= max_driver_edges:
        return _driver_union_find(
            list(zip(probe["u"].tolist(), probe["v"].tolist())),
            pairs.sparkSession,
        )
    edges, prev = _checkpoint_with_fingerprint(canon, "cc_init")
    for i in range(max_rounds):
        nxt = _star_round(_star_round(edges, large=True), large=False)
        edges, cur = _checkpoint_with_fingerprint(nxt, f"cc_round_{i}")
        if cur == prev:
            break
        prev = cur
    # Converged state: every non-root node has exactly the edge
    # (node, component_min); roots appear only on the v side.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        edges.select(F.col("v").alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return labels.unionAll(roots)


def triangle_counts(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """Per-node triangle counts over an undirected pair graph — the
    clustering-coefficient numerator used to find tightly-knit duplicate
    neighborhoods the pairwise threshold alone can't see.

    Degree-oriented wedge algorithm (Cohen, "Graph Twiddling in a
    MapReduce World", 2009): orient every edge from its lower-(degree,id)
    endpoint to the higher, enumerate wedges only at each edge's SOURCE,
    and close them against the canonical edge set.  Orientation bounds
    wedge fan-out by sqrt(|E|) per node (a celebrity node of degree d
    contributes wedges only through neighbors that out-rank it), which is
    what keeps the wedge join from exploding on skewed similarity graphs
    — the id-ordered naive join would square the hub degree.  Three
    shuffles total: degree agg, wedge self-join, closing join.

    Returns (node long, n_triangles long), nodes in >= 1 triangle.
    """
    canon = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = canon.unionAll(canon.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # orient: src = endpoint with smaller (deg, id); degree table is
    # |nodes| rows — broadcast onto the edge list twice, map-side
    with_deg = (
        canon.join(F.broadcast(deg.withColumnRenamed("u", "u_")), F.col("u") == F.col("u_"))
        .drop("u_")
        .withColumnRenamed("deg", "deg_u")
        .join(F.broadcast(deg.withColumnRenamed("u", "v_")), F.col("v") == F.col("v_"))
        .drop("v_")
        .withColumnRenamed("deg", "deg_v")
    )
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    o1 = oriented.select("src", F.col("dst").alias("d1"))
    o2 = oriented.select("src", F.col("dst").alias("d2"))
    wedges = o1.join(o2, "src").where(F.col("d1") < F.col("d2"))
    closed = wedges.join(
        canon.select(
            F.col("u").alias("cu"), F.col("v").alias("cv")
        ),
        (F.least("d1", "d2") == F.col("cu")) & (F.greatest("d1", "d2") == F.col("cv")),
    ).select("src", "d1", "d2")
    nodes = closed.select(
        F.explode(F.array("src", "d1", "d2")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def _checkpoint_with_count(
    df: DataFrame, obs_name: str
) -> tuple[DataFrame, int]:
    """localCheckpoint + row count in ONE job: the count rides the
    checkpoint materialization scan as an `observe()` metric instead of
    a second action over the checkpointed blocks (same fusion as
    `_checkpoint_with_fingerprint` above; guide §1 — one pass, one job).
    Falls back to the two-job path if the observed metric can't be read."""
    from crawling_vectordb_llm_spark.operators.fusion import (
        checkpoint_with_metrics,
    )

    cp, vals = checkpoint_with_metrics(
        df, obs_name, F.count(F.lit(1)).alias("n")
    )
    return cp, (vals[0] if vals is not None else cp.count())


def kcore_nodes(
    pairs: DataFrame,
    k: int,
    rounds: int = 8,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """k-core of an undirected pair graph via synchronous peeling: drop
    every node with degree < k, recompute degrees, repeat.  The k-core is
    the spam/template-farm detector of near-dup graphs — organic near-dups
    form small sparse clusters, while boilerplate farms form dense cores
    where every page is within tau of many others (each survivor has >= k
    near-duplicate neighbors INSIDE the surviving set, a much stronger
    signal than raw degree, which a single hub page can fake).

    Runs AT MOST `rounds` peels, early-exiting only on a fixpoint (an
    early exit is therefore result-identical to running all `rounds` —
    peeling is idempotent once converged).  Pinning the round budget makes
    the operator's output deterministic and replayable by an unrolled SQL
    oracle regardless of whether the true fixpoint needs more rounds;
    tests assert the fixture graphs converge well inside the budget.

    Scale: each round is one degree aggregation (partial-aggregable
    groupBy) plus two semi-joins of the edge list against the surviving
    node set — all shuffles keyed on node ids, O(E) per round, with
    `localCheckpoint` truncating the iterative lineage exactly as in
    connected_components above.  Round count is a constant knob, not a
    function of graph size.

    Returns (node, core_degree): the surviving nodes with their degree
    within the core.
    """
    sym = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(
            pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
        )
        .distinct()
    )
    edges, n_edges = _checkpoint_with_count(sym, "kcore_init")
    for i in range(rounds):
        if n_edges == 0:
            break
        keep = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select("a")
        )
        pruned, n_pruned = _checkpoint_with_count(
            edges.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b"),
            f"kcore_round_{i}",
        )
        if n_pruned == n_edges:
            # fixpoint: pruning only removes rows, so equal count means
            # equal set — further rounds are no-ops
            break
        edges, n_edges = pruned, n_pruned
    if n_edges == 0:
        spark = pairs.sparkSession
        return spark.createDataFrame([], "node long, core_degree bigint")
    return edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )
