"""SemDeDup (operators/semdedup.py) + DSIR (operators/importance.py) +
URL canonicalization (functions/text.canonicalize_url) properties.

SemDeDup is rows-only in the driver gate (iterative k-means + sequential
greedy are not SQL-expressible), so these tests pin the semantics the
oracle can't: planted-duplicate recall, lowest-id-wins election,
determinism, and that the sub-cell split never false-drops.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.functions.text import canonicalize_url
from crawling_vectordb_llm_spark.operators.importance import dsir_importance
from crawling_vectordb_llm_spark.operators.semdedup import semantic_dedup

from .conftest import SF_SMALL


def _planted(spark, n_groups=6, copies=3, dim=16, seed=7):
    """n_groups well-separated base vectors (near-orthogonal random
    Gaussians), each duplicated `copies` times with tiny jitter — every
    group is one semantic-dup family."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for g in range(n_groups):
        for _ in range(copies):
            v = base[g] + rng.normal(scale=1e-3, size=dim)
            rows.append((vid, g, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, group long, embedding array<float>"
    )


def test_planted_duplicates_collapse(spark):
    df = _planted(spark)
    out = semantic_dedup(
        df, tau=0.9, n_clusters=6, id_col="vec_id", vec_col="embedding"
    ).toPandas()
    assert len(out) == 18
    kept = out[out["keep"]]
    # every family collapses to >=1 survivor; near-identical copies in the
    # same k-means cluster must collapse, so survivors ~ n_groups (exactly
    # n_groups when clustering separates the families; never fewer)
    assert 6 <= len(kept) <= 8
    # dropped rows report the cosine to their kept twin: ~1.0
    dropped = out[~out["keep"]]
    assert (dropped["max_sim_kept"] >= 0.9).all()


def test_lowest_id_wins_and_determinism(spark):
    df = _planted(spark, n_groups=4, copies=4)
    a = semantic_dedup(df, tau=0.9, n_clusters=4).toPandas()
    b = semantic_dedup(df, tau=0.9, n_clusters=4).toPandas()
    a_s = a.sort_values("vec_id").reset_index(drop=True)
    b_s = b.sort_values("vec_id").reset_index(drop=True)
    assert a_s.equals(b_s), "semantic_dedup must be run-to-run deterministic"
    # within each (cluster) the kept member of a dup family is the min id:
    # for every dropped row some kept row with a smaller id exists in its
    # cluster (greedy scans ascending ids)
    for _, row in a.iterrows():
        if not row["keep"]:
            peers = a[(a["centroid_id"] == row["centroid_id"]) & a["keep"]]
            assert (peers["vec_id"] < row["vec_id"]).any()


def test_tau_monotonicity(spark):
    """Raising tau can only keep MORE documents (prune is less eager)."""
    df = _planted(spark)
    lo = semantic_dedup(df, tau=0.5, n_clusters=3).toPandas()
    hi = semantic_dedup(df, tau=0.999, n_clusters=3).toPandas()
    assert hi["keep"].sum() >= lo["keep"].sum()


def test_subcell_split_never_false_drops(spark):
    """With max_cluster forcing sub-cell splits, any doc kept by the
    unsplit run must still be kept: splitting can only MISS duplicates
    (conservative), never invent them."""
    df = _planted(spark, n_groups=5, copies=4)
    whole = semantic_dedup(df, tau=0.9, n_clusters=2, max_cluster=100_000).toPandas()
    split = semantic_dedup(df, tau=0.9, n_clusters=2, max_cluster=3).toPandas()
    kept_whole = set(whole[whole["keep"]]["vec_id"])
    kept_split = set(split[split["keep"]]["vec_id"])
    assert kept_whole <= kept_split


def test_dsir_prefers_target_like_docs(spark):
    """A raw doc written in the target slice's vocabulary must outscore a
    raw doc written in disjoint vocabulary."""
    tgt_vocab = "alpha beta gamma delta epsilon zeta eta theta"
    off_vocab = "one two three four five six seven eight"
    rows = [(i, "t", tgt_vocab) for i in range(10)]  # target slice
    rows += [(100, "r", tgt_vocab), (101, "r", off_vocab)]  # raw probes
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = (
        dsir_importance(df, F.col("source") == "t")
        .toPandas()
        .set_index("doc_id")["logratio"]
    )
    assert out[100] > out[101]
    # the disjoint-vocab probe has NO target evidence: strictly negative
    assert out[101] < 0


@pytest.mark.parametrize(
    "dirty,canon",
    [
        ("HTTPS://Example.COM/Path/Sub/?utm_source=f&id=5&ref=x#frag",
         "https://example.com/Path/Sub?id=5"),
        ("http://example.com:80/a/b/", "http://example.com/a/b"),
        ("https://example.com:443?utm_a=1&utm_b=2", "https://example.com"),
        ("http://h.com/p?utm_a=1&utm_b=2&id=5", "http://h.com/p?id=5"),
        ("https://h.com:8080/p/?fbclid=zz", "https://h.com:8080/p"),
        ("http://h.com/UPPER/Case?Q=Mixed", "http://h.com/UPPER/Case?Q=Mixed"),
    ],
)
def test_canonicalize_url_cases(spark, dirty, canon):
    got = (
        spark.createDataFrame([(dirty,)], "url string")
        .select(canonicalize_url("url"))
        .first()[0]
    )
    assert got == canon


def test_semantic_dedup_fixture_nontrivial(spark):
    """At the suite's operating point the fixture must exercise both
    branches (some kept, some dropped) or the rows-only check is vacuous."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = semantic_dedup(emb, tau=0.4, n_clusters=8, seed=42).toPandas()
    assert 0 < out["keep"].sum() < len(out)


def test_canonicalize_url_idempotent(spark):
    """A canonicalizer that isn't idempotent corrupts the frontier on
    re-crawl (already-canonical URLs mutate again).  Hypothesis-style
    sweep over the URL alias grammar, batched through one Spark job."""
    from hypothesis import strategies as st

    url_st = st.from_regex(
        r"https?://[A-Za-z0-9.]{1,12}(:\d{2,4})?(/[A-Za-z0-9_]{0,8}){0,3}/?"
        r"(\?(utm_[a-z]{1,3}|ref|id|q)=[A-Za-z0-9]{0,5}"
        r"(&(utm_[a-z]{1,3}|ref|id|q)=[A-Za-z0-9]{0,5}){0,3})?"
        r"(#[A-Za-z0-9]{0,5})?",
        fullmatch=True,
    )
    urls = [url_st.example() for _ in range(150)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url("url").alias("c1")
    out = df.select(
        "url", once, canonicalize_url(canonicalize_url("url")).alias("c2")
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
