"""Dimension-robustness measurement for the hybrid bounded-join
dispatch and the ANN ladder (VERDICT r8 #1 / r9 #1): re-run the forced
brute-vs-IVF crossover bracket AND the recall gates at d=1024 — the
reference's embedding width (text2vec-large-chinese emits 1024-d,
TencentVDB.py:46,49) — instead of the driver fixtures' d=64.

Why it matters: `BRUTE_TOPK_MAX_ROWS` (operators/knn.py) was bracketed
at d=64.  The claim that the bracket transfers to d=1024 ("both paths'
flops and overheads are ∝ d") was CITED before it was measured in r9 —
this tool makes it an artifact.  Per-pair GEMM flops at d=1024 are 16×
the d=64 cost, so if the transfer argument were wrong the crossover
would move visibly.

Fixture: the deterministic md5 hash-embedder (embedding.py, the S7
stand-in) over fresh-sf1/sf3 DOCUMENT text at dim=1024 — same embedding
law the engine ships, real token mass, ~7% controlled near-dup rate.
Corpora are fixed-size hash slices (pmod(xxhash64(doc_id), n) < target,
labels from MEASURED counts — the r9 slice-labeling bug class), each
localCheckpointed so embedding cost stays outside the timings.

Two sections, one artifact (AB_DIM_r10.json):

1. crossover_pairs — forced strategy="brute" vs strategy="ivf" of
   `topk_similarity_self_join`, interleaved reps with alternating
   order (tools/ab_bench.py discipline), at n ≈ 2k/8k/16k/20k/60k.
2. recall_gates — the ANN ladder at d=1024 against exact GEMM kNN
   truth (same 10-query gate set as the suite's *_recall_gate
   entries), plus the ivf_pruned_topk_join-vs-brute identity check
   (recall 1.0 by the angular triangle inequality — must hold at ANY
   d; a symmetric-difference count > 0 here is a correctness bug, not
   a tuning miss).

Usage:
  python tools/dim_ab.py [--reps N] [--dim D] [--json OUT]
                         [--gates-only] [--consumer]

--gates-only skips section 1 (the crossover bracket) — for re-running
the recall gates after an ANN-knob change that cannot move the
dispatch crossover (e.g. the r11 d-adaptive IVF-PQ m: ivfpq_topk is
not on the `topk_similarity_self_join` path at all).  The artifact
records crossover_pairs: "unchanged — see AB_DIM_r10.json".

--consumer adds section 3 (VERDICT r10 #6): a CONSUMER-level scaling
exponent at d — the `embedding_near_dup` body (bounded top-k edges,
hybrid dispatch) interleaved across the full sf1 (50k documents) and
sf3 (150k documents) hash-embedded corpora in one process;
e = ln(ratio)/ln(3).  Closes the gap between the d=64 exponent base
(AB_EXPONENT_POST_r10) and the reference's d=1024 operating point.
Read the result against EXP_SF9_DIAG_r11.json: hash embeddings are
isotropic, so the exact bounded join is flop-bound quadratic at ANY d
— the measured e (1.262, AB_DIM_r11.json) documents that the d=64
third-point law carries to d=1024, not that it is escaped there.

Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.embedding import make_embed_udf
from crawling_vectordb_llm_spark.operators.knn import (
    knn_join_numpy,
    topk_similarity_self_join,
)
from crawling_vectordb_llm_spark.session import get_spark

TAU, K = 0.35, 5  # the consumers' TOPK_TAU / TOPK_K operating point
SF1 = os.environ.get("SPARK_GRAFT_SF1F_DIR", "/tmp/sf1_fresh")
SF3 = os.environ.get("SPARK_GRAFT_SF3F_DIR", "/tmp/sf3_fresh")


def _embedded_slice(spark, docs_dir: str, target: int, dim: int):
    """Hash-slice the documents table to ~target rows, then hash-embed
    at `dim`.  Slicing BEFORE embedding keeps the (timed-out-of-band)
    embed cost proportional to the slice, and pinning via
    localCheckpoint keeps it out of the timings entirely."""
    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    n = docs.count()
    if target < n:
        docs = docs.where(
            F.pmod(F.xxhash64("doc_id"), F.lit(n)) < F.lit(target)
        )
    embed = make_embed_udf(dim=dim)
    emb = docs.select(
        F.col("doc_id").alias("vec_id"), embed(F.col("text")).alias("embedding")
    ).localCheckpoint()
    return emb


def _run(df, strategy: str) -> float:
    t0 = time.time()
    topk_similarity_self_join(df, k=K, tau=TAU, strategy=strategy, n_cells=16).count()
    return time.time() - t0


def crossover(spark, dim: int, reps: int) -> list[dict]:
    points = [(SF1, 2_000), (SF1, 8_192), (SF1, 16_384), (SF1, 20_000),
              (SF3, 60_000)]
    rows = []
    for src, target in points:
        if not os.path.exists(os.path.join(src, "documents.parquet")):
            print(f"WARN: {src} missing — run tools/sf1_fresh.py build/build3",
                  file=sys.stderr)
            continue
        df = _embedded_slice(spark, src, target, dim)
        n = df.count()
        label = f"{round(n / 1000)}k_n{n}"
        _run(df, "brute")  # cold, uncounted
        _run(df, "ivf")
        walls_b, walls_i = [], []
        for rep in range(reps):
            if rep % 2 == 0:
                walls_b.append(_run(df, "brute"))
                walls_i.append(_run(df, "ivf"))
            else:
                walls_i.append(_run(df, "ivf"))
                walls_b.append(_run(df, "brute"))
            spark.catalog.clearCache()
            gc.collect()
        med = statistics.median
        ratios = sorted(wi / max(wb, 1e-9) for wb, wi in zip(walls_b, walls_i))
        row = {
            "corpus": label,
            "n": n,
            "brute_median_s": round(med(walls_b), 3),
            "ivf_median_s": round(med(walls_i), 3),
            "ivf_over_brute_median_ratio": round(med(ratios), 3),
            "brute_walls_s": [round(w, 3) for w in walls_b],
            "ivf_walls_s": [round(w, 3) for w in walls_i],
            "reps": reps,
        }
        rows.append(row)
        print(
            f"{label:12s} n={n:6d}  brute {row['brute_median_s']:8.3f}s  "
            f"ivf {row['ivf_median_s']:8.3f}s  "
            f"ivf/brute {row['ivf_over_brute_median_ratio']:.3f}",
            flush=True,
        )
    return rows


def recall_gates(spark, dim: int) -> dict:
    """The suite's ANN recall gates re-run at d=1024 (same 10-query set,
    same knobs incl. the corpus-proportional ivfpq shortlist), plus the
    pruned-join identity check."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from crawling_vectordb_llm_spark.functions import vector as V
    from crawling_vectordb_llm_spark.operators.ivf import (
        ivf_pruned_topk_join,
        ivf_topk,
    )
    from crawling_vectordb_llm_spark.operators.pq import ivfpq_topk
    from crawling_vectordb_llm_spark.operators.topk import (
        adaptive_shortlist,
        grouped_topk,
    )

    emb = _embedded_slice(spark, SF1, 20_000, dim)
    n = emb.count()
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_join_numpy(queries, emb, k=10, corpus_id="vec_id")
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact.collect()}

    def recall(ann) -> float:
        got = {(r["query_id"], r["vec_id"]) for r in
               ann.select("query_id", "vec_id").collect()}
        return round(len(got & exact_set) / len(exact_set), 4)

    gates = {}
    r = recall(ivf_topk(queries, emb, k=10, n_centroids=16, n_probe=8))
    gates["ivf_nprobe8_of16"] = {"recall_at_10": r, "threshold": 0.7,
                                 "ok": r >= 0.7}
    r = recall(ivfpq_topk(
        queries, emb, k=10, n_centroids=16, n_probe=12,
        shortlist=adaptive_shortlist(n, floor=256),
    ))
    gates["ivfpq_adaptive_shortlist"] = {"recall_at_10": r, "threshold": 0.65,
                                         "ok": r >= 0.65}
    feats = emb.select(
        "vec_id", array_to_vector(V.l2_normalize("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=0.5, numHashTables=6, seed=42,
    )
    model = lsh.fit(feats)
    qf = queries.select(
        "query_id", array_to_vector(V.l2_normalize("query_vec")).alias("features")
    )
    joined = model.approxSimilarityJoin(qf, feats, 2.0, distCol="dist").select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("vec_id"),
        F.col("dist"),
    )
    ann_lsh = grouped_topk(joined, ["query_id"],
                           [F.asc("dist"), F.asc("vec_id")], 10)
    r = recall(ann_lsh)
    gates["lsh_6tables"] = {"recall_at_10": r, "threshold": 0.6, "ok": r >= 0.6}

    # identity: the IVF-composed bounded join must emit EXACTLY the brute
    # join's rows at any d (recall 1.0 by the angular triangle inequality)
    sub = _embedded_slice(spark, SF1, 8_192, dim)
    brute = topk_similarity_self_join(sub, k=K, tau=TAU, strategy="brute")
    pruned = ivf_pruned_topk_join(sub, tau=TAU, k=K, n_cells=16)
    b = {tuple(r) for r in brute.collect()}
    p = {tuple(r) for r in pruned.collect()}
    gates["ivf_pruned_topk_join_vs_brute"] = {
        "n": sub.count(),
        "brute_rows": len(b),
        "pruned_rows": len(p),
        "symmetric_diff": len(b ^ p),
        "ok": b == p,
    }
    for name, g in gates.items():
        print(f"gate {name}: {g}", flush=True)
    return {"gate_corpus_n": n, "gates": gates}


def consumer_exponent(spark, dim: int, reps: int) -> dict:
    """Section 3: the `embedding_near_dup` consumer body (bounded top-k
    edge graph via the hybrid dispatch) interleaved across the full sf1
    and sf3 document corpora hash-embedded at `dim`.  Same A,B/B,A
    alternation and median-of-per-rep-ratios as tools/ab_bench.py."""
    import math

    from crawling_vectordb_llm_spark.operators.knn import topk_edges

    def _consumer_run(df) -> float:
        t0 = time.time()
        topk_edges(
            topk_similarity_self_join(df, k=K, tau=TAU, n_cells=16)
        ).count()
        return time.time() - t0

    emb_a = _embedded_slice(spark, SF1, 10**9, dim)  # full 50k documents
    emb_b = _embedded_slice(spark, SF3, 10**9, dim)  # full 150k documents
    n_a, n_b = emb_a.count(), emb_b.count()
    _consumer_run(emb_a)  # cold, uncounted
    _consumer_run(emb_b)
    walls_a, walls_b = [], []
    for rep in range(reps):
        if rep % 2 == 0:
            walls_a.append(_consumer_run(emb_a))
            walls_b.append(_consumer_run(emb_b))
        else:
            walls_b.append(_consumer_run(emb_b))
            walls_a.append(_consumer_run(emb_a))
        spark.catalog.clearCache()
        gc.collect()
    med = statistics.median
    ratios = sorted(wb / max(wa, 1e-9) for wa, wb in zip(walls_a, walls_b))
    ratio = med(ratios)
    row = {
        "consumer": "embedding_near_dup (bounded top-k edges, hybrid dispatch)",
        "dim": dim,
        "n_a": n_a,
        "n_b": n_b,
        "a_median_s": round(med(walls_a), 3),
        "b_median_s": round(med(walls_b), 3),
        "b_over_a_median_ratio": round(ratio, 3),
        "marginal_exponent": round(math.log(ratio) / math.log(n_b / n_a), 3),
        "a_walls_s": [round(w, 3) for w in walls_a],
        "b_walls_s": [round(w, 3) for w in walls_b],
        "reps": reps,
    }
    print(f"consumer exponent d={dim}: {row['marginal_exponent']} "
          f"(ratio {row['b_over_a_median_ratio']} over {n_a}->{n_b})",
          flush=True)
    return row


def main() -> None:
    args = sys.argv[1:]
    reps, dim, json_out = 5, 1024, None
    gates_only, consumer = False, False
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps, args = int(args[1]), args[2:]
        elif args[0] == "--dim":
            dim, args = int(args[1]), args[2:]
        elif args[0] == "--json":
            json_out, args = args[1], args[2:]
        elif args[0] == "--gates-only":
            gates_only, args = True, args[1:]
        elif args[0] == "--consumer":
            consumer, args = True, args[1:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("dim_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    pairs = (
        "unchanged - dispatch path untouched; see AB_DIM_r10.json"
        if gates_only
        else crossover(spark, dim, reps)
    )
    gates = recall_gates(spark, dim)
    payload = {
        "dim": dim,
        "tau": TAU,
        "k": K,
        "fixture": "md5 hash-embed (embedding.py) of fresh-sf1/sf3 document "
        "text; fixed-size hash slices labeled by measured count",
        "protocol": "interleaved A/B, alternating order, 1 cold rep/side, "
        f"{reps} timed reps/side, median of per-rep ratios",
        "crossover_pairs": pairs,
        "ivfpq_m": "auto_m_subvectors(dim): fixed 8-dim sub-vector width "
        "(r11 — d-adaptive m; was a fixed m=8 through AB_DIM_r10.json)",
        "recall": gates,
    }
    if consumer:
        payload["consumer_exponent"] = consumer_exponent(spark, dim, reps)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    print(json.dumps({
        "pairs": pairs if isinstance(pairs, str) else [
            {k: v for k, v in r.items() if not k.endswith("walls_s")}
            for r in pairs
        ],
        "gates": {k: v for k, v in gates["gates"].items()},
        **({"consumer_exponent": {
            k: v for k, v in payload["consumer_exponent"].items()
            if not k.endswith("walls_s")}} if consumer else {}),
    }))


if __name__ == "__main__":
    main()
