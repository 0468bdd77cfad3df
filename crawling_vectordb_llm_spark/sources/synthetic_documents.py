"""Fresh-entropy document/embedding fixture generator (VERDICT r4 #1).

The r4 sf1 run replicated the sf0.1 fixtures 10x, so every document had
10 GENUINE copies: dedup/connected-components inputs grew quadratically
(the pair list ~120x for 10x data) and the measured "scaling slopes" of
the near-dup family said more about duplicate density than about
scaling.  This module generates sf1-sized `documents` / `embeddings`
fixtures with seeded UNIQUE content and a CONTROLLED duplicate rate
(~7% for text, ~5% for vectors), so a slope measured on them isolates
data growth from duplicate growth.

Distributional shape mirrors the driver fixtures (TESTDATA.md) so every
registered query behaves comparably: same 30-word vocabulary, uniform
10-100 words/doc, lang weights (en 0.40, de/zh/fr/es 0.15), 20 uniform
sources, unit-norm float32 dim-64 embeddings with labels 0-9.

Duplicate model (documents): ids are classed by `id % 100` —
  < 93   original: seeded-unique word sequence (30^10 min possibilities
         -> collisions are vanishing; the tests assert uniqueness)
  93-96  exact duplicate of a seeded-random original ("master")
  97-99  near duplicate: master's words with one seeded position
         replaced by the 'dup' marker token (the driver uses the same
         marker), so each near-dup is distinct W.H.P. but high-Jaccard.
         (Two near-dups that draw the same master AND the same replaced
         position produce identical texts; at n masters x 10 positions
         the collision probability is negligible but not zero, and only
         originals' uniqueness is asserted by tests — ADVICE r5.)
Masters are drawn uniformly over ALL originals, so cluster sizes stay
O(1) (Poisson, mean ~1.08) and the near-dup edge list grows LINEARLY in
n — the property the r4 replicated fixture lacked.

Embeddings: ids with `id % 100 >= 95` copy a seeded master's vector
plus sigma=0.01 Gaussian noise (cos ~ 0.9999 -> inside every near-dup
threshold); labels copy the master's so label-consistency checks hold.

Determinism: every row is a pure function of (seed, id) — per-row RNGs
seeded by (seed << 32) ^ id — independent of partitioning, task order,
and retries (same contract as synthetic_embeddings.py and the synthetic
crawl source).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_BASE_WORDS = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast row the "
    "agg key query a scan batch".split()
)
# r7 (VERDICT r6 #6): with the driver fixture's 30-word vocabulary the
# 3-gram shingle space is only 30^3 = 27k, so at fresh sf3 (~8M corpus
# shingles) MinHash bands collided by pigeonhole and manufactured ~155k
# spurious candidate pairs between UNRELATED documents (19k -> 155k for
# 3x data) — a fixture artifact no real corpus reproduces.  Suffix-
# expanding to 30*137 = 4,110 words lifts shingle space to ~6.9e10 >>
# corpus shingles at every bench scale, so candidate volume tracks the
# PLANTED duplicate rate (linear) instead of band pigeonholing, while the
# token shapes (letters + short digit tails) stay text-like.  The bare
# base words remain in the vocabulary (i=0), so stopword/quality
# heuristics still see them.
VOCAB = np.array(
    [f"{w}{i}" if i else w for w in _BASE_WORDS for i in range(137)]
)
LANGS = np.array(["en", "de", "zh", "fr", "es"])
LANG_P = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
DOC_DUP_MOD = 100  # id % 100: <93 original, 93-96 exact dup, 97-99 near dup
DOC_ORIGINAL_CUT = 93
DOC_EXACT_CUT = 97
EMB_DUP_CUT = 95  # id % 100 >= 95 -> near-dup vector


def _n_originals(n: int) -> int:
    """How many ids in [0, n) are originals (id % 100 < 93)."""
    return (n // DOC_DUP_MOD) * DOC_ORIGINAL_CUT + min(
        n % DOC_DUP_MOD, DOC_ORIGINAL_CUT
    )


def _original_id(j: int) -> int:
    """The j-th original id (inverse of the id%100<93 classing)."""
    return (j // DOC_ORIGINAL_CUT) * DOC_DUP_MOD + (j % DOC_ORIGINAL_CUT)


def _original_words(seed: int, doc_id: int) -> np.ndarray:
    rng = np.random.default_rng((seed << 32) ^ doc_id)
    n_words = int(rng.integers(10, 101))
    return VOCAB[rng.integers(0, len(VOCAB), n_words)]


def _doc_row(seed: int, doc_id: int, n_orig: int) -> tuple[str, str, str]:
    """(text, lang, source) for one id — pure function of (seed, id)."""
    cls = doc_id % DOC_DUP_MOD
    meta_rng = np.random.default_rng((seed << 33) ^ doc_id)
    lang = str(LANGS[meta_rng.choice(len(LANGS), p=LANG_P)])
    source = f"src{int(meta_rng.integers(0, 20))}"
    if cls < DOC_ORIGINAL_CUT:
        words = _original_words(seed, doc_id)
    else:
        master = _original_id(int(meta_rng.integers(0, n_orig)))
        words = _original_words(seed, master)
        if cls >= DOC_EXACT_CUT:  # near dup: one seeded position -> marker
            words = words.copy()
            words[int(meta_rng.integers(0, len(words)))] = "dup"
    return " ".join(words.tolist()), lang, source


def fresh_documents(
    spark: SparkSession, n: int, seed: int = 11, partitions: int | None = None
) -> DataFrame:
    """(doc_id long, text string, lang string, source string, n_chars
    long) — n docs, ~93% seeded-unique, ~4% exact dups, ~3% near dups.
    Distributed: each partition materializes only its own id range."""
    n_orig = _n_originals(n)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [_doc_row(seed, int(i), n_orig) for i in pdf["id"]]
            texts = [r[0] for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].to_numpy(),
                    "text": texts,
                    "lang": [r[1] for r in rows],
                    "source": [r[2] for r in rows],
                    "n_chars": np.array([len(t) for t in texts], np.int64),
                }
            )

    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(
        _gen,
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def fresh_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    seed: int = 13,
    partitions: int | None = None,
) -> DataFrame:
    """(vec_id long, embedding array<float>, label int) — n unit-norm
    vectors, ~95% seeded-unique isotropic (the driver fixture's
    geometry), ~5% near-dups (master + sigma 0.01 noise, cos~0.9999)."""
    n_base = (n // DOC_DUP_MOD) * EMB_DUP_CUT + min(n % DOC_DUP_MOD, EMB_DUP_CUT)

    def base_id(j: int) -> int:
        return (j // EMB_DUP_CUT) * DOC_DUP_MOD + (j % EMB_DUP_CUT)

    def vec_for(vid: int) -> tuple[np.ndarray, int]:
        cls = vid % DOC_DUP_MOD
        if cls < EMB_DUP_CUT:
            rng = np.random.default_rng((seed << 32) ^ vid)
            v = rng.standard_normal(dim)
            label = int(rng.integers(0, 10))
        else:
            meta_rng = np.random.default_rng((seed << 33) ^ vid)
            master = base_id(int(meta_rng.integers(0, n_base)))
            v, label = vec_for(master)  # master is base-class: depth 1
            v = v + 0.01 * np.random.default_rng(
                (seed << 34) ^ vid
            ).standard_normal(dim)
        return v / max(np.linalg.norm(v), 1e-30), label

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pairs = [vec_for(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"].to_numpy(),
                    "embedding": [p[0].astype(np.float32) for p in pairs],
                    "label": np.array([p[1] for p in pairs], np.int32),
                }
            )

    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(
        _gen, schema="vec_id long, embedding array<float>, label int"
    )
