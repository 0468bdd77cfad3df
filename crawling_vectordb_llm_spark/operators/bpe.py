"""Byte-pair-encoding tokenizer — trained on a bounded sample, applied
corpus-wide as an Arrow-batched UDF.

The reference tokenizes with a pretrained HF tokenizer loaded per process
(AutoTokenizer, reference main_server.py:53-55); a training-data pipeline
additionally needs to TRAIN vocabularies on its own corpus and count/pack
tokens at 100 TB.  The standard shape (identical to the IVF/PQ codebook
trainers, operators/ivf.py) is train-on-sample, apply-distributed:

* `train_bpe` — classic character-level BPE (Sennrich et al. 2016) over a
  word-frequency dict built from a seeded sample.  Runs on the driver
  (merge selection is inherently sequential); deterministic — pair-count
  ties break lexicographically, so two trainings on the same sample
  produce byte-identical merge tables.
* `bpe_tokenize` / `bpe_token_count` — apply the broadcast merge table
  with the GPT-2-style greedy lowest-rank merge loop inside an iterator
  pandas_udf: merge ranks are built once per executor process, and a
  per-worker word→tokens memo exploits Zipf (real corpora repeat words
  heavily), so the per-row cost is a dict lookup for all but novel words.

End-of-word marker "</w>" keeps the encoding reversible: joining a word's
tokens and stripping the marker reconstructs the word exactly
(tests/test_bpe.py round-trip property).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _word_freqs(texts: list[str]) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            freqs[w] += 1
    return freqs


def train_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn up to n_merges BPE merges from the sample texts.  Returns the
    ordered merge list (rank = position).  Deterministic: the best pair is
    max by (count, pair) with the LEXICOGRAPHIC pair as tie-break, so the
    table is stable across runs and partitionings of the same sample."""
    freqs = _word_freqs(texts)
    # each word starts as its characters + end-of-word marker
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in sorted(freqs.items())
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for sym, c in words:
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += c
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = []
        for sym, c in words:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words.append((out, c))
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy encode: repeatedly apply the lowest-rank merge
    present in the word until none applies."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_texts(
    texts: list[str],
    merges: list[tuple[str, str]],
    cache: dict[str, list[str]] | None = None,
) -> list[list[str]]:
    """Encode a batch of texts; optional cross-batch word memo."""
    ranks = {p: i for i, p in enumerate(merges)}
    cache = {} if cache is None else cache
    out = []
    for t in texts:
        toks: list[str] = []
        for w in (t or "").lower().split():
            hit = cache.get(w)
            if hit is None:
                hit = _encode_word(w, ranks)
                if len(cache) < 1_000_000:  # bound worker memory
                    cache[w] = hit
            toks.extend(hit)
        out.append(toks)
    return out


def make_bpe_udf(merges: list[tuple[str, str]]):
    """Iterator pandas_udf applying the broadcast merge table — ranks and
    the word memo are built once per executor process and reused across
    Arrow batches (the model-singleton pattern, embedding.py)."""

    @F.pandas_udf("array<string>")
    def tokenize(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, list[str]] = {}
        for s in it:
            yield pd.Series(bpe_encode_texts(s.fillna("").tolist(), merges, cache))

    return tokenize


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    return df.withColumn(out_col, make_bpe_udf(merges)(F.col(text_col)))


def train_bpe_on_sample(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_limit: int = 10_000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Train on a seeded random sample of the corpus (the same bounded-
    sample contract as the IVF/PQ trainers — tokenizer training on the
    full 100 TB corpus buys nothing over a large sample)."""
    from crawling_vectordb_llm_spark.operators.ivf import bounded_random_sample

    rows = bounded_random_sample(df, [text_col], sample_limit, seed)
    return train_bpe([r[0] for r in rows], n_merges)
