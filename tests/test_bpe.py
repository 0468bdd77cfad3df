"""BPE tokenizer (operators/bpe.py): training determinism, the classic
merge behavior on a planted corpus, reversibility, and the distributed
apply path."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.bpe import (
    EOW,
    bpe_encode_texts,
    bpe_tokenize,
    train_bpe,
    train_bpe_on_sample,
)


def test_train_is_deterministic_and_orders_by_frequency():
    corpus = ["low low low low low lower lower newest newest newest newest newest newest"]
    a = train_bpe(corpus, n_merges=50)
    b = train_bpe(corpus, n_merges=50)
    assert a == b and len(a) > 0
    # the most frequent adjacent pair in the sample merges first:
    # 'e'+'s' (6x in newest) ties 's'+'t' and 'w'+EOW... count check:
    # es=6, st=6, t</w>=6, ne=6, ew=6, we=6 -> lexicographic max of ties
    assert a[0] in {("e", "s"), ("s", "t"), ("n", "e"), ("e", "w"), ("w", "e"), ("t", EOW)}
    # frequent whole words eventually become single tokens
    toks = bpe_encode_texts(["newest"], a)[0]
    assert toks == ["newest" + EOW]


def test_encoding_is_reversible():
    corpus = ["the quick brown fox jumps over the lazy dog " * 3]
    merges = train_bpe(corpus, n_merges=30)
    for text in ["the quick fox", "unseen wordforms survive", ""]:
        toks = bpe_encode_texts([text], merges)[0]
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == " ".join(text.lower().split())


def test_fewer_tokens_than_chars_and_merge_monotonicity():
    corpus = ["aaab aaab aaab aaab caab caab"]
    m10 = train_bpe(corpus, n_merges=2)
    m50 = train_bpe(corpus, n_merges=50)
    t10 = bpe_encode_texts(["aaab caab"], m10)[0]
    t50 = bpe_encode_texts(["aaab caab"], m50)[0]
    assert len(m10) <= len(m50)
    assert len(t50) <= len(t10) <= len("aaab caab") + 2  # chars + EOW markers


def test_distributed_apply_matches_local(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        F.col("doc_id") < 100
    )
    merges = train_bpe_on_sample(docs, n_merges=100, sample_limit=100)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    local_rows = docs.select("doc_id", "text").collect()
    local = {
        r["doc_id"]: bpe_encode_texts([r["text"]], merges)[0] for r in local_rows
    }
    assert got == local
    # reversibility holds across the Arrow path too
    some = local_rows[0]
    rebuilt = "".join(got[some["doc_id"]]).replace(EOW, " ").strip()
    assert rebuilt == " ".join((some["text"] or "").lower().split())


def test_rank_order_apply_equals_greedy_encode():
    """The DuckDB oracle for bpe_token_count applies the fixture merges
    in RANK ORDER (one exhaustive left-to-right pass per merge); the
    engine's _encode_word runs the GPT-2 lowest-rank-first loop.  These
    are equivalent — a merge's component symbols always predate it, so a
    newly created adjacency can only enable later-rank merges — and this
    test pins that equivalence on every corpus word plus random fuzz, so
    the oracle can't silently diverge from the udf."""
    import random

    import duckdb

    from crawling_vectordb_llm_spark.operators.bpe import EOW, _encode_word
    from crawling_vectordb_llm_spark.suite.training_suite import (
        _bpe_fixture_merges,
    )

    merges = _bpe_fixture_merges()
    ranks = {p: i for i, p in enumerate(merges)}

    def rank_order_apply(word):
        sym = list(word) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    words = set()
    for (t,) in duckdb.connect().execute(
        "select text from read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall():
        words.update((t or "").lower().split())
    rng = random.Random(0)
    for _ in range(2000):
        words.add(
            "".join(rng.choice("abcdefghij") for _ in range(rng.randint(1, 12)))
        )
    for w in words:
        assert rank_order_apply(w) == _encode_word(w, ranks), w
