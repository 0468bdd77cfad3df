"""G1 generation stage: deterministic fake generator through the real
pandas_udf seam; citation append semantics (main_server.py:171-174)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.plans.generate import (
    fake_generate_batch,
    make_generate_udf,
    rag_generate,
)
from crawling_vectordb_llm_spark.plans.rag import search_pipeline

from .conftest import SF_SMALL


def test_fake_generator_deterministic():
    p = ['summarize according to "q", content: alpha beta gamma']
    assert fake_generate_batch(p, 8000) == fake_generate_batch(p, 8000)
    out = fake_generate_batch(p, 8000)[0]
    assert out.startswith("summary(alpha beta gamma)")


def test_generate_udf_over_dataframe(spark):
    df = spark.createDataFrame(
        [("summarize according to \"q\", content: one two three",)], "prompt string"
    )
    out = df.select(make_generate_udf()(F.col("prompt")).alias("r")).collect()
    assert out[0]["r"].startswith("summary(one two three)")


def test_rag_generate_appends_citations(spark):
    hits = search_pipeline(spark, SF_SMALL, n_queries=3, k=3)
    out = rag_generate(hits).collect()
    cits = {r["query_id"]: r["citations"] for r in hits.collect()}
    assert len(out) == 3
    for r in out:
        assert r["response"].startswith("summary(")
        # citations block is appended verbatim after a blank line
        assert r["response"].endswith("\n\n" + cits[r["query_id"]])


def test_chatglm_adapter_seam():
    """Opt-in real-generation adapter: clean NotImplementedError when
    transformers is absent; wired through make_generate_udf it must build
    a valid UDF either way."""
    import pytest

    from crawling_vectordb_llm_spark.plans.generate import (
        make_chatglm_generate_batch,
        make_generate_udf,
    )

    gen = make_chatglm_generate_batch()
    make_generate_udf(generate_batch=gen)  # plan construction never imports
    try:
        import transformers  # noqa: F401
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="transformers"):
            gen(["hello"], 100)
        return
