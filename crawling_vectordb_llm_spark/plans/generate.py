"""Batch generation stage (G1) — the Spark analog of the reference's
ChatGLM3-6B streamed chat (main_server.py:53-63 model load; 151-160
stream_chat with max_length/top_p/temperature; G2 history handling).

Engine design: generation is `prompt -> response` over a DataFrame, run as
an ITERATOR pandas_udf so a real model loads once per executor process and
then streams Arrow batches (the exact pattern the embedding stage uses —
SURVEY §4 "executor-side lazy singleton").  Token-by-token streaming is a
serving concern, out of engine scope (SURVEY §2.6).

The default generator is deterministic and extractive (first-sentences
summary + length stats) so the full RAG pipeline — search → context concat
→ prompt → GENERATE → citation append — runs end-to-end in tests with
stable output.  A real model plugs in via `generate_batch`.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_LENGTH_DEFAULT = 8000  # main_server.py:95 slider default


def fake_generate_batch(prompts: list[str], max_length: int) -> list[str]:
    """Deterministic extractive stand-in: echo the first 12 words of the
    prompt's content section as the 'summary'."""
    out = []
    for p in prompts:
        body = p.split("content:", 1)[-1].strip()
        words = body.split()
        out.append(
            "summary(" + " ".join(words[:12]) + f") [{min(len(p), max_length)} chars in]"
        )
    return out


def make_generate_udf(
    generate_batch: Callable[[list[str], int], list[str]] | None = None,
    max_length: int = MAX_LENGTH_DEFAULT,
):
    gen = generate_batch or fake_generate_batch

    @F.pandas_udf("string")
    def generate(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # a real LLM would be loaded HERE, once per worker process
        # (fp16/cuda selection as in main_server.py:56-59)
        for s in it:
            yield pd.Series(gen(s.fillna("").tolist(), max_length))

    return generate


def append_citations(response: Column | str, citations: Column | str) -> Column:
    """main_server.py:171-174: the citation block is appended to the
    generated response."""
    response = F.col(response) if isinstance(response, str) else response
    citations = F.col(citations) if isinstance(citations, str) else citations
    return F.concat(response, F.lit("\n\n"), citations)


def rag_generate(search_results: DataFrame, max_length: int = MAX_LENGTH_DEFAULT) -> DataFrame:
    """Full G1+P10 tail over search_pipeline output (query_id, context,
    citations, prompt): generate per prompt, append citations."""
    gen = make_generate_udf(max_length=max_length)
    return search_results.select(
        "query_id",
        append_citations(gen(F.col("prompt")), F.col("citations")).alias("response"),
    )
