"""Document chunking: split long texts into fixed-size overlapping
character windows — the standard pre-embedding stage of a RAG ingest
pipeline (the reference instead hard-truncates each page to 6000 chars,
Crawling.py:45; chunking is the lossless generalization).

Spark-first design: chunk starts come from `sequence()` + `explode`, and
the slice itself is `substring(text, start, size)` — all JVM expressions
inside whole-stage codegen, no UDF, no shuffle.  Output rows ≈
ceil(len/step) per document, so the operator is embarrassingly parallel
and scales linearly with corpus bytes regardless of document count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 200
CHUNK_OVERLAP = 50


def chunk_starts(text: Column | str, step: int) -> Column:
    """1-based chunk start offsets: 1, 1+step, ... ≤ max(len, 1).

    `greatest(len, 1)` keeps empty documents as a single empty chunk
    instead of silently dropping them.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.sequence(F.lit(1), F.greatest(F.length(text), F.lit(1)), F.lit(step))


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Explode each document into overlapping chunks.

    Returns (id, chunk_id, chunk_text) where chunk_id is 0-based and
    chunk_text = substring(text, 1 + chunk_id*(size-overlap), size).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    step = size - overlap
    return (
        docs.select(id_col, text_col, F.explode(chunk_starts(text_col, step)).alias("start"))
        .select(
            id_col,
            ((F.col("start") - 1) / step).cast("int").alias("chunk_id"),
            F.substring(F.col(text_col), F.col("start"), F.lit(size)).alias("chunk_text"),
        )
    )
