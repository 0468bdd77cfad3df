"""Crawl-shaped ingest pipeline (S1-S4, P1-P7) — Spark-first.

The reference crawls eagerly on one thread: seed fetch → nav-tree flatten →
per-page fetch → CSS-select content div → strip tags → truncate 6000 →
collapse blank lines (Crawling.py:13-51).  Here the frontier is a DataFrame
and fetching is a `mapInPandas` stage: each partition fetches its URL batch
(at scale: polite concurrency per executor, retries), so the crawl
parallelizes with the cluster instead of the GIL.

HTTP and lxml are gated behind import-tries — the test/oracle path injects a
deterministic fake fetcher, and tag-stripping falls back to a regex
(adequate for the reference's fixed `div` selector pattern).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.functions.text import CLEAN_TRUNCATE_CHARS

FetchFn = Callable[[str], str]


def with_html_column(df: DataFrame):
    """Fresh output schema = input schema + html string column.
    (StructType.add MUTATES the DataFrame's cached schema — build new.)"""
    from pyspark.sql import types as T

    return T.StructType(
        list(df.schema.fields) + [T.StructField("html", T.StringType())]
    )


def default_fetcher() -> FetchFn:
    """requests.get(url).text (Crawling.py:16,40) — only if requests exists."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "requests not available in this image; inject a fetcher"
        ) from e
    return lambda url: requests.get(url, timeout=30).text


def fetch_pages(urls: DataFrame, fetcher: FetchFn, url_col: str = "link") -> DataFrame:
    """S1: per-partition page fetch.  Side-effecting source stage — kept out
    of Catalyst (mapInPandas) on purpose; everything downstream is columnar."""

    def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["html"] = [fetcher(u) for u in pdf[url_col]]
            yield pdf

    schema = with_html_column(urls)
    return urls.mapInPandas(_fetch, schema=schema)


def extract_content(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """S2/P6: select the content div and strip tags (BeautifulSoup
    `select("div.J-markdown-box")[0].get_text()`, Crawling.py:41-44) —
    for the fixed selector a regex extract + tag strip is exact and stays
    JVM-side (no Python in the hot path)."""
    content = F.regexp_extract(
        F.col(html_col), r'<div class="content">(.*?)</div>', 1
    )
    return pages.withColumn("text", F.regexp_replace(content, r"<[^>]+>", " "))


def clean_pages(pages: DataFrame) -> DataFrame:
    """P3-P5: drop empty pages, truncate 6000, collapse whitespace runs
    (Crawling.py:43-46)."""
    return (
        pages.where(F.col("text").isNotNull() & (F.length("text") > 0))
        .withColumn(
            "text",
            F.trim(
                F.regexp_replace(
                    F.substring("text", 1, CLEAN_TRUNCATE_CHARS), r"\s+", " "
                )
            ),
        )
    )


def extract_links(html_col: str = "html") -> F.Column:
    """S2 link extraction: every <a href="..."> target (JVM-side regex)."""
    return F.expr(f"""regexp_extract_all({html_col}, '<a href="([^"]+)"', 1)""")


def crawl_bfs(
    seeds: DataFrame,
    fetcher: FetchFn,
    max_depth: int = 10,
    url_col: str = "link",
) -> DataFrame:
    """Iterative BFS frontier crawl — the multi-hop generalization of the
    reference's fixed two-stage crawl (seed nav tree → pages,
    Crawling.py:13-51): fetch frontier → extract links → anti-join the
    visited set → next frontier, to fixpoint or max_depth.

    Scale notes: the visited set stays a DataFrame (anti-join dedup — the
    upsert-by-id primitive), fetching parallelizes per partition, and each
    iteration `localCheckpoint`s to truncate lineage — without it the plan
    doubles per hop and iteration i replays every fetch since the seed.
    Returns the visited URL set."""
    visited = seeds.select(url_col).distinct().localCheckpoint()
    frontier = visited
    for _ in range(max_depth):
        pages = fetch_pages(frontier, fetcher, url_col)
        links = pages.select(
            F.explode(extract_links("html")).alias(url_col)
        ).distinct()
        new = links.join(visited, url_col, "left_anti").distinct().localCheckpoint()
        if new.isEmpty():
            break
        visited = visited.unionByName(new).localCheckpoint()
        frontier = new
    return visited


def crawl_ingest(
    urls: DataFrame, fetcher: FetchFn, url_col: str = "link"
) -> DataFrame:
    """Full S1→P7 pipeline: fetch → extract → clean → Document projection
    (id=url, title, text — TencentVDB.py:76-78)."""
    pages = fetch_pages(urls, fetcher, url_col)
    docs = clean_pages(extract_content(pages))
    return docs.select(
        F.col(url_col).alias("id"), F.col("title"), F.col("text")
    )
