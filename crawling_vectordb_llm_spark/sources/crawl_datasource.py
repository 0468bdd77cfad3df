"""The crawler as a first-class pluggable Spark SOURCE (Python Data
Source API, Spark 4.0+) — S1 re-expressed the way a Spark-native engine
actually wants it.

The reference fetches its frontier with a sequential driver-side loop
(one `requests.get` per page, Crawling.py:36-48).  The mapInPandas
fetcher (sources/crawl.py) already distributes that; this module goes
one step further and makes the crawl a `spark.read.format(...)` source:
the URL space is split across `partitions()` (each becomes one Spark
task), `read()` yields rows for its slice, and everything downstream —
pushdown of projections, the clean/normalize pipeline, embedding — is
ordinary lazy DataFrame planning over a real source, not a side-effect
stage.

Fetching is an injectable seam exactly like sources/crawl.py: the
default `_fake_fetch` synthesizes deterministic pages (offline, oracle-
reproducible in SQL); swapping in a real HTTP fetcher changes one
method, not the dataflow.  At 100 TB-scale crawls the partition count is
the politeness/parallelism knob — tasks fetch disjoint URL slices
concurrently, and a failed task refetches only its slice (Spark task
retry = crawl retry, for free).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _fake_fetch(page_id: int) -> tuple[str, str, str]:
    """Deterministic synthetic page — word-soup text reproducible in any
    SQL engine (the oracle generates the identical corpus from range())."""
    url = f"https://site.example/page/{page_id}"
    title = f"Page {page_id}"
    text = " ".join(f"w{(page_id * 7 + j) % 13}" for j in range(20))
    return (url, title, text)


class CrawlReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_pages = int(options.get("pages", "64"))
        self.n_parts = int(options.get("numpartitions", "8"))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # round-robin page -> partition keeps slices balanced even when
        # page cost correlates with id (deep pages are often heavier)
        for p in range(partition.value, self.n_pages, self.n_parts):
            yield _fake_fetch(p)


class CrawlDataSource(DataSource):
    """`spark.read.format("synthetic_crawl").option("pages", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_crawl"

    def schema(self) -> str:
        return "url string, title string, text string"

    def reader(self, schema) -> CrawlReader:
        return CrawlReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CrawlDataSource)


class CrawlStreamReader(SimpleDataSourceStreamReader):
    """Streaming frontier: each micro-batch fetches the next
    `batchpages` slice of the URL space; the engine persists the page
    offset in the checkpoint, so a stopped/restarted crawl resumes
    exactly where it left off (durable frontier, exactly-once pages —
    the property the reference's in-memory appendUrlList loses on every
    crash, Crawling.py:9-10)."""

    def __init__(self, options: dict) -> None:
        self.batch = int(options.get("batchpages", "10"))
        self.max_pages = int(options.get("pages", "64"))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        s = start["page"]
        e = min(s + self.batch, self.max_pages)
        return ([_fake_fetch(p) for p in range(s, e)], {"page": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after failure: offsets alone reproduce the slice
        return [_fake_fetch(p) for p in range(start["page"], end["page"])]


class CrawlStreamDataSource(DataSource):
    """`spark.readStream.format("synthetic_crawl_stream")...` — the
    frontier as a restartable stream."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_crawl_stream"

    def schema(self) -> str:
        return "url string, title string, text string"

    def simpleStreamReader(self, schema) -> CrawlStreamReader:
        return CrawlStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(CrawlStreamDataSource)
