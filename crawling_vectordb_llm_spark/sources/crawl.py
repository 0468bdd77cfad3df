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


#: HTML void elements — they never close, so they must not contribute to
#: the open-tag depth while capturing a matched subtree.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Step:
    """One compound selector: tag (None = any/'*'), classes (ALL must be
    present), id, and [attr op value] conditions."""

    __slots__ = ("tag", "classes", "id", "attrs")

    def __init__(self, tag, classes, id_, attrs):
        self.tag, self.classes, self.id, self.attrs = tag, classes, id_, attrs

    def matches(self, el) -> bool:
        tag, classes, id_, attrs = el
        if self.tag and tag != self.tag:
            return False
        if self.classes and not self.classes <= classes:
            return False
        if self.id and id_ != self.id:
            return False
        for name, op, val in self.attrs:
            got = attrs.get(name)
            if got is None:
                return False
            if op == "=" and got != val:
                return False
            if op == "^=" and not got.startswith(val):
                return False
            if op == "$=" and not got.endswith(val):
                return False
            if op == "*=" and val not in got:
                return False
            if op == "~=" and val not in got.split():
                return False
        return True


_ATOM_RE = None  # compiled lazily (module import stays cheap on executors)


def _compile_selector(selector: str) -> list[tuple[str, _Step]]:
    """CSS subset → [(combinator, step)] matched right-to-left.

    Supported without bs4: tag / '*' / .class (several) / #id /
    [attr] [attr=v] [attr^=v] [attr$=v] [attr*=v] [attr~=v] (value
    optionally quoted) compounded freely, joined by descendant (space)
    and child ('>') combinators.  Rejected (need bs4): selector lists
    (','), sibling combinators ('+'/'~'), pseudo-classes/elements (':').
    The first step's combinator slot is ''."""
    import re as _re

    global _ATOM_RE
    if _ATOM_RE is None:
        _ATOM_RE = _re.compile(
            r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
            r"(?P<quals>(?:\.[\w-]+|#[\w-]+|\[[^\]]+\])*)"
        )
    err = (
        f"unsupported selector {selector!r}: without bs4 the stdlib engine "
        "covers tag/*/.class/#id/[attr(=^$*~)val] compounds with descendant "
        "and '>' combinators; selector lists, sibling combinators and "
        "pseudo-classes need bs4"
    )
    s = (selector or "").strip()
    if not s:
        raise ValueError(err)
    steps: list[tuple[str, _Step]] = []
    i, comb = 0, ""
    while i < len(s):
        m = _ATOM_RE.match(s, i)
        if not m or m.end() == i or (not m.group("tag") and not m.group("quals")):
            raise ValueError(err)
        tag = m.group("tag")
        tag = None if tag in (None, "*") else tag.lower()
        classes, id_, attrs = set(), None, []
        for qm in _re.finditer(
            r"\.(?P<cls>[\w-]+)|#(?P<id>[\w-]+)|\[(?P<attr>[^\]]+)\]",
            m.group("quals"),
        ):
            if qm.group("cls"):
                classes.add(qm.group("cls"))
            elif qm.group("id"):
                id_ = qm.group("id")
            else:
                am = _re.fullmatch(
                    r"\s*(?P<n>[\w-]+)\s*(?:(?P<op>[\^\$\*~]?=)\s*"
                    r"(?P<v>\"[^\"]*\"|'[^']*'|[^\s\]]*)\s*)?",
                    qm.group("attr"),
                )
                if not am:
                    raise ValueError(err)
                val = am.group("v")
                if val and val[0] in "\"'":
                    val = val[1:-1]
                attrs.append(
                    (am.group("n").lower(), am.group("op") or "", val or "")
                )
        steps.append((comb, _Step(tag, classes, id_, attrs)))
        i = m.end()
        ws = _re.match(r"\s*(>)?\s*", s[i:])
        nxt = ws.group(0)
        if i + len(nxt) >= len(s):
            if ws.group(1):
                raise ValueError(err)  # dangling '>'
            break
        if not nxt:
            raise ValueError(err)  # e.g. ',', '+', '~', ':' hit the atom re
        comb = ">" if ws.group(1) else " "
        i += len(nxt)
    if not steps:
        raise ValueError(err)
    return steps


def _chain_matches(steps, stack) -> bool:
    """Right-to-left CSS matching with backtracking over the open-element
    stack (descendant steps may need a FARTHER ancestor when the nearest
    candidate has no matching context above it)."""

    def rec(si: int, ei: int) -> bool:
        if not steps[si][1].matches(stack[ei]):
            return False
        if si == 0:
            return True
        if steps[si][0] == ">":
            return ei > 0 and rec(si - 1, ei - 1)
        return any(rec(si - 1, j) for j in range(ei - 1, -1, -1))

    return rec(len(steps) - 1, len(stack) - 1)


def select_text(html: str, selector: str) -> str | None:
    """First-match text content for the supported CSS subset, via the
    stdlib HTML parser — nested-markup-correct (capture ends when the
    matched element leaves the open-element stack, which also survives
    stray/missing end tags), unlike a non-greedy regex which stops at the
    first same-tag close.  The bs4-backed path in `extract_content`
    supersedes this when bs4 is importable."""
    from html.parser import HTMLParser

    steps = _compile_selector(selector)

    class _Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.stack: list[tuple] = []  # (tag, classes, id, attrs)
            self.capture_at: int | None = None
            self.done = False
            self.out: list[str] = []

        def handle_starttag(self, tag: str, attrs) -> None:
            if self.done or tag in _VOID_TAGS:
                return
            d = {k: (v or "") for k, v in attrs}
            self.stack.append(
                (tag, set((d.get("class") or "").split()), d.get("id"), d)
            )
            if self.capture_at is None and _chain_matches(steps, self.stack):
                self.capture_at = len(self.stack)

        def handle_endtag(self, tag: str) -> None:
            if self.done or tag in _VOID_TAGS:
                return
            # recovery: pop to the nearest matching open tag; ignore
            # stray end tags entirely
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i][0] == tag:
                    del self.stack[i:]
                    break
            if self.capture_at is not None and len(self.stack) < self.capture_at:
                self.capture_at = None
                self.done = True

        def handle_data(self, data: str) -> None:
            if self.capture_at is not None:
                self.out.append(data)

    p = _Extract()
    p.feed(html or "")
    p.close()
    return "".join(p.out) if (p.done or p.capture_at is not None) else None


def make_selector_fn(selector: str):
    """Build the per-row text-selection callable: bs4 (full CSS grammar)
    when importable, else the stdlib `select_text` engine — in which case
    the selector is validated HERE, so combinator/attribute selectors
    fail fast at plan time with the bs4 guidance instead of per-row in a
    worker.  Returns (fn, engine_name) — engine_name is asserted in
    tests so both paths stay explicitly covered."""
    try:
        from bs4 import BeautifulSoup  # noqa: PLC0415

        def sel(html: str) -> str | None:
            nodes = BeautifulSoup(html or "", "html.parser").select(selector)
            return nodes[0].get_text() if nodes else None

        return sel, "bs4"
    except ImportError:
        _compile_selector(selector)

        def sel(html: str) -> str | None:
            return select_text(html, selector)

        return sel, "stdlib"


def extract_content(
    pages: DataFrame, html_col: str = "html", selector: str | None = None
) -> DataFrame:
    """S2/P6: select the content element and strip tags (BeautifulSoup
    `select("div.J-markdown-box")[0].get_text()`, Crawling.py:41-44).

    selector=None (default): the fixture's fixed `div.content` pattern via
    a JVM regex extract + tag strip — exact for that flat markup and fully
    codegen (no Python in the hot path).

    selector given: general CSS selection in a mapInPandas stage — bs4
    (full CSS grammar) when importable, else a stdlib-HTMLParser engine for
    simple selectors that is nested-markup-correct (`select_text`).
    Without bs4, unsupported selectors are rejected EAGERLY here (plan
    time, driver-side) rather than per-row inside a worker."""
    if selector is None:
        content = F.regexp_extract(
            F.col(html_col), r'<div class="content">(.*?)</div>', 1
        )
        return pages.withColumn("text", F.regexp_replace(content, r"<[^>]+>", " "))

    make_selector_fn(selector)  # eager validation (raises on reject path)

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sel, _engine = make_selector_fn(selector)
        for pdf in it:
            pdf = pdf.copy()
            pdf["text"] = [sel(h) for h in pdf[html_col]]
            yield pdf

    from pyspark.sql import types as T

    if "text" in pages.columns:
        pages = pages.drop("text")
    schema = T.StructType(
        list(pages.schema.fields) + [T.StructField("text", T.StringType())]
    )
    return pages.mapInPandas(_extract, schema=schema)


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
    urls: DataFrame, fetcher: FetchFn, url_col: str = "link",
    selector: str | None = None,
) -> DataFrame:
    """Full S1→P7 pipeline: fetch → extract → clean → Document projection
    (id=url, title, text — TencentVDB.py:76-78).  `selector` opts into the
    general CSS extraction path (any markup, any simple selector)."""
    pages = fetch_pages(urls, fetcher, url_col)
    docs = clean_pages(extract_content(pages, selector=selector))
    return docs.select(
        F.col(url_col).alias("id"), F.col("title"), F.col("text")
    )
