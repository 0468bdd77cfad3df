"""Text-analysis column expressions — pure Spark SQL, codegen-friendly.

Generalizes the reference's text cleaning (Crawling.py:44-46: strip, truncate
6000, collapse newlines) into the analysis ops a training-data pipeline needs:
token counting, quality scoring, language-ID features, fingerprinting.  All
deterministic and SQL-expressible so every op gets a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small language-agnostic stopword list used by quality/lang-id features
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with")

CLEAN_TRUNCATE_CHARS = 6000  # Crawling.py:45


def clean_text(c: Column | str) -> Column:
    """P4+P5: truncate to 6000 chars, collapse whitespace runs."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.substring(c, 1, CLEAN_TRUNCATE_CHARS), r"\s+", " ")


def tokens(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.split(c, " ")


def token_count(c: Column | str) -> Column:
    """Whitespace token count (the LLM-budget estimator's cheap path)."""
    return F.size(tokens(c))


def word_char_tokens(c: Column | str) -> Column:
    """BPE-ish segmentation: letter runs, digit runs, single punctuation —
    a deterministic stand-in for a real tokenizer's pre-tokenization."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def stopword_count(c: Column | str) -> Column:
    return F.size(F.filter(tokens(c), lambda t: t.isin(*STOPWORDS)))


def stopword_ratio(c: Column | str) -> Column:
    return F.round(stopword_count(c) / F.greatest(token_count(c), F.lit(1)), 6)


def digit_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.round(
        F.regexp_count(c, F.lit("[0-9]")) / F.greatest(F.length(c), F.lit(1)), 6
    )


def avg_word_len(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    non_space = F.length(F.regexp_replace(c, " ", ""))
    return F.round(non_space / F.greatest(token_count(c), F.lit(1)), 6)


def quality_score(c: Column | str) -> Column:
    """Composite [0,1]-ish quality heuristic: long-enough, word-shaped,
    stopword-bearing text scores high.  Weights are arbitrary but fixed —
    the op is the point, and it is oracle-checked."""
    c = F.col(c) if isinstance(c, str) else c
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * stopword_ratio(c) + 0.2 * (1 - digit_ratio(c)), 6
    )


def fingerprint(c: Column | str, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive rolling document fingerprint: polynomial hash over
    per-token primitives (len, first char).  Deterministic, overflow-free
    (values stay < mod * 31 + small), and expressible in both engines."""
    h = F.aggregate(
        tokens(c),
        F.lit(0).cast("bigint"),
        lambda acc, t: (
            acc * 31 + F.length(t) * 17 + F.coalesce(F.ascii(t), F.lit(0))
        )
        % mod,
    )
    return h


def nfc_normalize(c: Column | str) -> Column:
    """Unicode NFC normalization — canonical composition so byte-level ops
    (hashing, exact dedup, shingling) agree across sources that emit
    composed vs decomposed forms ('é' as U+00E9 vs 'e'+U+0301 hash apart
    without this; a crawl mixing CMSes will contain both).

    Spark has no built-in normalizer, so this is an Arrow-batched pandas
    UDF over stdlib unicodedata — the sanctioned slow path (SURVEY §2.5
    UDF row), map-only, no state.  ASCII fast path: unicodedata.is_normalized
    is O(n) scan-and-skip for already-NFC text, which dominates real
    corpora, so the UDF is cheap where it matters.
    """
    import unicodedata

    import pandas as pd

    def _nfc_series(s: "pd.Series") -> "pd.Series":
        return s.map(
            lambda t: t
            if t is None or unicodedata.is_normalized("NFC", t)
            else unicodedata.normalize("NFC", t)
        )

    _nfc_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = F.pandas_udf(_nfc_series, "string")
    return _nfc(F.col(c) if isinstance(c, str) else c)


def canonicalize_url(c: Column | str) -> Column:
    """Crawl-frontier URL canonicalization — pure regexp/string exprs so
    an external oracle reproduces it exactly.

    The reference's frontier builds URLs by naive concat (Crawling.py:26)
    and dedups only by upsert-by-id at the very end (TencentVDB.py:70);
    at crawl scale the frontier itself must collapse URL aliases BEFORE
    fetching, or every tracking-tagged share link refetches the page.
    Rules (each a standard alias class):
      1. scheme + host lowercased (RFC 3986 §6.2.2.1)
      2. fragment dropped (never sent to the server)
      3. utm_* / ref / fbclid tracking params dropped, '?'/'&' re-fixed
      4. default ports (:80/:443) dropped
      5. trailing '/' dropped (root included: host/ == host)

    Every regex below is RE2-safe (no lookaround, no backrefs in the
    pattern) so DuckDB's regexp_replace(..., 'g') is an exact oracle.
    """
    u = F.col(c) if isinstance(c, str) else c
    # 1. lowercase scheme://host[:port] only (path/query stay case-sensitive)
    lowered = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/]*//[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[^/]*//[^/?#]*", ""),
    )
    no_frag = F.regexp_replace(lowered, r"#.*$", "")
    # 3a. strip non-leading tracking params (global), 3b. promote a
    # surviving param past a stripped leading tracker, 3c. drop a bare '?'
    a = F.regexp_replace(no_frag, r"&(?:utm_[a-z]+|ref|fbclid)=[^&]*", "")
    b = F.regexp_replace(a, r"\?(?:utm_[a-z]+|ref|fbclid)=[^&]*&", "?")
    no_track = F.regexp_replace(b, r"\?(?:utm_[a-z]+|ref|fbclid)=[^&]*$", "")
    no_port = F.regexp_replace(
        no_track, r"^(https?://[^/:?#]*):(?:80|443)([/?#]|$)", r"$1$2"
    )
    # /+ not /: 'path//' must canonicalize in ONE pass or the op isn't
    # idempotent (re-crawled frontiers would mutate already-canonical
    # URLs); [^/] guard keeps the scheme's // intact
    return F.regexp_replace(
        no_port, r"([^/])/+(\?|$)", r"$1$2"
    ).alias("canonical_url")
