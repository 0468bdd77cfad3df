"""Bench output contract (VERDICT r13 #8): the one-line JSON the driver
parses must be the LAST thing bench.py prints, as exactly one parseable
line — round 12's driver tail capture cut off before the headline line
and the round lost its round-over-round comparison entirely."""

from __future__ import annotations

import ast
import io
import json
import os
from contextlib import redirect_stdout

import bench


def test_emit_headline_line_is_one_parseable_line():
    payload = {
        "metric": "headline_queries_total_time",
        "value": 1.23,
        "unit": "sec",
        "queries": {"knn_topk": 0.5},
        "sf": 0.1,
        "n": 3,
        "streaming": {"tws": {"rows": 1}},
    }
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.emit_headline_line(payload)
    out = buf.getvalue()
    assert out.endswith("\n") and out.count("\n") == 1
    assert json.loads(out.strip()) == payload


def test_emit_is_the_last_statement_of_main():
    """Source-level pin: no statement follows the emit call in main(), so
    nothing can ever print after the headline line."""
    src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
    tree = ast.parse(src)
    main_fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    last = main_fn.body[-1]
    assert isinstance(last, ast.Expr) and isinstance(last.value, ast.Call)
    assert getattr(last.value.func, "id", "") == "emit_headline_line"


def test_headline_queries_all_registered():
    from crawling_vectordb_llm_spark.suite import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing
