"""Scale smoke sweep: run EVERY registered query at a given sf dir (default
sf0.1 — 10x the oracle gate's scale) and report failures.  No oracle
comparison (tools/selfcheck.py does that at sf0.01); this catches
scale-sensitive breakage — broadcast assumptions, overflow, skew — in the
queries the bench headline set doesn't cover.

  python tools/sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.suite import QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sweep")
    fails: list[tuple[str, str]] = []
    t0 = time.time()
    for name, fn in sorted(QUERIES.items()):
        t1 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"ok   {name} ({n} rows, {time.time() - t1:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, str(e).splitlines()[0][:160]))
            print(f"FAIL {name}: {fails[-1][1]}")
    print(
        f"\nswept {len(QUERIES)} queries at {sf_dir} "
        f"in {time.time() - t0:.1f}s, {len(fails)} failures"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
