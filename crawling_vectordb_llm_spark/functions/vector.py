"""Vector column expressions — pure Spark SQL (JVM, whole-stage codegen).

The reference delegates vector math to the VectorDB service: COSINE metric
declared at index DDL (reference TencentVDB.py:46), searched via HNSW
(main_server.py:41).  Here cosine/dot/norm are built from `zip_with` +
`aggregate` so they run inside codegen — no Python in the hot path.  The
numpy batch path (operators/knn.py) is used only where a matrix-multiply
genuinely beats per-row expressions (many-query × many-doc top-k).

All math is done in float64 regardless of the storage type (fixtures store
float32) so results are reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right sum — same order DuckDB uses, so the oracle
    comparison is bit-stable before rounding."""
    a, b = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """COSINE similarity (reference metric, TencentVDB.py:46)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Normalize at ingest so cosine degrades to a dot product downstream —
    the batch analog of the reference's index-build-time normalization.

    The norm is BOUND via array_repeat before entering the lambda: a
    lambda that captures an outer aggregate re-evaluates it once per
    element (no common-subexpression elimination inside higher-order
    functions) — O(dim^2) per vector, measured 190x slower at the
    reference's dim=1024 (TencentVDB.py:46)."""
    a = as_double_array(a)
    n = l2_norm(a)
    return F.when(
        n > 0,
        F.zip_with(a, F.array_repeat(n, F.size(a)), lambda x, nn: x / nn),
    ).otherwise(a)


def int8_scale(a: Column | str) -> Column:
    """Per-vector symmetric int8 scale: max|x| / 127, floored at 1e-12 so
    all-zero vectors quantize to zeros instead of dividing by zero."""
    e = as_double_array(a)
    return F.greatest(
        F.array_max(F.transform(e, F.abs)) / F.lit(127.0), F.lit(1e-12)
    )


def int8_quantize(a: Column | str, scale: Column) -> Column:
    """Symmetric int8 quantization: q = floor(x/scale + 0.5).

    floor(+0.5) instead of round() so Spark and any SQL oracle share one
    rounding rule (round() is HALF_UP in Spark, HALF_EVEN in DuckDB).
    |x/scale| <= 127 by construction of the scale, so the arithmetic is
    ANSI-safe.  At 100 TB this is the storage op that turns a 4 KB
    float32[1024] embedding (reference dimension, TencentVDB.py:46,49)
    into 1 KB + one float — 4x less shuffle and scan volume for ANN
    candidate generation; rerank reads the float column for the top
    candidates only."""
    e = as_double_array(a)
    # scale bound via array_repeat — a captured scale Column would be
    # re-evaluated per element inside the lambda (see l2_normalize)
    return F.zip_with(
        e,
        F.array_repeat(scale, F.size(e)),
        lambda x, s: F.floor(x / s + F.lit(0.5)).cast("int"),
    )


def sign_pack_words(a: Column | str, dim: int) -> Column:
    """Binary (1-bit) quantization: pack the vector's sign bits into
    array<bigint> words of 32 bits each — dim/32 words, 32x smaller than
    float32.  Hamming distance between two packed vectors is then
    sum(bit_count(w_a XOR w_b)) per word, fully codegen (see
    hamming_distance).  32-bit words inside BIGINTs keep every shift
    below the sign bit, so the packing is bit-identical in any engine.

    The cheapest rung of the quantization ladder (sign < int8 < PQ <
    float): at 100 TB the packed column is the scan target for candidate
    generation, reranked exactly on the shortlist."""
    if dim % 32:
        raise ValueError(f"dim {dim} not a multiple of 32")
    e = as_double_array(a)
    words = [
        F.aggregate(
            F.zip_with(
                F.slice(e, k * 32 + 1, 32),
                F.sequence(F.lit(0), F.lit(31)),
                # call_function: PySpark's shiftleft wrapper only accepts a
                # literal shift amount, the SQL function takes a column
                lambda x, i: F.when(
                    x > 0,
                    F.call_function("shiftleft", F.lit(1).cast("bigint"), i),
                ).otherwise(F.lit(0).cast("bigint")),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        for k in range(dim // 32)
    ]
    return F.array(*words)


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two sign_pack_words columns: per-word
    XOR + popcount, summed — pure codegen, no Python."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
