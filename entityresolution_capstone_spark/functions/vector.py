"""Codegen-safe dense-vector primitives over ``array<double>`` columns.

Why this module exists (round-3 measured law, docs/SCALE.md): Spark's
higher-order array expressions — ``zip_with``, ``aggregate``, ``exists``,
``transform``, ``array_intersect`` — are *interpreted* (codegen-fallback)
and allocate per row. On wide streams (the quadratic candidate-pair stream,
a corpus×queries score stream) they anti-scale at high in-JVM concurrency:
identical output measured 627.6s (array HOFs) vs 40.3s (static expressions)
at sf0.1 / local[32]. The fix is always the same: when the vector dimension
is a PLAN-TIME CONSTANT, unroll the loop into a static scalar expression —
``element_at`` ordinal access + multiply-adds stay inside whole-stage
codegen with zero per-row allocation.

Numeric contract: all folds are STRICT LEFT-TO-RIGHT (``((t1+t2)+t3)+…``),
the same association order as ``zip_with``+``aggregate`` and as DuckDB's
``list_dot_product`` — so swapping an interpreted dot for a static one is
bit-identical, and the DuckDB correctness oracles keep matching without
re-rounding.

Dim ceiling: each dot is ~2·dim expression nodes. Past a few hundred dims
the generated projection risks the JVM 64 KB method limit / codegen split
thresholds and can silently fall back to interpreted evaluation — the exact
failure mode this module exists to avoid — so :data:`MAX_STATIC_DIM` is
enforced. For wider embeddings use :func:`pandas_dot` (Arrow-batched NumPy,
the other scale-safe path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Practical whole-stage-codegen ceiling for one unrolled dot product.
# 256 dims ≈ 512 multiply-add nodes: comfortably inside Spark's expression
# splitting (spark.sql.codegen.methodSplitThreshold default 1024) and far
# from the 64 KB JVM method limit. Wider vectors must take the Arrow path.
MAX_STATIC_DIM = 256


def _check_dim(dim: int) -> None:
    if not isinstance(dim, int) or dim <= 0:
        raise ValueError(f"dim must be a positive int, got {dim!r}")
    if dim > MAX_STATIC_DIM:
        raise ValueError(
            f"static vector expressions support dim <= {MAX_STATIC_DIM} "
            f"(got {dim}); use functions.vector.pandas_dot (Arrow-batched "
            "NumPy) for wider embeddings"
        )


def static_dot(a, b, dim: int) -> Column:
    """Σ_i a[i]·b[i] as a static whole-stage-codegen expression.

    Strict left-to-right summation — bit-identical to the
    ``aggregate(zip_with(a, b, *))`` interpreted form it replaces and to
    DuckDB ``list_dot_product``.
    """
    _check_dim(dim)
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    dot = None
    for i in range(dim):
        term = F.element_at(a, i + 1) * F.element_at(b, i + 1)
        dot = term if dot is None else dot + term
    return dot


def static_sq_norm(a, dim: int) -> Column:
    """Σ_i a[i]² (left-to-right), static."""
    _check_dim(dim)
    a = F.col(a) if isinstance(a, str) else a
    out = None
    for i in range(dim):
        x = F.element_at(a, i + 1)
        term = x * x
        out = term if out is None else out + term
    return out


def static_norm(a, dim: int) -> Column:
    """√(Σ a[i]²), static — matches ``sqrt(aggregate(v, 0.0, acc + x·x))``."""
    return F.sqrt(static_sq_norm(a, dim))


def static_weighted_sum(a, weights, dim: int) -> Column:
    """Σ_i a[i]·w_i for PLAN-TIME-CONSTANT scalar weights (e.g. LSH plane
    coefficients): each weight is folded as a literal, so the whole dot is
    constant-foldable scalar algebra. Left-to-right over ALL dims (zero
    weights included) to preserve bit-parity with full-sum oracles."""
    _check_dim(dim)
    if len(weights) != dim:
        raise ValueError(f"got {len(weights)} weights for dim={dim}")
    a = F.col(a) if isinstance(a, str) else a
    out = None
    for i, w in enumerate(weights):
        term = F.element_at(a, i + 1) * F.lit(w)
        out = term if out is None else out + term
    return out


def assert_dim(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Fail LOUDLY (not silently-NULL) when any vector's length ≠ dim.

    Under non-ANSI Spark, ``element_at`` past the array end returns NULL and
    a static dot silently degrades to NULL → downstream ``cosine`` becomes
    0.0 — for a decontamination operator that reads as "everything clean",
    a safety-critical false negative. This guard turns a dim mismatch into
    a raised error at scan time via ``raise_error`` inside the projection
    (no extra aggregate job; the check rides the existing scan)."""
    v = F.col(vec_col)
    return df.withColumn(
        vec_col,
        F.when(
            F.size(v) == dim, v
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"vector column '{vec_col}': expected dim {dim}, got "),
                    F.size(v).cast("string"),
                )
            )
        ),
    )


def _ordered_rowwise_dot(mx: np.ndarray, my: np.ndarray) -> np.ndarray:
    """Rowwise Σ_i x[i]·y[i], accumulated STRICTLY LEFT-TO-RIGHT across dims
    (vectorized across rows): ``((t1+t2)+t3)+…`` — the same association order
    as :func:`static_dot`, ``aggregate(zip_with(...))`` and DuckDB
    ``list_dot_product``, so results are bit-identical, not merely close.
    ``np.einsum``/``np.dot`` use pairwise/SIMD summation and are NOT; a dim-
    length loop of vectorized adds costs ~dim batch-ops, which the Arrow
    transfer already dwarfs."""
    acc = mx[:, 0] * my[:, 0]
    for k in range(1, mx.shape[1]):
        acc = acc + mx[:, k] * my[:, k]
    return acc


def pandas_dot(a, b, dim: int | None = None) -> Column:
    """Arrow-batched NumPy dot — the scale path for wide vectors and for
    large pair streams (measured at sf-agnostic 2.44M pairs × dim 64,
    local[32]: 5.0s vs 9.1s for the static unroll; the gap widens with dim).

    Per batch: stack the two list columns into (n, dim) float64 matrices and
    left-fold across dims (:func:`_ordered_rowwise_dot`) — bit-identical to
    :func:`static_dot` and to DuckDB ``list_dot_product``, so oracles keep
    matching without re-rounding.
    """
    @pandas_udf("double")
    def _dot(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        mx = np.asarray(x.tolist(), dtype="float64")
        my = np.asarray(y.tolist(), dtype="float64")
        return pd.Series(_ordered_rowwise_dot(mx, my))

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _dot(a, b)


def pandas_cosine(a, b) -> Column:
    """Arrow-batched cosine: dot(a,b) / (‖a‖·‖b‖) in ONE UDF (one Arrow
    transfer for all three folds). Each fold is the ordered left-fold and the
    norms are √(left-fold of squares) — bit-identical to the static
    composition ``static_dot / (static_norm · static_norm)`` on every
    nonzero-norm pair (verified mismatch-free over a 2.44M-pair stream).
    Non-finite divergence: NumPy division is raw IEEE, so a zero-norm side
    (0/0) or an overflowed norm (inf/inf) yields NaN, which the Arrow
    serializer surfaces as Spark NULL — the pair then fails any
    ``>= threshold`` filter, i.e. is dropped. The static composition under
    ANSI Spark (the session default) instead raises divideByZero on a
    zero norm and yields NaN (not NULL) on overflow."""
    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        mx = np.asarray(x.tolist(), dtype="float64")
        my = np.asarray(y.tolist(), dtype="float64")
        num = _ordered_rowwise_dot(mx, my)
        with np.errstate(divide="ignore", invalid="ignore"):
            den = np.sqrt(_ordered_rowwise_dot(mx, mx)) * np.sqrt(
                _ordered_rowwise_dot(my, my)
            )
            return pd.Series(num / den)

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)


def pandas_cosine_guarded(a, b) -> Column:
    """:func:`pandas_cosine` with the zero-norm guard used by similarity
    search: a zero-norm side yields cosine 0.0 (not NULL/NaN/raise) —
    bit-identical to the static composition
    ``when((n1 > 0) & (n2 > 0), dot/(n1·n2)).otherwise(0.0)`` on nonzero
    norms and to its guard on zero norms. (Sole divergence: if both norms
    are so small their PRODUCT underflows to 0 while each is > 0, the static
    form divides by zero — ANSI raise — where this returns 0.0.)"""
    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        mx = np.asarray(x.tolist(), dtype="float64")
        my = np.asarray(y.tolist(), dtype="float64")
        num = _ordered_rowwise_dot(mx, my)
        den = np.sqrt(_ordered_rowwise_dot(mx, mx)) * np.sqrt(
            _ordered_rowwise_dot(my, my)
        )
        return pd.Series(np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0))

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)


def dot(a, b, dim: int) -> Column:
    """Dim-dispatching dot product: static unroll when it fits codegen,
    Arrow/NumPy beyond."""
    if dim <= MAX_STATIC_DIM:
        return static_dot(a, b, dim)
    return pandas_dot(a, b, dim)
