"""Fellegi-Sunter probabilistic record linkage with EM-fitted m/u weights.

The classical probabilistic counterpart of the reference's deterministic
weighted-kernel scoring (reference core/resolver.py scores pairs with fixed
attribute weights): each candidate pair is reduced to a boolean agreement
vector gamma over K comparison fields; matches and non-matches are modeled as
a two-class mixture with per-field agreement probabilities m_k = P(gamma_k |
match) and u_k = P(gamma_k | non-match), fitted by EM without labels
(Fellegi & Sunter 1969, JASA; the unlabeled-EM formulation follows Winkler
1988 and the open-source Splink documentation). A pair's match weight is
log2 of its likelihood ratio.

Scale shape: the ONLY pass over the (potentially 10^10-row) pair set is one
groupBy over the K boolean fields — at most 2^K result rows. EM itself runs
driver-side on that contingency table (the legitimate scalar-aggregate
collect class: patterns ≪ pairs, bounded by 2^K regardless of data size),
and scoring is a broadcast join of the fitted 2^K-row pattern table back
onto the pairs.

Exactness discipline (same as evaluate.bcubed / similarity_search.ivf_index):
the E-step posterior is frozen to integer nano-units (floor(w * 1e9 + 0.5))
each round, so every M-step sum is an exact int64 sum and the whole EM
trajectory is bit-reproducible in the ANSI-SQL oracle — no dependence on
summation order anywhere. All products/divisions are fixed expression trees
evaluated identically by CPython and the SQL engine on identical doubles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 10**9


@dataclass
class FSParams:
    lam: float
    m: list[float]
    u: list[float]
    # final E-step per pattern: (gamma tuple, n, wq nano-units, m-prod, u-prod)
    patterns: list[tuple[tuple[bool, ...], int, int, float, float]]


def pattern_counts(vectors: DataFrame, fields: list[str]) -> DataFrame:
    """The one distributed pass: (gamma_1..gamma_K, n) — ≤ 2^K rows."""
    return vectors.groupBy(*fields).agg(F.count("*").cast("long").alias("n"))


def _products(g: tuple[bool, ...], m: list[float], u: list[float]):
    mp = up = None
    for k, gk in enumerate(g):
        tm = m[k] if gk else 1.0 - m[k]
        tu = u[k] if gk else 1.0 - u[k]
        mp = tm if mp is None else mp * tm  # left-assoc, matches SQL e1*e2*e3
        up = tu if up is None else up * tu
    return mp, up


def _estep(pats, lam, m, u):
    out = []
    for g, n in pats:
        mp, up = _products(g, m, u)
        num = lam * mp
        den = num + (1.0 - lam) * up
        w = num / den
        wq = int(math.floor(w * NANO + 0.5))
        out.append((g, n, wq, mp, up))
    return out

def _mstep(e, k_fields: int):
    s1 = sum(n * wq for _, n, wq, _, _ in e)
    s0 = sum(n * (NANO - wq) for _, n, wq, _, _ in e)
    n_tot = sum(n for _, n, _, _, _ in e)
    lam = float(s1) / (float(n_tot) * 1e9)
    m, u = [], []
    for k in range(k_fields):
        mn = sum(n * wq for g, n, wq, _, _ in e if g[k])
        un = sum(n * (NANO - wq) for g, n, wq, _, _ in e if g[k])
        m.append(float(mn) / float(s1) if s1 else 0.0)
        u.append(float(un) / float(s0) if s0 else 0.0)
    return lam, m, u


def fs_em(
    pats: list[tuple[tuple[bool, ...], int]],
    rounds: int = 3,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> FSParams:
    """EM over the pattern contingency: ``rounds`` M-step updates, then one
    final E-step whose posteriors/products feed the reported weights."""
    k_fields = len(pats[0][0])
    lam, m, u = lam0, [m0] * k_fields, [u0] * k_fields
    for _ in range(rounds):
        e = _estep(pats, lam, m, u)
        lam, m, u = _mstep(e, k_fields)
    return FSParams(lam, m, u, _estep(pats, lam, m, u))


def fs_fit(
    vectors: DataFrame,
    fields: list[str],
    rounds: int = 3,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> tuple[FSParams, DataFrame]:
    """Fit on a comparison-vector DataFrame; returns (params, pattern table).

    The pattern table has one row per observed gamma: (fields..., n_pairs,
    p_match, match_weight) — p_match is the EM posterior (frozen nano-units /
    1e9), match_weight = log2(P(gamma|M) / P(gamma|U)).
    """
    rows = pattern_counts(vectors, fields).collect()
    pats = [(tuple(bool(r[f]) for f in fields), int(r["n"])) for r in rows]
    pats.sort()  # deterministic driver-side order (sums are exact anyway)
    params = fs_em(pats, rounds, lam0, m0, u0)
    spark = vectors.sparkSession
    # p_match boundary discipline: wq/1e9 has exactly 9 decimals, so rounding
    # to 6 hits an exact .5 whenever wq % 1000 == 500 — Python's banker's
    # round and SQL's half-away would then disagree. floor(x/1000 + 0.5) is
    # the same exact integer step on both engines (wq/1000.0 is a correctly
    # rounded division of an int < 2^30 — the .5 cases are dyadic and exact).
    out = [
        (
            *g,
            n,
            math.floor(wq / 1000.0 + 0.5) / 1e6,
            round(math.log2(mp / up), 6),
        )
        for g, n, wq, mp, up in params.patterns
    ]
    schema = (
        ", ".join(f"{f} boolean" for f in fields)
        + ", n_pairs long, p_match double, match_weight double"
    )
    return params, spark.createDataFrame(out, schema)


def fs_score(
    vectors: DataFrame, pattern_table: DataFrame, fields: list[str]
) -> DataFrame:
    """Attach (p_match, match_weight) to every pair by its gamma pattern —
    a broadcast join on the ≤ 2^K-row fitted table; the pair set never
    re-aggregates."""
    return vectors.join(
        F.broadcast(pattern_table.drop("n_pairs")), fields, "left"
    )
