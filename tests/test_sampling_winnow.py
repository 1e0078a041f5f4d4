"""Round-2 additions: winnowing, meta-blocking, temperature mixing,
random projection, gap fill."""

import math

from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators.asof import gap_fill
from entityresolution_capstone_spark.operators.blocking import (
    BlockingConfig,
    metablock_pairs,
)
from entityresolution_capstone_spark.operators.dedup import temperature_sample
from entityresolution_capstone_spark.operators.similarity_search import (
    IVF_QUANT,
    random_project,
)
from entityresolution_capstone_spark.operators.textstats import winnow_fingerprints


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_winnow_shared_run_guarantee(spark):
    # two docs share a run of >= w+k-1 = 8 tokens -> must share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (1, "one two " + shared + " end1a end1b"),
            (2, "three four five " + shared),
            (3, "totally different words here nothing shared at all"),
        ],
    )
    fp = winnow_fingerprints(docs, k=4, w=5).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_winnow_bounds_and_determinism(spark):
    text = " ".join(f"t{i % 13}" for i in range(40))
    docs = _docs(spark, [(1, text)])
    out1 = sorted(map(tuple, winnow_fingerprints(docs, k=4, w=5).collect()))
    out2 = sorted(map(tuple, winnow_fingerprints(docs, k=4, w=5).collect()))
    assert out1 == out2
    n_grams = 40 - 4 + 1
    n_windows = n_grams - 5 + 1
    assert 1 <= len(out1) <= n_windows
    for _, pos, h in out1:
        assert 0 <= pos < n_grams
        assert 0 <= h < 2147483647


def test_winnow_short_doc_empty(spark):
    docs = _docs(spark, [(1, "a b c")])  # 3 tokens < k+w-1 -> no full window
    assert winnow_fingerprints(docs, k=4, w=5).count() == 0


# ---------------------------------------------------------------------------
# meta-blocking (WNP over CBS weights)
# ---------------------------------------------------------------------------

def test_metablock_matches_bruteforce(spark):
    assignments = [
        ("a", ["b1", "b2", "b3"]),
        ("b", ["b1", "b2"]),
        ("c", ["b1", "b3"]),
        ("d", ["b2"]),
        ("e", ["b3", "b4"]),
        ("f", ["b4"]),
    ]
    rows = [(cid, k) for cid, keys in assignments for k in keys]
    blocks = spark.createDataFrame(rows, ["conv_id", "block_key"])
    cfg = BlockingConfig(max_block_size=100)
    got = {
        (r["id1"], r["id2"]): r["weight"]
        for r in metablock_pairs(blocks, cfg).collect()
    }

    # brute force WNP
    keys = dict(assignments)
    ids = sorted(keys)
    w = {}
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            c = len(set(keys[u]) & set(keys[v]))
            if c:
                w[(u, v)] = c
    node_edges = {}
    for (u, v), c in w.items():
        node_edges.setdefault(u, []).append(c)
        node_edges.setdefault(v, []).append(c)
    expected = {
        (u, v): c
        for (u, v), c in w.items()
        if c >= sum(node_edges[u]) / len(node_edges[u])
        or c >= sum(node_edges[v]) / len(node_edges[v])
    }
    assert got == expected
    # sanity: pruning actually removed at least one edge
    assert len(got) < len(w)


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------

def _domain_df(spark):
    rows = (
        [(i, "small") for i in range(8)]
        + [(100 + i, "mid") for i in range(32)]
        + [(1000 + i, "big") for i in range(128)]
    )
    return spark.createDataFrame(rows, ["doc_id", "domain"])


def test_temperature_sample_fracs_and_floor(spark):
    out = temperature_sample(_domain_df(spark), "domain", key_col="doc_id", alpha=0.5)
    rows = out.collect()
    fracs = {r["domain"]: r["keep_frac"] for r in rows}
    assert fracs["small"] == 1.0
    assert fracs["mid"] == round(math.sqrt(8 / 32), 6)
    assert fracs["big"] == round(math.sqrt(8 / 128), 6)
    # smallest domain kept whole
    assert all(r["kept"] for r in rows if r["domain"] == "small")
    # head domain actually downsampled
    big_kept = sum(r["kept"] for r in rows if r["domain"] == "big")
    assert 0 < big_kept < 128


def test_temperature_sample_alpha_monotone(spark):
    df = _domain_df(spark)
    kept_lo = {
        r["doc_id"]
        for r in temperature_sample(df, "domain", key_col="doc_id", alpha=0.25).collect()
        if r["kept"]
    }
    kept_hi = {
        r["doc_id"]
        for r in temperature_sample(df, "domain", key_col="doc_id", alpha=0.75).collect()
        if r["kept"]
    }
    assert kept_lo <= kept_hi  # raising alpha strictly grows the sample


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------

def test_random_project_exact_values(spark):
    vec = [0.5, -1.25, 2.0]
    df = spark.createDataFrame([(7, vec)], ["vec_id", "embedding"])
    out = {r["out_dim"]: r["value"] for r in random_project(df, out_dim=4).collect()}
    assert len(out) == 4
    q = [math.floor(x * IVF_QUANT + 0.5) for x in vec]
    for j in range(4):
        y = sum(q[i] * (((j * 131 + i * 137 + 41) % 17) - 8) for i in range(3))
        assert out[j] == round(y / IVF_QUANT, 6)


def test_random_project_preserves_relative_distance(spark):
    # identical vectors project identically; a far vector stays far
    a = [1.0] * 16
    b = [1.0] * 16
    c = [-1.0] * 16
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["vec_id", "embedding"]
    )
    rows = random_project(df, out_dim=6).collect()
    p = {}
    for r in rows:
        p.setdefault(r["id"], {})[r["out_dim"]] = r["value"]
    assert p[1] == p[2]
    d13 = sum((p[1][j] - p[3][j]) ** 2 for j in range(6))
    assert d13 > 0


# ---------------------------------------------------------------------------
# gap fill
# ---------------------------------------------------------------------------

def test_gap_fill_locf(spark):
    rows = [
        ("u1", "2024-01-01 00:00:00", 3, 1.5),
        ("u1", "2024-01-01 03:00:00", 7, 9.0),
        ("u2", "2024-01-01 05:00:00", 1, 2.0),
    ]
    obs = spark.createDataFrame(rows, ["k", "h", "n", "v"]).withColumn(
        "h", F.to_timestamp("h")
    )
    out = gap_fill(obs, "k", "h", ["n", "v"]).collect()
    got = {(r["k"], r["h"].hour): (r["n"], r["v"], r["filled"]) for r in out}
    assert got[("u1", 0)] == (3, 1.5, False)
    assert got[("u1", 1)] == (3, 1.5, True)   # carried
    assert got[("u1", 2)] == (3, 1.5, True)   # carried
    assert got[("u1", 3)] == (7, 9.0, False)
    assert got[("u2", 5)] == (1, 2.0, False)
    assert len(got) == 5  # u2 has a single-point span: no synthesized rows
