"""Cross-scale datapoint: the same bench at sf0.1 and at a Kx scaled input.

VERDICT r3 item 3: every bench/scaling number so far is sf0.1 (6.2M candidate
pairs); the design arguments for 100-TB readiness need at least one
order-of-magnitude datapoint to catch superlinear blowups (pair-count growth
in q_prefix, the soft-TF-IDF token-pair cross stream, CC round count).

There is no driver-generated sf1 testdata, so this tool builds a
**deterministic weak-scaling input** from sf0.1 (no external data, per the
round rules):

- ``documents``: K copies; copy 0 is sf0.1 verbatim, copy i>0 offsets doc_id
  by ``i * 1_000_000 / 100_000``-free stride (i * N_DOCS) and suffixes every
  word with ``q{i}``. Suffixing remaps each copy into a DISJOINT token space,
  so copies never co-block: the candidate-pair set of the scaled input is
  exactly K unions of the sf0.1 pair set. That makes this a WEAK-SCALING
  probe of the ENGINE — rows, pairs, and dup groups all grow exactly
  linearly by construction, so any superlinear wall growth is the plan's
  fault (shuffle fan-in, window skew, CC rounds), not a data-distribution
  artifact. It deliberately does NOT model how real-corpus skew grows with
  scale — that needs real data.
- ``embeddings``: K copies, vec_id offset, one deterministic fixed-point
  perturbation per copy (+i on one coordinate) so vectors are distinct.

Outputs one JSON line per level plus a growth table; exit code 1 if any
query's growth exponent log(wall_ratio)/log(row_ratio) exceeds
``MAX_EXPONENT`` (1.25 — linear with 25% headroom; sublinear is fine).

Skew mode (``--skew``, VERDICT r4 item 2): the disjoint construction above
deliberately avoids skew GROWTH — but a real 100x corpus grows its hot
blocks superlinearly. ``--skew`` builds both levels with a SHARED Zipf(s)
hot-token dictionary: ~``SKEW_FRAC`` of word positions (chosen
deterministically per (doc, position), identically in every copy) are
replaced by ``zzhot{rank}`` tokens drawn Zipf(s=1.1) over ``SKEW_NHOT``
ranks, while the background vocabulary stays per-copy disjoint. Every hot
block therefore grows exactly Kx in MEMBERS — i.e. ~K²x in raw pairs — the
growth pattern the block-cap/salting machinery exists for. The 1x level is
the SAME transform at K=1, so levels differ only in scale, never in token
statistics. Because caps legitimately bound the EMITTED pair count, the
skew gate reads the wall-growth exponent against the INPUT scale K
(wall_hi/wall_lo <= K^1.25), and the cap/salt/drop metrics at both levels
are committed alongside (``--metrics`` submode runs them per level).

Usage: python tools/cross_scale_bench.py [K] [base_sf_dir] [--skew]
       python tools/cross_scale_bench.py --metrics <sf_dir> <cpus>
Writes BENCH/CROSS_SCALE.json (disjoint) / CROSS_SCALE_SKEW.json (--skew).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.environ.get("ERCS_SCALE_SCRATCH", "/dev/shm/ercs-scale")
MAX_EXPONENT = 1.25

# --skew construction constants (deterministic; see module docstring)
SKEW_S = 1.1        # Zipf exponent over the hot-token ranks
SKEW_NHOT = 1000    # hot dictionary size
SKEW_FRAC = 0.1     # fraction of word positions replaced by hot tokens


def _zipf_cdf(n: int, s: float) -> list[float]:
    w = [1.0 / (r ** s) for r in range(1, n + 1)]
    tot = sum(w)
    acc, cdf = 0.0, []
    for x in w:
        acc += x
        cdf.append(acc / tot)
    return cdf


def build_skewed(k: int, base: str, out_dir: str) -> None:
    """K copies sharing a Zipf(SKEW_S) hot-token dictionary (skew mode).

    Per word position p of doc d: crc32("sel:{d}:{p}") selects ~SKEW_FRAC of
    positions; selected positions become ``zzhot{rank}`` with rank drawn by
    inverse-CDF from crc32("rank:{d}:{p}") — both hashes are COPY-INDEPENDENT,
    so every copy carries the same hot tokens at the same positions and every
    hot block grows exactly Kx in members. Unselected words get the per-copy
    ``q{i}`` suffix (disjoint background vocabulary, as in build_scaled).
    """
    import zlib
    from bisect import bisect_left

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    cdf = _zipf_cdf(SKEW_NHOT, SKEW_S)
    sel_mod = max(1, round(1.0 / SKEW_FRAC))
    tab = pq.read_table(os.path.join(base, "documents.parquet"))
    n_docs = tab.num_rows
    doc_ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    langs = tab.column("lang").to_pylist()
    sources = tab.column("source").to_pylist()

    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(k):
        sfx = f"q{i}" if i else ""
        for d, txt, lg, src in zip(doc_ids, texts, langs, sources):
            words = txt.split()
            for p, w in enumerate(words):
                key = f"{d}:{p}".encode()
                if zlib.crc32(b"sel:" + key) % sel_mod == 0:
                    u = zlib.crc32(b"rank:" + key) / 2**32
                    words[p] = f"zzhot{bisect_left(cdf, u):04d}"
                elif sfx:
                    words[p] = w + sfx
            new_txt = " ".join(words)
            out["doc_id"].append(d + i * n_docs)
            out["text"].append(new_txt)
            out["lang"].append(lg)
            out["source"].append(src)
            out["n_chars"].append(len(new_txt))
    pq.write_table(
        pa.table(out), os.path.join(out_dir, "documents.parquet")
    )
    _write_embeddings(k, base, out_dir)


def _write_embeddings(k: int, base: str, out_dir: str) -> None:
    """K deterministic distinct copies of embeddings (shared by both modes)."""
    import duckdb

    con = duckdb.connect()
    n_vecs = con.execute(
        f"select count(*) from '{base}/embeddings.parquet'"
    ).fetchone()[0]
    vec_parts = []
    for i in range(k):
        vec_parts.append(
            f"select vec_id + {i * n_vecs} as vec_id, "
            f"list_transform(embedding, (x, j) -> case when j = 1 then "
            f"x + {i}::float else x end) as embedding, label "
            f"from '{base}/embeddings.parquet'"
        )
    con.execute(
        f"copy ({' union all '.join(vec_parts)}) to "
        f"'{out_dir}/embeddings.parquet' (format parquet)"
    )
    con.close()


def build_scaled(k: int, base: str, out_dir: str) -> None:
    """K deterministic disjoint-token-space copies of documents/embeddings."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"select count(*) from '{base}/documents.parquet'"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"select count(*) from '{base}/embeddings.parquet'"
    ).fetchone()[0]
    doc_parts = []
    for i in range(k):
        if i == 0:
            doc_parts.append(
                f"select doc_id, text, lang, source, n_chars "
                f"from '{base}/documents.parquet'"
            )
        else:
            # suffix every word: copy i's vocabulary is disjoint from copy j's
            doc_parts.append(
                f"select doc_id + {i * n_docs} as doc_id, "
                f"regexp_replace(text, '(\\w+)', '\\1q{i}', 'g') as text, "
                f"lang, source, length(regexp_replace(text, '(\\w+)', "
                f"'\\1q{i}', 'g')) as n_chars "
                f"from '{base}/documents.parquet'"
            )
    con.execute(
        f"copy ({' union all '.join(doc_parts)}) to "
        f"'{out_dir}/documents.parquet' (format parquet)"
    )
    # VERIFY the disjoint-vocabulary premise instead of assuming it
    # (ADVICE r4): a base token that already ends in q{i} (e.g. base 'xq1'
    # vs copy 1's 'x'->'xq1') would let copies co-block and break the
    # "pairs grow exactly linearly" construction. Disjoint across all k
    # copies iff the scaled distinct-token count is exactly k x the base's.
    n_base_vocab = con.execute(
        "select count(distinct w) from (select unnest(regexp_extract_all("
        f"text, '\\w+')) as w from '{base}/documents.parquet')"
    ).fetchone()[0]
    n_scaled_vocab = con.execute(
        "select count(distinct w) from (select unnest(regexp_extract_all("
        f"text, '\\w+')) as w from '{out_dir}/documents.parquet')"
    ).fetchone()[0]
    assert n_scaled_vocab == k * n_base_vocab, (
        f"copy vocabularies are NOT disjoint: scaled distinct tokens "
        f"{n_scaled_vocab} != {k} x base {n_base_vocab} — a base token "
        f"collides with a suffixed one; pair growth is no longer linear "
        f"by construction"
    )
    con.close()
    _write_embeddings(k, base, out_dir)


def collect_skew_metrics(sf_dir: str, cpus: int) -> dict:
    """Cap/salt/drop accounting at one level — the disclosure half of the
    skew gate: how many blocks/buckets the machinery dropped, salted, or
    kept, and the raw-pair mass in each class. Mirrors the EXACT configs the
    benched queries run (bench.py q_block's BlockingConfig; q_dedup's
    default MinHashConfig)."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F  # noqa: N812

    from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
    from entityresolution_capstone_spark.operators import dedup as D
    from entityresolution_capstone_spark.operators.canonicalize import canonical_docs
    from entityresolution_capstone_spark.plans import driver_queries as DQ
    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="skew-metrics",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    # --- q_block's blocking config over the derived-transcript docs -------
    cfg = DQ.B.BlockingConfig(
        use_token_keys=False, use_minhash=True, minhash_rows=4,
        minhash_bands=4, seed=7, max_block_size=5000,
        salt_block_size=400, salt_factor=8,
    )
    docs = canonical_docs(DQ.derive_transcripts(spark, sf_dir), prefix_len=128)
    tdict = DQ.B.token_dictionary(doc_frequencies(docs))
    blocks = DQ.B.build_blocks(docs, tdict, cfg)
    m = DQ.B.block_size_metrics(blocks, cfg)
    agg = m.agg(
        F.count("*").alias("n_blocks"),
        F.max("size").alias("max_block"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(F.col("dropped"), F.col("pairs_if_kept"))).alias("pairs_dropped"),
        F.sum(
            F.when(
                (~F.col("dropped")) & (F.col("size") > cfg.salt_block_size), 1
            ).otherwise(0)
        ).alias("n_salted"),
        F.sum(
            F.when(
                (~F.col("dropped")) & (F.col("size") > cfg.salt_block_size),
                F.col("pairs_if_kept"),
            )
        ).alias("pairs_salted"),
        F.sum(F.when(~F.col("dropped"), F.col("pairs_if_kept"))).alias("pairs_kept"),
    ).first()
    out["q_block"] = {k2: (int(v) if v is not None else 0) for k2, v in agg.asDict().items()}

    # --- q_dedup's band buckets over documents ----------------------------
    mcfg = D.MinHashConfig()
    ddocs = D.prepare_docs(spark.read.parquet(os.path.join(sf_dir, "documents.parquet")))
    tdict2 = D.dedup_token_dict(ddocs)
    buckets = D.packed_band_buckets(ddocs, tdict2, mcfg.rows, mcfg.bands, mcfg.seed)
    bsz = buckets.groupBy("bkey").agg(F.count("*").alias("size"))
    agg2 = bsz.agg(
        F.count("*").alias("n_buckets"),
        F.max("size").alias("max_bucket"),
        F.sum(
            F.when(F.col("size") > mcfg.salt_bucket_size, 1).otherwise(0)
        ).alias("n_salted"),
        F.sum(
            F.when(
                F.col("size") > mcfg.salt_bucket_size,
                (F.col("size") * (F.col("size") - 1) / 2).cast("long"),
            )
        ).alias("pairs_salted"),
        F.sum((F.col("size") * (F.col("size") - 1) / 2).cast("long")).alias("pairs_raw"),
    ).first()
    out["q_dedup"] = {k2: (int(v) if v is not None else 0) for k2, v in agg2.asDict().items()}

    # --- realized token skew ----------------------------------------------
    tok = ddocs.select(F.explode(F.array_distinct("tokens")).alias("t"))
    tdf = tok.groupBy("t").agg(F.count("*").alias("df"))
    top = tdf.orderBy(F.desc("df")).limit(5).collect()
    out["token_skew"] = {
        "n_distinct_tokens": tdf.count(),
        "top_df": [[r["t"], int(r["df"])] for r in top],
    }
    spark.stop()
    return out


def run_bench(sf_dir: str, cpus: int, trials: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_TRIALS"] = str(trials)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--metrics":
        # submode: print one JSON line of cap/salt/drop metrics for a dir
        sf_dir = sys.argv[2]
        cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        print(json.dumps(collect_skew_metrics(sf_dir, cpus)), flush=True)
        return

    skew = "--skew" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--skew"]
    k = int(args[0]) if args else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if skew:
        # SAME transform at both levels (k=1 and k) — levels differ only in
        # scale, never in token statistics
        lo_dir = os.path.join(SCRATCH, "skew-x1")
        scaled_dir = os.path.join(SCRATCH, f"skew-x{k}")
        print(f"building skewed 1x input at {lo_dir} ...", flush=True)
        build_skewed(1, base, lo_dir)
        print(f"building skewed {k}x input at {scaled_dir} ...", flush=True)
        build_skewed(k, base, scaled_dir)
    else:
        lo_dir = base
        scaled_dir = os.path.join(SCRATCH, f"x{k}")
        print(f"building {k}x scaled input at {scaled_dir} ...", flush=True)
        build_scaled(k, base, scaled_dir)

    # base level gets min-of-3 (cheap); the scaled level runs once — at 10x
    # the walls are long enough that host noise is proportionally small, and
    # the growth check only needs ~10-20% relative accuracy
    print("running bench at base level ...", flush=True)
    lo = run_bench(lo_dir, cpus, trials=3)
    print(json.dumps(lo), flush=True)
    print(f"running bench at {k}x level ...", flush=True)
    hi = run_bench(scaled_dir, cpus, trials=1)
    print(json.dumps(hi), flush=True)

    growth = {}
    bad = []
    for q, w_lo in lo["queries"].items():
        w_hi = hi["queries"].get(q)
        r_lo, r_hi = lo["rows"].get(q, 0), hi["rows"].get(q, 0)
        if not w_hi or not r_lo or not r_hi or r_hi <= r_lo or w_lo <= 0:
            continue
        exp = math.log(w_hi / w_lo) / math.log(r_hi / r_lo)
        # under --skew the caps legitimately bound output rows, so the gate
        # reads wall growth against the INPUT scale K; the rows-based
        # exponent stays recorded for disclosure
        exp_input = math.log(w_hi / w_lo) / math.log(k)
        growth[q] = {
            "wall_lo_s": w_lo,
            "wall_hi_s": w_hi,
            "rows_lo": r_lo,
            "rows_hi": r_hi,
            "exponent": round(exp, 3),
            "exponent_vs_input": round(exp_input, 3),
        }
        if (exp_input if skew else exp) > MAX_EXPONENT:
            bad.append(q)

    artifact = {
        "k": k,
        "base_sf": base,
        "lo_dir": lo_dir,
        "scaled_dir": scaled_dir,
        "cpus": cpus,
        "max_exponent": MAX_EXPONENT,
        "construction": (
            f"skew weak-scaling: K copies sharing a Zipf(s={SKEW_S}) hot-token "
            f"dictionary ({SKEW_NHOT} ranks, frac={SKEW_FRAC}); hot blocks grow "
            "Kx in members (~K^2 in raw pairs); gate reads exponent_vs_input"
            if skew
            else "weak-scaling: K disjoint-token-space copies "
            "(pairs/dups grow exactly linearly by construction)"
        ),
        "base": lo,
        "scaled": hi,
        "growth": growth,
        "superlinear": bad,
    }
    if skew:
        print("collecting cap/salt metrics at both levels ...", flush=True)
        artifact["cap_metrics"] = {
            "lo": _metrics_subprocess(lo_dir, cpus),
            "hi": _metrics_subprocess(scaled_dir, cpus),
        }
    out_path = os.path.join(
        REPO, "BENCH", "CROSS_SCALE_SKEW.json" if skew else "CROSS_SCALE.json"
    )
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"\nwrote {out_path}")
    print(f"{'query':12s} {'wall lo':>9s} {'wall hi':>9s} {'rows lo':>10s} "
          f"{'rows hi':>10s} {'exponent':>9s}")
    for q, g in growth.items():
        print(
            f"{q:12s} {g['wall_lo_s']:9.1f} {g['wall_hi_s']:9.1f} "
            f"{g['rows_lo']:10d} {g['rows_hi']:10d} "
            f"{(g['exponent_vs_input'] if skew else g['exponent']):9.3f}"
        )
    if bad:
        print(f"SUPERLINEAR (> {MAX_EXPONENT}): {bad}")
        sys.exit(1)
    print(
        "no query grows superlinearly vs "
        + ("the input scale" if skew else "its row count")
    )


def _metrics_subprocess(sf_dir: str, cpus: int) -> dict:
    """Run --metrics in a fresh subprocess (own Spark session/JVM)."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--metrics", sf_dir, str(cpus)],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no metrics JSON for {sf_dir}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


if __name__ == "__main__":
    main()
