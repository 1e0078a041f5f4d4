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

Usage: python tools/cross_scale_bench.py [K] [base_sf_dir]
Writes BENCH/CROSS_SCALE.json.
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
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaled_dir = os.path.join(SCRATCH, f"x{k}")

    print(f"building {k}x scaled input at {scaled_dir} ...", flush=True)
    build_scaled(k, base, scaled_dir)

    # base level gets min-of-3 (cheap); the scaled level runs once — at 10x
    # the walls are long enough that host noise is proportionally small, and
    # the growth check only needs ~10-20% relative accuracy
    print("running bench at base level ...", flush=True)
    lo = run_bench(base, cpus, trials=3)
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
        growth[q] = {
            "wall_lo_s": w_lo,
            "wall_hi_s": w_hi,
            "rows_lo": r_lo,
            "rows_hi": r_hi,
            "exponent": round(exp, 3),
        }
        if exp > MAX_EXPONENT:
            bad.append(q)

    artifact = {
        "k": k,
        "base_sf": base,
        "scaled_dir": scaled_dir,
        "cpus": cpus,
        "max_exponent": MAX_EXPONENT,
        "construction": "weak-scaling: K disjoint-token-space copies "
        "(pairs/dups grow exactly linearly by construction)",
        "base": lo,
        "scaled": hi,
        "growth": growth,
        "superlinear": bad,
    }
    out_path = os.path.join(REPO, "BENCH", "CROSS_SCALE.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"\nwrote {out_path}")
    print(f"{'query':12s} {'wall lo':>9s} {'wall hi':>9s} {'rows lo':>10s} "
          f"{'rows hi':>10s} {'exponent':>9s}")
    for q, g in growth.items():
        print(
            f"{q:12s} {g['wall_lo_s']:9.1f} {g['wall_hi_s']:9.1f} "
            f"{g['rows_lo']:10d} {g['rows_hi']:10d} {g['exponent']:9.3f}"
        )
    if bad:
        print(f"SUPERLINEAR (> {MAX_EXPONENT}): {bad}")
        sys.exit(1)
    print("no query grows superlinearly vs its row count")


if __name__ == "__main__":
    main()
