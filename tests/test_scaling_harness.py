"""Pure-Python tests for the scaling-evidence merge/pool logic.

tools/scaling_bench.py is the machinery behind BENCH/BASELINE.md (the
north rule's N-vs-4N efficiency evidence); its min-of-k accumulation must
be exact:

- per-QUERY minima when merging trials of one level pair (one straggler
  query in an otherwise-fast trial must not pin the committed table);
- per-LEVEL q_score pooling across pairs (8 cores is the big side of the
  2v8 pair and the small side of the 8v32 pair — every pinned trial of a
  level measures the identical q_score job).

No Spark session needed: the functions operate on plain dicts.
"""

import importlib.util
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


@pytest.fixture(scope="module")
def sb():
    spec = importlib.util.spec_from_file_location(
        "scaling_bench", os.path.join(_TOOLS, "scaling_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _pair(n, q_n, q_4n, rows=1000, trials=1):
    def side(cpus, queries):
        return {"queries": dict(queries), "rows": {"q_score": rows}, "cpus": cpus}

    thr_n = round(rows / q_n["q_score"], 1)
    thr_4n = round(rows / q_4n["q_score"], 1)
    return {
        "N": n,
        "trials": trials,
        "score_only": False,
        "throughput_N": thr_n,
        "throughput_4N": thr_4n,
        "scaling_efficiency": round(thr_4n / (4 * thr_n), 3),
        "bench_N": side(n, q_n),
        "bench_4N": side(4 * n, q_4n),
    }


def test_merge_takes_per_query_minima(sb):
    prev = _pair(
        8,
        {"q_block": 40.0, "q_score": 98.2, "q_pipeline": 22.3},
        {"q_block": 28.0, "q_score": 49.4, "q_pipeline": 78.3},
        trials=2,
    )
    new = _pair(
        8,
        {"q_block": 35.0, "q_score": 102.0, "q_pipeline": 25.0},
        {"q_block": 30.0, "q_score": 51.0, "q_pipeline": 26.0},
    )
    m = sb._merge_pair(prev, new)
    assert m["trials"] == 3
    # each query independently min'd — the fast q_pipeline from the slower
    # (by q_score) trial replaces the straggler value
    assert m["bench_N"]["queries"] == {
        "q_block": 35.0,
        "q_score": 98.2,
        "q_pipeline": 22.3,
    }
    assert m["bench_4N"]["queries"] == {
        "q_block": 28.0,
        "q_score": 49.4,
        "q_pipeline": 26.0,
    }
    # throughput keys on the q_score minimum
    assert m["throughput_N"] == round(1000 / 98.2, 1)
    assert m["throughput_4N"] == round(1000 / 49.4, 1)


def test_merge_none_prev_is_identity(sb):
    new = _pair(2, {"q_score": 300.0}, {"q_score": 100.0})
    assert sb._merge_pair(None, new) is new


def test_merge_handles_disjoint_query_sets(sb):
    # score-only trials lack the tail queries; merging must keep the union
    prev = _pair(
        8,
        {"q_score": 100.0, "q_pipeline": 20.0},
        {"q_score": 50.0, "q_pipeline": 30.0},
    )
    new = _pair(8, {"q_score": 95.0}, {"q_score": 52.0})
    m = sb._merge_pair(prev, new)
    assert m["bench_N"]["queries"] == {"q_score": 95.0, "q_pipeline": 20.0}
    assert m["bench_4N"]["queries"] == {"q_score": 50.0, "q_pipeline": 30.0}


def test_pool_levels_shares_minima_across_pairs(sb):
    # level 8 measured faster inside the 8v32 pair than inside the 2v8 pair:
    # the 2v8 efficiency must use the pooled (faster) level-8 estimate
    p_2v8 = _pair(2, {"q_score": 340.0}, {"q_score": 132.0})
    p_8v32 = _pair(8, {"q_score": 98.0}, {"q_score": 49.0})
    pairs = [p_2v8, p_8v32]
    sb._pool_levels(pairs)
    assert p_2v8["pooled_q_score"] == {"2": 340.0, "8": 98.0}
    assert p_2v8["scaling_efficiency"] == round(340.0 / (4 * 98.0), 3)
    assert p_8v32["scaling_efficiency"] == round(98.0 / (4 * 49.0), 3)
    # throughputs recomputed from the pool
    assert p_2v8["throughput_4N"] == round(1000 / 98.0, 1)


def test_pool_levels_keeps_per_pair_tables(sb):
    p_2v8 = _pair(2, {"q_score": 340.0}, {"q_score": 132.0})
    p_8v32 = _pair(8, {"q_score": 98.0}, {"q_score": 49.0})
    sb._pool_levels([p_2v8, p_8v32])
    # the pair's own bench tables are untouched (they are the per-pair
    # fastest-trial evidence); only the headline fields re-key on the pool
    assert p_2v8["bench_4N"]["queries"]["q_score"] == 132.0


def test_median_window_estimator_overrides_pooled_min(sb):
    # with a trial_log, the headline efficiency is the median same-window
    # ratio (drift-cancelling); pooled-min stays as the secondary stat
    p = _pair(2, {"q_score": 272.0}, {"q_score": 84.0})
    p["trial_log"] = [
        {"window": 1, "q_score_N": 272.0, "q_score_4N": 92.0, "window_efficiency": 0.739},
        {"window": 2, "q_score_N": 279.0, "q_score_4N": 84.0, "window_efficiency": 0.830},
        {"window": 3, "q_score_N": 290.0, "q_score_4N": 86.0, "window_efficiency": 0.843},
    ]
    sb._pool_levels([p])
    assert p["efficiency_method"] == "same-window-median"
    assert p["scaling_efficiency"] == 0.830
    assert p["pooled_min_efficiency"] == round(272.0 / (4 * 84.0), 3)


def test_even_window_count_takes_mean_of_middle_two(sb):
    # ratios recomputed from the RAW seconds (display-rounded
    # window_efficiency would double-round at the 0.8 gate boundary)
    p = _pair(2, {"q_score": 96.0}, {"q_score": 30.0})
    p["trial_log"] = [
        {"window": 1, "q_score_N": 96.0, "q_score_4N": 30.0, "window_efficiency": 0.8},
        {"window": 2, "q_score_N": 96.0, "q_score_4N": 24.0, "window_efficiency": 1.0},
    ]
    sb._pool_levels([p])
    raw = (96.0 / (4 * 30.0) + 96.0 / (4 * 24.0)) / 2
    assert p["scaling_efficiency"] == round(raw, 3)


def test_median_uses_raw_seconds_not_rounded_ratios(sb):
    # a stored 0.800 that is really 0.7995 must not read as gate-met
    p = _pair(2, {"q_score": 102.4}, {"q_score": 32.0})
    p["trial_log"] = [
        {"window": 1, "q_score_N": 102.4, "q_score_4N": 32.0, "window_efficiency": 0.8},
    ]
    sb._pool_levels([p])
    assert p["scaling_efficiency"] == round(102.4 / (4 * 32.0), 3) == 0.8
    p2 = _pair(2, {"q_score": 102.2}, {"q_score": 32.0})
    p2["trial_log"] = [
        {"window": 1, "q_score_N": 102.2, "q_score_4N": 32.0, "window_efficiency": 0.8},
    ]
    sb._pool_levels([p2])
    assert p2["scaling_efficiency"] == 0.798  # not the pre-rounded 0.800


def test_merge_refuses_cross_protocol_pooling(sb):
    prev = _pair(2, {"q_score": 51.0}, {"q_score": 20.0})
    prev["protocol"] = "cold-levelpart-v1"
    new = _pair(2, {"q_score": 272.0}, {"q_score": 84.0}, trials=2)
    new["protocol"] = "steady-constpart-v2"
    merged = sb._merge_pair(prev, new)
    # the old-protocol 51s trial must NOT become the pooled min
    assert merged["bench_N"]["queries"]["q_score"] == 272.0
    assert merged["trials"] == 2


def test_no_trial_log_falls_back_to_pooled_min(sb):
    p = _pair(2, {"q_score": 340.0}, {"q_score": 132.0})
    sb._pool_levels([p])
    assert p["efficiency_method"] == "pooled-min"
    assert p["scaling_efficiency"] == p["pooled_min_efficiency"]


def test_merge_concatenates_trial_logs(sb):
    prev = _pair(2, {"q_score": 300.0}, {"q_score": 90.0})
    prev["trial_log"] = [
        {"window": 1, "q_score_N": 300.0, "q_score_4N": 90.0, "window_efficiency": 0.833}
    ]
    new = _pair(2, {"q_score": 280.0}, {"q_score": 85.0}, trials=2)
    new["trial_log"] = [
        {"window": 1, "q_score_N": 280.0, "q_score_4N": 85.0, "window_efficiency": 0.824},
        {"window": 2, "q_score_N": 285.0, "q_score_4N": 88.0, "window_efficiency": 0.810},
    ]
    merged = sb._merge_pair(prev, new)
    assert len(merged["trial_log"]) == 3
    assert merged["trials"] == 3


def test_probe_ok_requires_both_floors(sb):
    """v4: a window is healthy only when BOTH probe kinds clear their floors.
    The first two v3 windows were certified by ALU alone (0.87-1.01) while
    the memory probe would have read the collapse — gating must AND them."""
    assert sb._probe_ok({"health": 0.9, "mem_health": 0.7})
    assert not sb._probe_ok({"health": 0.9, "mem_health": 0.3})
    assert not sb._probe_ok({"health": 0.5, "mem_health": 0.9})
    # v3 readings carry no mem_health: gate on ALU alone (back-compat)
    assert sb._probe_ok({"health": 0.9})
    assert not sb._probe_ok({"health": 0.5})


def test_healthy_median_reads_only_healthy_windows(sb):
    p = _pair(4, {"q_score": 100.0}, {"q_score": 30.0})
    p["trial_log"] = [
        {"window": 1, "q_score_N": 100.0, "q_score_4N": 30.0,
         "window_efficiency": 0.833, "healthy": True},
        {"window": 2, "q_score_N": 100.0, "q_score_4N": 80.0,
         "window_efficiency": 0.313, "healthy": False},
        {"window": 3, "q_score_N": 104.0, "q_score_4N": 31.0,
         "window_efficiency": 0.839, "healthy": True},
    ]
    sb._pool_levels([p])
    assert p["efficiency_method"] == "same-window-median-ballast-healthy"
    assert p["healthy_windows"] == 2 and p["unhealthy_windows"] == 1
    # median over the two healthy ratios only; the 0.313 window is excluded
    # from the headline but disclosed via all_window_median
    assert p["scaling_efficiency"] == round((100/120 + 104/124) / 2, 3)
    assert p["all_window_median"] == round(100 / 120, 3)


def test_window_trials_env_reaches_bench(sb, monkeypatch):
    """v4: each level's in-window q_score is min-of-WINDOW_TRIALS via
    bench.py's SPARK_GRAFT_BENCH_TRIALS; the harness must plumb it."""
    captured = {}

    def fake_run(cmd, env=None, **kw):
        captured.update(env)

        class R:
            stdout = '{"queries": {"q_score": 1.0}, "value": 1.0, "rows": {"q_score": 1}}'
            stderr = ""
        return R()

    monkeypatch.setattr(sb.subprocess, "run", fake_run)
    monkeypatch.setattr(sb.shutil, "which", lambda name: None)
    sb._run_level_once(4, "/tmp/sf", "/tmp/x.zip", score_only=True)
    assert captured["SPARK_GRAFT_BENCH_TRIALS"] == str(sb.WINDOW_TRIALS)
    assert captured["SPARK_GRAFT_BENCH_STEADY"] == "1"
