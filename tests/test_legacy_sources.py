"""Legacy-format readers (reference parser parity on synthesized fixtures)."""

import json
import os

import pytest

from entityresolution_capstone_spark.sources import legacy as L


@pytest.fixture()
def tmpdir_path(tmp_path):
    return str(tmp_path)


def test_graph_json_roundtrip(spark, tmpdir_path):
    rows = [
        {"node_id": 1, "edge_id": 10, "attr_dict": {"name": "wang_w", "title": "a b"}},
        {"node_id": 2, "edge_id": 10, "attr_dict": {"name": "li_x", "title": "c d"}},
        {"node_id": 3, "edge_id": 11, "attr_dict": {"name": "wang_w", "title": "a b"}},
    ]
    p = os.path.join(tmpdir_path, "graph.json")
    with open(p, "w") as f:
        for r in rows:  # spark json reader takes JSON-lines
            f.write(json.dumps(r) + "\n")
    df = L.read_graph_json(spark, p, ["name", "title"])
    got = sorted((r["node_id"], r["edge_id"], r["name"]) for r in df.collect())
    assert got == [(1, 10, "wang_w"), (2, 10, "li_x"), (3, 11, "wang_w")]

    out = os.path.join(tmpdir_path, "graph_out")
    L.write_graph_json(df, out, ["name", "title"])
    back = L.read_graph_json(spark, out, ["name", "title"])
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_ground_truth_ordered(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "gt.json")
    with open(p, "w") as f:
        for r in [{"node_id": 3, "cluster_id": 1}, {"node_id": 1, "cluster_id": 2}]:
            f.write(json.dumps(r) + "\n")
    df = L.read_ground_truth_json(spark, p)
    assert [r["node_id"] for r in df.collect()] == [1, 3]


def test_citeseer_dat_parsing_and_corrupt_drop(spark, tmpdir_path):
    """Pipe format per /root/reference/data/citeseer/format.txt; the reference
    drops author_id 2716 (scripts.py:104-106)."""
    lines = [
        "100 | 5 | smith_j | J. Smith | 1 | 900 | 50 | Some Title",
        "2716 | 6 | bad_row | Bad Row | 1 | 901 | 51 | Corrupt",
        "101 | 5 | smith_j | John Smith | 2 | 900 | 50 | Some Title",
    ]
    p = os.path.join(tmpdir_path, "authors.dat")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    df = L.read_citeseer_dat(spark, p)
    got = sorted((r["author_id"], r["normalized_author"], r["paper_id"]) for r in df.collect())
    assert got == [(100, "smith_j", 900), (101, "smith_j", 900)]


def test_prep_dat_arxiv_roundtrip(spark, tmp_path):
    """prep-arxiv CLI parity: .dat -> graph.json + ground_truth.json with the
    reference's column mapping (normalized_author -> attr 'name'), and no
    citeseer-specific id filtering."""
    from entityresolution_capstone_spark.sources.legacy import (
        prep_dat,
        read_graph_json,
        read_ground_truth_json,
    )

    dat = tmp_path / "arxiv.dat"
    rows = [
        "2716 | 5 | j smith | John Smith | 1 | 100 | 900 | Some Title",
        "2 | 5 | j smith | J. Smith | 2 | 100 | 900 | Some Title",
        "3 | 7 | a jones | Ann Jones | 1 | 101 | 901 | Other Title",
    ]
    dat.write_text("\n".join(rows) + "\n")
    graph_dir = str(tmp_path / "graph.json")
    gt_dir = str(tmp_path / "gt.json")
    prep_dat(spark, str(dat), graph_dir, gt_dir, name="arxiv")

    g = read_graph_json(spark, graph_dir, ["name"])
    got = sorted((r["node_id"], r["edge_id"], r["name"]) for r in g.collect())
    # arxiv keeps id 2716 (the drop is citeseer-specific)
    assert got == [(2, 100, "j smith"), (3, 101, "a jones"), (2716, 100, "j smith")]
    gt = read_ground_truth_json(spark, gt_dir)
    assert sorted((r["node_id"], r["cluster_id"]) for r in gt.collect()) == [
        (2, 5), (3, 7), (2716, 5),
    ]
