"""Dashboard payload = the reference streamlit app's five surfaces
(V1-V5) as bounded, scale-safe data artifacts."""

from __future__ import annotations

import base64

import pytest

from pagerank_spark.dashboard import build_dashboard_payload, to_dot


@pytest.fixture(scope="module")
def payload(spark, tmp_path_factory):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 1), (2, 4)]
    path = tmp_path_factory.mktemp("dash") / "edges.txt"
    path.write_text("".join(f"{s}\t{d}\n" for s, d in edges))
    return build_dashboard_payload(spark, str(path), k=3, chart_limit=4)


def test_payload_counts_and_topk(payload):
    assert payload.n_edges == 7
    assert len(payload.top) == 3
    assert payload.iterations > 0
    # scores descending
    scores = [s for _, s in payload.top]
    assert scores == sorted(scores, reverse=True)


def test_subgraph_edges_within_topk(payload):
    members = {p for p, _ in payload.top}
    for s, d in payload.subgraph_edges:
        assert s in members and d in members


def test_dot_renders_every_subgraph_edge(payload):
    assert payload.dot.startswith("digraph")
    for s, d in payload.subgraph_edges:
        assert f'"{s}" -> "{d}"' in payload.dot


def test_chart_series_bounded(payload):
    assert len(payload.chart_scores) <= 4


def test_box_stats_ordered(payload):
    b = payload.box_stats
    assert b["min"] <= b["p25"] <= b["p50"] <= b["p75"] <= b["max"]


def test_download_decodes_to_csv(payload):
    text = base64.b64decode(payload.download_b64).decode()
    lines = text.strip().splitlines()
    assert lines[0] == "page,score"
    assert len(lines) == 1 + len(payload.top)


def test_to_dot_empty():
    assert to_dot([]) == "digraph pagerank {\n}"
