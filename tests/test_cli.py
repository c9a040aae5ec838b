"""CLI pipeline parity (``python -m pagerank_spark.cli``).

The CLI mirrors the reference's ``python pageRank.py`` UX
(pageRank.py:181-194): duplicate-edge report, per-iteration L1 print,
``[page] [score]`` result file, optional CSV dump and β sweep.
"""

from __future__ import annotations

import os

from pagerank_spark.cli import main


def _write_edges(tmp_path):
    # 4-node graph with one duplicate edge and one dangling node (4).
    p = tmp_path / "edges.txt"
    p.write_text("1\t2\n2\t3\n3\t1\n1\t3\n1\t3\n3\t4\n")
    return str(p)


def test_cli_end_to_end(tmp_path, spark, capsys):
    edges = _write_edges(tmp_path)
    out = tmp_path / "result.txt"
    csv_dir = tmp_path / "edges_csv"
    rc = main(
        [
            edges,
            "--top", "4",
            "--output", str(out),
            "--csv-dump", str(csv_dir),
            "--compare-teleports",
        ],
        spark=spark,
    )
    assert rc == 0

    captured = capsys.readouterr().out
    assert "duplicate edges: 1" in captured
    assert "(1, 3) x2" in captured
    assert "converged in" in captured
    assert "compare_teleports:" in captured

    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4
    assert all(line.startswith("[") for line in lines)

    # CSV dump exists with a header and all 6 edge rows.
    csv_files = [f for f in os.listdir(csv_dir) if f.endswith(".csv")]
    assert len(csv_files) == 1
    rows = (csv_dir / csv_files[0]).read_text().strip().splitlines()
    assert rows[0] == "src,dst"
    assert len(rows) == 7
