"""CI dry-run of the one-command BASELINE reproduction protocol
(``nrtpu-reproduce``): on the synthetic fixture + tiny encoder it must run the
config scenarios end to end and emit one metric row per config — the same
command reproduces the real-data rows when MIND data and the e5 checkpoint are
present (SURVEY.md §6 self-established baseline)."""

import pytest
import json

from news_recommendation_project_v2_tpu.cli import reproduce


@pytest.mark.slow
def test_reproduce_dry_run_emits_config_rows(tmp_path):
    rows = reproduce.main(
        [
            str(tmp_path / "data"),
            "--synthetic",
            "--tiny-encoder",
            "--max-length", "16",
            "--epochs", "1",
            "--batch-size", "32",
            "--lr", "3e-4",
            "--with-e2e",
            "--out", str(tmp_path / "rows.json"),
        ]
    )
    # conftest forces 8 virtual devices, so the mesh scenarios run too.
    assert [r["config"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert {"auc", "mrr", "ndcg5", "ndcg10", "description"} <= set(r)
        assert 0.0 <= r["auc"] <= 1.0
    saved = json.loads((tmp_path / "rows.json").read_text())
    assert saved == rows
