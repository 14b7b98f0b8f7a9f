"""The offline examples must keep running end-to-end — they are the
user-facing composition of registry operators, and this round's review
caught one drifting (a stage not updated for a new operator).  Each runs
as a subprocess at sf0.001; the wikimedia example needs a live SSE
endpoint and is exercised by the sources/landing tests instead."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "script,args,expect",
    [
        (
            "examples/ann_index_pipeline.py",
            ["--sf-dir", SF],
            "recall@k vs exact x_sim_topk_ivf",
        ),
        (
            "examples/corpus_prep_pipeline.py",
            ["--sf-dir", SF],
            "packs planned",
        ),
        (
            "examples/event_analytics_pipeline.py",
            ["--sf-dir", SF],
            "event analytics complete",
        ),
        (
            "examples/robust_stats_pipeline.py",
            ["--sf-dir", SF],
            "event-type x weekday association",
        ),
        (
            "examples/experiment_analysis_pipeline.py",
            ["--sf-dir", SF],
            "experiment readout complete",
        ),
    ],
)
def test_offline_example_runs(script, args, expect, tmp_path):
    extra = (
        ["--out", str(tmp_path / "out")]
        if "corpus_prep" in script
        else []
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args, *extra],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert expect in proc.stdout, proc.stdout[-2000:]
