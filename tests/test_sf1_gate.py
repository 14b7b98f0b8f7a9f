"""Unit coverage for the sf1 gate's sweep-log parser (tools/sf1_gate.py)
— the record the gate writes each round must faithfully reflect the
checker output even when progress bars share lines via carriage
returns."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "sf1_gate",
    os.path.join(os.path.dirname(__file__), "..", "tools", "sf1_gate.py"),
)
sf1_gate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sf1_gate)


def test_parse_sweep_handles_progress_bars_and_all_statuses():
    text = (
        "Setting default log level to WARN.\n"
        "[Stage 3:>      (0 + 1) / 1]\rPASS q_agg_groupby: rows=42 (1.3s)\n"
        "PASS x_ann_pipeline: rows=50 (8.4s)\n"
        "FAIL q_broken (2.0s): value hash mismatch:\n"
        "    spark-only (1x vs 0x): ('a',)\n"
        "WEAK s_rows_only: rows=7 (0.5s, no oracle)\n"
        "== 2 pass, 1 weak, 1 fail\n"
    )
    ops = sf1_gate.parse_sweep(text)
    assert ops["q_agg_groupby"] == {"status": "PASS", "rows": 42, "sec": 1.3}
    assert ops["x_ann_pipeline"]["rows"] == 50
    assert ops["q_broken"] == {"status": "FAIL"}
    assert ops["s_rows_only"] == {"status": "WEAK"}
    assert len(ops) == 4


def test_gate_refuses_truncated_sweep(tmp_path):
    """An OOM-killed checker or a partial --sweep-log must exit 1 and
    write NO record — a vacuously-green gate is worse than no gate."""
    import subprocess
    import sys

    log = tmp_path / "partial.log"
    log.write_text("PASS q_agg_groupby: rows=42 (1.3s)\n== 1 pass, 0 weak, 0 fail\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "sf1_gate.py"),
         "--round", "99", "--skip-gen", "--skip-bench", "--skip-plan-audit",
         "--sweep-log", str(log)],
        capture_output=True, text=True, cwd=repo,
    )
    try:
        assert proc.returncode == 1, proc.stdout + proc.stderr
        assert "INCOMPLETE" in proc.stderr
        assert not os.path.exists(os.path.join(repo, "SWEEP_sf1_r99.json"))
    finally:
        try:
            os.remove(os.path.join(repo, "SWEEP_sf1_r99.json"))
        except FileNotFoundError:
            pass


def test_parse_sweep_captures_phase_split():
    """Round-10 checker lines carry the [spark= oracle= canon=] phase
    split (VERDICT r9 item 4); the parser must record it so a sweep-wall
    regression is attributable — and still accept old-format lines."""
    ops = sf1_gate.parse_sweep(
        "PASS q_new: rows=3 (9.1s) [spark=7.2s oracle=1.4s canon=0.5s]\n"
        "PASS q_old: rows=3 (1.3s)\n"
    )
    assert ops["q_new"] == {
        "status": "PASS",
        "rows": 3,
        "sec": 9.1,
        "spark_sec": 7.2,
        "oracle_sec": 1.4,
        "canon_sec": 0.5,
    }
    assert "spark_sec" not in ops["q_old"]


def test_parse_sweep_fail_variants():
    # both FAIL line shapes the checker emits: "FAIL name (Xs): ..." and
    # "FAIL name: spark error"
    ops = sf1_gate.parse_sweep(
        "FAIL q_a (0.1s): cols spark=[] oracle=[]\n"
        "FAIL q_b: spark error\n"
    )
    assert ops == {"q_a": {"status": "FAIL"}, "q_b": {"status": "FAIL"}}


def test_gate_excludes_conditional_ops_from_completeness(tmp_path):
    """On a host where an optional dep is installed the sweep also runs
    the conditional ops (e.g. s_transform_with_state), so the parsed
    count exceeds SURVEY.md's declared total by design.  The gate must
    subtract the conditional set before the completeness compare instead
    of calling a fully green sweep INCOMPLETE — and the conditional op
    must not trip the no-WEAK gate either (ADVICE r6)."""
    import json
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    declared = int(
        re.search(r"\*\*Declared operator total: (\d+)\*\*",
                  open(os.path.join(repo, "SURVEY.md")).read()).group(1)
    )
    lines = [f"PASS q_synth_{i}: rows=1 (0.1s)" for i in range(declared)]
    lines.append("WEAK s_transform_with_state: rows=7 (0.5s, no oracle)")
    lines.append(f"== {declared} pass, 1 weak, 0 fail")
    log = tmp_path / "full_with_conditional.log"
    log.write_text("\n".join(lines) + "\n")
    # MANIFEST.json is read from the sf1 dir; point the gate at a stub
    rec_path = os.path.join(repo, "SWEEP_sf1_r98.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "sf1_gate.py"),
         "--round", "98", "--skip-gen", "--skip-bench", "--skip-plan-audit",
         "--sweep-log", str(log)],
        capture_output=True, text=True, cwd=repo,
    )
    try:
        assert proc.returncode == 0, proc.stdout + proc.stderr
        rec = json.load(open(rec_path))
        assert rec["n_ops"] == declared
        assert "s_transform_with_state" not in rec["ops"]
        assert rec["conditional_ops_excluded"] == {
            "s_transform_with_state": {"status": "WEAK"}
        }
    finally:
        try:
            os.remove(rec_path)
        except FileNotFoundError:
            pass
