"""Per-round sf1 regression gate (VERDICT r5 item 4, institutionalized).

One command regenerates the deterministic sf1 tier, runs the FULL
operator sweep against it, runs the bench at sf1, and writes the round's
records — so every round gets a fresh data point in the data-dominated
regime and a regression invisible at sf0.1 is caught here:

    python tools/sf1_gate.py --round 6
    # writes SWEEP_sf1_r06.json and BENCH_sf1_r06.json at the repo root

Options:
    --skip-gen          reuse the existing testdata/sf1 tier
    --sweep-log PATH    parse an already-captured check_correctness log
                        instead of re-running the ~45 min sweep
    --skip-bench        sweep only (e.g. while a perf-sensitive run owns
                        the machine)
    --skip-plan-audit   skip the sf0.001 rescan audit (tools/plan_audit
                        --gate) that otherwise runs first — a NEW or
                        WORSENED >=2-FileScan op outside the documented
                        allowlist fails the round before the 40-min
                        sweep starts (VERDICT r9 item 5)

The fixture is bit-deterministic (tools/gen_fixture.py, seed pinned), so
"regenerate" never changes the data — it only guarantees the tier exists
and matches the committed generator.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, "testdata", "sf1")

# run as a script (tools/ is sys.path[0]); the package lives at repo root
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_PASS = re.compile(r"^PASS (\S+): rows=(\d+) \(([\d.]+)s\)")
_SPLIT = re.compile(
    r"\[spark=([\d.]+)s oracle=([\d.]+)s canon=([\d.]+)s\]"
)
_FAIL = re.compile(r"^FAIL ([^\s:(]+)")
_WEAK = re.compile(r"^WEAK (\S+):")


def parse_sweep(text: str) -> dict:
    ops: dict[str, dict] = {}
    # Spark's console progress bar emits \r-terminated fragments that
    # can land on the same physical line as a checker PASS/FAIL row;
    # the anchored regexes below then miss the row and the
    # completeness gate refuses a genuinely green sweep (bit round 13:
    # 182 of 365 rows parsed).  Keep only the text after the last \r
    # on every line before matching.
    text = re.sub(r"[^\n]*\r", "", text)
    for line in text.splitlines():
        m = _PASS.match(line)
        if m:
            rec = {
                "status": "PASS",
                "rows": int(m.group(2)),
                "sec": float(m.group(3)),
            }
            # per-phase attribution (VERDICT r9 item 4): spark
            # execution vs DuckDB oracle vs pandas canonicalization —
            # absent on logs captured by older checkers
            ms = _SPLIT.search(line)
            if ms:
                rec["spark_sec"] = float(ms.group(1))
                rec["oracle_sec"] = float(ms.group(2))
                rec["canon_sec"] = float(ms.group(3))
            ops[m.group(1)] = rec
            continue
        m = _FAIL.match(line)
        if m:
            ops[m.group(1)] = {"status": "FAIL"}
            continue
        m = _WEAK.match(line)
        if m:
            ops[m.group(1)] = {"status": "WEAK"}
    return ops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--sweep-log")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-plan-audit", action="store_true")
    args = ap.parse_args()

    if not args.skip_plan_audit:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "plan_audit.py"),
             "--gate"],
            capture_output=True, text=True,
        )
        sys.stdout.write(proc.stdout[-4000:])
        if proc.returncode != 0:
            print("plan audit FAILED — an op rescans a relation beyond "
                  "its documented allowance (tools/plan_audit.ALLOWLIST); "
                  "fix the plan or document the multi-pass before the "
                  "sweep", file=sys.stderr)
            sys.stderr.write(proc.stderr[-2000:])
            sys.exit(1)

    if not args.skip_gen:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_fixture.py"),
             "--sf", "1"],
            check=True,
        )

    if args.sweep_log:
        sweep_text = open(args.sweep_log).read()
    else:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "check_correctness.py"),
             "--sf", SF1_DIR],
            capture_output=True, text=True,
        )
        sweep_text = proc.stdout + proc.stderr
        # the checker exits 0 (all pass) or 1 (fails, which we parse and
        # gate below); anything else is a crash/OOM kill — the sweep is
        # incomplete and must never produce a green record
        if proc.returncode not in (0, 1):
            print(f"sweep crashed (exit {proc.returncode}); last output:\n"
                  + sweep_text[-2000:], file=sys.stderr)
            sys.exit(1)
    ops = parse_sweep(sweep_text)
    # conditional ops (import-gated on optional deps, excluded from
    # SURVEY.md's declared total exactly as
    # tests/test_operators.py::test_registry_count_matches_survey does)
    # are dropped before the completeness compare — on a host where the
    # optional dep IS installed the sweep legitimately runs them, and
    # without this the gate would report a fully green sweep as
    # INCOMPLETE (ADVICE r6)
    from kafka_connect_sse_spark.registry import CONDITIONAL_OPS

    conditional = {c: ops.pop(c) for c in sorted(CONDITIONAL_OPS) if c in ops}
    n_pass = sum(1 for v in ops.values() if v["status"] == "PASS")
    n_fail = sum(1 for v in ops.values() if v["status"] == "FAIL")
    n_weak = sum(1 for v in ops.values() if v["status"] == "WEAK")

    # completeness gate: a truncated sweep (OOM-killed checker, partial
    # --sweep-log) or a silently-dropped oracle (WEAK) must fail loudly,
    # never write a vacuously-green record.  The declared total in
    # SURVEY.md is the same denominator tests pin against the registry.
    m = re.search(
        r"\*\*Declared operator total: (\d+)\*\*",
        open(os.path.join(REPO, "SURVEY.md")).read(),
    )
    declared = int(m.group(1)) if m else None
    if declared is not None and len(ops) != declared:
        print(f"sweep INCOMPLETE: {len(ops)} ops parsed but SURVEY.md "
              f"declares {declared} — refusing to write a green record",
              file=sys.stderr)
        sys.exit(1)
    if n_weak:
        print(f"{n_weak} ops ran WEAK (no oracle) — the sf1 gate requires "
              "the full EXACT surface", file=sys.stderr)
        sys.exit(1)
    # MANIFEST.json exists whenever the tier was generated (gen_fixture
    # writes it); under --skip-gen with an external --sweep-log the tier
    # may be absent entirely — record a null fixture instead of crashing
    manifest_path = os.path.join(SF1_DIR, "MANIFEST.json")
    manifest = (json.load(open(manifest_path))
                if os.path.exists(manifest_path) else None)
    sweep_rec = {
        "sf_dir": SF1_DIR,
        "fixture": manifest,
        "n_ops": len(ops),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "note": f"round-{args.round} sf1 gate (tools/sf1_gate.py): full "
                "sweep over the regenerated deterministic tier",
        "ops": ops,
    }
    if conditional:
        sweep_rec["conditional_ops_excluded"] = conditional
    # cross-round per-op regression visibility (VERDICT r6 item 6): the
    # 192-op surface is ~10x the benched headline set, so surface the
    # most expensive sweep entries up front.  `sec` is the checker's
    # end-to-end per-op wall (Spark execution + DuckDB oracle + pandas
    # canonicalization of both outputs — at sf1 the canonicalization is
    # ~10 s for full-table 6M-row outputs, see BASELINE.md), so compare
    # round-over-round, not against bench.py numbers.
    sweep_rec["top_sec"] = dict(
        sorted(
            ((k, v["sec"]) for k, v in ops.items() if "sec" in v),
            key=lambda kv: -kv[1],
        )[:15]
    )
    sweep_path = os.path.join(REPO, f"SWEEP_sf1_r{args.round:02d}.json")
    with open(sweep_path, "w") as fh:
        json.dump(sweep_rec, fh, indent=1)
    print(f"wrote {sweep_path}: {n_pass} pass / {n_fail} fail "
          f"of {len(ops)} ops")
    if n_fail:
        print("FAILING:",
              " ".join(k for k, v in ops.items() if v["status"] == "FAIL"))

    if not args.skip_bench:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF1_DIR)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env,
        )
        bench_line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")),
            None,
        )
        if bench_line is None:
            print("bench produced no JSON line", file=sys.stderr)
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        bench_path = os.path.join(REPO, f"BENCH_sf1_r{args.round:02d}.json")
        with open(bench_path, "w") as fh:
            fh.write(bench_line + "\n")
        print(f"wrote {bench_path}: "
              f"{json.loads(bench_line)['value']} s total")

    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
