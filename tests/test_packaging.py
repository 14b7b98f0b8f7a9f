"""Packaging/install smoke (VERDICT r9 item 1 'What's missing'): the
reference ships a Confluent-Hub zip (pom.xml kafka-connect-maven-plugin
+ upload-to-confluent-cloud.sh) as its distribution tier; this engine's
analog is a pip wheel.  Prove, fully OFFLINE, that a user off this repo
checkout can build the wheel, install it into a clean location, import
the package from a foreign working directory, and run a registered
query — the first thing a real deployment does and the one tier that
previously had no executable check.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_src_copy(dst: str) -> str:
    """Copy ONLY the shippable source (pyproject + package tree) into a
    scratch dir and build there.  Building in the repo checkout with
    --no-build-isolation lets setuptools reuse a stale build/lib staging
    dir, so files deleted/renamed in the source can silently ship in
    future wheels (ADVICE r10 item 1) — a clean copy can't."""
    os.makedirs(dst, exist_ok=True)
    shutil.copy2(os.path.join(REPO, "pyproject.toml"), dst)
    shutil.copy2(os.path.join(REPO, "README.md"), dst)  # pyproject readme=
    shutil.copytree(
        os.path.join(REPO, "kafka_connect_sse_spark"),
        os.path.join(dst, "kafka_connect_sse_spark"),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
    )
    return dst


def _wheel_pkg_path() -> str | None:
    """The build backend (setuptools 65) needs the pure-python `wheel`
    package for bdist_wheel; this container doesn't install it but
    CPython's own test suite ships a wheel-*.whl we can put on
    PYTHONPATH (a .whl is an importable zip, and importlib.metadata
    resolves entry points from zips).  Entirely offline."""
    try:
        import wheel  # noqa: F401

        return ""  # already importable, no injection needed
    except ImportError:
        pass
    cands = sorted(
        glob.glob(
            os.path.expanduser(
                "~/.pyenv/versions/*/lib/python*/test/**/wheel-*.whl"
            ),
            recursive=True,
        )
    )
    return cands[-1] if cands else None


def test_wheel_builds_installs_and_runs_a_query_offline(tmp_path):
    whl_pkg = _wheel_pkg_path()
    if whl_pkg is None:
        pytest.skip("no `wheel` package importable or vendorable offline")

    env = dict(os.environ)
    if whl_pkg:
        env["PYTHONPATH"] = whl_pkg

    # 1. build the wheel with NO network and NO build isolation, from a
    #    CLEAN source copy (never the live checkout — see _clean_src_copy)
    src = _clean_src_copy(str(tmp_path / "src"))
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "pip",
            "wheel",
            src,
            "--no-deps",
            "--no-index",
            "--no-build-isolation",
            "-w",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    wheels = list(tmp_path.glob("kafka_connect_sse_spark-*.whl"))
    assert len(wheels) == 1, wheels

    # 2. install it into a scratch target, still offline
    site = tmp_path / "site"
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "pip",
            "install",
            str(wheels[0]),
            "--no-deps",
            "--no-index",
            "--target",
            str(site),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert (site / "kafka_connect_sse_spark" / "registry.py").exists()
    # the wheel must carry every subpackage, not just the root
    for sub in ("operators", "functions", "streaming", "sources",
                "plans", "formats"):
        assert (site / "kafka_connect_sse_spark" / sub).is_dir(), sub

    # 3. from a FOREIGN cwd (not the repo), import the INSTALLED copy
    #    and run one registered query end to end at sf0.001
    script = (
        "import os, sys\n"
        f"sys.path.insert(0, {str(site)!r})\n"
        "import kafka_connect_sse_spark\n"
        f"assert kafka_connect_sse_spark.__file__.startswith({str(site)!r}), "
        "kafka_connect_sse_spark.__file__\n"
        "from kafka_connect_sse_spark.registry import queries\n"
        "from kafka_connect_sse_spark.session import get_spark\n"
        "spark = get_spark(app_name='pkg-smoke', shuffle_partitions=4)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "rows = queries()['q_agg_groupby'](spark, '/root/testdata/sf0.001')"
        ".collect()\n"
        "assert len(rows) > 0\n"
        "print('PKG_SMOKE_OK', len(rows))\n"
    )
    env2 = dict(os.environ)
    env2.pop("PYTHONPATH", None)  # nothing from the repo may leak in
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env2,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "PKG_SMOKE_OK" in out.stdout
