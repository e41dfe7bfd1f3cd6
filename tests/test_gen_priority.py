"""Pins for tools/gen_priority.py's argument handling (VERDICT r11
item 4): the bare invocation rewrites queries/__init__.py in place, so
any unrecognized argument must print usage, exit 2, and leave the
registry byte-identical.  No Spark session needed.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "gen_priority.py")
INIT = os.path.join(REPO, "aiesec_guc_spark", "queries", "__init__.py")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, TOOL, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_unknown_arg_exits_2_and_touches_nothing():
    before = open(INIT, "rb").read()
    for bad in (["--help"], ["--chekc"], ["frobnicate"], ["--check", "--help"]):
        proc = _run(*bad)
        assert proc.returncode == 2, (bad, proc.stdout, proc.stderr)
        assert "unrecognized arguments" in proc.stderr
        assert open(INIT, "rb").read() == before


def test_check_mode_reads_only():
    before = open(INIT, "rb").read()
    proc = _run("--check")
    # 0 (current) or 1 (stale) are both legitimate --check outcomes;
    # the pin is that --check NEVER writes.
    assert proc.returncode in (0, 1), (proc.stdout, proc.stderr)
    assert open(INIT, "rb").read() == before
