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


def test_green_row_requires_affirmative_match():
    # Shared predicate (gen_coverage imports it): a row whose
    # rows_match is null with no error VERIFIED nothing — it must not
    # count as evidence, or the sampling window rotates an unverified
    # query out of the driver's reach.
    from tools.gen_priority import green_row

    assert green_row(
        {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    )
    assert not green_row(
        {"err": None, "rows_match": None, "schema_match": None, "hash_match": None}
    )
    assert not green_row(
        {"err": "boom", "rows_match": None, "schema_match": None, "hash_match": None}
    )
    assert not green_row(
        {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}
    )
    assert not green_row("not-a-dict")


def test_corrupt_correctness_file_fails_loudly(tmp_path, monkeypatch):
    # A truncated CORRECTNESS file must stop the tool, not silently
    # drop that round's evidence and reorder the driver window.
    import tools.gen_priority as gp

    good = tmp_path / "CORRECTNESS_r01.json"
    good.write_text('{"q": {"err": null, "rows_match": true}}')
    bad = tmp_path / "CORRECTNESS_r02.json"
    bad.write_text('{"q": {"err": null, "rows_ma')  # truncated mid-write
    monkeypatch.setattr(gp, "REPO", str(tmp_path))
    import pytest

    with pytest.raises(SystemExit) as exc:
        gp.load_correctness()
    assert "CORRECTNESS_r02" in str(exc.value)
    bad.unlink()
    assert [r for r, _ in gp.load_correctness()] == [1]
