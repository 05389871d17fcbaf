"""CI lane for the day-one runbook (tools/day_one.py --dry-run).

VERDICT r4 item 8: the real-checkpoint bring-up must be ONE command whose
machinery is testable in-image. The dry-run chains the manifest-pinned
fixture conversion, the checkpoint-free parity lane, and the speculative
acceptance sweep; this test pins that the chain runs end to end and that
each step reports its PASS line.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_day_one_dry_run():
    proc = subprocess.run(
        [sys.executable, "tools/day_one.py", "--dry-run"], cwd=REPO,
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "INDEXTTS_SPEC_DECODE": ""})
    out = proc.stdout
    assert proc.returncode == 0, out + proc.stderr[-2000:]
    assert "[day-one] manifest (fixture conversion): PASS" in out
    assert "[day-one] parity (tiny lane): PASS" in out
    assert "[day-one] spec sweep: PASS" in out
    assert "gamma=4" in out and "gamma=8" in out
    assert "commits/chunk vs gate" in out
    assert "[day-one] ALL STEPS PASS" in out
