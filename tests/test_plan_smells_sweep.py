"""Full-registry plan-smell sweep as a pytest pin.

Round 12 shipped its headline query (`containment_report`) with a 6×
documents-scan fan-out that only the JUDGE's run of
``tools/plan_smells.py`` caught — the sweep was judge-run only, so a
smell introduced mid-round survived to the verdict.  This pin runs the
same tool over the WHOLE registry (every query, not just the ones a
round touched — a smell can regress through a shared helper) so the
plan discipline fails CI the moment it breaks.

Cost: ~5 minutes at sf0.001 on an idle box (plan building only, plus
the few build-time guard actions).  That is the price of making the
house scan-fanout/window-partition rules un-regressable; keep it.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_smells_sweep_is_clean():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "plan_smells.py"),
            os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"),
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"plan_smells exited {proc.returncode} — a registry query violates "
        f"the structural plan discipline:\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert "0 smells" in proc.stdout
