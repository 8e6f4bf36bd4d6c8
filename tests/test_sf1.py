"""Full-scale (sf1) correctness gate as a pytest marker.

``pytest -m sf1`` runs the complete sf1 harness (tools/verify_sf1.py):
oracle rows re-checked at ~6M lineitem rows plus the planted-duplicate
ground-truth recall and leakage checks that are stronger than any SQL
oracle.  Deselected from the default run (see pytest.ini) because it
takes ~6-8 minutes; the point is that scale regressions — like the
round-6 as-of O(n²) window frame — are caught the round they appear by
running this in CI, not a round later by the external study.

Runs in a subprocess so the harness stays the single source of truth
(same entry point the round evidence uses) and its dedicated Spark
session/config can't interfere with the shared test-session fixture.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "testdata_sf1")

pytestmark = pytest.mark.sf1


@pytest.mark.skipif(
    not os.path.isdir(SF1),
    reason="sf1 data not generated — run tools/gen_sf.py first",
)
def test_sf1_harness_all_green():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_sf1.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert proc.returncode == 0, f"verify_sf1 failed:\n{proc.stderr[-4000:]}"
    with open(os.path.join(REPO, "SF1_CORRECTNESS.json")) as fh:
        res = json.load(fh)
    assert res["n_checks"] >= 36  # 34 oracle rows + 2 ground-truth checks
    assert res["n_ok"] == res["n_checks"], {
        k: v for k, v in res["results"].items()
        if not (v.get("hash_match") or v.get("pass"))
    }
