"""Evidence hygiene: every tool that writes a committed artifact
(SF*_CORRECTNESS.json, BENCH_*.md, BENCH_SPREAD.json, ...) stages it in
git right after writing, so a refreshed artifact can never silently
drift from HEAD or sit untracked when the round ends (a recurring
review finding).  Staging only — committing stays a deliberate act."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage(path: str) -> None:
    """Best-effort ``git add`` of an evidence artifact inside the repo."""
    ap = os.path.abspath(path)
    if not ap.startswith(REPO + os.sep) or not os.path.exists(ap):
        return
    try:
        subprocess.run(
            ["git", "-C", REPO, "add", "--", ap],
            check=False, capture_output=True, timeout=30,
        )
    except Exception as exc:  # noqa: BLE001 — hygiene must never fail a run
        print(f"# evidence not staged ({path}): {exc}", file=sys.stderr)
