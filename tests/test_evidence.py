"""Evidence-pipeline honesty gates.

Rounds 2 and 3 both produced an untracked experiment in ``runs/`` whose
outcome contradicted the tracked docs ("artifact exists, docs silent").
These tests make that state a FAILURE by construction:

1. every substantial training run under ``runs/`` must have an up-to-date
   distillation in ``docs/runs/`` (tools/distill_run.py);
2. ``docs/runs`` must be trackable by git (the round-3 loss: the gitignore
   pattern ``runs/`` silently matched ``docs/runs/`` too, so the "committed"
   evidence files were never in the repository).
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "runs")
DOCS_RUNS = os.path.join(REPO, "docs", "runs")

# a run shorter than this is a smoke/debug run, not evidence
MIN_EPOCHS = 1000
# distillation may lag an in-flight run by this many epochs
SLACK_EPOCHS = 1000


def _last_epoch(path):
    last = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            last = max(last, int(row.get("epoch", 0)))
    return last


def test_runs_are_distilled():
    if not os.path.isdir(RUNS):
        pytest.skip("no runs/ directory")
    stale = []
    for name in sorted(os.listdir(RUNS)):
        metrics = os.path.join(RUNS, name, "metrics.jsonl")
        if not os.path.exists(metrics):
            continue
        run_epoch = _last_epoch(metrics)
        if run_epoch < MIN_EPOCHS:
            continue
        distilled = os.path.join(DOCS_RUNS, f"{name}.jsonl")
        if not os.path.exists(distilled):
            stale.append(f"{name}: {run_epoch} epochs, no docs/runs/{name}.jsonl")
            continue
        doc_epoch = _last_epoch(distilled)
        if run_epoch - doc_epoch > SLACK_EPOCHS:
            stale.append(f"{name}: run at epoch {run_epoch}, distillation at "
                         f"{doc_epoch} (> {SLACK_EPOCHS} behind)")
    assert not stale, (
        "untracked experiment evidence — run `python tools/distill_run.py "
        "runs/<name>` and commit docs/runs/: " + "; ".join(stale))


def test_docs_runs_not_gitignored():
    os.makedirs(DOCS_RUNS, exist_ok=True)
    probe = os.path.join(DOCS_RUNS, "probe.jsonl")
    rc = subprocess.run(["git", "check-ignore", "-q", probe], cwd=REPO).returncode
    # 0 = ignored (the round-3 failure mode), 1 = not ignored
    assert rc == 1, ("docs/runs/ is matched by .gitignore — evidence files "
                     "committed there silently never enter the repository")
