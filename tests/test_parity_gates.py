"""Consistency of the on-chip parity GATE with its recorded evidence.

`tools/parity_tpu.py --all` gates fused-vs-XLA single-step deviations on
real TPU hardware; this CPU test keeps the gate table honest:

- every gated task has a default size and every threshold key exists;
- the committed measurement (`docs/runs/parity_r5.jsonl`) PASSES the
  current thresholds — tightening a gate without re-measuring on-chip, or
  editing the tool's field list, fails here instead of silently shipping a
  gate that no recorded run satisfies.
"""

import json
import os

import pytest

from tools.parity_tpu import DEFAULT_SIZES, GATED_FIELDS, GATES

EVIDENCE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "runs", "parity_r5.jsonl")


def test_gate_table_complete():
    assert set(GATES) == set(DEFAULT_SIZES)
    for task, gate in GATES.items():
        for k in GATED_FIELDS:
            assert f"max_{k}" in gate, (task, k)
        assert "max_flip_rate" in gate


def test_recorded_evidence_passes_current_gates():
    if not os.path.exists(EVIDENCE):
        pytest.skip("no recorded parity evidence")
    seen = set()
    for line in open(EVIDENCE):
        r = json.loads(line)
        gate = GATES.get(r["task"])
        if gate is None:
            continue
        seen.add(r["task"])
        for k in GATED_FIELDS:
            assert r[f"max_{k}_no_flip"] <= gate[f"max_{k}"], (
                f"{r['task']} {k}: recorded {r[f'max_{k}_no_flip']:.4g} "
                f"exceeds gate {gate[f'max_{k}']:.4g} — re-measure on-chip "
                "before tightening")
        assert r["flip_rate"] <= gate["max_flip_rate"], r["task"]
    assert seen == set(GATES), f"evidence missing for {set(GATES) - seen}"


def test_resting_smooth_bands_match():
    """The XLA and in-kernel resting-contact smoothing must use the same
    band, or fused-vs-XLA parity silently degrades at contact margins."""
    from isaacgym_tpu.sim import simulator as S
    from isaacgym_tpu.ops import pallas_dynamics as PDK
    assert S.RESTING_SMOOTH_BAND == PDK.RESTING_SMOOTH_BAND
