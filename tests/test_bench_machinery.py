"""The judged bench-record machinery (bench.py): environment
co-drift auto-attribution — pure-python, no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import attribute_environment_codrift


def _entry(prior, final, resolved=False, **extra):
    e = {
        "prior": prior,
        "samples": [final],
        "final": final,
        "resolved": resolved,
    }
    e.update(extra)
    return e


def test_codrift_attributes_r10_signature():
    """Five code-unchanged drifters (the r10 judged-record case) must
    all read attributed with machine-readable evidence, leaving
    unexplained empty."""
    dr = {
        "agg_expr_totals": _entry(0.4, 0.9),
        "bloom_suite": _entry(1.0, 1.6),
        "folder_customer": _entry(0.3, 1.1),
        "folder_flatten": _entry(0.3, 0.8),
        "soft_fail_detail": _entry(0.3, 0.6),
        "gate_changed": _entry(1.0, 2.0, attributed="round N: new leg"),
        "retried_ok": _entry(1.0, 1.1, resolved=True),
    }
    results = {k: v["final"] for k, v in dr.items()}
    prior = {k: v["prior"] for k, v in dr.items()}
    # plus stable keys — the run-wide median must reflect them
    for i in range(20):
        results[f"stable{i}"] = 1.0
        prior[f"stable{i}"] = 1.0
    note = attribute_environment_codrift(dr, results, prior)
    assert note is not None and note["kind"] == "codrift"
    assert note["codrifters"] == sorted(
        [
            "agg_expr_totals", "bloom_suite", "folder_customer",
            "folder_flatten", "soft_fail_detail",
        ]
    )
    assert note["codrift_median_ratio"] > 1.3
    # transient-stall signature: most keys flat -> run median ~1.0
    assert note["run_median_ratio"] == 1.0
    for n in note["codrifters"]:
        assert dr[n]["attribution_kind"] == "environment"
        assert "co-drift" in dr[n]["attributed"]
    # gate-changed and resolved entries untouched
    assert dr["gate_changed"]["attributed"] == "round N: new leg"
    assert "attribution_kind" not in dr["retried_ok"]
    unexplained = [
        n
        for n, e in dr.items()
        if not e["resolved"]
        and not e.get("attributed")
        and not e.get("investigated")
    ]
    assert unexplained == []


def test_codrift_below_threshold_stays_unexplained():
    """One or two isolated drifters are NOT an environment signature —
    they must stay unexplained (forcing a per-query investigation),
    and investigated entries don't count toward the threshold."""
    dr = {
        "a": _entry(1.0, 2.0),
        "b": _entry(1.0, 1.9),
        "c": _entry(1.0, 1.8, investigated="chased: intrinsic"),
    }
    results = {k: v["final"] for k, v in dr.items()}
    prior = {k: v["prior"] for k, v in dr.items()}
    assert attribute_environment_codrift(dr, results, prior) is None
    assert "attribution_kind" not in dr["a"]
    assert "attribution_kind" not in dr["b"]


def test_codrift_uniform_slowdown_signature():
    """Uniform box slowdown: run-wide median itself is elevated and
    the note records it (the second environment signature)."""
    dr = {k: _entry(1.0, 1.5) for k in ("a", "b", "c")}
    results = {k: 1.5 for k in dr}
    prior = {k: 1.0 for k in dr}
    for i in range(10):
        results[f"s{i}"] = 1.4
        prior[f"s{i}"] = 1.0
    note = attribute_environment_codrift(dr, results, prior)
    assert note is not None
    assert note["run_median_ratio"] >= 1.4
    assert note["n_keys_compared"] == 13
