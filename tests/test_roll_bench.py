"""Unit test for tools/roll_bench.py (the BENCH.json rolling-min merge)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_roll_bench_merge_semantics(tmp_path, monkeypatch):
    """Mins only decrease, new keys are recorded, >2x runs are flagged
    but never raise the stored min, and provenance is prepended."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "roll_bench", REPO / "tools" / "roll_bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    (tmp_path / "BENCH.json").write_text(json.dumps({
        "queries": {"q_a": 1.0, "q_b": 2.0, "q_c": 0.2},
        "n_queries": 3, "value": 3.2, "provenance": "old",
    }))
    (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps({
        "queries": {
            "q_a": 0.5,    # improves
            "q_b": 5.0,    # >2x flag, min kept
            "q_c": 0.3,    # worse but under 2x: kept, no flag
            "q_new": 7.0,  # first recording
        },
    }))
    monkeypatch.setattr(mod, "_REPO", tmp_path)
    out_lines = []
    monkeypatch.setattr(
        "builtins.print", lambda s, **k: out_lines.append(s)
    )
    monkeypatch.setattr(sys, "argv", ["roll_bench.py", "test-note"])
    assert mod.main() == 0

    rolled = json.loads((tmp_path / "BENCH.json").read_text())
    assert rolled["queries"] == {
        "q_a": 0.5, "q_b": 2.0, "q_c": 0.2, "q_new": 7.0,
    }
    assert rolled["n_queries"] == 4
    assert rolled["value"] == 9.7
    assert rolled["provenance"].startswith("test-note; old"[:9])

    summary = json.loads(out_lines[-1])
    assert summary["improved"] == 1
    assert summary["new_keys"] == 1
    assert summary["flags_over_2x"] == [
        {"query": "q_b", "min": 2.0, "run": 5.0}
    ]


def test_roll_bench_rebaseline_resets_min(tmp_path, monkeypatch):
    """--rebaseline=k resets that key's min to the fresh value even if
    HIGHER (the legitimate-floor-change path, r10 streaming precedent);
    unlisted keys keep the normal mins-only-decrease semantics."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "roll_bench", REPO / "tools" / "roll_bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    (tmp_path / "BENCH.json").write_text(json.dumps({
        "queries": {"q_a": 1.0, "q_b": 2.0},
        "n_queries": 2, "value": 3.0, "provenance": "old",
    }))
    (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps({
        "queries": {"q_a": 3.0, "q_b": 5.0},
    }))
    monkeypatch.setattr(mod, "_REPO", tmp_path)
    out_lines = []
    monkeypatch.setattr(
        "builtins.print", lambda s, **k: out_lines.append(s)
    )
    monkeypatch.setattr(
        sys, "argv",
        ["roll_bench.py", "impl changed: portable hash family",
         "--rebaseline=q_a"],
    )
    assert mod.main() == 0

    rolled = json.loads((tmp_path / "BENCH.json").read_text())
    assert rolled["queries"] == {"q_a": 3.0, "q_b": 2.0}
    summary = json.loads(out_lines[-1])
    assert summary["rebaselined"] == [
        {"query": "q_a", "old_min": 1.0, "new_min": 3.0}
    ]
    # q_b was NOT rebaselined: >2x flag fires as usual, min kept
    assert summary["flags_over_2x"] == [
        {"query": "q_b", "min": 2.0, "run": 5.0}
    ]
