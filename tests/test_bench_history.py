"""bench.py scaling-history helpers (pure python — no Spark)."""

from __future__ import annotations

import importlib
import json


def test_history_summary_filters_by_work_size(tmp_path, monkeypatch):
    """Runs at a different mult measure a different fixed-cost ratio
    and must not mix into the cross-session median-of-medians."""
    import bench

    hist = tmp_path / "BENCH_HISTORY.jsonl"
    entries = [
        {"cores_n": 2, "cores_4n": 8, "mult": 1, "efficiency": 0.70,
         "pair_efficiencies": [0.7], "wall_ts": 1.0},
        {"cores_n": 2, "cores_4n": 8, "mult": 2, "efficiency": 0.90,
         "pair_efficiencies": [0.88, 0.92], "wall_ts": 2.0},
        {"cores_n": 2, "cores_4n": 8, "mult": 2, "efficiency": 0.84,
         "pair_efficiencies": [0.84], "wall_ts": 3.0},
        {"cores_n": 8, "cores_4n": 32, "mult": 2, "efficiency": 0.40,
         "pair_efficiencies": [0.4], "wall_ts": 4.0},
    ]
    hist.write_text("\n".join(json.dumps(e) for e in entries) + "\n")
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))

    h = bench.history_summary(2, 8, mult=2)
    assert h["runs"] == 2
    assert h["run_medians"] == [0.9, 0.84]
    assert h["median_of_medians"] == 0.87
    assert h["pairs_total"] == 3
    # mult=None aggregates across work sizes (explicit opt-in only)
    assert bench.history_summary(2, 8, mult=None)["runs"] == 3
    # other (N, 4N) config is its own bucket
    assert bench.history_summary(8, 32)["run_medians"] == [0.4]
    # unknown config → None
    assert bench.history_summary(4, 16) is None


def test_measure_scaling_trailing_window_retry(monkeypatch):
    """The spread retry must stop as soon as the trailing `rounds`-pair
    window settles (a global spread can never shrink — it would always
    exhaust the retry budget once tripped)."""
    import bench

    pair_effs = [0.90, 0.50, 0.88, 0.86, 0.87, 0.85, 0.86]
    state = {"pair": 0, "half": 0}

    def fake_spawn(cores, data_path, mult=2):
        eff = pair_effs[min(state["pair"], len(pair_effs) - 1)]
        out = (
            {"rows": 1000, "elapsed_sec": 10.0}
            if cores == 2
            else {"rows": int(4000 * eff), "elapsed_sec": 10.0}
        )
        state["half"] += 1
        if state["half"] % 2 == 0:
            state["pair"] += 1
        return out

    monkeypatch.setattr(bench, "spawn_flagship", fake_spawn)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    r = bench.measure_scaling("x", rounds=4, max_extra_pairs=3, spread_gate=0.25)
    # 4 base pairs tripped the gate (0.9 vs 0.5); settles after 2 extras
    assert r["extra_pairs_on_spread"] == 2
    assert r["n_pairs"] == 6
    assert r["pair_efficiencies"] == [0.9, 0.5, 0.88, 0.86, 0.87, 0.85]
