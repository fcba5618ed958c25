"""Unit tests for the bench.py ladder logic (the driver artifact).

The driver parses the LAST stdout line of ``python bench.py`` as the
round's official throughput record, so the ladder's contract — a
parsable JSON line after every rung, best completed rung wins, a rung
failure never aborts the ladder — is tested here with ``bench.run``
monkeypatched (no device, no compile; the real rungs are exercised by
the driver and `python bench.py <scale>`).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench


def _run_main(monkeypatch, capsys, order, results):
    """Run bench.main() with scripted per-scale outcomes.

    ``results[scale]`` is a float (rung succeeds) or an Exception
    instance (rung raises).  Returns the list of stdout JSON dicts.
    """
    monkeypatch.setattr(bench, "SCALE_ORDER", tuple(order))

    def fake_run(scale):
        r = results[scale]
        if isinstance(r, Exception):
            raise r
        return r

    monkeypatch.setattr(bench, "run", fake_run)
    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    return [json.loads(ln) for ln in lines]


class TestLadder:
    def test_every_line_parsable_and_last_is_best(self, monkeypatch,
                                                  capsys):
        out = _run_main(monkeypatch, capsys, ("tiny", "small", "full"),
                        {"tiny": 5.0, "small": 1.0, "full": 0.3})
        # one line up front + one after each rung + one final
        assert len(out) == 5
        for d in out:
            assert {"metric", "value", "unit", "vs_baseline"} <= set(d)
            if "(" in d["metric"]:     # a real rung: estimate is flagged
                assert "estimate" in d["baseline_note"]
        # the LARGEST completed scale is the headline even when slower
        assert out[-1]["value"] == 0.3
        assert out[-1]["metric"].endswith("(full)")
        assert out[-1]["vs_baseline"] == pytest.approx(
            0.3 / bench.EST_REFERENCE_SCENES_PER_SEC_PER_GPU, rel=1e-6)

    def test_rung_failure_does_not_abort_ladder(self, monkeypatch,
                                                capsys):
        out = _run_main(
            monkeypatch, capsys, ("tiny", "small", "full"),
            {"tiny": 5.0, "small": RuntimeError("backend hiccup"),
             "full": 0.3})
        assert out[-1]["value"] == 0.3
        # the failed rung printed no result line of its own
        assert len(out) == 4

    def test_all_rungs_failing_still_prints_zero(self, monkeypatch,
                                                 capsys):
        out = _run_main(
            monkeypatch, capsys, ("tiny", "small"),
            {"tiny": RuntimeError("x"), "small": RuntimeError("y")})
        assert out[-1]["value"] == 0.0
        assert out[-1]["vs_baseline"] == 0.0

    def test_full2_only_upgrades_on_improvement(self, monkeypatch,
                                                capsys):
        out = _run_main(monkeypatch, capsys, ("full", "full2"),
                        {"full": 0.35, "full2": 0.30})
        assert out[-1]["metric"].endswith("(full)")
        assert out[-1]["value"] == 0.35
        out = _run_main(monkeypatch, capsys, ("full", "full2"),
                        {"full": 0.35, "full2": 0.50})
        assert out[-1]["metric"].endswith("(full2)")
        assert out[-1]["value"] == 0.50

    def test_budget_exhaustion_skips_later_rungs(self, monkeypatch,
                                                 capsys):
        monkeypatch.setattr(bench, "TOTAL_BUDGET", 0.0)
        out = _run_main(monkeypatch, capsys, ("tiny",), {"tiny": 5.0})
        # no budget -> every rung skipped, but the 0.0 line still lands
        assert out[-1]["value"] == 0.0
