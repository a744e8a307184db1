"""Regression tests for experiments/collect_results.py — the generator of
the RESULTS.md master table (the judged at-scale inventory). Guards the
footer parser, the cut-run fallback, the in-flight guard, and the
seed-spread grouping, all against synthetic logs in a tmp dir."""
import importlib.util
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cr():
    spec = importlib.util.spec_from_file_location(
        "collect_results", os.path.join(REPO, "experiments",
                                        "collect_results.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FOOTER = """Epoch 19
Training Loss (progress: 0.95): 0.1
Min Val loss: 1.0
Test loss: 1.1
**Dimensionless L2 errors**
Min Val L2 Error: 0.08
Min Relative Val L2 Error: {val} %
Test L2 Error: 0.07
Relative Test L2 Error: {test} %
Elapsed Time : {sec}
"""

CUT = """Saved model at models/x
*Valid*
L2 error 0.0812
L2 relative error {val} %
*Test*
L2 error 0.0790
L2 relative error {test} %
Epoch 7
"""


def _write(d, name, text, age_s=7200):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write(text)
    old = time.time() - age_s
    os.utime(p, (old, old))
    return p


def test_footer_harvest_and_order(cr, tmp_path):
    d = str(tmp_path)
    _write(d, "train_E2.log", FOOTER.format(val=6.5, test=6.46, sec=2700))
    _write(d, "train_KF.log", FOOTER.format(val=1.12, test=0.76, sec=1800))
    rows, pending, unknown = cr.harvest(d)
    assert not pending and not unknown
    got = {(r[0], r[1]): r for r in rows if r[6] != "(RESULTS.md)"}
    e2 = got[("E2", "MSMP-PDE")]
    assert e2[3] == 6.5 and e2[4] == 6.46 and abs(e2[5] - 45.0) < 1e-9
    # rows sort by TASK_ORDER then ascending test error
    tasks = [r[0] for r in rows]
    assert tasks == sorted(tasks, key=cr.TASK_ORDER.index)
    for t in set(tasks):
        errs = [r[4] for r in rows if r[0] == t]
        assert errs == sorted(errs)


def test_cut_run_fallback_and_in_flight_guard(cr, tmp_path):
    d = str(tmp_path)
    # old footerless log WITH a checkpoint -> harvested as a cut row
    _write(d, "train_E2.log", CUT.format(val=7.5, test=7.9), age_s=7200)
    # footerless log still being written -> pending, never published
    _write(d, "train_KF.log", CUT.format(val=9.9, test=9.8), age_s=60)
    rows, pending, unknown = cr.harvest(d)
    cut = [r for r in rows if r[6] == "train_E2.log"]
    assert len(cut) == 1 and cut[0][4] == 7.9
    assert "cut before completion" in cut[0][2]
    assert [p[3] for p in pending] == ["train_KF.log"]


def test_cut_pair_anchoring_never_mispairs(cr, tmp_path):
    # a run cut BETWEEN the valid and test prints must not pair the fresh
    # valid with the previous epoch's test value
    d = str(tmp_path)
    txt = CUT.format(val=8.0, test=8.5) + """*Valid*
L2 error 0.07
L2 relative error 7.0 %
"""
    _write(d, "train_E2.log", txt, age_s=7200)
    rows, _, _ = cr.harvest(d)
    row = [r for r in rows if r[6] == "train_E2.log"][0]
    assert (row[3], row[4]) == (8.0, 8.5)


def test_unknown_logs_are_flagged_not_published(cr, tmp_path):
    d = str(tmp_path)
    _write(d, "train_NEW_THING.log", FOOTER.format(val=1, test=2, sec=60))
    rows, pending, unknown = cr.harvest(d)
    assert unknown == ["train_NEW_THING.log"]
    assert all(r[6] != "train_NEW_THING.log" for r in rows)


def test_seed_spread_groups_with_base(cr, tmp_path):
    d = str(tmp_path)
    _write(d, "train_E1_MSMP_s0.log", FOOTER.format(val=6.4, test=6.35,
                                                    sec=600))
    _write(d, "train_E1_MSMP_s1.log", FOOTER.format(val=6.4, test=6.61,
                                                    sec=600))
    _write(d, "train_E1_MSMP_s2.log", FOOTER.format(val=6.3, test=6.74,
                                                    sec=600))
    rows, _, _ = cr.harvest(d)
    lines = cr.seed_spread(rows)
    line = [l for l in lines if l.startswith("| E1 | MSMP-PDE |")]
    assert len(line) == 1
    # mean of (6.35, 6.61, 6.74) = 6.5667 -> "6.57%"; base row included
    assert "| 3 |" in line[0] and "6.57%" in line[0]
    assert "6.35–6.74%" in line[0]


def test_render_contains_markers_and_pending(cr, tmp_path):
    d = str(tmp_path)
    _write(d, "train_KF.log", CUT.format(val=9.9, test=9.8), age_s=60)
    rows, pending, _ = cr.harvest(d)
    out = cr.render(rows, pending)
    assert out.startswith(cr.BEGIN) and out.rstrip().endswith(cr.END)
    assert "In flight / not yet recorded: MSMP-PDE on KF" in out
    # static rows carried from RESULTS.md render with an em-dash val
    assert "| E1 | MSMP-PDE | — | **6.76%** |" in out
