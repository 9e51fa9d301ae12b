"""Model selection (resolvenhap semantics): the G grid must pick the true
number of strains on synthetic data (BASELINE.json config #3)."""
import numpy as np
import pytest

from desman_tpu import synth
from desman_tpu.model_selection import (
    RunRecord, fit_grid, resolve_nhap, scan_run_dirs,
)


def test_resolve_nhap_elbow_rule():
    # deviance drops hard until G=3, then flattens: expect G=3
    records = [
        RunRecord(G=1, seed=0, mean_deviance=10000.0, uncertainty=0.0),
        RunRecord(G=2, seed=0, mean_deviance=6000.0, uncertainty=0.01),
        RunRecord(G=3, seed=0, mean_deviance=4000.0, uncertainty=0.02),
        RunRecord(G=4, seed=0, mean_deviance=3990.0, uncertainty=0.2),
        RunRecord(G=5, seed=0, mean_deviance=3985.0, uncertainty=0.4),
    ]
    sel = resolve_nhap(records, dev_cutoff=0.02)
    assert sel.G == 3


def test_resolve_nhap_picks_best_replicate():
    records = [
        RunRecord(G=2, seed=0, mean_deviance=5000.0, uncertainty=0.0),
        RunRecord(G=2, seed=1, mean_deviance=4000.0, uncertainty=0.0),
        RunRecord(G=3, seed=0, mean_deviance=3990.0, uncertainty=0.0),
    ]
    sel = resolve_nhap(records, dev_cutoff=0.02)
    assert (sel.G, sel.seed) == (2, 1)


def test_fit_grid_selects_true_G(tmp_path):
    t = synth.generate(V=100, S=12, G=3, coverage=60.0, seed=11)
    records = fit_grid(
        t.data.counts, g_values=[1, 2, 3, 4], seeds=[0, 1],
        iterations=80, eta_init=t.eta, fix_eta=True,
        out_stub=str(tmp_path / "run"), data=t.data,
    )
    assert len(records) == 8
    sel = resolve_nhap(records)
    assert sel.G == 3, f"picked G={sel.G}"
    # round-trip through the on-disk fit.txt path (reference resolvenhap mode)
    dirs = [r.run_dir for r in records]
    rescanned = scan_run_dirs(dirs)
    sel2 = resolve_nhap(rescanned)
    assert sel2.G == 3
    assert abs(sel2.mean_deviance - sel.mean_deviance) < 1.0


def test_summary_line_format():
    sel = resolve_nhap([RunRecord(G=2, seed=1, mean_deviance=10.0, uncertainty=0.05,
                                  run_dir="d")])
    parts = sel.summary_line().split(",")
    assert parts[0] == "2" and parts[1] == "1" and parts[4] == "d"


def test_resolve_nhap_uncertainty_veto_is_conditional():
    """r5 regression (paper-scale mock): an honestly-mixing UNDERFIT chain
    shows high SNV uncertainty while each added strain still halves the
    deviance — the uncertainty veto must not stop the scan there. It still
    vetoes a MARGINAL improvement whose new strain is uncertain."""
    records = [
        RunRecord(G=1, seed=0, mean_deviance=76_891_681.0, uncertainty=0.0),
        RunRecord(G=2, seed=0, mean_deviance=11_094_384.0, uncertainty=0.5),
        RunRecord(G=3, seed=0, mean_deviance=7_045_330.0, uncertainty=0.4),
        RunRecord(G=4, seed=0, mean_deviance=5_320_977.0, uncertainty=0.3),
        RunRecord(G=5, seed=0, mean_deviance=2_606_099.0, uncertainty=0.01),
        RunRecord(G=6, seed=0, mean_deviance=2_606_207.0, uncertainty=0.6),
    ]
    assert resolve_nhap(records).G == 5
    # marginal improvement + uncertain new strain: veto applies
    records2 = [
        RunRecord(G=2, seed=0, mean_deviance=4000.0, uncertainty=0.01),
        RunRecord(G=3, seed=0, mean_deviance=3800.0, uncertainty=0.5),
    ]
    assert resolve_nhap(records2).G == 2


def test_fit_grid_ess_target(tmp_path):
    """ess_target extends each run's sampling until the post-burn loglik
    ESS reaches the target; metrics report the achieved length, and
    elastic resume reuses ESS-regime dirs (digest salt) without
    recomputing."""
    import json

    from desman_tpu import synth
    from desman_tpu.model_selection import fit_grid

    t = synth.generate(V=60, S=6, G=2, coverage=8.0, gamma_alpha=50.0,
                       seed=5)  # slow-mixing: extension must trigger
    recs = fit_grid(t.data.counts, g_values=[2], seeds=[0, 1],
                    iterations=40, out_stub=str(tmp_path / "run"),
                    data=t.data, ess_target=60.0, max_samples=200)
    m = json.load(open(str(tmp_path / "run_2_0") + "/metrics.json"))
    assert m["sampling_sweeps"] > 20, m["sampling_sweeps"]
    assert "loglik_ess_bulk" in m
    # resume: same config + same ESS regime -> served from disk bitwise
    recs2 = fit_grid(t.data.counts, g_values=[2], seeds=[0, 1],
                     iterations=40, out_stub=str(tmp_path / "run"),
                     data=t.data, ess_target=60.0, max_samples=200)
    assert [r.mean_deviance for r in recs2] == pytest.approx(
        [r.mean_deviance for r in recs])
    # a DIFFERENT ESS regime must not reuse those dirs (digest salt)
    import os
    mtime = os.path.getmtime(str(tmp_path / "run_2_0") + "/metrics.json")
    fit_grid(t.data.counts, g_values=[2], seeds=[0, 1], iterations=40,
             out_stub=str(tmp_path / "run"), data=t.data,
             ess_target=30.0, max_samples=200)
    assert os.path.getmtime(str(tmp_path / "run_2_0") + "/metrics.json") > mtime
