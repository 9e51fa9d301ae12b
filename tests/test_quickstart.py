"""The bundled TestData quickstart — the reference's de-facto smoke test
(SURVEY.md §4), upgraded with ground-truth validation: 1000 true variant +
1000 monomorphic positions; filter -> desman G=5 with the FILTER's eta ->
compare against the known strains."""
import os

import numpy as np
import pytest

from desman_tpu import io
from desman_tpu.filter import filter_variants
from desman_tpu.run import RunConfig, run
from desman_tpu.validation import compare_tau
from desman_tpu.utils import match_gamma_perm

TESTDATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "TestData")


@pytest.fixture(scope="module")
def testdata():
    return io.read_counts_csv(os.path.join(TESTDATA, "variant_counts.csv"))


@pytest.fixture(scope="module")
def filtered(testdata):
    return filter_variants(testdata)


def test_testdata_shape(testdata):
    assert testdata.V == 2000
    assert testdata.S == 16


def test_filter_discriminates(testdata, filtered):
    is_variant = np.asarray(testdata.positions) < 1000
    sens = filtered.selected[is_variant].mean()
    fpr = filtered.selected[~is_variant].mean()
    assert sens > 0.9, f"sensitivity {sens}"
    # BH controls FDR among ~1000 discoveries at q<0.05 -> ~5% of the
    # monomorphic half may pass; gate a little above that
    assert fpr < 0.08, f"FPR {fpr}"


def test_filter_learns_eta(filtered):
    true_eta = io.read_eta_csv(os.path.join(TESTDATA, "true_eta.csv"))
    assert np.abs(filtered.eta - true_eta).max() < 0.002


def test_quickstart_g5(testdata, filtered, tmp_path):
    sel = testdata.select(np.flatnonzero(filtered.selected))
    eta_csv = str(tmp_path / "tran_df.csv")
    io.write_eta_csv(eta_csv, filtered.eta)
    out = str(tmp_path / "out")
    res = run(sel, RunConfig(G=5, iterations=150, seed=0, out_dir=out,
                             eta_file=eta_csv))
    pred_tau, pc, pp = io.read_tau_star_csv(
        os.path.join(out, "Filtered_Tau_star.csv"))
    true_tau, tc, tp = io.read_tau_star_csv(os.path.join(TESTDATA, "true_tau.csv"))
    rep = compare_tau(
        pred_tau, true_tau,
        pred_keys=list(zip(map(str, pc), map(int, pp))),
        true_keys=list(zip(map(str, tc), map(int, tp))),
    )
    assert rep.error_rate < 0.02, f"SNP error rate {rep.error_rate}"
    gmae, _ = match_gamma_perm(
        io.read_gamma_csv(os.path.join(TESTDATA, "true_gamma.csv")),
        io.read_gamma_csv(os.path.join(out, "Gamma_mean.csv")),
    )
    assert gmae < 0.02, f"gamma MAE {gmae}"
