"""The bundled TestData quickstart — the reference's de-facto smoke test
(SURVEY.md §4), upgraded with ground-truth validation: filter + run G=5 and
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


def test_testdata_shape(testdata):
    assert testdata.V == 1000
    assert testdata.S == 16


def test_filter_keeps_most_true_variants(testdata):
    res = filter_variants(testdata)
    # every position is a true variant by construction
    assert res.selected.mean() > 0.9


def test_quickstart_g5(testdata, tmp_path):
    out = str(tmp_path / "out")
    res = run(testdata, RunConfig(
        G=5, iterations=150, seed=0, out_dir=out,
        eta_file=os.path.join(TESTDATA, "true_eta.csv"),
    ))
    true_tau, tc, tp = io.read_tau_star_csv(os.path.join(TESTDATA, "true_tau.csv"))
    rep = compare_tau(np.asarray(res.tau_star), true_tau)
    # 1000 x 5 = 5000 calls; the hardest strain is at ~4% abundance
    assert rep.error_rate < 0.02, f"SNP error rate {rep.error_rate}"
    gmae, _ = match_gamma_perm(
        io.read_gamma_csv(os.path.join(TESTDATA, "true_gamma.csv")),
        np.asarray(res.gamma_mean),
    )
    assert gmae < 0.02, f"gamma MAE {gmae}"
    assert os.path.exists(os.path.join(out, "fit.txt"))
