"""Multi-bin batched deconvolution (desman_tpu.multibin)."""
import os

import jax
import numpy as np
import pytest

from desman_tpu import io, synth
from desman_tpu.multibin import pad_bins, run_bins, run_bins_files
from desman_tpu.sampler import SamplerConfig
from desman_tpu.utils import match_gamma_perm, snp_distance_perm


@pytest.fixture(scope="module")
def bins():
    # three bins, different V and G_true, SAME sample axis
    return [
        synth.generate(V=60, S=8, G=2, coverage=60.0, seed=11),
        synth.generate(V=90, S=8, G=3, coverage=60.0, seed=12),
        synth.generate(V=45, S=8, G=2, coverage=60.0, seed=13),
    ]


def test_pad_bins_shapes(bins):
    p = pad_bins([t.data.counts for t in bins])
    assert p.shape == (3, 90, 8, 4)
    assert (p[0, 60:] == 0).all() and (p[2, 45:] == 0).all()


def test_pad_bins_rejects_mismatched_samples():
    a = np.zeros((10, 4, 4), np.int32)
    b = np.zeros((10, 5, 4), np.int32)
    with pytest.raises(ValueError, match="shared sample axis"):
        pad_bins([a, b])


def test_run_bins_recovers_each_bin(bins):
    cfg = SamplerConfig(G=3, burn=40, samples=40, nmf_iters=40)
    results = run_bins([t.data.counts for t in bins], cfg, seed=0)
    assert len(results) == 3
    for t, r in zip(bins, results):
        assert r.tau_star.shape == (t.data.counts.shape[0], 3)
        # fit with G=3 >= G_true: matched strains must recover the truth
        dist = snp_distance_perm(t.tau_idx, np.asarray(r.tau_star))
        assert dist <= 2, f"bin SNP distance {dist}"
        mae, _ = match_gamma_perm(t.gamma, np.asarray(r.gamma_mean))
        # G=3 fit over a G_true=2 bin splits one strain's mass across the
        # surplus strain, so matched-gamma error is loose there by design
        assert mae < (0.05 if t.gamma.shape[1] == 3 else 0.2), mae


def test_run_bins_files(bins, tmp_path):
    files, outs = [], []
    for i, t in enumerate(bins):
        f = str(tmp_path / f"bin{i}.csv")
        io.write_counts_csv(f, t.data)
        files.append(f)
        outs.append(str(tmp_path / f"out{i}"))
    cfg = SamplerConfig(G=2, burn=20, samples=20, nmf_iters=30)
    run_bins_files(files, cfg, outs, seed=1)
    for t, out in zip(bins, outs):
        fit = io.read_fit_txt(os.path.join(out, "fit.txt"))
        assert fit["G"] == 2 and fit["V"] == t.data.counts.shape[0]
        assert os.path.exists(os.path.join(out, "Filtered_Tau_star.csv"))


def test_multibin_cli_basename_collision(bins, tmp_path):
    """bin1/counts.csv + bin2/counts.csv must not overwrite each other."""
    from desman_tpu.cli import main

    files = []
    for i, t in enumerate(bins[:2]):
        d = tmp_path / f"bin{i}"
        d.mkdir()
        f = str(d / "counts.csv")
        io.write_counts_csv(f, t.data)
        files.append(f)
    stub = str(tmp_path / "runs") + os.sep
    os.makedirs(stub, exist_ok=True)
    rc = main(["multibin", *files, "-g", "2", "-o", stub, "-i", "10"])
    assert rc == 0
    outs = sorted(os.listdir(stub))
    assert len(outs) == 2, outs  # one dir per bin, disambiguated
    for d in outs:
        assert os.path.isfile(os.path.join(stub, d, "fit.txt"))


def test_run_bins_files_rejects_sample_mismatch(bins, tmp_path):
    t0 = bins[0]
    f0 = str(tmp_path / "a.csv")
    io.write_counts_csv(f0, t0.data)
    other = synth.generate(V=30, S=8, G=2, coverage=50.0, seed=5)
    renamed = io.CountsData(counts=other.data.counts, contigs=other.data.contigs,
                            positions=other.data.positions,
                            samples=[f"x{i}" for i in range(8)])
    f1 = str(tmp_path / "b.csv")
    io.write_counts_csv(f1, renamed)
    with pytest.raises(ValueError, match="sample columns differ"):
        run_bins_files([f0, f1], SamplerConfig(G=2, burn=2, samples=2),
                       [str(tmp_path / "o0"), str(tmp_path / "o1")])