import numpy as np

from desman_tpu import io, synth
from desman_tpu.utils import BASES


def test_counts_roundtrip(tmp_path):
    t = synth.generate(V=25, S=3, G=2, seed=5)
    p = str(tmp_path / "counts.csv")
    io.write_counts_csv(p, t.data)
    back = io.read_counts_csv(p)
    assert back.samples == t.data.samples
    assert np.array_equal(back.counts, t.data.counts)
    assert np.array_equal(back.positions, t.data.positions)


def test_counts_header_format(tmp_path):
    t = synth.generate(V=5, S=2, G=2, seed=5)
    p = str(tmp_path / "counts.csv")
    io.write_counts_csv(p, t.data)
    header = open(p).readline().strip().split(",")
    assert header[:2] == ["Contig", "Position"]
    # DESMAN convention: '<sample>-A,... per sample', base order A,C,G,T
    assert header[2:6] == [f"Sample0-{b}" for b in BASES]


def test_eta_roundtrip(tmp_path):
    eta = synth.make_eta(0.02)
    p = str(tmp_path / "tran_df.csv")
    io.write_eta_csv(p, eta)
    assert np.allclose(io.read_eta_csv(p), eta)


def test_gamma_roundtrip(tmp_path):
    gamma = np.random.default_rng(0).dirichlet(np.ones(3), size=4)
    p = str(tmp_path / "Gamma_mean.csv")
    io.write_gamma_csv(p, gamma)
    assert np.allclose(io.read_gamma_csv(p), gamma)


def test_tau_star_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tau = rng.integers(0, 4, size=(20, 3)).astype(np.int32)
    p = str(tmp_path / "Filtered_Tau_star.csv")
    io.write_tau_star_csv(p, tau, ["c"] * 20, np.arange(20))
    back, contigs, positions = io.read_tau_star_csv(p)
    assert np.array_equal(back, tau)
    assert np.array_equal(positions, np.arange(20))


def test_tau_mean_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tm = rng.dirichlet(np.ones(4), size=(10, 2))
    p = str(tmp_path / "Tau_mean.csv")
    io.write_tau_mean_csv(p, tm, ["c"] * 10, np.arange(10))
    assert np.allclose(io.read_tau_mean_csv(p), tm)


def test_fit_txt_roundtrip(tmp_path):
    p = str(tmp_path / "fit.txt")
    io.write_fit_txt(p, G=3, V=100, S=8, mean_deviance=123.4,
                     star_deviance=120.0, star_loglik=-60.0)
    rec = io.read_fit_txt(p)
    assert rec["G"] == 3 and rec["V"] == 100 and rec["S"] == 8
    assert np.isclose(rec["mean_deviance"], 123.4)


def test_gzipped_counts_csv(tmp_path):
    """Gzipped counts CSVs read identically to plain ones (both readers)."""
    import gzip

    from desman_tpu import synth

    t = synth.generate(V=30, S=4, G=2, coverage=40.0, seed=8)
    plain = tmp_path / "c.csv"
    io.write_counts_csv(str(plain), t.data)
    gz = tmp_path / "c.csv.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    got = io.read_counts_csv(str(gz))
    np.testing.assert_array_equal(got.counts, t.data.counts)
    assert got.samples == t.data.samples


def test_gzipped_pileup(tmp_path):
    import gzip

    from desman_tpu import synth
    from desman_tpu.pileup import read_pileup, write_pileup

    t = synth.generate(V=20, S=3, G=2, coverage=30.0, seed=9)
    plain = tmp_path / "p.pileup"
    write_pileup(str(plain), t.data)
    gz = tmp_path / "p.pileup.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    got = read_pileup(str(gz))
    np.testing.assert_array_equal(got.counts, t.data.counts)
