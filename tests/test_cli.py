"""CLI surface tests: the reference's flag semantics end-to-end (SURVEY.md §8)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from desman_tpu import io, synth
from desman_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    t = synth.generate(V=80, S=8, G=2, coverage=60.0, seed=9)
    io.write_counts_csv(str(d / "counts.csv"), t.data)
    io.write_eta_csv(str(d / "tran_df.csv"), t.eta)
    return d, t


def test_desman_cli(workdir):
    d, t = workdir
    out = str(d / "out")
    rc = main(["desman", str(d / "counts.csv"), "-g", "2",
               "-e", str(d / "tran_df.csv"), "-o", out, "-i", "40", "-s", "0"])
    assert rc == 0
    fit = io.read_fit_txt(os.path.join(out, "fit.txt"))
    assert fit["G"] == 2 and fit["V"] == 80
    assert os.path.exists(os.path.join(out, "Filtered_Tau_star.csv"))
    assert os.path.exists(os.path.join(out, "metrics.json"))


def test_desman_cli_chains(workdir):
    d, t = workdir
    out = str(d / "out_chains")
    rc = main(["desman", str(d / "counts.csv"), "-g", "2", "-o", out,
               "-i", "30", "--chains", "2"])
    assert rc == 0
    chains = json.load(open(os.path.join(out, "chains.json")))
    assert chains["seeds"] == [0, 1]


def test_filter_cli(workdir, tmp_path):
    d, t = workdir
    stub = str(tmp_path / "filt_")
    rc = main(["filter", str(d / "counts.csv"), "-o", stub])
    assert rc == 0
    for suffix in ["sel_var.csv", "p_df.csv", "q_df.csv", "tran_df.csv",
                   "log_file.txt"]:
        assert os.path.exists(stub + suffix), suffix
    sel = io.read_counts_csv(stub + "sel_var.csv")
    assert sel.V > 0
    eta = io.read_eta_csv(stub + "tran_df.csv")
    assert np.allclose(eta.sum(1), 1.0, atol=1e-6)


def test_geneassign_cli(workdir, tmp_path):
    d, t = workdir
    # gamma from a tiny run + synthetic gene coverage against it
    gamma = t.gamma
    io.write_gamma_csv(str(tmp_path / "Gamma_mean.csv"), gamma, t.data.samples)
    rng = np.random.default_rng(0)
    total = np.full(t.data.S, 40.0)
    cov = (gamma * total[:, None]).T
    etaG = rng.integers(0, 2, size=(30, gamma.shape[1]))
    etaG[etaG.sum(1) == 0, 0] = 1
    x = rng.poisson(etaG @ cov)
    pd.DataFrame(x, index=[f"gene{i}" for i in range(30)],
                 columns=t.data.samples).to_csv(tmp_path / "gene_cov.csv")
    pd.DataFrame({"cov": total}, index=t.data.samples).to_csv(tmp_path / "total.csv")

    stub = str(tmp_path / "ga_")
    rc = main(["geneassign", "-g", str(tmp_path / "Gamma_mean.csv"),
               "-c", str(tmp_path / "gene_cov.csv"),
               "-t", str(tmp_path / "total.csv"), "-o", stub])
    assert rc == 0
    calls = pd.read_csv(stub + "etaS_df.csv", index_col=0).to_numpy()
    assert (calls == etaG).mean() > 0.9


def test_geneassign_cli_tolerates_n_positions(workdir, tmp_path):
    """gene_cov.csv from genecov/extract has an n_positions metadata column;
    geneassign must not read it as a sample (review regression)."""
    d, t = workdir
    io.write_gamma_csv(str(tmp_path / "Gamma_mean.csv"), t.gamma, t.data.samples)
    rng = np.random.default_rng(2)
    total = np.full(t.data.S, 40.0)
    cov = (t.gamma * total[:, None]).T
    etaG = rng.integers(0, 2, size=(20, t.gamma.shape[1]))
    etaG[etaG.sum(1) == 0, 0] = 1
    x = rng.poisson(etaG @ cov)
    df = pd.DataFrame(x, index=[f"gene{i}" for i in range(20)],
                      columns=t.data.samples)
    df.insert(0, "n_positions", 100)  # the genecov metadata column
    df.to_csv(tmp_path / "gene_cov.csv")
    pd.DataFrame({"cov": total}, index=t.data.samples).to_csv(
        tmp_path / "total.csv")
    stub = str(tmp_path / "ganp_")
    rc = main(["geneassign", "-g", str(tmp_path / "Gamma_mean.csv"),
               "-c", str(tmp_path / "gene_cov.csv"),
               "-t", str(tmp_path / "total.csv"), "-o", stub])
    assert rc == 0
    calls = pd.read_csv(stub + "etaS_df.csv", index_col=0).to_numpy()
    assert calls.shape == etaG.shape
    assert (calls == etaG).mean() > 0.9


def test_resolvenhap_cli(workdir, tmp_path, capsys):
    d, t = workdir
    outs = []
    for G in (1, 2, 3):
        out = str(tmp_path / f"run_{G}_0")
        main(["desman", str(d / "counts.csv"), "-g", str(G), "-o", out,
              "-i", "30", "-e", str(d / "tran_df.csv")])
        outs.append(out)
    rc = main(["resolvenhap", str(tmp_path / "run_*"),
               "-o", str(tmp_path / "best.txt"),
               "-c", str(tmp_path / "chosen")])
    assert rc == 0
    line = open(tmp_path / "best.txt").read().strip().splitlines()[1]
    G = int(line.split(",")[0])
    assert G == 2, f"picked G={G}"
    # -c copies the chosen run's haplotype/abundance outputs (SURVEY.md §3.4)
    chosen_dir = line.split(",")[4]
    for name in ("Filtered_Tau_star.csv", "Gamma_mean.csv", "fit.txt"):
        src = os.path.join(chosen_dir, name)
        dst = os.path.join(str(tmp_path / "chosen"), name)
        assert os.path.isfile(dst), name
        assert open(dst).read() == open(src).read()


def test_diag_cli(workdir, tmp_path, capsys):
    d, t = workdir
    for s in (0, 1):
        main(["desman", str(d / "counts.csv"), "-g", "2", "-s", str(s),
              "-o", str(tmp_path / f"dg_2_{s}"), "-i", "30"])
    rc = main(["diag", str(tmp_path / "dg_*"),
               "-o", str(tmp_path / "diag.csv")])
    assert rc == 0
    df = pd.read_csv(tmp_path / "diag.csv")
    row = df[df.G == 2].iloc[0]
    assert row.chains == 2
    assert np.isfinite(row.split_rhat) and row.ess_bulk > 0
    # two seeds on easy data agree on the haplotypes
    assert row.max_replicate_snp_distance <= 2


def test_unknown_command():
    assert main(["bogus"]) == 2


def test_geneassign_assign_tau_cli(workdir, tmp_path):
    """Reference --assign_tau parity: gene SNVs assigned with frozen gamma/eta."""
    d, t = workdir
    io.write_gamma_csv(str(tmp_path / "Gamma_mean.csv"), t.gamma, t.data.samples)
    rng = np.random.default_rng(1)
    total = np.full(t.data.S, 40.0)
    cov = (t.gamma * total[:, None]).T
    etaG = rng.integers(0, 2, size=(10, t.gamma.shape[1]))
    etaG[etaG.sum(1) == 0, 0] = 1
    x = rng.poisson(etaG @ cov)
    pd.DataFrame(x, index=[f"g{i}" for i in range(10)],
                 columns=t.data.samples).to_csv(tmp_path / "gene_cov.csv")
    pd.DataFrame({"cov": total}, index=t.data.samples).to_csv(tmp_path / "total.csv")
    # gene variant counts: reuse the core synthetic counts as gene SNVs
    io.write_counts_csv(str(tmp_path / "gene_var.csv"), t.data)
    io.write_eta_csv(str(tmp_path / "eta.csv"), t.eta)

    stub = str(tmp_path / "gat_")
    rc = main(["geneassign", "-g", str(tmp_path / "Gamma_mean.csv"),
               "-c", str(tmp_path / "gene_cov.csv"),
               "-t", str(tmp_path / "total.csv"),
               "--assign_tau", str(tmp_path / "gene_var.csv"),
               "-e", str(tmp_path / "eta.csv"), "-o", stub])
    assert rc == 0
    tau, _, _ = io.read_tau_star_csv(stub + "gene_tau_star.csv")
    # gamma/eta are the truth and strain order is pinned -> direct compare
    assert (tau == t.tau_idx).mean() > 0.97


def test_geneassign_assign_tau_requires_eta(workdir, tmp_path):
    d, t = workdir
    io.write_gamma_csv(str(tmp_path / "G.csv"), t.gamma, t.data.samples)
    pd.DataFrame(np.ones((3, t.data.S)), index=list("abc"),
                 columns=t.data.samples).to_csv(tmp_path / "gc.csv")
    rc = main(["geneassign", "-g", str(tmp_path / "G.csv"),
               "-c", str(tmp_path / "gc.csv"),
               "--assign_tau", "whatever.csv", "-o", str(tmp_path / "s_")])
    assert rc == 2


def test_desman_cli_store_every_and_diag(small_synth, tmp_path):
    """--store_every writes draws.npz; diag consumes it (VERDICT r1 item 6)."""
    from desman_tpu import io
    from desman_tpu.cli import main

    t = small_synth
    counts = str(tmp_path / "counts.csv")
    io.write_counts_csv(counts, t.data)
    out = str(tmp_path / "out")
    rc = main(["desman", counts, "-g", "2", "-o", out, "-i", "20",
               "--store_every", "2"])
    assert rc == 0
    draws = io.read_draws(os.path.join(out, "draws.npz"))
    assert draws["tau"].shape == (5, t.data.V, 2)   # samples=10, thin=2
    assert draws["thin"] == 2 and draws["burn"] == 10
    assert main(["diag", out]) == 0

    # --store_every now composes with --pt: cold-chain draws (r3)
    out_pt = str(tmp_path / "out_pt")
    rc = main(["desman", counts, "-g", "2", "-o", out_pt, "-i", "20",
               "--store_every", "2", "--pt", "2"])
    assert rc == 0
    draws = io.read_draws(os.path.join(out_pt, "draws.npz"))
    assert draws["tau"].shape == (5, t.data.V, 2)
    assert np.isfinite(draws["gamma"]).all()
    np.testing.assert_allclose(draws["gamma"].sum(-1), 1.0, rtol=1e-5)

    # r3: --store_every composes with --auto_burn too (draws from the
    # post-plateau sampling phase; see test_matrix.test_cli_matrix_combos_r3)
    out_ab = str(tmp_path / "out_ab")
    rc = main(["desman", counts, "-g", "2", "-o", out_ab, "-i", "20",
               "--store_every", "2", "--auto_burn", "--auto_max_burn", "40"])
    assert rc == 0
    draws = io.read_draws(os.path.join(out_ab, "draws.npz"))
    assert draws["tau"].shape == (5, t.data.V, 2)
