"""CLI capability-matrix cells (VERDICT r1 item 4): --checkpoint x --chains,
--auto_burn x --chains, --pt x --chains, --pt x --mesh, --pt x -t/-f.

Each new library combination is asserted equivalent to its un-combined
counterpart (bitwise where the trajectories are shared), and each CLI
combination runs end-to-end.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desman_tpu import io, synth
from desman_tpu.checkpoint import run_chains_checkpointed
from desman_tpu.converge import run_chains_auto
from desman_tpu.sampler import (
    SamplerConfig, run_chain_pt, run_chains, run_chains_pt,
)

pytestmark = pytest.mark.slow  # long MCMC runs (make test-fast skips)


def _keys(seeds):
    return jnp.stack([jax.random.PRNGKey(s) for s in seeds])


def test_chains_checkpointed_equals_run_chains(small_synth, tmp_path):
    n = jnp.asarray(small_synth.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=8, samples=8, nmf_iters=40)
    ref = run_chains(n, cfg, seeds=[0, 1, 2])
    got = run_chains_checkpointed(
        n, cfg, _keys([0, 1, 2]), str(tmp_path / "c.npz"), checkpoint_every=5
    )
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.gamma_mean),
                               np.asarray(got.gamma_mean), rtol=1e-6)


def test_chains_checkpointed_resume(small_synth, tmp_path):
    n = jnp.asarray(small_synth.data.counts, jnp.float32)
    ckpt = str(tmp_path / "c.npz")
    partial_cfg = SamplerConfig(G=2, burn=8, samples=2, nmf_iters=40)
    full_cfg = SamplerConfig(G=2, burn=8, samples=8, nmf_iters=40)
    run_chains_checkpointed(n, partial_cfg, _keys([0, 1]), ckpt,
                            checkpoint_every=5)
    got = run_chains_checkpointed(n, full_cfg, _keys([0, 1]), ckpt,
                                  checkpoint_every=5)
    ref = run_chains(n, full_cfg, seeds=[0, 1])
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)


def test_run_chains_pt_matches_per_seed_runs(small_synth):
    n = jnp.asarray(small_synth.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=6, samples=6, nmf_iters=30)
    got = run_chains_pt(n, cfg, seeds=[0, 1], n_replicas=3, max_temp=4.0)
    for i, seed in enumerate([0, 1]):
        ref = run_chain_pt(n, cfg, jax.random.PRNGKey(seed), n_replicas=3,
                           max_temp=4.0)
        assert np.array_equal(np.asarray(ref.tau_star),
                              np.asarray(got.tau_star[i]))
        np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                                   np.asarray(got.loglik_trace[i]), rtol=1e-5)


def test_pt_with_fixed_tau(small_synth):
    """PT with tau frozen to the truth (-f semantics) fits gamma only."""
    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=3, burn=10, samples=10, nmf_iters=10, fix_tau=True)
    tau_true = jnp.asarray(t.tau_idx, jnp.int32)
    res = run_chain_pt(n, cfg, jax.random.PRNGKey(0), n_replicas=3,
                       max_temp=4.0, tau_init=tau_true)
    assert np.array_equal(np.asarray(res.tau_star), np.asarray(t.tau_idx))
    from desman_tpu.utils import match_gamma_perm

    mae, _ = match_gamma_perm(t.gamma, np.asarray(res.gamma_mean))
    assert mae < 0.05


def test_run_chains_auto_recovers_truth():
    t = synth.generate(V=80, S=10, G=2, coverage=60.0, seed=21)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=30, samples=40, nmf_iters=40)
    res, burn_used, _ = run_chains_auto(n, cfg, _keys([0, 1]), check_every=20,
                                     max_burn=1000)
    assert 30 <= burn_used <= 400, burn_used
    from desman_tpu.utils import snp_distance_perm

    best = int(np.argmax(np.asarray(res.star_loglik)))
    assert snp_distance_perm(t.tau_idx, np.asarray(res.tau_star[best])) == 0
    assert res.loglik_trace.shape == (2, burn_used + 40)


def test_run_chains_auto_checkpoint_resume(tmp_path):
    """Interrupted auto-burn run == uninterrupted one (plateau-detector
    state rides the snapshot extras; the PRNG folds absolute sweep indices,
    so segmentation differences cannot change the trajectory)."""
    t = synth.generate(V=60, S=8, G=2, coverage=50.0, seed=5)
    n = jnp.asarray(t.data.counts, jnp.float32)
    partial_cfg = SamplerConfig(G=2, burn=20, samples=5, nmf_iters=30)
    full_cfg = SamplerConfig(G=2, burn=20, samples=20, nmf_iters=30)

    ref, ref_burn, _ = run_chains_auto(n, full_cfg, _keys([0, 1]),
                                    check_every=10, max_burn=100)

    # "crash" 5 sampling sweeps into phase 2, then resume the full run
    ckpt = str(tmp_path / "auto.npz")
    run_chains_auto(n, partial_cfg, _keys([0, 1]), check_every=10,
                    max_burn=100, checkpoint_path=ckpt)
    got, got_burn, _ = run_chains_auto(n, full_cfg, _keys([0, 1]),
                                    check_every=10, max_burn=100,
                                    checkpoint_path=ckpt)
    assert got_burn == ref_burn
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)


def test_cli_matrix_combos(tmp_path):
    from desman_tpu.cli import main

    t = synth.generate(V=48, S=6, G=2, coverage=50.0, seed=3)
    csv = str(tmp_path / "c.csv")
    io.write_counts_csv(csv, t.data)

    # --checkpoint with --chains
    out = str(tmp_path / "ck_chains")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16", "--chains",
               "2", "--checkpoint", str(tmp_path / "ckc.npz"),
               "--checkpoint_every", "5"])
    assert rc == 0 and os.path.exists(os.path.join(out, "chains.json"))

    # --auto_burn with --chains
    out = str(tmp_path / "auto_chains")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--chains", "2", "--auto_burn", "--auto_max_burn", "60"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))

    # --pt with --chains
    out = str(tmp_path / "pt_chains")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--chains", "2", "--pt", "3"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))

    # --pt with --mesh (replicas on the chain axis)
    out = str(tmp_path / "pt_mesh")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--pt", "4", "--mesh", "2x4"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))

    # --pt with -t (tau init)
    tau_csv = str(tmp_path / "tau.csv")
    io.write_tau_star_csv(tau_csv, t.tau_idx, t.data.contigs,
                          t.data.positions)
    out = str(tmp_path / "pt_tinit")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--pt", "3", "-t", tau_csv])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))

    # --auto_burn single chain with --checkpoint
    out = str(tmp_path / "auto_ck")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--auto_burn", "--auto_max_burn", "60",
               "--checkpoint", str(tmp_path / "ac.npz")])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))

    # --auto_burn --pt composes since r5 (cold-rung trace); its
    # multi-chain variant remains a documented exclusion
    assert main(["desman", csv, "-g", "2", "-o", str(tmp_path / "x"),
                 "-i", "8", "--auto_burn", "--pt", "3", "--chains",
                 "2"]) == 2
