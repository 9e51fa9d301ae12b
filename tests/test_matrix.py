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

    # the one permitted rejection: --auto_burn --pt
    assert main(["desman", csv, "-g", "2", "-o", str(tmp_path / "x"),
                 "-i", "8", "--auto_burn", "--pt", "3"]) == 2

# ---------------------------------------------------------------------------
# round 3: --store_every rides every mode; remaining mesh triples close
# ---------------------------------------------------------------------------

def _small(V=30):
    return synth.generate(V=V, S=6, G=2, coverage=30.0, seed=0)


def test_store_draws_survive_checkpointing(tmp_path):
    """Segmented (checkpointed) runs return bitwise the draws of an
    uninterrupted run — plain, multi-chain, and PT (cold rung)."""
    from desman_tpu.checkpoint import (
        run_chain_checkpointed, run_chain_pt_checkpointed,
    )
    from desman_tpu.sampler import run_chain

    t = _small()
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                        store_thin=3, nmf_iters=30)

    ref = run_chain(n, cfg, jax.random.PRNGKey(0))
    # checkpoint_every=7 deliberately misaligned with the thin grid
    got = run_chain_checkpointed(n, cfg, jax.random.PRNGKey(0),
                                 str(tmp_path / "c.npz"), checkpoint_every=7)
    assert np.array_equal(np.asarray(ref.tau_samples),
                          np.asarray(got.tau_samples))
    assert np.array_equal(np.asarray(ref.gamma_samples),
                          np.asarray(got.gamma_samples))
    assert np.array_equal(np.asarray(ref.eta_samples),
                          np.asarray(got.eta_samples))

    refc = run_chains(n, cfg, seeds=[0, 1])
    gotc = run_chains_checkpointed(n, cfg, _keys([0, 1]),
                                   str(tmp_path / "cc.npz"),
                                   checkpoint_every=7)
    assert np.array_equal(np.asarray(refc.tau_samples),
                          np.asarray(gotc.tau_samples))

    refp = run_chain_pt(n, cfg, jax.random.PRNGKey(0), n_replicas=3,
                        max_temp=4.0)
    gotp = run_chain_pt_checkpointed(n, cfg, jax.random.PRNGKey(0),
                                     str(tmp_path / "p.npz"),
                                     checkpoint_every=7, n_replicas=3,
                                     max_temp=4.0)
    assert np.array_equal(np.asarray(refp.tau_samples),
                          np.asarray(gotp.tau_samples))


def test_chains_sharded_checkpointed_matrix(tmp_path):
    """--mesh x --checkpoint x --chains (+ --store_every): bitwise equal to
    the uninterrupted sharded run, through a crash and a mesh-shape change."""
    from desman_tpu.parallel import (
        make_mesh, run_chains_sharded, run_chains_sharded_checkpointed,
    )

    t = _small(V=30)  # pads to 32 on the 4-wide data axis
    cfg = SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                        store_thin=3, nmf_iters=30)
    mesh = make_mesh(n_chain=2, n_data=4)
    ref = run_chains_sharded(t.data.counts, cfg, [0, 1], mesh=mesh)

    ck = run_chains_sharded_checkpointed(
        t.data.counts, cfg, [0, 1], str(tmp_path / "ck1"),
        checkpoint_every=7, mesh=mesh)
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(ck.tau_star))
    assert np.array_equal(np.asarray(ref.tau_samples),
                          np.asarray(ck.tau_samples))
    assert np.array_equal(np.asarray(ref.loglik_trace),
                          np.asarray(ck.loglik_trace))

    # crash mid-run, then resume on a DIFFERENT mesh shape
    assert run_chains_sharded_checkpointed(
        t.data.counts, cfg, [0, 1], str(tmp_path / "ck2"),
        checkpoint_every=7, mesh=mesh, stop_after=10) is None
    ck2 = run_chains_sharded_checkpointed(
        t.data.counts, cfg, [0, 1], str(tmp_path / "ck2"),
        checkpoint_every=7, mesh=make_mesh(n_chain=1, n_data=8))
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(ck2.tau_star))
    assert np.array_equal(np.asarray(ref.tau_samples),
                          np.asarray(ck2.tau_samples))


def test_auto_burn_on_mesh_matches_single_device():
    """--auto_burn x --mesh: same plateau decision, bitwise-identical
    trajectories and stored draws as the unsharded multi-chain run."""
    from desman_tpu.parallel import make_mesh

    t = _small(V=30)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                        store_thin=3, nmf_iters=30)
    keys = _keys([0, 1])
    res_m, burn_m, _ = run_chains_auto(n, cfg, keys,
                                    mesh=make_mesh(n_chain=2, n_data=4),
                                    check_every=8, max_burn=40)
    res_s, burn_s, _ = run_chains_auto(n, cfg, keys, check_every=8, max_burn=40)
    assert burn_m == burn_s
    assert np.array_equal(np.asarray(res_m.tau_star),
                          np.asarray(res_s.tau_star))
    assert np.array_equal(np.asarray(res_m.tau_samples),
                          np.asarray(res_s.tau_samples))
    # every DECISION (tau draws, stars, plateau) is bitwise mesh-invariant;
    # gamma values drift in the last f32 bits per sweep (psum reduction
    # order) and the drift compounds over the ~40 auto-burn sweeps, so the
    # means get a loose absolute bar only
    np.testing.assert_allclose(np.asarray(res_m.gamma_mean),
                               np.asarray(res_s.gamma_mean), atol=5e-3)


def test_cli_matrix_combos_r3(tmp_path):
    from desman_tpu.cli import main

    t = _small(V=48)
    csv = str(tmp_path / "c.csv")
    io.write_counts_csv(csv, t.data)

    # --store_every x --checkpoint
    out = str(tmp_path / "store_ck")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--store_every", "2", "--checkpoint",
               str(tmp_path / "sck.npz"), "--checkpoint_every", "5"])
    assert rc == 0
    d = io.read_draws(os.path.join(out, "draws.npz"))
    assert d["tau"].shape[0] == 4  # 8 sampling sweeps / thin 2

    # --store_every x --auto_burn
    out = str(tmp_path / "store_auto")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--store_every", "2", "--auto_burn", "--auto_max_burn", "40"])
    assert rc == 0
    assert io.read_draws(os.path.join(out, "draws.npz"))["tau"].shape[0] == 4

    # --store_every x --pt x --mesh
    out = str(tmp_path / "store_pt_mesh")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--store_every", "2", "--pt", "4", "--mesh", "2x4"])
    assert rc == 0
    assert io.read_draws(os.path.join(out, "draws.npz"))["tau"].shape[0] == 4

    # --auto_burn x --mesh (x --chains)
    out = str(tmp_path / "auto_mesh")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--auto_burn", "--auto_max_burn", "40", "--mesh", "2x4",
               "--chains", "2"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))

    # --mesh x --checkpoint x --chains (+ --store_every)
    out = str(tmp_path / "mesh_ck_chains")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--mesh", "2x4", "--chains", "2", "--store_every", "2",
               "--checkpoint", str(tmp_path / "mckc"),
               "--checkpoint_every", "5"])
    assert rc == 0 and os.path.exists(os.path.join(out, "chains.json"))
    assert io.read_draws(os.path.join(out, "draws.npz"))["tau"].shape[0] == 4

    # the two remaining structural rejections stay rejected
    assert main(["desman", csv, "-g", "2", "-o", str(tmp_path / "x1"),
                 "-i", "16", "--auto_burn", "--pt", "2"]) == 2
    assert main(["desman", csv, "-g", "2", "-o", str(tmp_path / "x2"),
                 "-i", "16", "--pt", "2", "--mesh", "2x4",
                 "--chains", "2"]) == 2


def test_pt_sharded_checkpointed_matrix(tmp_path):
    """--pt x --mesh x --checkpoint (VERDICT r3 missing #3): bitwise equal to
    the uninterrupted sharded PT run, through a crash + resume on a
    DIFFERENT mesh shape, stored cold-rung draws included."""
    from desman_tpu.parallel import (
        make_mesh, run_chain_pt_sharded, run_chain_pt_sharded_checkpointed,
    )

    t = _small(V=30)  # pads to 32 on the 4-wide data axis
    cfg = SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                        store_thin=3, nmf_iters=30)
    mesh = make_mesh(n_chain=2, n_data=4)
    key = jax.random.PRNGKey(0)
    ref = run_chain_pt_sharded(t.data.counts, cfg, key, n_replicas=2,
                               max_temp=4.0, mesh=mesh)

    ck = run_chain_pt_sharded_checkpointed(
        t.data.counts, cfg, key, str(tmp_path / "ck1"), checkpoint_every=7,
        n_replicas=2, max_temp=4.0, mesh=mesh)
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(ck.tau_star))
    assert np.array_equal(np.asarray(ref.tau_samples),
                          np.asarray(ck.tau_samples))
    assert np.array_equal(np.asarray(ref.loglik_trace),
                          np.asarray(ck.loglik_trace))
    np.testing.assert_allclose(float(ref.pt_swap_accept),
                               float(ck.pt_swap_accept), rtol=1e-6)

    # crash mid-run, then resume on a DIFFERENT mesh shape
    assert run_chain_pt_sharded_checkpointed(
        t.data.counts, cfg, key, str(tmp_path / "ck2"), checkpoint_every=7,
        n_replicas=2, max_temp=4.0, mesh=mesh, stop_after=10) is None
    ck2 = run_chain_pt_sharded_checkpointed(
        t.data.counts, cfg, key, str(tmp_path / "ck2"), checkpoint_every=7,
        n_replicas=2, max_temp=4.0, mesh=make_mesh(n_chain=1, n_data=8))
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(ck2.tau_star))
    assert np.array_equal(np.asarray(ref.tau_samples),
                          np.asarray(ck2.tau_samples))


def test_auto_burn_mesh_checkpointed_matrix(tmp_path):
    """--auto_burn x --mesh x --checkpoint (VERDICT r3 missing #3): same
    plateau decision and bitwise-identical tau trajectories/draws as the
    uninterrupted mesh run, including a crash + resume."""
    from desman_tpu.parallel import make_mesh

    t = _small(V=30)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                        store_thin=3, nmf_iters=30)
    keys = _keys([0, 1])
    mesh = make_mesh(n_chain=2, n_data=4)
    ref, burn_ref, _ = run_chains_auto(n, cfg, keys, mesh=mesh, check_every=8,
                                    max_burn=40)

    ck, burn_ck, _ = run_chains_auto(
        n, cfg, keys, mesh=mesh, check_every=8, max_burn=40,
        checkpoint_path=str(tmp_path / "ab1"))
    assert burn_ck == burn_ref
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(ck.tau_star))
    assert np.array_equal(np.asarray(ref.tau_samples),
                          np.asarray(ck.tau_samples))

    # interrupted: run a shortened-sample pass to force a mid-flight stop,
    # then resume with the full config from the committed snapshot
    short = SamplerConfig(G=2, burn=10, samples=4, store_samples=True,
                          store_thin=1, nmf_iters=30)
    run_chains_auto(n, short, keys, mesh=mesh, check_every=8, max_burn=40,
                    checkpoint_path=str(tmp_path / "ab2"))
    # store_thin must agree across lives for the shard files to line up;
    # rerun with the real cfg resumes from the last committed segment
    full2, burn2, _ = run_chains_auto(
        n, SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                         store_thin=1, nmf_iters=30),
        keys, mesh=mesh, check_every=8, max_burn=40,
        checkpoint_path=str(tmp_path / "ab2"))
    ref2, _, _ = run_chains_auto(
        n, SamplerConfig(G=2, burn=10, samples=12, store_samples=True,
                         store_thin=1, nmf_iters=30),
        keys, mesh=mesh, check_every=8, max_burn=40)
    assert burn2 == burn_ref
    assert np.array_equal(np.asarray(ref2.tau_star),
                          np.asarray(full2.tau_star))
    assert np.array_equal(np.asarray(ref2.tau_samples),
                          np.asarray(full2.tau_samples))


def test_cli_pt_mesh_checkpoint_and_auto_mesh_checkpoint(tmp_path):
    """The two newly-closed CLI cells run end-to-end and write outputs."""
    from desman_tpu.cli import main

    t = _small(V=48)
    csv = str(tmp_path / "c.csv")
    io.write_counts_csv(csv, t.data)

    out = str(tmp_path / "pt_mesh_ck")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--pt", "2", "--mesh", "2x4", "--store_every", "2",
               "--checkpoint", str(tmp_path / "pmck"),
               "--checkpoint_every", "5"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))
    assert io.read_draws(os.path.join(out, "draws.npz"))["tau"].shape[0] == 4

    out = str(tmp_path / "auto_mesh_ck")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "16",
               "--auto_burn", "--auto_max_burn", "40", "--mesh", "2x4",
               "--chains", "2", "--store_every", "2",
               "--checkpoint", str(tmp_path / "amck"),
               "--checkpoint_every", "8"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))
    assert io.read_draws(os.path.join(out, "draws.npz"))["tau"].shape[0] == 4
