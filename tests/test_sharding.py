"""Mesh-sharded execution gates (SURVEY.md §7.2 step 6): the sharded run must
compile, execute, and produce trajectories identical to the single-device run
for the same seeds, on any mesh shape."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desman_tpu.parallel import make_mesh, run_chains_sharded
from desman_tpu.parallel.mesh import pad_positions
from desman_tpu.sampler import SamplerConfig, run_chains


@pytest.fixture(scope="module")
def cfg():
    return SamplerConfig(G=2, burn=4, samples=4, nmf_iters=30)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pad_positions():
    c = np.ones((10, 3, 4), np.float32)
    p, V = pad_positions(c, 8)
    assert p.shape[0] == 16 and V == 10
    assert (p[10:] == 0).all()


def test_sharded_matches_single_device(small_synth, cfg):
    t = small_synth
    seeds = [0, 1]
    ref = run_chains(jnp.asarray(t.data.counts, jnp.float32), cfg, seeds)

    mesh = make_mesh(n_chain=2, n_data=4)
    got = run_chains_sharded(t.data.counts, cfg, seeds, mesh=mesh)

    # bitwise-identical trajectories across mesh shapes (partitionable PRNG)
    assert np.array_equal(np.asarray(got.tau_star), np.asarray(ref.tau_star))
    np.testing.assert_allclose(
        np.asarray(got.loglik_trace), np.asarray(ref.loglik_trace), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.gamma_mean), np.asarray(ref.gamma_mean), rtol=1e-4, atol=1e-6
    )


def test_sharded_mesh_shapes_agree(small_synth, cfg):
    t = small_synth
    seeds = [3]
    a = run_chains_sharded(t.data.counts, cfg, seeds, mesh=make_mesh(n_chain=1, n_data=8))
    b = run_chains_sharded(t.data.counts, cfg, seeds, mesh=make_mesh(n_chain=1, n_data=2,
                                                                     devices=jax.devices()[:2]))
    assert np.array_equal(np.asarray(a.tau_star), np.asarray(b.tau_star))
    np.testing.assert_allclose(
        np.asarray(a.loglik_trace), np.asarray(b.loglik_trace), rtol=1e-5
    )


def test_sharded_pt_matches_single_device(small_synth):
    """Parallel tempering on a (chain, data) mesh == single-device PT: the
    temperature-swap exchange is replica-local, so sharding replicas over
    the chain axis must not change the trajectory."""
    from desman_tpu.parallel import run_chain_pt_sharded
    from desman_tpu.sampler import run_chain_pt

    t = small_synth
    cfg = SamplerConfig(G=2, burn=4, samples=4, nmf_iters=30)
    key = jax.random.PRNGKey(5)
    ref = run_chain_pt(jnp.asarray(t.data.counts, jnp.float32), cfg, key,
                       n_replicas=2, max_temp=4.0)
    got = run_chain_pt_sharded(t.data.counts, cfg, key, n_replicas=2,
                               max_temp=4.0, mesh=make_mesh(n_chain=2, n_data=4))
    assert np.array_equal(np.asarray(got.tau_star), np.asarray(ref.tau_star))
    np.testing.assert_allclose(
        np.asarray(got.loglik_trace), np.asarray(ref.loglik_trace), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.gamma_mean), np.asarray(ref.gamma_mean),
        rtol=1e-4, atol=1e-6,
    )


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out[3]))


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_desman_cli_mesh(small_synth, tmp_path):
    """--mesh CLI path executes on a virtual device mesh."""
    from desman_tpu import io
    from desman_tpu.cli import main

    t = small_synth
    counts = str(tmp_path / "counts.csv")
    io.write_counts_csv(counts, t.data)
    out = str(tmp_path / "out")
    rc = main(["desman", counts, "-g", "2", "-o", out, "-i", "20",
               "--chains", "2", "--mesh", "2x4"])
    assert rc == 0
    import os
    assert os.path.exists(os.path.join(out, "chains.json"))


def test_sharded_checkpoint_resume(small_synth, tmp_path):
    """Interrupted + resumed sharded run == uninterrupted sharded run with
    the SAME segmentation (bitwise: only the npz round-trip differs).

    The comparison partner must share the segment schedule: different
    segment lengths compile different GSPMD programs whose psum orderings
    differ in the last ulp, which can flip a borderline MH acceptance —
    that is cross-program float noise, not a resume defect."""
    from desman_tpu.parallel import run_chain_sharded_checkpointed
    from desman_tpu.sampler import run_chain

    t = small_synth
    key = jax.random.PRNGKey(13)
    mesh = make_mesh(n_chain=1, n_data=4, devices=jax.devices()[:4])

    partial_cfg = SamplerConfig(G=2, burn=6, samples=1, nmf_iters=30)
    full_cfg = SamplerConfig(G=2, burn=6, samples=6, nmf_iters=30)
    # "crash" after one 7-sweep segment, then resume the full run
    ckpt = str(tmp_path / "sh.npz")
    run_chain_sharded_checkpointed(t.data.counts, partial_cfg, key, ckpt,
                                   checkpoint_every=7, mesh=mesh)
    got = run_chain_sharded_checkpointed(t.data.counts, full_cfg, key, ckpt,
                                         checkpoint_every=7, mesh=mesh)
    ref = run_chain_sharded_checkpointed(
        t.data.counts, full_cfg, key, str(tmp_path / "ref.npz"),
        checkpoint_every=7, mesh=mesh,
    )
    assert np.array_equal(np.asarray(got.tau_star), np.asarray(ref.tau_star))
    np.testing.assert_array_equal(np.asarray(got.loglik_trace),
                                  np.asarray(ref.loglik_trace))
    np.testing.assert_array_equal(np.asarray(got.gamma_mean),
                                  np.asarray(ref.gamma_mean))
    # and the single-device chain agrees up to cross-program float noise
    sd = run_chain(jnp.asarray(t.data.counts, jnp.float32), full_cfg, key)
    np.testing.assert_allclose(np.asarray(got.loglik_trace),
                               np.asarray(sd.loglik_trace), rtol=1e-4)
    agree = (np.asarray(got.tau_star) == np.asarray(sd.tau_star)).mean()
    assert agree > 0.99, agree


def test_sharded_checkpoint_resume_across_mesh_shapes(small_synth, tmp_path):
    """VERDICT r1 item 2: a checkpoint written on one mesh shape resumes on
    another. Per-process shard files are keyed by global row offset, and
    load_sharded rebuilds into the NEW mesh's shardings, so the layouts are
    independent. Different data-axis sizes compile different psum reduction
    orders -> last-ulp trace differences (cross-program float noise, same
    caveat as test_sharded_checkpoint_resume), so cross-mesh comparisons are
    allclose + tau agreement; the SAME-mesh resume above stays bitwise."""
    from desman_tpu.parallel import run_chain_sharded_checkpointed

    t = small_synth
    key = jax.random.PRNGKey(13)
    mesh8 = make_mesh(n_chain=1, n_data=8)
    mesh4 = make_mesh(n_chain=1, n_data=4, devices=jax.devices()[:4])
    mesh24 = make_mesh(n_chain=2, n_data=4)

    full_cfg = SamplerConfig(G=2, burn=6, samples=6, nmf_iters=30)
    # crash on the 8-way mesh after one 7-sweep segment...
    ckpt = str(tmp_path / "cross_mesh_ckpt")
    out = run_chain_sharded_checkpointed(
        t.data.counts, full_cfg, key, ckpt, checkpoint_every=7, mesh=mesh8,
        stop_after=7,
    )
    assert out is None  # simulated crash
    # ...resume on a 4-way mesh (fewer devices, e.g. after losing a host)
    got4 = run_chain_sharded_checkpointed(
        t.data.counts, full_cfg, key, ckpt, checkpoint_every=7, mesh=mesh4)
    ref = run_chain_sharded_checkpointed(
        t.data.counts, full_cfg, key, str(tmp_path / "ref_ckpt"),
        checkpoint_every=7, mesh=mesh8,
    )
    agree = (np.asarray(got4.tau_star) == np.asarray(ref.tau_star)).mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(np.asarray(got4.loglik_trace),
                               np.asarray(ref.loglik_trace), rtol=1e-4)
    # and onto a (chain, data) mesh that REPLICATES the chain axis; got4
    # completed the run, so this exercises pure load-at-completion
    got24 = run_chain_sharded_checkpointed(
        t.data.counts, full_cfg, key, ckpt, checkpoint_every=7, mesh=mesh24)
    np.testing.assert_array_equal(np.asarray(got24.tau_star),
                                  np.asarray(got4.tau_star))


def _sweep_all_reduce_count(cfg, mesh):
    """Count all-reduce launches in the compiled HLO of ONE sweep with
    position-sharded inputs (the per-sweep collective budget of
    docs/SCALING.md)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from desman_tpu.parallel.sharded import _accum_shardings, _state_shardings
    from desman_tpu.sampler import init_accum, init_state, make_sweep_fn

    V, S = 64, 16
    n = jnp.asarray(
        np.random.default_rng(0).poisson(10.0, (V, S, 4)), jnp.float32
    )
    n = jax.device_put(n, NamedSharding(mesh, P("data", None, None)))
    st = jax.jit(
        lambda n, k: init_state(n, cfg, k),
        out_shardings=_state_shardings(mesh),
    )(n, jax.random.PRNGKey(0))
    ac = jax.tree_util.tree_map(
        jax.device_put, init_accum(V, S, cfg.G), _accum_shardings(mesh)
    )
    sweep = make_sweep_fn(cfg)
    f = jax.jit(lambda n, st, ac, it: sweep(n, st, ac, it))
    txt = f.lower(n, st, ac, jnp.int32(0)).compile().as_text()
    return txt.count(" all-reduce(") + txt.count(" all-reduce-start(")


def test_collectives_per_sweep_budget():
    """VERDICT r1 item 9: the fused gamma old/new reduction plus the blocked
    eta update bound the sweep at <=3 all-reduces; joint mode must never use
    more collectives than per-row mode."""
    mesh = make_mesh(n_chain=1, n_data=8)
    rows = _sweep_all_reduce_count(
        SamplerConfig(G=4, burn=4, samples=4, eta_update="rows"), mesh
    )
    joint = _sweep_all_reduce_count(
        SamplerConfig(G=4, burn=4, samples=4, eta_update="joint"), mesh
    )
    assert joint <= 3, f"joint-eta sweep uses {joint} all-reduces"
    assert rows <= 5, f"rows-eta sweep uses {rows} all-reduces"
    assert joint <= rows, (joint, rows)
