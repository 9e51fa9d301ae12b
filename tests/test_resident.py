"""Base-major-resident sweep (desman_tpu.resident + ops/gamma_pallas).

The resident path must be a pure speed mode: identical PRNG streams and
per-lane math as the pallas+fused-swap path, so trajectories agree except
at float-reduction knife edges, and the posterior contract (truth
recovery) holds unchanged. CPU runs the kernels in interpreter mode.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desman_tpu import synth, utils
from desman_tpu.likelihood import mixture
from desman_tpu.ops.tau_pallas import from_bmajor, to_bmajor
from desman_tpu.sampler import SamplerConfig, run_chain
from desman_tpu.utils import heinsum, one_hot_tau, safe_log

INTERPRET = jax.default_backend() != "tpu"


def test_gamma_ll_kernel_matches_xla():
    """gamma_ll_bmajor == the stacked-mixture loglik pair gamma_step
    evaluates, to f32 reduction-order tolerance."""
    from desman_tpu.ops.gamma_pallas import gamma_ll_bmajor

    t = synth.generate(V=96, S=12, G=3, coverage=50.0, seed=0)
    n = jnp.asarray(t.data.counts, jnp.float32)
    rng = np.random.default_rng(0)
    tau = jnp.asarray(rng.integers(0, 4, size=(96, 3)), jnp.int32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    gp = jnp.asarray(rng.dirichlet(np.ones(3), size=12), jnp.float32)
    eta = jnp.asarray(t.eta, jnp.float32)
    mix = mixture(one_hot_tau(tau), gamma)

    ll2 = gamma_ll_bmajor(to_bmajor(n), to_bmajor(mix), tau, gp, eta,
                          interpret=INTERPRET)

    def ll_s(m):
        return heinsum("vsb->s", n * safe_log(heinsum("vsa,ab->vsb", m, eta)))

    np.testing.assert_allclose(np.asarray(ll2[0]), np.asarray(ll_s(mix)),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ll2[1]),
        np.asarray(ll_s(mixture(one_hot_tau(tau), gp))), rtol=1e-6)


def test_apply_eta_kernel_matches_xla():
    """Accepted samples take the fresh proposal mixture (gamma_step's
    semantics); the fused eta loglik matches a plain pass."""
    from desman_tpu.ops.gamma_pallas import gamma_apply_eta_bmajor

    t = synth.generate(V=64, S=8, G=2, coverage=40.0, seed=1)
    n = jnp.asarray(t.data.counts, jnp.float32)
    rng = np.random.default_rng(1)
    tau = jnp.asarray(rng.integers(0, 4, size=(64, 2)), jnp.int32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    gp = jnp.asarray(rng.dirichlet(np.ones(2), size=8), jnp.float32)
    eta_prop = jnp.asarray(synth.make_eta(0.02), jnp.float32)
    mix = mixture(one_hot_tau(tau), gamma)
    accept = jnp.asarray(rng.random(8) < 0.5)

    mix_k, ll_eta = gamma_apply_eta_bmajor(
        to_bmajor(n), to_bmajor(mix), tau, gp, accept, eta_prop,
        interpret=INTERPRET)
    ref = jnp.where(accept[None, :, None], mixture(one_hot_tau(tau), gp), mix)
    np.testing.assert_allclose(np.asarray(from_bmajor(mix_k, 8)),
                               np.asarray(ref), rtol=1e-5, atol=1e-7)
    want = heinsum("vsb->s", n * safe_log(heinsum("vsa,ab->vsb", ref,
                                                  eta_prop)))
    np.testing.assert_allclose(np.asarray(ll_eta), np.asarray(want),
                               rtol=1e-6)
    # with_eta=False skips the logs and returns zeros
    _, z = gamma_apply_eta_bmajor(to_bmajor(n), to_bmajor(mix), tau, gp,
                                  accept, eta_prop, interpret=INTERPRET,
                                  with_eta=False)
    assert np.array_equal(np.asarray(z), np.zeros(8, np.float32))


def test_resident_chain_matches_pallas_chain():
    """Whole chain vs the composable pallas path: same streams, so the
    trajectories agree except at knife-edge ties — none on this data.
    Odd V exercises the resident pad rows (inert + stripped)."""
    from desman_tpu.ops.tau_pallas import tau_sweep_pallas
    from desman_tpu.resident import run_chain_resident

    t = synth.generate(V=101, S=10, G=3, coverage=50.0, seed=5)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=3, burn=30, samples=30, nmf_iters=60)
    ref = run_chain(n, cfg, jax.random.PRNGKey(0),
                    tau_sweep=functools.partial(tau_sweep_pallas,
                                                interpret=INTERPRET))
    got = run_chain_resident(n, cfg, jax.random.PRNGKey(0),
                             interpret=INTERPRET)
    agree = (np.asarray(ref.tau_star) == np.asarray(got.tau_star)).mean()
    assert agree >= 0.999, agree
    np.testing.assert_allclose(np.asarray(got.loglik_trace),
                               np.asarray(ref.loglik_trace), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.gamma_mean),
                               np.asarray(ref.gamma_mean), atol=1e-4)
    assert utils.snp_distance_perm(t.tau_idx, np.asarray(got.tau_star)) == 0


def test_resident_fix_eta_and_chains():
    from desman_tpu.resident import run_chain_resident, run_chains_resident

    t = synth.generate(V=80, S=8, G=2, coverage=50.0, seed=7)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=15, samples=15, fix_eta=True, nmf_iters=30)
    res = run_chain_resident(n, cfg, jax.random.PRNGKey(0),
                             eta_init=jnp.asarray(t.eta, jnp.float32),
                             interpret=INTERPRET)
    assert np.allclose(np.asarray(res.eta_star), t.eta, atol=1e-6)
    assert utils.snp_distance_perm(t.tau_idx, np.asarray(res.tau_star)) == 0

    resv = run_chains_resident(
        n, SamplerConfig(G=2, burn=5, samples=5, nmf_iters=20), [0, 1],
        interpret=INTERPRET)
    assert resv.loglik_trace.shape == (2, 10)
    assert not np.allclose(resv.loglik_trace[0], resv.loglik_trace[1])


def test_resident_rejects_unsupported_configs():
    from desman_tpu.resident import run_chain_resident

    n = jnp.asarray(synth.generate(V=16, S=4, G=2, seed=0).data.counts,
                    jnp.float32)
    for bad in [dict(fix_tau=True), dict(fix_gamma=True),
                dict(store_samples=True), dict(eta_update="rows")]:
        cfg = SamplerConfig(G=2, burn=2, samples=2, nmf_iters=5, **bad)
        with pytest.raises(ValueError, match="resident"):
            run_chain_resident(n, cfg, jax.random.PRNGKey(0),
                               interpret=INTERPRET)


def test_resident_cli(tmp_path):
    import os

    from desman_tpu import io
    from desman_tpu.cli import main

    t = synth.generate(V=60, S=6, G=2, coverage=50.0, seed=3)
    csv = str(tmp_path / "c.csv")
    io.write_counts_csv(csv, t.data)
    out = str(tmp_path / "out")
    rc = main(["desman", csv, "-g", "2", "-o", out, "-i", "20",
               "--kernel", "pallas_resident"])
    assert rc == 0 and os.path.exists(os.path.join(out, "fit.txt"))
    rc2 = main(["desman", csv, "-g", "2", "-o", str(tmp_path / "o2"),
                "-i", "20", "--chains", "2", "--kernel", "pallas_resident"])
    assert rc2 == 0
    # documented exclusions exit cleanly
    assert main(["desman", csv, "-g", "2", "-o", str(tmp_path / "x"),
                 "-i", "20", "--kernel", "pallas_resident",
                 "--mesh", "2x4"]) == 2
    assert main(["desman", csv, "-g", "2", "-o", str(tmp_path / "x"),
                 "-i", "20", "--kernel", "pallas_resident", "--pt",
                 "2"]) == 2


def test_fused_front_half_matches_staged_kernels():
    """ops/fused_sweep (tau+swap+gamma-ll in one kernel) is BITWISE equal
    to the staged tau_pallas -> swap_pallas(emit_ll) -> gamma_ll pipeline:
    same operands, same op order, only the HBM round-trips removed."""
    from desman_tpu.ops.fused_sweep import fused_sweep
    from desman_tpu.ops.gamma_pallas import gamma_ll_bmajor
    from desman_tpu.ops.swap_pallas import draw_swap_proposal, swap_bmajor
    from desman_tpu.ops.tau_pallas import _sweep_bmajor, draw_gumbel

    V, S, G = 512, 12, 4
    t = synth.generate(V=V, S=S, G=G, coverage=50.0, seed=0)
    n_bm = to_bmajor(jnp.asarray(t.data.counts, jnp.float32))
    rng = np.random.default_rng(0)
    tau0 = jnp.asarray(rng.integers(0, 4, (V, G)), jnp.int32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    eta = jnp.asarray(t.eta, jnp.float32)
    mix_bm = to_bmajor(mixture(one_hot_tau(tau0), gamma))
    key = jax.random.PRNGKey(3)
    gz = draw_gumbel(key, V, G, 1.0)
    g_s, h_s, logu = draw_swap_proposal(jax.random.fold_in(key, 12345), V, G)
    gp = jnp.asarray(rng.dirichlet(np.ones(G), size=S), jnp.float32)

    t1, m1 = _sweep_bmajor(n_bm, mix_bm, tau0, gz, gamma, eta,
                           interpret=INTERPRET)
    t1, m1, ll_old = swap_bmajor(n_bm, t1, m1, gamma, eta, g_s, h_s, logu,
                                 interpret=INTERPRET, emit_ll=True)
    ll2 = gamma_ll_bmajor(n_bm, m1, t1, gp, eta, interpret=INTERPRET,
                          with_old=False)
    tf, mf, llf = fused_sweep(n_bm, tau0, mix_bm, gamma, eta, gz, g_s, h_s,
                              logu, gp, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(tf))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(mf))
    np.testing.assert_array_equal(np.asarray(ll_old), np.asarray(llf[0]))
    np.testing.assert_array_equal(np.asarray(ll2[1]), np.asarray(llf[1]))
