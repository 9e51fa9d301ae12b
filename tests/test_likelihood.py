import jax.numpy as jnp
import numpy as np
from scipy.stats import multinomial

from desman_tpu import likelihood, synth, utils


def test_log_multinomial_coeff_matches_scipy():
    n = np.array([[3, 1, 0, 2], [5, 0, 0, 0]])
    got = np.asarray(utils.log_multinomial_coeff(jnp.asarray(n)))
    for i, row in enumerate(n):
        p = np.full(4, 0.25)
        want = multinomial.logpmf(row, row.sum(), p) - (row * np.log(p)).sum()
        assert np.allclose(got[i], want, atol=1e-4)


def test_loglik_matches_scipy_multinomial():
    t = synth.generate(V=30, S=4, G=2, coverage=20.0, seed=3)
    tau_oh = jnp.asarray(np.eye(4)[t.tau_idx], jnp.float32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    eta = jnp.asarray(t.eta, jnp.float32)
    n = jnp.asarray(t.data.counts, jnp.float32)

    got = float(likelihood.log_likelihood(n, tau_oh, gamma, eta))

    p = np.einsum("vga,sg,ab->vsb", np.eye(4)[t.tau_idx], t.gamma, t.eta)
    want = 0.0
    for v in range(t.data.V):
        for s in range(t.data.S):
            c = t.data.counts[v, s]
            if c.sum() > 0:
                want += multinomial.logpmf(c, c.sum(), p[v, s] / p[v, s].sum())
    assert np.allclose(got, want, rtol=1e-4)


def test_probs_rows_are_simplex():
    t = synth.generate(V=10, S=3, G=2, seed=0)
    p = likelihood.probs(
        jnp.asarray(np.eye(4)[t.tau_idx], jnp.float32),
        jnp.asarray(t.gamma, jnp.float32),
        jnp.asarray(t.eta, jnp.float32),
    )
    assert np.allclose(np.asarray(p).sum(-1), 1.0, atol=1e-5)


def test_snv_uncertainty():
    tau_mean = jnp.array([[[1.0, 0, 0, 0]], [[0.5, 0.5, 0, 0]]])  # [2,1,4]
    u = float(likelihood.snv_uncertainty(tau_mean, threshold=0.9))
    assert np.isclose(u, 0.5)


def test_bh_fdr_monotone():
    p = np.array([0.001, 0.01, 0.02, 0.8, 0.9])
    q = utils.bh_fdr(p)
    assert (np.diff(q[np.argsort(p)]) >= -1e-12).all()
    assert q.max() <= 1.0
    # classic check: largest p keeps its value
    assert np.isclose(q[np.argsort(p)][-1], 0.9)


def test_snp_distance_perm_invariant_to_relabeling():
    rng = np.random.default_rng(0)
    tau = rng.integers(0, 4, size=(50, 3))
    perm = [2, 0, 1]
    assert utils.snp_distance_perm(tau, tau[:, perm]) == 0
    tau_b = tau[:, perm].copy()
    tau_b[0, 0] = (tau_b[0, 0] + 1) % 4
    assert utils.snp_distance_perm(tau, tau_b) == 1


def test_f32_deviance_drift_at_scale():
    """VERDICT r1 item 5: at the north-star scale (V=1e5, S=96) the f32
    device log-likelihood's reduction error must sit far (>=10x) below the
    deviance deltas model selection discriminates; fit.txt itself is written
    from the f64 host path (run.write_outputs), so this gates the margin of
    the per-sweep trace that feeds the posterior-mean deviance."""
    import numpy as np

    from desman_tpu.likelihood import (
        log_likelihood_host_f64, log_likelihood_tau_idx,
    )

    V, S, G = 100_000, 96, 8
    rng = np.random.default_rng(0)
    tau = rng.integers(0, 4, (V, G))
    gamma = rng.dirichlet(np.ones(G), size=S).astype(np.float32)
    eta = np.asarray(synth.make_eta(0.01), np.float32)
    onehot = np.eye(4, dtype=np.float32)[tau]
    p = np.einsum("vga,sg->vsa", onehot, gamma) @ eta
    counts = rng.poisson(50.0 * p).astype(np.float32)

    ll32 = float(log_likelihood_tau_idx(
        jnp.asarray(counts), jnp.asarray(tau), jnp.asarray(gamma),
        jnp.asarray(eta), include_coeff=False,
    ))
    ll64 = log_likelihood_host_f64(counts, tau, gamma, eta,
                                   include_coeff=False)
    drift = abs(ll32 - ll64)

    # a realistic selection delta: the same data explained with two strains
    # collapsed (the G vs G-1 comparison resolve_nhap makes)
    gamma_merged = gamma.copy()
    gamma_merged[:, 0] += gamma_merged[:, 1]
    gamma_merged[:, 1] = 0.0
    ll64_merged = log_likelihood_host_f64(counts, tau, gamma_merged, eta,
                                          include_coeff=False)
    delta = abs(ll64 - ll64_merged)

    assert np.isfinite(ll32) and np.isfinite(ll64)
    assert drift * 10.0 < delta, (drift, delta)
    # and the absolute drift is small in relative terms
    assert drift < 1e-5 * abs(ll64), (drift, ll64)
