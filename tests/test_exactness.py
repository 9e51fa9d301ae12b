"""Sampler exactness: with gamma/eta frozen, the tau Gibbs chain's posterior
mean must match the EXACT per-position posterior (computable by enumerating
all 4^G joint assignments — the same enumeration geneassign.assign_gene_tau
uses). This validates the conditional-posterior math end-to-end, a stronger
check than recovery tests (which only probe the mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from desman_tpu import synth
from desman_tpu.geneassign import assign_gene_tau
from desman_tpu.sampler import SamplerConfig, run_chain


def test_gibbs_matches_exact_posterior():
    # small V so the chain averages many sweeps per position; moderate
    # coverage so posteriors are non-degenerate (some genuine uncertainty)
    t = synth.generate(V=24, S=3, G=2, coverage=6.0, seed=42)
    n = jnp.asarray(t.data.counts, jnp.float32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    eta = jnp.asarray(t.eta, jnp.float32)

    # exact per-position posterior over joint strain assignments
    _, exact_mean = assign_gene_tau(t.data.counts, t.gamma, t.eta)

    cfg = SamplerConfig(
        G=2, burn=500, samples=4000, fix_gamma=True, fix_eta=True,
        anneal_temp0=1.0, adapt_kappa=False, nmf_iters=10,
    )
    res = run_chain(n, cfg, jax.random.PRNGKey(0), eta_init=eta,
                    gamma_init=gamma)

    got = np.asarray(res.tau_mean)          # [V,G,4]
    want = np.asarray(exact_mean)
    err = np.abs(got - want).max()
    # MC error with 4000 draws of a {0,1} indicator ~ 0.008 sd; allow 5 sd
    assert err < 0.05, f"max |MCMC - exact| = {err}"
    # and the bulk should be much tighter
    assert np.abs(got - want).mean() < 0.01


def test_fix_gamma_holds():
    t = synth.generate(V=30, S=4, G=2, coverage=30.0, seed=1)
    n = jnp.asarray(t.data.counts, jnp.float32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    cfg = SamplerConfig(G=2, burn=5, samples=5, fix_gamma=True, nmf_iters=20)
    res = run_chain(n, cfg, jax.random.PRNGKey(0), gamma_init=gamma)
    assert np.allclose(np.asarray(res.gamma_star), t.gamma, atol=1e-6)
