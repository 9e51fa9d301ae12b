"""The DESMAN generative model's likelihood, as batched XLA ops.

Model (SURVEY.md §0.1, Quince et al. 2017):

    p[v,s,b] = sum_a ( sum_g tau[v,g,a] * gamma[s,g] ) * eta[a,b]
    n[v,s,:] ~ Multinomial(N[v,s], p[v,s,:])
    logL     = sum_vs [ logMultinomCoeff(n[v,s,:]) + sum_b n[v,s,b] log p[v,s,b] ]
    D        = -2 logL

Everything reduces over the position axis V, so under a position-sharded mesh
XLA lowers these reductions to psum collectives automatically (see
desman_tpu.parallel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import heinsum, log_multinomial_coeff, one_hot_tau, safe_log


def mixture(tau_onehot: jax.Array, gamma: jax.Array) -> jax.Array:
    """M[v,s,a] = sum_g gamma[s,g] * tau[v,g,a] — the true-base mixture."""
    return heinsum("vga,sg->vsa", tau_onehot, gamma)


def probs(tau_onehot: jax.Array, gamma: jax.Array, eta: jax.Array) -> jax.Array:
    """p[v,s,b] = (M @ eta)[v,s,b]."""
    return heinsum("vga,sg,ab->vsb", tau_onehot, gamma, eta)


def log_likelihood(
    n: jax.Array, tau_onehot: jax.Array, gamma: jax.Array, eta: jax.Array,
    include_coeff: bool = True,
) -> jax.Array:
    """Full-data multinomial log-likelihood (scalar).

    include_coeff adds the multinomial coefficient term; it is constant in
    (tau,gamma,eta) so samplers may omit it, but the deviance written to
    fit.txt includes it for parity with the reference's definition.
    """
    p = probs(tau_onehot, gamma, eta)
    ll = jnp.sum(n * safe_log(p))
    if include_coeff:
        ll = ll + jnp.sum(log_multinomial_coeff(n, axis=-1))
    return ll


def log_likelihood_tau_idx(
    n: jax.Array, tau_idx: jax.Array, gamma: jax.Array, eta: jax.Array,
    include_coeff: bool = True,
) -> jax.Array:
    return log_likelihood(n, one_hot_tau(tau_idx), gamma, eta, include_coeff)


def deviance(
    n: jax.Array, tau_onehot: jax.Array, gamma: jax.Array, eta: jax.Array
) -> jax.Array:
    """D = -2 logL — the model-selection statistic recorded in fit.txt."""
    return -2.0 * log_likelihood(n, tau_onehot, gamma, eta, include_coeff=True)


def per_sample_loglik(
    n: jax.Array, tau_onehot: jax.Array, gamma: jax.Array, eta: jax.Array
) -> jax.Array:
    """logL decomposed per sample [S] (no coeff) — the gamma-MH target.

    gamma_s only enters sample s's factor, so all samples' MH proposals can
    be accepted/rejected in parallel (a valid blocked update).
    """
    p = probs(tau_onehot, gamma, eta)
    return heinsum("vsb->s", n * safe_log(p))


def log_likelihood_host_f64(
    counts, tau_idx, gamma, eta, include_coeff: bool = True
) -> float:
    """Exact float64 log-likelihood on host numpy (same math as the device
    f32 path, including the 1e-12 probability floor).

    The deviances written to fit.txt are computed through this (and through
    math.fsum over the f32 per-sweep trace for the posterior mean) so model
    selection never rides the f32 tree-reduction error of a sum over V*S*4
    terms (SURVEY.md §7.3 'f32 vs f64'; the measured drift margin is gated
    in tests/test_likelihood.py::test_f32_deviance_drift_at_scale).
    Cost: one O(V*S*16) numpy pass per finished run — not a hot path.
    """
    import numpy as np

    n = np.asarray(counts, np.float64)
    tau_idx = np.asarray(tau_idx)
    gamma = np.asarray(gamma, np.float64)
    eta = np.asarray(eta, np.float64)
    onehot = np.eye(4, dtype=np.float64)[tau_idx]          # [V,G,4]
    mix = np.einsum("vga,sg->vsa", onehot, gamma)
    p = mix @ eta                                          # [V,S,4]
    ll = float(np.sum(n * np.log(np.maximum(p, 1e-12))))
    if include_coeff:
        ll += total_coeff_host_f64(n)
    return ll


def total_coeff_host_f64(counts) -> float:
    """Multinomial-coefficient term of logL in float64 on host."""
    import numpy as np
    from scipy.special import gammaln

    n = np.asarray(counts, np.float64)
    return float(
        np.sum(gammaln(n.sum(axis=-1) + 1.0)) - np.sum(gammaln(n + 1.0))
    )


def snv_uncertainty(tau_mean: jax.Array, threshold: float = 0.9) -> jax.Array:
    """Fraction of (position, strain) posterior base calls below `threshold`.

    The reference's model-selection rule pairs posterior mean deviance with a
    mean SNV-uncertainty statistic over the posterior tau (SURVEY.md §3.4);
    a call is 'uncertain' when its posterior mode probability < threshold.
    """
    conf = jnp.max(tau_mean, axis=-1)  # [V,G]
    return jnp.mean((conf < threshold).astype(jnp.float32))
