"""Base-major-resident sweep: the whole Gibbs sweep on the kernels' tiles.

PERF.md r4's deferred lever: the default pallas path still converts the
mixture to/from base-major around the tau kernel every sweep (~0.05 ms)
and runs the gamma MH (0.154 ms) and joint-eta likelihood (0.065 ms) as
XLA [V,S,4] passes. Here the scan CARRIES the mixture in base-major
[Vp, 4S] layout — padded once to the kernel tile size — and the whole
sweep is TWO pallas calls on those tiles:

    tau sweep + strain-pair swap + both gamma-MH likelihood terms
        (ops/fused_sweep.fused_sweep — one tile visit; the swap re-exports
        the post-swap per-sample loglik as the gamma MH's ll_old)
    -> [host: gamma/eta MH accepts on [S]-sized stats]
    -> accepted-gamma apply + joint-eta likelihood, fused
       (ops/gamma_pallas.gamma_apply_eta_bmajor)

(The staged single-purpose kernels — _sweep_bmajor, swap_bmajor emit_ll,
gamma_ll_bmajor — remain the bitwise reference for the fused call and
serve the swap_moves=False path.) Nothing [V]-sized touches XLA between
kernels, and the layout transposes are gone from the sweep entirely (one
conversion at init, none after — results need only tau/gamma/eta, never
the mixture).

Trajectory parity: identical PRNG streams and per-lane math as
sampler.make_sweep_fn's pallas+fused-swap path (pad rows are inert:
zero counts, never-accept swap thresholds, stripped from results);
decisions can diverge only at float-reduction knife edges
(tests/test_resident.py gates sweep agreement and posterior equality).

Scope: the single-device speed mode for the default sampling
configuration — eta_update="joint" (or fix_eta), no fix_tau/fix_gamma,
no stored draws. Every other mode keeps the composable `pallas` path
(--mesh/--pt/--checkpoint/--store_every); unsupported configs raise.
Reference parity: this replaces the same ``sampletau`` Cython+GSL hot
loop (SURVEY.md §2.1) as the other tau kernels — purely faster.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.fused_sweep import fused_sweep
from .ops.gamma_pallas import gamma_apply_eta_bmajor, gamma_ll_bmajor
from .ops.swap_pallas import draw_swap_proposal
from .ops.tau_pallas import (
    _round_up, _sweep_bmajor, _tile_rows, draw_gumbel, to_bmajor,
)
from .sampler import (
    SamplerAccum, SamplerConfig, SamplerResult, SamplerState,
    _dirichlet_logpdf, _result_from_accum, _sample_dirichlet, init_accum,
    init_state,
)
from .utils import NBASES, one_hot_tau, safe_log


def _check_supported(cfg: SamplerConfig) -> None:
    bad = []
    if cfg.fix_tau:
        bad.append("fix_tau")
    if cfg.fix_gamma:
        bad.append("fix_gamma")
    if cfg.store_samples:
        bad.append("store_samples")
    if not cfg.fix_eta and cfg.eta_update != "joint":
        bad.append(f"eta_update={cfg.eta_update!r}")
    if bad:
        raise ValueError(
            "the resident kernel path supports the default sampling "
            f"configuration only (unsupported here: {', '.join(bad)}) — "
            "use --kernel pallas for these modes")


def make_resident_sweep(cfg: SamplerConfig, n_bm, V: int, interpret: bool):
    """(state, accum, it) -> (state, accum, loglik) on base-major state.

    ``state.mix`` holds the PADDED base-major mixture [Vp, 4S]; tau and the
    accumulators are padded to Vp as well (pad rows stripped by the
    caller). Mirrors sampler.make_sweep_fn's stream/order exactly.
    """
    Vp, lanes = n_bm.shape
    S = lanes // NBASES
    eta_prior = (
        jnp.full((NBASES, NBASES), cfg.eta_prior_off)
        + jnp.eye(NBASES) * (cfg.eta_prior_diag - cfg.eta_prior_off)
    )

    def sweep(state: SamplerState, accum: SamplerAccum, it):
        key = jax.random.fold_in(state.key, it)
        k_tau, k_gamma, k_eta = jax.random.split(key, 3)
        tau, mix_bm, gamma, eta = state.tau, state.mix, state.gamma, state.eta
        G = tau.shape[1]

        # --- tau sweep (annealed exactly like make_sweep_fn) ---
        if cfg.anneal_temp0 > 1.0 and cfg.burn > 0:
            anneal_sweeps = max(int(cfg.burn * cfg.anneal_frac), 1)
            temp = jnp.maximum(
                1.0,
                jnp.float32(cfg.anneal_temp0)
                ** (1.0 - it.astype(jnp.float32) / anneal_sweeps),
            )
        else:
            temp = 1.0
        gz = draw_gumbel(k_tau, Vp, G, temp)
        # gamma proposal drawn up front (its stream never depends on the
        # sweep's outputs), so the tau sweep + swap + both gamma-MH
        # likelihood terms run as ONE kernel (ops/fused_sweep) — the tile
        # is read once per sweep for the whole front half
        k_prop, k_u = jax.random.split(k_gamma)
        kappa_g = state.kappa_gamma
        alpha_fwd = kappa_g * gamma + cfg.proposal_floor
        gamma_prop = _sample_dirichlet(k_prop, alpha_fwd)
        alpha_rev = kappa_g * gamma_prop + cfg.proposal_floor
        if cfg.swap_moves and G > 1:
            g_s, h_s, logu = draw_swap_proposal(
                jax.random.fold_in(k_tau, 12345), Vp, G)
            if V < Vp:  # pad rows never accept
                logu = jnp.where(jnp.arange(Vp) >= V, jnp.inf, logu)
            tau, mix_bm, ll2 = fused_sweep(
                n_bm, tau, mix_bm, gamma, eta, gz, g_s, h_s, logu,
                gamma_prop, interpret=interpret)
            ll_old, ll_new = ll2[0], ll2[1]
        else:
            tau, mix_bm = _sweep_bmajor(n_bm, mix_bm, tau, gz, gamma, eta,
                                        interpret=interpret)
            ll2 = gamma_ll_bmajor(n_bm, mix_bm, tau, gamma_prop, eta,
                                  interpret=interpret, with_old=True)
            ll_old, ll_new = ll2[0], ll2[1]

        # --- gamma MH accept (sampler.gamma_step's stream + math) ---
        log_ratio = (
            (ll_new - ll_old)
            + _dirichlet_logpdf(gamma, alpha_rev)
            - _dirichlet_logpdf(gamma_prop, alpha_fwd)
        )
        accept = safe_log(jax.random.uniform(k_u, (S,))) < log_ratio
        gamma = jnp.where(accept[:, None], gamma_prop, gamma)
        acc_g = jnp.mean(accept.astype(jnp.float32))
        loglik = jnp.sum(jnp.where(accept, ll_new, ll_old))

        # --- accepted-gamma apply + joint eta MH, one fused pass ---
        if cfg.fix_eta:
            mix_bm, _ = gamma_apply_eta_bmajor(
                n_bm, mix_bm, tau, gamma_prop, accept, eta,
                interpret=interpret, with_eta=False)
            acc_e = jnp.float32(0.0)
        else:
            kp, ku = jax.random.split(k_eta)
            kappa_e = state.kappa_eta
            alpha_fwd_e = kappa_e * eta + cfg.proposal_floor
            eta_prop = _sample_dirichlet(kp, alpha_fwd_e)
            alpha_rev_e = kappa_e * eta_prop + cfg.proposal_floor
            mix_bm, ll_eta = gamma_apply_eta_bmajor(
                n_bm, mix_bm, tau, gamma_prop, accept, eta_prop,
                interpret=interpret)
            ll_new_e = jnp.sum(ll_eta)
            log_ratio_e = (
                (ll_new_e - loglik)
                + jnp.sum((eta_prior - 1.0)
                          * (safe_log(eta_prop) - safe_log(eta)))
                + jnp.sum(_dirichlet_logpdf(eta, alpha_rev_e))
                - jnp.sum(_dirichlet_logpdf(eta_prop, alpha_fwd_e))
            )
            acc_e_b = safe_log(jax.random.uniform(ku, ())) < log_ratio_e
            eta = jnp.where(acc_e_b, eta_prop, eta)
            loglik = jnp.where(acc_e_b, ll_new_e, loglik)
            acc_e = acc_e_b.astype(jnp.float32)

        # --- adaptation + accumulators: verbatim make_sweep_fn ---
        if cfg.adapt_kappa:
            adapting = (it < cfg.burn).astype(jnp.float32)
            kg = state.kappa_gamma * jnp.exp(
                adapting * cfg.adapt_rate * (cfg.target_accept - acc_g))
            ke = state.kappa_eta * jnp.exp(
                adapting * cfg.adapt_rate * (cfg.target_accept - acc_e))
            kg = jnp.clip(kg, 10.0, 1e9)
            ke = jnp.clip(ke, 10.0, 1e10)
        else:
            kg, ke = state.kappa_gamma, state.kappa_eta

        new_state = SamplerState(
            tau=tau, gamma=gamma, eta=eta, mix=mix_bm, loglik=loglik,
            key=state.key, kappa_gamma=kg, kappa_eta=ke,
        )
        is_sample = (it >= cfg.burn).astype(jnp.float32)
        is_star = loglik > accum.star_loglik
        accum = SamplerAccum(
            sum_tau=accum.sum_tau + is_sample * one_hot_tau(tau),
            sum_gamma=accum.sum_gamma + is_sample * gamma,
            sum_eta=accum.sum_eta + is_sample * eta,
            sum_loglik=accum.sum_loglik + is_sample * loglik,
            n_samples=accum.n_samples + is_sample,
            star_loglik=jnp.where(is_star, loglik, accum.star_loglik),
            star_tau=jnp.where(is_star, tau, accum.star_tau),
            star_gamma=jnp.where(is_star, gamma, accum.star_gamma),
            star_eta=jnp.where(is_star, eta, accum.star_eta),
            acc_gamma=accum.acc_gamma + acc_g,
            acc_eta=accum.acc_eta + acc_e,
            acc_gamma_post=accum.acc_gamma_post + is_sample * acc_g,
            acc_eta_post=accum.acc_eta_post + is_sample * acc_e,
        )
        return new_state, accum, loglik

    return sweep


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def run_chain_resident(
    n: jax.Array,
    cfg: SamplerConfig,
    key: jax.Array,
    eta_init: Optional[jax.Array] = None,
    tau_init: Optional[jax.Array] = None,
    gamma_init: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> SamplerResult:
    """run_chain on the base-major-resident sweep (same signature/stream).

    interpret=None auto-selects Pallas interpreter mode off-TPU (CPU CI).
    """
    _check_supported(cfg)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = n.astype(jnp.float32)
    V, S, _ = n.shape
    state = init_state(n, cfg, key, eta_init, tau_init, gamma_init)

    Vt = min(_round_up(V, 8), _tile_rows(S))
    Vp = _round_up(V, Vt)
    pad = Vp - V
    n_bm = to_bmajor(n)
    mix_bm = to_bmajor(state.mix)
    tau = state.tau
    if pad:
        n_bm = jnp.pad(n_bm, ((0, pad), (0, 0)))
        mix_pad = jnp.zeros((pad, NBASES * S), jnp.float32)
        mix_pad = mix_pad.at[:, :S].set(1.0)      # valid simplex rows
        mix_bm = jnp.concatenate([mix_bm, mix_pad], axis=0)
        tau = jnp.pad(tau, ((0, pad), (0, 0)))
    state = state._replace(tau=tau, mix=mix_bm)
    accum = init_accum(Vp, S, cfg.G)
    sweep = make_resident_sweep(cfg, n_bm, V, interpret)

    def step(carry, it):
        state, accum = carry
        state, accum, ll = sweep(state, accum, it)
        return (state, accum), ll

    (state, accum), trace = jax.lax.scan(
        step, (state, accum), jnp.arange(cfg.total_sweeps)
    )
    res = _result_from_accum(accum, cfg, trace)
    if pad:
        res = res._replace(tau_mean=res.tau_mean[:V],
                           tau_star=res.tau_star[:V])
    return res


def run_chains_resident(n, cfg: SamplerConfig, seeds, eta_init=None,
                        tau_init=None, interpret=None) -> SamplerResult:
    """vmapped multi-seed variant (the --chains fan-out)."""
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in np.asarray(seeds)])
    fn = lambda k: run_chain_resident(n, cfg, k, eta_init=eta_init,
                                      tau_init=tau_init, interpret=interpret)
    return jax.vmap(fn)(keys)
