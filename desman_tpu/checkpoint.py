"""Checkpoint / exact resume for sampler chains.

The reference has no within-run checkpointing — a crashed run is re-run
(SURVEY.md §5). Here a run can be executed as segments of sweeps with the
full chain state (tau, gamma, eta, mixture cache, PRNG key, sweep index,
posterior accumulators) serialized to a single .npz between segments.
Because every sweep derives its randomness by folding the *absolute* sweep
index into the chain key (sampler.make_sweep_fn), a resumed run continues
the exact trajectory of an uninterrupted one (tested bitwise in
tests/test_checkpoint.py).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampler import (
    SamplerAccum, SamplerConfig, SamplerResult, SamplerState, init_accum,
    init_state, make_sweep_fn, tau_sweep_xla,
)

_STATE_FIELDS = SamplerState._fields
_ACCUM_FIELDS = SamplerAccum._fields


def save(path: str, state: SamplerState, accum: SamplerAccum, it: int,
         trace: np.ndarray) -> None:
    """Serialize a chain snapshot atomically (write + rename)."""
    payload = {f"state_{k}": np.asarray(v) for k, v in zip(_STATE_FIELDS, state)}
    payload.update(
        {f"accum_{k}": np.asarray(v) for k, v in zip(_ACCUM_FIELDS, accum)}
    )
    payload["it"] = np.asarray(it, np.int64)
    payload["trace"] = np.asarray(trace, np.float32)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    # np.savez appends .npz only when missing; tmp already ends with it
    os.replace(tmp, path)


def load(path: str) -> Tuple[SamplerState, SamplerAccum, int, np.ndarray]:
    z = np.load(path)
    state = SamplerState(*[jnp.asarray(z[f"state_{k}"]) for k in _STATE_FIELDS])
    accum = SamplerAccum(*[jnp.asarray(z[f"accum_{k}"]) for k in _ACCUM_FIELDS])
    return state, accum, int(z["it"]), np.asarray(z["trace"])


@partial(jax.jit, static_argnames=("cfg", "n_sweeps", "tau_sweep"))
def run_segment(
    n: jax.Array,
    cfg: SamplerConfig,
    state: SamplerState,
    accum: SamplerAccum,
    start_it: int,
    n_sweeps: int,
    tau_sweep=tau_sweep_xla,
):
    """Advance a chain n_sweeps from absolute sweep index start_it."""
    sweep = make_sweep_fn(cfg, tau_sweep)

    def step(carry, it):
        state, accum = carry
        state, accum, ll = sweep(n, state, accum, it)
        return (state, accum), ll

    (state, accum), trace = jax.lax.scan(
        step, (state, accum), start_it + jnp.arange(n_sweeps)
    )
    return state, accum, trace


def run_chain_checkpointed(
    n: jax.Array,
    cfg: SamplerConfig,
    key: jax.Array,
    checkpoint_path: str,
    checkpoint_every: int = 50,
    eta_init=None,
    tau_init=None,
    tau_sweep=tau_sweep_xla,
) -> SamplerResult:
    """run_chain with periodic checkpoints and automatic resume.

    If checkpoint_path exists the run resumes from it; otherwise it starts
    fresh. The final result is identical to sampler.run_chain with the same
    (n, cfg, key) regardless of how many times the run was interrupted.
    """
    n = n.astype(jnp.float32)
    V, S, _ = n.shape

    if os.path.exists(checkpoint_path):
        state, accum, it, trace_done = load(checkpoint_path)
        trace_parts = [trace_done[:it]]
    else:
        state = init_state(n, cfg, key, eta_init, tau_init)
        accum = init_accum(V, S, cfg.G)
        it = 0
        trace_parts = []

    while it < cfg.total_sweeps:
        seg = min(checkpoint_every, cfg.total_sweeps - it)
        state, accum, trace = run_segment(
            n, cfg, state, accum, it, seg, tau_sweep=tau_sweep
        )
        it += seg
        trace_parts.append(np.asarray(trace))
        save(checkpoint_path, state, accum, it, np.concatenate(trace_parts))

    trace = jnp.asarray(np.concatenate(trace_parts))
    n_s = jnp.maximum(accum.n_samples, 1.0)
    return SamplerResult(
        tau_mean=accum.sum_tau / n_s,
        tau_star=accum.star_tau,
        gamma_mean=accum.sum_gamma / n_s,
        gamma_star=accum.star_gamma,
        eta_mean=accum.sum_eta / n_s,
        eta_star=accum.star_eta,
        mean_loglik=accum.sum_loglik / n_s,
        star_loglik=accum.star_loglik,
        loglik_trace=trace,
        accept_gamma=accum.acc_gamma / cfg.total_sweeps,
        accept_eta=accum.acc_eta / cfg.total_sweeps,
    )
