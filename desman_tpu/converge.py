"""Convergence-adaptive runs: stop burning in when the chain plateaus.

The reference runs a fixed iteration count (``desman -i``, SURVEY.md §3.1) —
users guess, and model selection silently degrades when the guess is low
(PERF.md's under-convergence failure mode). Here the burn-in length is
decided by the chain itself: advance in segments (checkpoint.run_segment,
so the PRNG stream is the absolute-sweep-indexed one) without accumulating,
until the segment-mean log-likelihood stops improving; then sample a fixed
number of sweeps.
"""
from __future__ import annotations

import os
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import (
    _DrawBuf, init_chains, load, load_extras, run_segment,
    run_segment_chains, run_segment_chains_store, run_segment_store, save,
    stored_slots,
)
from .sampler import SamplerConfig, init_accum, init_state, tau_sweep_xla
from .sampler import _result_from_accum


def run_chain_auto(
    n: jax.Array,
    cfg: SamplerConfig,
    key: jax.Array,
    eta_init=None,
    tau_init=None,
    check_every: int = 50,
    rel_tol: float = 1e-5,
    max_burn: int = 2000,
    tau_sweep=tau_sweep_xla,
):
    """run_chain with data-driven burn-in length.

    Burn-in advances ``check_every`` sweeps at a time until the segment-mean
    loglik stops improving — improvement below 2 standard errors of the
    segment mean (the MC noise floor, self-calibrating) or below ``rel_tol``
    relative — but at least ``cfg.burn`` sweeps (the tempered-annealing
    schedule still runs over cfg.burn * anneal_frac sweeps) — capped at
    ``max_burn``. Then ``cfg.samples`` sweeps are accumulated. Returns
    (SamplerResult, burn_used).
    """
    n = n.astype(jnp.float32)
    V, S, _ = n.shape
    max_burn = max(max_burn, cfg.burn)

    state = init_state(n, cfg, key, eta_init, tau_init)
    # phase 1 — burn until plateau. The accumulation/adaptation gates take
    # a TRACED burn override (run_segment burn=...), so every phase-1
    # segment shares ONE compiled program and the phase-2 program does not
    # depend on where the plateau landed. The anneal schedule follows the
    # static cfg.burn (the guaranteed minimum burn).
    never = jnp.int32(np.iinfo(np.int32).max)  # accumulate nothing
    scratch = init_accum(V, S, cfg.G)  # phase-1 accum, discarded
    it = 0
    trace_parts = []
    prev_mean: Optional[float] = None
    while it < max_burn:
        seg = min(check_every, max_burn - it)
        state, scratch, trace = run_segment(
            n, cfg, state, scratch, it, seg, tau_sweep=tau_sweep, burn=never,
        )
        it += seg
        trace = np.asarray(trace)
        trace_parts.append(trace)
        mean = float(trace.mean())
        # autocorrelation inflates the naive stderr; 2x the naive one is a
        # pragmatic bar — improvement below it is indistinguishable from
        # segment-mean noise
        stderr = float(trace.std()) / max(np.sqrt(seg), 1.0)
        if prev_mean is not None and it >= cfg.burn:
            improvement = mean - prev_mean
            if (improvement < 2.0 * stderr
                    or abs(improvement) < rel_tol * max(abs(prev_mean), 1.0)):
                break
        prev_mean = mean

    # phase 2 — sample: accumulate cfg.samples sweeps from the plateau.
    # traced burn=it gates accumulation on (>= it) and freezes adaptation;
    # the anneal temp is already 1 past cfg.burn * anneal_frac <= it.
    accum = init_accum(V, S, cfg.G)
    fields = {}
    if cfg.store_samples:
        state, accum, trace, tau_s, gamma_s, eta_s = run_segment_store(
            n, cfg, state, accum, it, cfg.samples, tau_sweep=tau_sweep,
            burn=jnp.int32(it),
        )
        draws = _DrawBuf()
        draws.append(stored_slots(it, cfg.samples, it, cfg.store_thin),
                     tau_s, gamma_s, eta_s)
        fields = draws.result_fields()
    else:
        state, accum, trace = run_segment(
            n, cfg, state, accum, it, cfg.samples, tau_sweep=tau_sweep,
            burn=jnp.int32(it),
        )
    trace_parts.append(np.asarray(trace))

    # acceptance normalization divides by the passed cfg's total_sweeps;
    # only the cfg.samples phase-2 sweeps accumulated acceptance values
    res = _result_from_accum(
        accum, replace(cfg, burn=0, samples=cfg.samples),
        jnp.asarray(np.concatenate(trace_parts)), **fields,
    )
    return res, it


def run_chains_auto(
    n: jax.Array,
    cfg: SamplerConfig,
    keys: jax.Array,
    eta_init=None,
    tau_init=None,
    check_every: int = 50,
    rel_tol: float = 1e-5,
    max_burn: int = 2000,
    tau_sweep=tau_sweep_xla,
    checkpoint_path: Optional[str] = None,
    mesh=None,
):
    """Multi-chain run_chain_auto with optional checkpoint/resume.

    keys: [C,2] stacked PRNG keys. Burn-in advances all chains together in
    ``check_every``-sweep segments until EVERY chain's segment-mean loglik
    plateaus (per-chain detection, same bar as run_chain_auto) or
    ``max_burn`` is hit; then ``cfg.samples`` sweeps are accumulated for all
    chains from that common point. With ``checkpoint_path`` each segment is
    snapshotted (plateau-detector state included via the extras channel) and
    a resumed run reproduces an uninterrupted one. Returns (vmapped
    SamplerResult, burn_used).

    ``mesh``: run on a (chain, data) mesh — positions shard over 'data'
    (zero-padded, stripped from the results) and chains over 'chain'; the
    plateau detector reads only the tiny [C, seg] trace. Trajectories are
    bitwise mesh-shape-invariant like every other sharded path. Checkpoints
    under a mesh would host-gather — not supported (use the fixed-burn
    run_chains_sharded_checkpointed for long sharded runs).
    """
    n = n.astype(jnp.float32)
    C = keys.shape[0]
    max_burn = max(max_burn, cfg.burn)
    never = jnp.int32(np.iinfo(np.int32).max)  # phase 1: accumulate nothing

    V_orig = n.shape[0]
    st_sh = ac_sh = rep = None
    if mesh is not None:
        if checkpoint_path:
            raise ValueError("run_chains_auto: checkpoint_path does not "
                             "compose with mesh (host-gather snapshot)")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import pad_positions, pad_tau, shard_counts
        from .parallel.sharded import (
            _accum_shardings_chains, _state_shardings_chains,
        )

        padded, V_orig = pad_positions(np.asarray(n, np.float32),
                                       mesh.shape["data"])
        n = shard_counts(jnp.asarray(padded), mesh)
        if tau_init is not None:
            tau_init = jnp.asarray(pad_tau(tau_init, mesh.shape["data"]),
                                   jnp.int32)
        keys = jax.device_put(keys, NamedSharding(mesh, P("chain")))
        st_sh = _state_shardings_chains(mesh)
        ac_sh = _accum_shardings_chains(mesh)
        rep = NamedSharding(mesh, P())

    def _host_trace(trace):
        # chain-sharded [C, seg] -> replicated -> host (tiny)
        return np.asarray(trace if rep is None
                          else jax.device_put(trace, rep))

    def _fresh_accums():
        V, S, _ = n.shape
        accums = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (C,) + jnp.shape(x)),
            init_accum(V, S, cfg.G),
        )
        if ac_sh is not None:
            accums = jax.tree_util.tree_map(jax.device_put, accums, ac_sh)
        return accums

    it = 0
    burn_used = -1  # -1 == still in phase 1
    prev_mean = np.full(C, np.nan, np.float64)
    done = np.zeros(C, bool)
    trace_parts = []
    draws = _DrawBuf()
    if checkpoint_path and os.path.exists(checkpoint_path):
        states, accums, it, trace_done = load(checkpoint_path)
        ex = load_extras(checkpoint_path)
        burn_used = int(ex["burn_used"])
        prev_mean = np.asarray(ex["prev_mean"], np.float64)
        done = np.asarray(ex["done"]).astype(bool)
        trace_parts = [np.asarray(trace_done)[:, :it]]
        draws = _DrawBuf(ex)  # phase-2 draws stored so far (if any)
    else:
        states, accums = init_chains(n, cfg, keys, eta_init, tau_init,
                                     out_shardings=st_sh)
        if ac_sh is not None:
            accums = jax.tree_util.tree_map(jax.device_put, accums, ac_sh)

    def _snapshot():
        if checkpoint_path:
            trace = (np.concatenate(trace_parts, axis=1) if trace_parts
                     else np.zeros((C, 0), np.float32))
            save(checkpoint_path, states, accums, it, trace,
                 extras={"burn_used": burn_used, "prev_mean": prev_mean,
                         "done": done, **draws.extras(axis=1)})

    # phase 1 — burn until every chain plateaus (accums is discarded scratch)
    while burn_used < 0:
        if done.all() or it >= max_burn:
            burn_used = it
            _snapshot()
            break
        seg = min(check_every, max_burn - it)
        states, accums, trace = run_segment_chains(
            n, cfg, states, accums, it, seg, tau_sweep=tau_sweep, burn=never,
        )
        it += seg
        trace = _host_trace(trace)                      # [C, seg]
        trace_parts.append(trace)
        mean = trace.mean(axis=1)
        stderr = trace.std(axis=1) / max(np.sqrt(seg), 1.0)
        if it >= cfg.burn:
            improvement = mean - prev_mean
            done |= (~np.isnan(prev_mean)) & (
                (improvement < 2.0 * stderr)
                | (np.abs(improvement)
                   < rel_tol * np.maximum(np.abs(prev_mean), 1.0))
            )
        prev_mean = mean
        if done.all() or it >= max_burn:
            burn_used = it
        _snapshot()

    # phase 2 — accumulate cfg.samples sweeps; traced burn gates on >= it
    target = burn_used + cfg.samples
    while it < target:
        if it == burn_used:  # entering phase 2: drop the scratch accums
            accums = _fresh_accums()
        seg = min(check_every, target - it) if checkpoint_path else target - it
        if cfg.store_samples:
            states, accums, trace, tau_s, gamma_s, eta_s = (
                run_segment_chains_store(
                    n, cfg, states, accums, it, seg, tau_sweep=tau_sweep,
                    burn=jnp.int32(burn_used),
                ))
            draws.append(stored_slots(it, seg, burn_used, cfg.store_thin),
                         tau_s, gamma_s, eta_s, axis=1)
        else:
            states, accums, trace = run_segment_chains(
                n, cfg, states, accums, it, seg, tau_sweep=tau_sweep,
                burn=jnp.int32(burn_used),
            )
        it += seg
        trace_parts.append(_host_trace(trace))
        _snapshot()

    trace = jnp.asarray(np.concatenate(trace_parts, axis=1))
    res_cfg = replace(cfg, burn=0, samples=cfg.samples)
    res = jax.vmap(lambda ac, tr: _result_from_accum(ac, res_cfg, tr))(
        accums, trace
    )
    res = res._replace(**draws.result_fields(axis=1))
    if mesh is not None and res.tau_mean.shape[1] != V_orig:
        res = res._replace(
            tau_mean=res.tau_mean[:, :V_orig],
            tau_star=res.tau_star[:, :V_orig],
            **({"tau_samples": res.tau_samples[:, :, :V_orig]}
               if res.tau_samples is not None else {}),
        )
    return res, burn_used