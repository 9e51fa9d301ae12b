"""Pallas strain-pair swap move (epilogue to the fused tau sweep).

The XLA swap (sampler.tau_swap_move) costs ~0.32 ms/sweep at the north-star
config — a third of the whole sweep — because its mixture->p einsum, two
log passes and accept-update each round-trip [V,S,4] through HBM. The swap
proposal is rank-1 in the mixture (mix' = mix + dgam[s] * doh[v,a], so
p' = p + dgam[s] * w[v,b] with w = doh @ eta), so the whole move is ONE
pass over the same base-major tiles the tau kernel just produced: recompute
p from the VMEM-resident mixture tile, evaluate the per-position MH
log-ratio sum_sb n * (log p' - log p) (per-element correlated rounding),
and apply the accepted swaps to tau and mix in place.

The (g, h, log-u) proposal stream is drawn OUTSIDE the kernel by
``draw_swap_proposal`` — the same stream as the XLA path, so pallas and XLA
swap trajectories agree except where the log-ratio sits within float
noise of the acceptance threshold (tested in tests/test_pallas.py).

Reference parity: same role as the per-position relabeling moves absent
from the reference's per-site sampler (see sampler.tau_swap_move notes);
this is purely a faster implementation of the identical MH move.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import NBASES, safe_log
from .tau_pallas import _round_up, _tile_rows

_LOG_FLOOR = 1e-12


def draw_swap_proposal(key, V: int, G: int):
    """(g, h, logu[V]) with the exact stream sampler.tau_swap_move uses.

    G == 1 has no strain pair to swap; return a never-accept proposal
    (+inf thresholds, g == h identity) so direct callers passing swap_key
    with G=1 stay safe (make_sweep_fn guards this, raw kernel calls don't).
    """
    if G < 2:
        return jnp.int32(0), jnp.int32(0), jnp.full((V,), jnp.inf, jnp.float32)
    k_pair, k_u = jax.random.split(key)
    g = jax.random.randint(k_pair, (), 0, G)
    off = jax.random.randint(jax.random.fold_in(k_pair, 1), (), 1, G)
    h = (g + off) % G
    logu = safe_log(jax.random.uniform(k_u, (V,)))
    return g, h, logu


def _kernel(n_ref, mix_ref, tau_ref, logu_ref, dgam_ref, sel_ref, eta_ref,
            tau_out_ref, mix_out_ref, *args, G: int, S: int,
            emit_ll: bool = False):
    """Swap MH for a [Vt, 4S] base-major tile.

    n_ref/mix_ref: [Vt, 4S] counts / mixture (lane = a*S + s).
    tau_ref: [Vt, G]; logu_ref: [Vt, 1] log-uniform acceptance draws
    (pre-multiplied by 1/beta outside, so the kernel compares plain dll).
    dgam_ref: [1, 4S] gamma[s,g]-gamma[s,h] tiled over the base axis.
    sel_ref: [1, G*2] one-hot masks for g (first G lanes) and h (last G).
    emit_ll: also accumulate the POST-swap per-sample log-likelihood into
    a trailing [1, S] output — both logs are already in registers for the
    MH ratio, so this costs ~2 extra multiply/select passes and hands the
    resident sweep its gamma-MH ll_old term for free (ops/gamma_pallas).
    """
    n = n_ref[:]                                    # [Vt, 4S]
    mix = mix_ref[:]
    tau = tau_ref[:]                                # [Vt, G] int32
    Vt = n.shape[0]
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (Vt, NBASES * S), 1) // S

    gmask = sel_ref[0, :G][None, :]                 # [1, G] f32 one-hot g
    hmask = sel_ref[0, G:][None, :]
    tauf = tau.astype(jnp.float32)
    tau_g = jnp.sum(tauf * gmask, axis=1).astype(jnp.int32)   # [Vt]
    tau_h = jnp.sum(tauf * hmask, axis=1).astype(jnp.int32)

    # doh over the lane (a) axis and w = doh @ eta over the (b) axis
    doh_lane = ((lane_base == tau_h[:, None]).astype(jnp.float32)
                - (lane_base == tau_g[:, None]).astype(jnp.float32))
    dgam = dgam_ref[0, :][None, :]                  # [1, 4S]

    # p[., b*S+s] = sum_a mix[., a*S+s] * eta[a, b] (same MAC order as the
    # tau kernel's q) and w_lane[., b*S+s] = sum_a doh[., a] * eta[a, b]
    p_blocks, w_blocks = [], []
    oh_h = []
    for a in range(NBASES):
        oh_h.append(((tau_h[:, None] == a).astype(jnp.float32)
                     - (tau_g[:, None] == a).astype(jnp.float32)))  # [Vt,1]
    for b in range(NBASES):
        acc = mix[:, 0:S] * eta_ref[0, b]
        wacc = oh_h[0] * eta_ref[0, b]
        for a in range(1, NBASES):
            acc = acc + mix[:, a * S:(a + 1) * S] * eta_ref[a, b]
            wacc = wacc + oh_h[a] * eta_ref[a, b]
        p_blocks.append(acc)
        w_blocks.append(jnp.broadcast_to(wacc, (Vt, S)))
    p = jnp.concatenate(p_blocks, axis=1)           # [Vt, 4S]
    w = jnp.concatenate(w_blocks, axis=1)           # [Vt, 4S]

    p_prop = p + dgam * w
    logp = jnp.log(jnp.maximum(p, _LOG_FLOOR))
    term = n * (jnp.log(jnp.maximum(p_prop, _LOG_FLOOR)) - logp)
    dll = jnp.sum(term, axis=1)                     # [Vt]

    accept = (logu_ref[:, 0] < dll).astype(jnp.float32)   # [Vt]

    if emit_ll:
        ll_ref = args[0]
        t_fin = n * logp + accept[:, None] * term   # [Vt, 4S]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            ll_ref[:] = jnp.zeros_like(ll_ref)

        lanes_sum = jnp.sum(t_fin, axis=0)          # [4S] b-major fold
        acc_s = lanes_sum[0:S]
        for b in range(1, NBASES):
            acc_s = acc_s + lanes_sum[b * S:(b + 1) * S]
        ll_ref[0, :] += acc_s

    mix_out_ref[:] = mix + accept[:, None] * (dgam * doh_lane)
    # swap tau cols g<->h where accepted
    acc_i = accept.astype(jnp.int32)[:, None]       # [Vt,1]
    gmask_i = gmask.astype(jnp.int32)
    hmask_i = hmask.astype(jnp.int32)
    swapped = (tau * (1 - gmask_i) * (1 - hmask_i)
               + tau_h[:, None] * gmask_i + tau_g[:, None] * hmask_i)
    tau_out_ref[:] = tau + acc_i * (swapped - tau)


@functools.partial(jax.jit, static_argnames=("interpret", "emit_ll"))
def _swap_bmajor(n_bm, mix_bm, tau, logu, dgam_t, sel, eta, interpret=False,
                 emit_ll=False):
    V, lanes = n_bm.shape
    G = tau.shape[1]
    S = lanes // NBASES
    Vt = min(V, _tile_rows(S))
    assert V % Vt == 0

    kernel = functools.partial(_kernel, G=G, S=S, emit_ll=emit_ll)
    grid = (V // Vt,)
    tile = lambda r: pl.BlockSpec((Vt, r), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    out_specs = [tile(G), tile(lanes)]
    out_shape = [
        jax.ShapeDtypeStruct((V, G), jnp.int32),
        jax.ShapeDtypeStruct((V, lanes), jnp.float32),
    ]
    if emit_ll:
        out_specs.append(full((1, S)))
        out_shape.append(jax.ShapeDtypeStruct((1, S), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(lanes),                    # n
            tile(lanes),                    # mix
            tile(G),                        # tau
            tile(1),                        # logu
            full((1, lanes)),               # dgam tiled
            full((1, 2 * G)),               # g/h one-hot masks
            full((NBASES, NBASES)),         # eta
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(n_bm, mix_bm, tau, logu, dgam_t, sel, eta)
    if emit_ll:
        tau_out, mix_out, ll = out
        return tau_out, mix_out, ll[0]
    tau_out, mix_out = out
    return tau_out, mix_out


def swap_bmajor(n_bm, tau, mix_bm, gamma, eta, g, h, logu, beta=1.0,
                interpret=False, emit_ll=False):
    """Swap move on PADDED base-major arrays (tau kernel epilogue).

    (g, h, logu) come from ``draw_swap_proposal`` drawn at the UNPADDED V
    (stream parity with sampler.tau_swap_move); pad logu with +inf so
    padded rows never accept. Same MH rule as tau_swap_move; the
    log-ratio's float reduction order differs (lane tree vs heinsum), so
    accept decisions can differ only at knife-edge proposals.
    """
    G = tau.shape[1]
    # kernel compares logu' < dll with logu' = logu / beta (beta > 0)
    logu = logu / beta
    gam_g = jnp.take(gamma, g, axis=1)
    gam_h = jnp.take(gamma, h, axis=1)
    dgam_t = jnp.tile(gam_g - gam_h, NBASES)[None, :]          # [1, 4S]
    gidx = jnp.arange(G)
    sel = jnp.concatenate([
        (gidx == g).astype(jnp.float32), (gidx == h).astype(jnp.float32)
    ])[None, :]                                                 # [1, 2G]
    return _swap_bmajor(n_bm, mix_bm, tau, logu[:, None], dgam_t, sel,
                        jnp.asarray(eta, jnp.float32), interpret=interpret,
                        emit_ll=emit_ll)
