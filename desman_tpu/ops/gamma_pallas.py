"""Pallas kernels for the gamma-MH and eta log-likelihood passes on
base-major tiles — the last two XLA-side [V,S,4] passes of the sweep.

PERF.md r4 ("where the rest of the sweep goes"): after the fused tau+swap
kernels, the sweep spends 0.154 ms in the XLA gamma MH (a [2,V,S,4]
stacked mixture+log pass, with mix_prop materialized through HBM) and
0.065 ms in the joint-eta likelihood pass, plus ~0.05 ms converting the
mixture to/from base-major around the tau kernel. The resident sweep
(desman_tpu.resident) keeps the mixture base-major across the whole scan
and runs these passes as kernels on the same [Vt, 4S] tiles:

- ``gamma_ll_bmajor``: one pass computing BOTH per-sample likelihood terms
  of the gamma MH ratio — ll_old from the carried mixture, ll_new from the
  proposal mixture rebuilt in VMEM from (tau, gamma_prop) — without ever
  materializing mix_prop in HBM. Output [2, S] accumulated across the
  position grid (TPU grids are sequential, so += into the same output
  block is race-free).
- ``gamma_apply_eta_bmajor``: one pass applying the accepted per-sample
  proposals to the mixture (recomputing the proposal mixture exactly as
  the MH evaluation did, so accepted samples match sampler.gamma_step's
  fresh-recompute semantics bit-for-bit) and, fused into the same tile
  visit, the per-sample likelihood of the JOINT eta proposal against the
  updated mixture — the whole eta_step_joint likelihood for free on
  bandwidth already paid.

Semantics parity: identical operands and per-lane operations as
sampler.gamma_step / eta_step_joint; only reduction orders differ (lane
tree + sequential-tile accumulation vs heinsum), so MH decisions can
diverge only at float knife-edges (tests/test_resident.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import NBASES
from .tau_pallas import _tile_rows

_LOG_FLOOR = 1e-12


def _fold_b(x, S):
    """[Vt, 4S] b-major lanes -> per-sample row-sum [S]: reduce rows, then
    add the four base blocks."""
    lanes = jnp.sum(x, axis=0)                       # [4S]
    acc = lanes[0:S]
    for b in range(1, NBASES):
        acc = acc + lanes[b * S:(b + 1) * S]
    return acc


def _mix_from_tau(tau_ref, gtile, lane_base, G, S):
    """Rebuild mixture lanes from integer tau and a [G, 4S] gamma tiling:
    mp[v, a*S+s] = sum_g (tau[v,g] == a) * gamma[s,g]."""
    mp = None
    for g in range(G):
        oh = (lane_base == tau_ref[:, g][:, None]).astype(jnp.float32)
        term = gtile[g, :][None, :] * oh
        mp = term if mp is None else mp + term
    return mp


def _eta_p(mix, eta_ref, S):
    """p[., b*S+s] = sum_a mix[., a*S+s] * eta[a, b] (b-major lanes)."""
    blocks = []
    for b in range(NBASES):
        acc = mix[:, 0:S] * eta_ref[0, b]
        for a in range(1, NBASES):
            acc = acc + mix[:, a * S:(a + 1) * S] * eta_ref[a, b]
        blocks.append(acc)
    return jnp.concatenate(blocks, axis=1)


def _gamma_ll_kernel(n_ref, mix_ref, tau_ref, gptile_ref, eta_ref, ll_ref,
                     *, G: int, S: int, with_old: bool):
    n = n_ref[:]
    Vt = n.shape[0]
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (Vt, NBASES * S), 1) // S

    mp = _mix_from_tau(tau_ref, gptile_ref, lane_base, G, S)   # proposal mix
    p_new = _eta_p(mp, eta_ref, S)
    t_new = n * jnp.log(jnp.maximum(p_new, _LOG_FLOOR))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ll_ref[:] = jnp.zeros_like(ll_ref)

    if with_old:
        p_old = _eta_p(mix_ref[:], eta_ref, S)
        t_old = n * jnp.log(jnp.maximum(p_old, _LOG_FLOOR))
        ll_ref[0, :] += _fold_b(t_old, S)
    ll_ref[1, :] += _fold_b(t_new, S)


@functools.partial(jax.jit, static_argnames=("interpret", "with_old"))
def gamma_ll_bmajor(n_bm, mix_bm, tau, gamma_prop, eta, interpret=False,
                    with_old=True):
    """Per-sample loglik of the carried mixture AND the gamma proposal.

    n_bm/mix_bm [V, 4S] (V tile-aligned), tau [V, G] int32,
    gamma_prop [S, G], eta [4,4] -> ll [2, S] (row 0 old, row 1 new).
    with_old=False skips the carried-mixture half (row 0 stays zero) —
    the resident sweep gets ll_old from the swap kernel's emit_ll output,
    whose logs were already evaluated for the swap MH ratio.
    """
    V, lanes = n_bm.shape
    S = lanes // NBASES
    G = tau.shape[1]
    Vt = min(V, _tile_rows(S))
    assert V % Vt == 0
    gptile = jnp.broadcast_to(
        gamma_prop.T[:, None, :], (G, NBASES, S)).reshape(G, NBASES * S)

    kernel = functools.partial(_gamma_ll_kernel, G=G, S=S, with_old=with_old)
    tile = lambda r: pl.BlockSpec((Vt, r), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(V // Vt,),
        in_specs=[tile(lanes), tile(lanes), tile(G),
                  full((G, NBASES * S)), full((NBASES, NBASES))],
        out_specs=full((2, S)),
        out_shape=jax.ShapeDtypeStruct((2, S), jnp.float32),
        interpret=interpret,
    )(n_bm, mix_bm, tau, gptile, jnp.asarray(eta, jnp.float32))


def _apply_eta_kernel(n_ref, mix_ref, tau_ref, gptile_ref, acc_ref,
                      etap_ref, mix_out_ref, ll_ref, *, G: int, S: int,
                      with_eta: bool):
    n = n_ref[:]
    mix = mix_ref[:]
    Vt = n.shape[0]
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (Vt, NBASES * S), 1) // S

    # accepted samples take the FRESH proposal mixture (exactly the value
    # the MH ratio was evaluated on), rejected keep the carried one
    mp = _mix_from_tau(tau_ref, gptile_ref, lane_base, G, S)
    acc = acc_ref[0, :][None, :]                     # [1, 4S] 0/1 per lane
    mix_new = mix + acc * (mp - mix)
    mix_out_ref[:] = mix_new

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ll_ref[:] = jnp.zeros_like(ll_ref)

    if with_eta:
        p = _eta_p(mix_new, etap_ref, S)
        t = n * jnp.log(jnp.maximum(p, _LOG_FLOOR))
        ll_ref[0, :] += _fold_b(t, S)


@functools.partial(jax.jit, static_argnames=("interpret", "with_eta"))
def gamma_apply_eta_bmajor(n_bm, mix_bm, tau, gamma_prop, accept, eta_prop,
                           interpret=False, with_eta=True):
    """Apply accepted gamma proposals to the mixture; fused per-sample
    loglik of the joint eta proposal against the updated mixture.

    accept [S] bool; returns (mix_bm_new [V,4S], ll_eta [S]) — ll_eta is
    zeros when with_eta=False (fix_eta runs skip the eta logs entirely).
    """
    V, lanes = n_bm.shape
    S = lanes // NBASES
    G = tau.shape[1]
    Vt = min(V, _tile_rows(S))
    assert V % Vt == 0
    gptile = jnp.broadcast_to(
        gamma_prop.T[:, None, :], (G, NBASES, S)).reshape(G, NBASES * S)
    acc_lane = jnp.tile(accept.astype(jnp.float32), NBASES)[None, :]

    kernel = functools.partial(_apply_eta_kernel, G=G, S=S,
                               with_eta=with_eta)
    tile = lambda r: pl.BlockSpec((Vt, r), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    mix_out, ll = pl.pallas_call(
        kernel,
        grid=(V // Vt,),
        in_specs=[tile(lanes), tile(lanes), tile(G),
                  full((G, NBASES * S)), full((1, NBASES * S)),
                  full((NBASES, NBASES))],
        out_specs=[tile(lanes), full((1, S))],
        out_shape=[jax.ShapeDtypeStruct((V, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((1, S), jnp.float32)],
        interpret=interpret,
    )(n_bm, mix_bm, tau, gptile, acc_lane, jnp.asarray(eta_prop, jnp.float32))
    return mix_out, ll[0]
