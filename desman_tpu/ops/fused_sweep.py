"""One kernel for (tau sweep + strain-pair swap + gamma-MH likelihoods).

The resident path (desman_tpu.resident) runs three [V]-sized kernels per
sweep: tau (ops/tau_pallas), swap (ops/swap_pallas), gamma both-sides ll
(ops/gamma_pallas). All three are position-local and the gamma PROPOSAL
does not depend on the sweep's output (it is drawn from the carried gamma
and the k_gamma stream), so the whole front of the sweep fuses into ONE
tile visit: while the counts/mixture tile is VMEM-resident for the strain
loop, the same tile finishes the swap MH and evaluates both gamma-MH
likelihood terms — saving two full kernel launches and two re-reads of
the n/mix tiles per sweep (~50 MB of HBM traffic at the north-star
config). Only the gamma/eta ACCEPT decisions (global reductions + host
MH) and the apply+eta pass (ops/gamma_pallas.gamma_apply_eta_bmajor)
remain outside.

Bitwise parity with the staged kernels: the swap section reuses the exact
operand/op order of swap_pallas._kernel and the gamma section of
gamma_pallas._gamma_ll_kernel, computed on the same values the staged
kernels would read back from HBM — asserted in tests/test_resident.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import NBASES
from .gamma_pallas import _eta_p, _fold_b
# same tile height as the staged kernels so the resident runner's single
# padding serves all of them; the fused working set is ~7 live [Vt,4S]
# arrays vs the tau kernel's 5 — at the 512-row tile and S=64 that is
# ~3.7 MB, comfortably inside v5e VMEM (~16 MB)
from .tau_pallas import _tile_rows

_LOG_FLOOR = 1e-12


def _kernel(n_ref, mix_ref, tau_ref, gz_ref, add_ref, gtile_ref, eta_ref,
            logu_ref, dgam_ref, sel_ref, gptile_ref,
            tau_out_ref, mix_out_ref, ll_ref, *, G: int, S: int):
    n = n_ref[:]                                   # [Vt, 4S]
    mix = mix_ref[:]
    Vt = n.shape[0]
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (Vt, NBASES * S), 1) // S

    # ---- tau Gibbs sweep (verbatim tau_pallas._kernel) ----
    new_tau_cols = []
    for g in range(G):
        tau_g = tau_ref[:, g]
        gam_g = gtile_ref[g, :][None, :]
        oh = (lane_base == tau_g[:, None]).astype(jnp.float32)
        rest = mix - gam_g * oh
        q_blocks = []
        for b in range(NBASES):
            acc = rest[:, 0:S] * eta_ref[0, b]
            for a in range(1, NBASES):
                acc = acc + rest[:, a * S:(a + 1) * S] * eta_ref[a, b]
            q_blocks.append(acc)
        q = jnp.concatenate(q_blocks, axis=1)
        cand_cols = []
        for c in range(NBASES):
            add_c = add_ref[g, c * NBASES * S:(c + 1) * NBASES * S][None, :]
            term = n * jnp.log(jnp.maximum(q + add_c, 1e-12))
            cand_cols.append(jnp.sum(term, axis=1, keepdims=True))
        cand = jnp.concatenate(cand_cols, axis=1)
        scores = cand + gz_ref[:, g * NBASES:(g + 1) * NBASES]
        new_g = jnp.argmax(scores, axis=1).astype(jnp.int32)
        oh_new = (lane_base == new_g[:, None]).astype(jnp.float32)
        mix = rest + gam_g * oh_new
        new_tau_cols.append(new_g[:, None])
    tau = jnp.concatenate(new_tau_cols, axis=1)    # [Vt, G]

    # ---- swap MH (verbatim swap_pallas._kernel, emit_ll variant) ----
    gmask = sel_ref[0, :G][None, :]
    hmask = sel_ref[0, G:][None, :]
    tauf = tau.astype(jnp.float32)
    tau_g = jnp.sum(tauf * gmask, axis=1).astype(jnp.int32)
    tau_h = jnp.sum(tauf * hmask, axis=1).astype(jnp.int32)
    doh_lane = ((lane_base == tau_h[:, None]).astype(jnp.float32)
                - (lane_base == tau_g[:, None]).astype(jnp.float32))
    dgam = dgam_ref[0, :][None, :]
    oh_h = []
    for a in range(NBASES):
        oh_h.append(((tau_h[:, None] == a).astype(jnp.float32)
                     - (tau_g[:, None] == a).astype(jnp.float32)))
    p_blocks, w_blocks = [], []
    for b in range(NBASES):
        acc = mix[:, 0:S] * eta_ref[0, b]
        wacc = oh_h[0] * eta_ref[0, b]
        for a in range(1, NBASES):
            acc = acc + mix[:, a * S:(a + 1) * S] * eta_ref[a, b]
            wacc = wacc + oh_h[a] * eta_ref[a, b]
        p_blocks.append(acc)
        w_blocks.append(jnp.broadcast_to(wacc, (Vt, S)))
    p = jnp.concatenate(p_blocks, axis=1)
    w = jnp.concatenate(w_blocks, axis=1)
    p_prop = p + dgam * w
    logp = jnp.log(jnp.maximum(p, _LOG_FLOOR))
    term = n * (jnp.log(jnp.maximum(p_prop, _LOG_FLOOR)) - logp)
    dll = jnp.sum(term, axis=1)
    accept = (logu_ref[:, 0] < dll).astype(jnp.float32)
    # post-swap per-sample loglik from the logs already in registers: the
    # gamma MH's ll_old term (swap_pallas emit_ll semantics)
    t_fin = n * logp + accept[:, None] * term
    acc_i = accept.astype(jnp.int32)[:, None]
    gmask_i = gmask.astype(jnp.int32)
    hmask_i = hmask.astype(jnp.int32)
    swapped = (tau * (1 - gmask_i) * (1 - hmask_i)
               + tau_h[:, None] * gmask_i + tau_g[:, None] * hmask_i)
    tau = tau + acc_i * (swapped - tau)
    mix = mix + accept[:, None] * (dgam * doh_lane)

    tau_out_ref[:] = tau
    mix_out_ref[:] = mix

    # ---- gamma-MH proposal likelihood (gamma_pallas semantics) on the
    # POST-swap tau; ll_old comes from the swap's t_fin fold ----
    mp = _mix_from_tau_cols(tau, gptile_ref, lane_base, G, S)
    p_new = _eta_p(mp, eta_ref, S)
    t_new = n * jnp.log(jnp.maximum(p_new, _LOG_FLOOR))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ll_ref[:] = jnp.zeros_like(ll_ref)

    ll_ref[0, :] += _fold_b(t_fin, S)
    ll_ref[1, :] += _fold_b(t_new, S)


def _mix_from_tau_cols(tau, gptile, lane_base, G, S):
    """gamma_pallas._mix_from_tau on an in-register [Vt, G] tau array."""
    mp = None
    for g in range(G):
        oh = (lane_base == tau[:, g][:, None]).astype(jnp.float32)
        t = gptile[g, :][None, :] * oh
        mp = t if mp is None else mp + t
    return mp


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sweep_bmajor(n_bm, mix_bm, tau, gz, gamma, eta, logu, dgam_t, sel,
                       gamma_prop, interpret=False):
    """tau sweep + swap + gamma old/new per-sample loglik, one pallas call.

    All [V]-sized operands tile-aligned base-major (the resident runner
    pads once at init). Returns (tau [V,G], mix_bm [V,4S], ll [2,S]).
    logu must already carry the 1/beta scaling and +inf pad-row masking.
    """
    V, lanes = n_bm.shape
    G = tau.shape[1]
    S = lanes // NBASES
    Vt = min(V, _tile_rows(S))
    assert V % Vt == 0

    add = jnp.einsum("sg,cb->gcbs", gamma, eta).reshape(G, NBASES * NBASES * S)
    gtile = jnp.broadcast_to(
        gamma.T[:, None, :], (G, NBASES, S)).reshape(G, NBASES * S)
    gptile = jnp.broadcast_to(
        gamma_prop.T[:, None, :], (G, NBASES, S)).reshape(G, NBASES * S)

    kernel = functools.partial(_kernel, G=G, S=S)
    grid = (V // Vt,)
    tile = lambda r: pl.BlockSpec((Vt, r), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    tau_out, mix_out, ll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(lanes),                      # n
            tile(lanes),                      # mix
            tile(G),                          # tau
            tile(G * NBASES),                 # gz
            full((G, NBASES * NBASES * S)),   # add
            full((G, NBASES * S)),            # gtile
            full((NBASES, NBASES)),           # eta
            tile(1),                          # logu
            full((1, lanes)),                 # dgam tiled
            full((1, 2 * G)),                 # swap g/h one-hot masks
            full((G, NBASES * S)),            # gamma_prop tiled
        ],
        out_specs=[tile(G), tile(lanes), full((2, S))],
        out_shape=[
            jax.ShapeDtypeStruct((V, G), jnp.int32),
            jax.ShapeDtypeStruct((V, lanes), jnp.float32),
            jax.ShapeDtypeStruct((2, S), jnp.float32),
        ],
        interpret=interpret,
    )(n_bm, mix_bm, tau, gz, add, gtile, eta, logu[:, None], dgam_t, sel,
      gptile)
    return tau_out, mix_out, ll


def fused_sweep(n_bm, tau, mix_bm, gamma, eta, gz, g, h, logu, gamma_prop,
                interpret=False):
    """Convenience wrapper building the swap-side tilings (swap_pallas
    layout) from the (g, h) proposal scalars."""
    G = tau.shape[1]
    gam_g = jnp.take(gamma, g, axis=1)
    gam_h = jnp.take(gamma, h, axis=1)
    dgam_t = jnp.tile(gam_g - gam_h, NBASES)[None, :]
    gidx = jnp.arange(G)
    sel = jnp.concatenate([
        (gidx == g).astype(jnp.float32), (gidx == h).astype(jnp.float32)
    ])[None, :]
    return fused_sweep_bmajor(
        n_bm, mix_bm, tau, gz, gamma.astype(jnp.float32),
        jnp.asarray(eta, jnp.float32), logu, dgam_t, sel,
        gamma_prop.astype(jnp.float32), interpret=interpret)
