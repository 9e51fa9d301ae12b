"""Observed-base-compressed Pallas tau sweep (top-k candidate evaluation).

The exact tau conditional is ``cand[v,c] = sum_{s,b} n[v,s,b] *
log(q[v,s,b] + gamma[s,g] * eta[c,b])`` — but lanes with ``n[v,s,b] == 0``
contribute exactly 0, and on real metagenomic data variant positions are
overwhelmingly biallelic, so most (v,s) cells observe counts on only 1-2 of
the 4 bases. This kernel evaluates the candidate logs ONLY at a static
per-cell top-2 base selection: layout ``n_val/b_idx [V, 2*S]`` (slot-major,
lane = k*S + s), computed once per chain from the static counts tensor.
Per candidate it evaluates ``2S`` logs instead of ``4S`` — a 2x cut in the
transcendental work that bounds the full kernel (PERF.md roofline).

EXACTNESS: applicable iff every (v,s) cell has at most 2 observed bases
(``compress_counts`` raises otherwise — the dispatcher falls back to the
full kernel). Where applicable, every per-lane term is bitwise identical to
the full kernel's (same operands, same operation order); only the lane-
reduction tree differs (2S lanes vs 4S lanes with exact-zero terms), so
candidate scores agree to f32 summation rounding and the Gumbel-argmax
draws agree except at knife-edge ties (asserted in tests/test_pallas.py).

WHY top-2 and not top-3 (measured + lane arithmetic): VPU registers are
8x128 lanes; at S=64 the full kernel's per-candidate [Vt, 4S=256] log array
occupies exactly 2 lane-rows, the compressed [Vt, 2S=128] exactly 1 — a
true 2x. A k=3 layout (192 lanes) still pads to 2 lane-rows: zero savings.
And per-cell adaptivity is impossible in SIMD — exactness requires the
GLOBAL max cell-nnz <= k. See PERF.md "observed-base compression" for the
nnz histograms: the north-star synthetic (uniform tau over 4 bases, G=8)
has 96% of cells with 3-4 observed bases — there this kernel is
inapplicable and the full kernel's log count is irreducible.

Reference parity: same role as ``sampletau`` (SURVEY.md §2.1) — a faster
exact implementation for the (realistic) biallelic regime.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import NBASES
from .tau_pallas import _round_up, draw_gumbel, from_bmajor, to_bmajor

K_SLOTS = 2


def compress_counts(counts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Static top-2 layout: (n_val [V, 2S] f32, b_idx [V, 2S] int32).

    Slot-major lanes (lane = k*S + s). Raises ValueError when any cell
    observes >2 bases — the compressed evaluation would drop real counts.
    Cells with <2 observed bases pad with (n_val=0, b_idx=0); the zero
    count makes the padded log term exactly 0, like the full kernel's
    zero-count lanes.
    """
    n = np.asarray(counts)
    V, S, B = n.shape
    assert B == NBASES
    nnz = (n > 0).sum(axis=2)
    if int(nnz.max(initial=0)) > K_SLOTS:
        frac = float((nnz > K_SLOTS).mean())
        raise ValueError(
            f"counts have {frac:.1%} of cells with >{K_SLOTS} observed "
            "bases; the top-2 compressed kernel is exact only on <=2-base "
            "cells — use the full kernel"
        )
    # descending count order; stable so ties keep base order
    order = np.argsort(-n, axis=2, kind="stable")[:, :, :K_SLOTS]  # [V,S,2]
    vals = np.take_along_axis(n, order, axis=2).astype(np.float32)
    idx = np.where(vals > 0, order, 0).astype(np.int32)
    # [V,S,2] -> slot-major [V, 2S]
    n_val = np.transpose(vals, (0, 2, 1)).reshape(V, K_SLOTS * S)
    b_idx = np.transpose(idx, (0, 2, 1)).reshape(V, K_SLOTS * S)
    return n_val, b_idx


def _kernel(nval_ref, bidx_ref, mix_ref, tau_ref, gz_ref, gtile_ref,
            eta_ref, tau_out_ref, mix_out_ref, *, G: int, S: int):
    """Full tau sweep on a [Vt, ...] position tile, 2S logs per candidate.

    nval_ref/bidx_ref: [Vt, 2S] top-2 counts / base indices (slot-major).
    mix_ref: [Vt, 4S] base-major mixture tile (as in tau_pallas._kernel).
    tau_ref, gz_ref, gtile_ref, eta_ref: as in tau_pallas._kernel.
    """
    nval = nval_ref[:]                              # [Vt, 2S]
    bidx = bidx_ref[:]                              # [Vt, 2S] int32
    mix = mix_ref[:]                                # [Vt, 4S]
    Vt = mix.shape[0]
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (Vt, NBASES * S), 1) // S

    # Selected eta rows, once per sweep: etaA[k][:, a*S+s] = eta[a, b_k(v,s)]
    # (also serves as the candidate's eta[c, b_k] — same row indexing).
    etaA = []
    for k in range(K_SLOTS):
        bk = bidx[:, k * S:(k + 1) * S]             # [Vt, S]
        blocks = []
        for a in range(NBASES):
            acc = (bk == 0).astype(jnp.float32) * eta_ref[a, 0]
            for b in range(1, NBASES):
                acc = acc + (bk == b).astype(jnp.float32) * eta_ref[a, b]
            blocks.append(acc)
        etaA.append(jnp.concatenate(blocks, axis=1))   # [Vt, 4S]

    new_tau_cols = []
    for g in range(G):
        tau_g = tau_ref[:, g]                       # [Vt]
        gam_g = gtile_ref[g, :][None, :]            # [1, 4S]
        gam_s = gtile_ref[g, 0:S][None, :]          # [1, S] (a=0 block)
        oh = (lane_base == tau_g[:, None]).astype(jnp.float32)
        rest = mix - gam_g * oh                     # [Vt, 4S]

        # q at the selected bases only, same MAC order as the full kernel's
        # q: q_sel_k = sum_a rest[:, aS:(a+1)S] * eta[a, b_k]
        qsel = []
        for k in range(K_SLOTS):
            acc = rest[:, 0:S] * etaA[k][:, 0:S]
            for a in range(1, NBASES):
                acc = acc + (rest[:, a * S:(a + 1) * S]
                             * etaA[k][:, a * S:(a + 1) * S])
            qsel.append(acc)                        # [Vt, S]

        cand_cols = []
        for c in range(NBASES):
            args = [qsel[k] + gam_s * etaA[k][:, c * S:(c + 1) * S]
                    for k in range(K_SLOTS)]
            arg = jnp.concatenate(args, axis=1)     # [Vt, 2S]
            term = nval * jnp.log(jnp.maximum(arg, 1e-12))
            cand_cols.append(jnp.sum(term, axis=1, keepdims=True))
        cand = jnp.concatenate(cand_cols, axis=1)   # [Vt, 4]

        scores = cand + gz_ref[:, g * NBASES:(g + 1) * NBASES]
        new_g = jnp.argmax(scores, axis=1).astype(jnp.int32)

        oh_new = (lane_base == new_g[:, None]).astype(jnp.float32)
        mix = rest + gam_g * oh_new
        new_tau_cols.append(new_g[:, None])

    tau_out_ref[:] = jnp.concatenate(new_tau_cols, axis=1)
    mix_out_ref[:] = mix


def _tile_rows(S: int) -> int:
    """~6 MB VMEM working set: ~8 live [Vt, 4S]-equivalent f32 arrays
    (mix/rest, 2x etaA, nval+bidx, qsel+args+one-hot temps)."""
    budget_rows = (6 * 1024 * 1024) // (8 * NBASES * S * 4)
    vt = min(512, budget_rows)
    return max(8, vt - vt % 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_topk(n_val, b_idx, mix_bm, tau, gz, gamma, eta, interpret=False):
    V, lanes = mix_bm.shape
    G = tau.shape[1]
    S = lanes // NBASES
    Vt = min(V, _tile_rows(S))
    assert V % Vt == 0

    gtile = jnp.broadcast_to(
        gamma.T[:, None, :], (G, NBASES, S)
    ).reshape(G, NBASES * S)

    kernel = functools.partial(_kernel, G=G, S=S)
    grid = (V // Vt,)
    tile = lambda r: pl.BlockSpec((Vt, r), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    tau_out, mix_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(K_SLOTS * S),              # n_val
            tile(K_SLOTS * S),              # b_idx
            tile(lanes),                    # mix
            tile(G),                        # tau
            tile(G * NBASES),               # gz
            full((G, NBASES * S)),          # gtile
            full((NBASES, NBASES)),         # eta
        ],
        out_specs=[tile(G), tile(lanes)],
        out_shape=[
            jax.ShapeDtypeStruct((V, G), jnp.int32),
            jax.ShapeDtypeStruct((V, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(n_val, b_idx, mix_bm, tau, gz, gtile, eta)
    return tau_out, mix_out


def tau_sweep_topk_from_parts(n_val, b_idx, n_bm, tau, mix, gamma, eta, gz,
                              swap_proposal=None, swap_beta=1.0,
                              interpret=False):
    """Compressed sweep on UNPADDED [V, ...] blocks of the static layout
    (pads to the kernel tile internally, strips before returning).

    The shard_map-friendly core: parallel/sharded.make_topk_sweep_sharded
    passes each device's position-shard of (n_val, b_idx, n_bm) plus the
    globally-drawn Gumbel noise and swap proposal; make_tau_sweep_topk
    passes the whole arrays. Row-local computation, so per-shard tile
    padding cannot perturb other rows — outputs are bitwise independent of
    how V was split (tests/test_pallas.py::test_topk_sharded_matches_single).
    """
    V, lanes = n_bm.shape
    S = lanes // NBASES
    Vt = min(_round_up(V, 8), _tile_rows(S))
    Vp = _round_up(V, Vt)
    pad = Vp - V
    mix_bm = to_bmajor(mix)
    if pad:
        n_val = jnp.pad(n_val, ((0, pad), (0, 0)))
        b_idx = jnp.pad(b_idx, ((0, pad), (0, 0)))
        n_bm = jnp.pad(n_bm, ((0, pad), (0, 0)))
        mix_pad = jnp.zeros((pad, NBASES * S), jnp.float32)
        mix_pad = mix_pad.at[:, :S].set(1.0)        # valid simplex rows
        mix_bm = jnp.concatenate([mix_bm, mix_pad], axis=0)
        tau = jnp.pad(tau, ((0, pad), (0, 0)))
        gz = jnp.pad(gz, ((0, pad), (0, 0)))
    tau_out, mix_out = _sweep_topk(
        n_val, b_idx, mix_bm, tau, gz, gamma.astype(jnp.float32),
        eta.astype(jnp.float32), interpret=interpret,
    )
    if swap_proposal is not None:
        from .swap_pallas import swap_bmajor

        g_s, h_s, logu = swap_proposal
        if pad:
            logu = jnp.pad(logu, (0, pad), constant_values=jnp.inf)
        tau_out, mix_out = swap_bmajor(
            n_bm, tau_out, mix_out, gamma.astype(jnp.float32),
            eta.astype(jnp.float32), g_s, h_s, logu, beta=swap_beta,
            interpret=interpret,
        )
    if pad:
        tau_out = tau_out[:V]
        mix_out = mix_out[:V]
    return tau_out, from_bmajor(mix_out, S)


def compress_parts(counts: np.ndarray):
    """(n_val, b_idx, n_bm) static layout triple for the compressed sweep."""
    n_val_h, b_idx_h = compress_counts(counts)
    V, S = counts.shape[0], counts.shape[1]
    n_bm_h = np.transpose(np.asarray(counts, np.float32), (0, 2, 1)).reshape(
        V, NBASES * S)
    return n_val_h, b_idx_h, n_bm_h


def make_tau_sweep_topk(counts: np.ndarray, interpret=None, mesh=None):
    """Factory: compressed sweep with the standard tau_sweep signature.

    The top-2 layout depends only on the static counts, so it is computed
    once here (device constants closed over by the returned fn), not per
    sweep. Raises ValueError when the data has >2-base cells (dispatch to
    the full kernel instead). The returned fn ignores its ``n`` argument
    (kept for signature parity) — callers must pass the same counts.

    interpret=None auto-selects Pallas interpreter mode off-TPU (CPU CI).
    mesh: build the position-sharded variant instead (the static layout is
    pre-split per shard outside shard_map — parallel/sharded).
    """
    if mesh is not None:
        from ..parallel.sharded import make_topk_sweep_sharded

        return make_topk_sweep_sharded(mesh, counts, interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_val_h, b_idx_h, n_bm_h = compress_parts(counts)
    V = counts.shape[0]
    n_val = jnp.asarray(n_val_h)
    b_idx = jnp.asarray(b_idx_h)
    n_bm = jnp.asarray(n_bm_h)

    def tau_sweep_topk(n, tau, mix, gamma, eta, key, temp=1.0,
                       swap_key=None, swap_beta=1.0):
        G = tau.shape[1]
        gz = draw_gumbel(key, V, G, temp)
        swap = None
        if swap_key is not None:
            from .swap_pallas import draw_swap_proposal

            swap = draw_swap_proposal(swap_key, V, G)
        return tau_sweep_topk_from_parts(
            n_val, b_idx, n_bm, tau, mix, gamma, eta, gz,
            swap_proposal=swap, swap_beta=swap_beta, interpret=interpret,
        )

    tau_sweep_topk.needs_counts = False  # already bound
    tau_sweep_topk.handles_swap = True
    return tau_sweep_topk
