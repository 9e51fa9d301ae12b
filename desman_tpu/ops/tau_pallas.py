"""Fused Pallas kernel for the tau Gibbs sweep — the framework's hot loop.

The XLA path (sampler.tau_sweep_xla) round-trips the [V,S,4] mixture through
HBM once per strain (G reads + G writes per sweep). This kernel runs the
ENTIRE sweep — all G strains' conditional updates — inside one kernel
invocation per position tile: the counts tile and mixture tile live in VMEM
across the whole strain loop, so HBM traffic drops to one read of (n, mix)
and one write of (mix, tau) per sweep, and the per-candidate
log-likelihood reduction fuses with the categorical draw.

Layout: base-major flattening [V, 4*S] (lane index = a*S + s). The error-
matrix contraction q[.,b] = sum_a rest[.,a] * eta[a,b] then becomes 16
static lane-block multiply-adds — no in-kernel reshapes or gathers, which
TPU tiling cannot do cheaply (pallas_guide.md 'Tiling Constraints').

Randomness: Gumbel noise is drawn OUTSIDE with the same
``fold_in(key, g)`` scheme as the XLA path, so both paths sample identical
categorical draws up to float-associativity of the candidate scores
(equivalence tested in tests/test_pallas.py).

Reference parity: this replaces DESMAN's only native component, the
``sampletau`` Cython+GSL extension (SURVEY.md §2.1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import NBASES


# degree-5 minimax fit of ln(m) on m in [1,2); max abs err 2.2e-5 — far
# below the O(1) Gumbel noise added to candidate scores (score error bound:
# sum(n) * 2.2e-5 ~= 0.1 at coverage 50x64 samples)
_LOG_POLY = (3.010262501e-02, -2.806325404e-01, 1.104808236e+00,
             -2.420812563e+00, 3.498227901e+00, -1.931671542e+00)
_LN2 = 0.6931471805599453


def _fast_log(x):
    """Polynomial log for x > 0: exponent via bitcast + deg-5 poly.

    Measured on TPU v5e: ~14% SLOWER than the builtin log (630 vs 731
    sweeps/s at the north-star config) — the hardware transcendental already
    wins; kept as a documented negative result and for backends where it may
    not (identical categorical draws either way, tested).
    """
    xi = pltpu.bitcast(x, jnp.int32)
    e = jax.lax.shift_right_logical(xi, 23) - 127          # unbiased exponent
    m = pltpu.bitcast(
        jax.lax.bitwise_or(
            jax.lax.bitwise_and(xi, jnp.int32(0x7FFFFF)), jnp.int32(127 << 23)
        ),
        jnp.float32,
    )                                                       # mantissa in [1,2)
    p = jnp.float32(_LOG_POLY[0])
    for c in _LOG_POLY[1:]:
        p = p * m + jnp.float32(c)
    return e.astype(jnp.float32) * jnp.float32(_LN2) + p


def _kernel(n_ref, mix_ref, tau_ref, gz_ref, add_ref, gtile_ref, eta_ref,
            tau_out_ref, mix_out_ref, *, G: int, S: int, fast_log: bool):
    """One full tau sweep for a [Vt, 4*S] tile.

    n_ref, mix_ref: [Vt, 4*S] base-major counts / mixture tile.
    tau_ref:  [Vt, G] int32 current calls.
    gz_ref:   [Vt, G*4] Gumbel noise (already scaled by temperature).
    add_ref:  [G, 4*4*S] candidate add-terms, add[g, c*4S + b*S + s]
              = gamma[s,g] * eta[c,b].
    gtile_ref:[G, 4*S] gamma tiled over the base axis, gtile[g, a*S+s]
              = gamma[s,g].
    eta_ref:  [4, 4] error matrix (row a = true base).
    Outputs: updated tau and mixture tiles.
    """
    n = n_ref[:]                                   # [Vt, 4S]
    mix = mix_ref[:]
    Vt = n.shape[0]
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (Vt, NBASES * S), 1) // S

    new_tau_cols = []
    for g in range(G):
        tau_g = tau_ref[:, g]                      # [Vt] int32
        gam_g = gtile_ref[g, :][None, :]           # [1, 4S]
        oh = (lane_base == tau_g[:, None]).astype(jnp.float32)
        rest = mix - gam_g * oh                    # [Vt, 4S]

        # q[., b*S+s] = sum_a rest[., a*S+s] * eta[a, b]
        q_blocks = []
        for b in range(NBASES):
            acc = rest[:, 0:S] * eta_ref[0, b]
            for a in range(1, NBASES):
                acc = acc + rest[:, a * S:(a + 1) * S] * eta_ref[a, b]
            q_blocks.append(acc)
        q = jnp.concatenate(q_blocks, axis=1)      # [Vt, 4S]

        # candidate scores: cand[v,c] = sum_l n * log(q + add[g,c,:])
        log_fn = _fast_log if fast_log else jnp.log
        cand_cols = []
        for c in range(NBASES):
            add_c = add_ref[g, c * NBASES * S:(c + 1) * NBASES * S][None, :]
            term = n * log_fn(jnp.maximum(q + add_c, 1e-12))
            cand_cols.append(jnp.sum(term, axis=1, keepdims=True))
        cand = jnp.concatenate(cand_cols, axis=1)  # [Vt, 4]

        scores = cand + gz_ref[:, g * NBASES:(g + 1) * NBASES]
        new_g = jnp.argmax(scores, axis=1).astype(jnp.int32)   # [Vt]

        oh_new = (lane_base == new_g[:, None]).astype(jnp.float32)
        mix = rest + gam_g * oh_new
        new_tau_cols.append(new_g[:, None])

    tau_out_ref[:] = jnp.concatenate(new_tau_cols, axis=1)
    mix_out_ref[:] = mix


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_rows(S: int) -> int:
    """Position-tile height under a ~6 MB VMEM working-set budget.

    The kernel keeps ~5 live [Vt, 4S] f32 arrays (n, mix/rest, q, one
    candidate term, one-hot); 512 rows fits comfortably up to S=256, larger
    S shrinks the tile (v5e VMEM is ~16 MB/core, pallas_guide.md).
    """
    budget_rows = (6 * 1024 * 1024) // (5 * NBASES * S * 4)
    vt = min(512, budget_rows)
    return max(8, vt - vt % 8)


@functools.partial(jax.jit, static_argnames=("interpret", "fast_log"))
def _sweep_bmajor(n_bm, mix_bm, tau, gz, gamma, eta, interpret=False,
                  fast_log=False):
    """Run the kernel on base-major [V,4S] arrays. V must be tile-aligned."""
    V, lanes = n_bm.shape
    G = tau.shape[1]
    S = lanes // NBASES
    Vt = min(V, _tile_rows(S))
    assert V % Vt == 0

    # host-side precomputed tables (tiny): add[g, c, b, s], gtile[g, a, s]
    add = jnp.einsum("sg,cb->gcbs", gamma, eta).reshape(G, NBASES * NBASES * S)
    gtile = jnp.broadcast_to(
        gamma.T[:, None, :], (G, NBASES, S)
    ).reshape(G, NBASES * S)

    kernel = functools.partial(_kernel, G=G, S=S, fast_log=fast_log)
    grid = (V // Vt,)
    tile = lambda r: pl.BlockSpec((Vt, r), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    tau_out, mix_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(lanes),                    # n
            tile(lanes),                    # mix
            tile(G),                        # tau
            tile(G * NBASES),               # gz
            full((G, NBASES * NBASES * S)),  # add
            full((G, NBASES * S)),          # gtile
            full((NBASES, NBASES)),         # eta
        ],
        out_specs=[tile(G), tile(lanes)],
        out_shape=[
            jax.ShapeDtypeStruct((V, G), jnp.int32),
            jax.ShapeDtypeStruct((V, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(n_bm, mix_bm, tau, gz, add, gtile, eta)
    return tau_out, mix_out


def to_bmajor(x):
    """[V,S,4] -> [V, 4*S] base-major (lane = a*S + s)."""
    V, S, B = x.shape
    return jnp.transpose(x, (0, 2, 1)).reshape(V, B * S)


def from_bmajor(x, S):
    V, lanes = x.shape
    return jnp.transpose(x.reshape(V, NBASES, S), (0, 2, 1))


def tau_sweep_pallas(n, tau, mix, gamma, eta, key, temp=1.0, interpret=False,
                     fast_log=False, swap_key=None, swap_beta=1.0):
    """Drop-in replacement for sampler.tau_sweep_xla (same signature/PRNG).

    Handles layout conversion and position-padding; for best performance V
    should be a multiple of 512 (the wrapper pads with zero-coverage rows,
    which are likelihood-neutral).

    swap_key (optional): run the strain-pair swap move (sampler.
    tau_swap_move semantics, ops/swap_pallas kernel) as an epilogue on the
    base-major tiles before converting back — saves the XLA swap's extra
    [V,S,4] HBM round-trips (~0.3 ms/sweep at the north-star config).
    make_sweep_fn uses this via the ``handles_swap`` attribute.
    """
    G = tau.shape[1]
    gz = draw_gumbel(key, n.shape[0], G, temp)
    return tau_sweep_pallas_from_gz(n, tau, mix, gamma, eta, gz,
                                    interpret=interpret, fast_log=fast_log,
                                    swap_key=swap_key, swap_beta=swap_beta)


tau_sweep_pallas.handles_swap = True


def draw_gumbel(key, V: int, G: int, temp=1.0):
    """The sweep's categorical noise [V, G*4] — same fold_in scheme as the
    XLA path. Split out so sharded callers can draw it globally (one
    partitionable-PRNG stream over the full V) before shard_mapping the
    kernel (parallel/sharded.py)."""
    return jnp.stack(
        [jax.random.gumbel(jax.random.fold_in(key, g), (V, NBASES))
         for g in range(G)], axis=1,
    ).reshape(V, G * NBASES) * temp


def tau_sweep_pallas_from_gz(n, tau, mix, gamma, eta, gz, interpret=False,
                             fast_log=False, swap_key=None, swap_beta=1.0,
                             swap_proposal=None):
    """Kernel invocation with pre-drawn Gumbel noise (layout + padding).

    swap_proposal: optional pre-drawn (g, h, logu[V]) swap move — sharded
    callers draw it globally outside shard_map (parallel/sharded.py), the
    same way gz is pre-drawn. Mutually exclusive with swap_key.
    """
    V, S, _ = n.shape
    G = tau.shape[1]

    Vt = min(_round_up(V, 8), _tile_rows(S))
    Vp = _round_up(V, Vt)
    pad = Vp - V

    n_bm = to_bmajor(n.astype(jnp.float32))
    mix_bm = to_bmajor(mix)
    if pad:
        n_bm = jnp.pad(n_bm, ((0, pad), (0, 0)))
        # pad mix with a valid simplex row (all strains base A) to keep the
        # kernel's logs finite; the rows are stripped below
        mix_pad = jnp.zeros((pad, NBASES * S), jnp.float32).at[:, :S].set(1.0)
        mix_bm = jnp.concatenate([mix_bm, mix_pad], axis=0)
        tau = jnp.pad(tau, ((0, pad), (0, 0)))
        gz = jnp.pad(gz, ((0, pad), (0, 0)))

    tau_out, mix_out = _sweep_bmajor(
        n_bm, mix_bm, tau, gz, gamma.astype(jnp.float32),
        eta.astype(jnp.float32), interpret=interpret, fast_log=fast_log,
    )
    if swap_key is not None or swap_proposal is not None:
        from .swap_pallas import draw_swap_proposal, swap_bmajor

        if swap_proposal is not None:
            g_s, h_s, logu = swap_proposal
        else:
            # proposal drawn at the UNPADDED V (stream parity with the XLA
            # path); padded rows get +inf thresholds so they never accept
            g_s, h_s, logu = draw_swap_proposal(swap_key, V, G)
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
