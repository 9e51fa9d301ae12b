"""Pallas tau-sweep kernel equivalence vs the XLA path.

On the CPU test backend the kernel runs in interpreter mode (semantics
check); on a real TPU the same tests exercise the compiled kernel. Both
paths draw identical Gumbel noise (same fold_in scheme), so disagreements
can only come from float associativity at near-ties — tolerated at <1%.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desman_tpu import synth
from desman_tpu.likelihood import mixture
from desman_tpu.ops.tau_pallas import (
    from_bmajor, tau_sweep_pallas, to_bmajor,
)
from desman_tpu.sampler import tau_sweep_xla
from desman_tpu.utils import one_hot_tau

INTERPRET = jax.default_backend() != "tpu"


def _setup(V=96, S=12, G=3, seed=0):
    t = synth.generate(V=V, S=S, G=G, coverage=50.0, seed=seed)
    n = jnp.asarray(t.data.counts, jnp.float32)
    rng = np.random.default_rng(seed)
    tau = jnp.asarray(rng.integers(0, 4, size=(V, G)), jnp.int32)
    gamma = jnp.asarray(t.gamma, jnp.float32)
    eta = jnp.asarray(t.eta, jnp.float32)
    mix = mixture(one_hot_tau(tau), gamma)
    return n, tau, mix, gamma, eta


def test_bmajor_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 6, 4)), jnp.float32)
    assert np.allclose(from_bmajor(to_bmajor(x), 6), x)


def test_matches_xla_single_sweep():
    n, tau, mix, gamma, eta = _setup()
    key = jax.random.PRNGKey(3)
    tau_x, mix_x = tau_sweep_xla(n, tau, mix, gamma, eta, key)
    tau_p, mix_p = tau_sweep_pallas(n, tau, mix, gamma, eta, key,
                                    interpret=INTERPRET)
    agree = (np.asarray(tau_x) == np.asarray(tau_p)).mean()
    assert agree > 0.99, f"tau agreement {agree}"
    np.testing.assert_allclose(np.asarray(mix_p), np.asarray(mix_x),
                               rtol=1e-4, atol=1e-5)


def test_mix_consistency():
    """Kernel's returned mix must equal the mixture implied by its tau."""
    n, tau, mix, gamma, eta = _setup(V=64, S=8, G=4, seed=1)
    tau_p, mix_p = tau_sweep_pallas(n, tau, mix, gamma, eta,
                                    jax.random.PRNGKey(0), interpret=INTERPRET)
    want = mixture(one_hot_tau(tau_p), gamma)
    np.testing.assert_allclose(np.asarray(mix_p), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_padding_path():
    """V not a multiple of the tile: padded rows must not perturb results."""
    n, tau, mix, gamma, eta = _setup(V=77, S=6, G=2, seed=2)
    key = jax.random.PRNGKey(1)
    tau_x, _ = tau_sweep_xla(n, tau, mix, gamma, eta, key)
    tau_p, _ = tau_sweep_pallas(n, tau, mix, gamma, eta, key,
                                interpret=INTERPRET)
    agree = (np.asarray(tau_x) == np.asarray(tau_p)).mean()
    assert agree > 0.99, f"tau agreement {agree}"


def test_full_chain_with_pallas_sweep():
    """run_chain with the Pallas sweep recovers truth like the XLA path."""
    import functools

    from desman_tpu import utils
    from desman_tpu.sampler import SamplerConfig, run_chain

    t = synth.generate(V=96, S=10, G=2, coverage=60.0, seed=5)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=30, samples=30, nmf_iters=100)
    sweep = functools.partial(tau_sweep_pallas, interpret=INTERPRET)
    res = run_chain(n, cfg, jax.random.PRNGKey(0),
                    eta_init=jnp.asarray(t.eta, jnp.float32), tau_sweep=sweep)
    dist = utils.snp_distance_perm(t.tau_idx, np.asarray(res.tau_star))
    assert dist <= 4, f"SNP distance {dist}"


def test_sharded_pallas_matches_sharded_xla():
    """shard_mapped Pallas kernel == XLA path on a position-sharded mesh."""
    from desman_tpu.parallel import (
        make_mesh, make_pallas_sweep_sharded, run_chains_sharded,
    )
    from desman_tpu.sampler import SamplerConfig

    t = synth.generate(V=96, S=8, G=2, coverage=50.0, seed=9)
    cfg = SamplerConfig(G=2, burn=4, samples=4, nmf_iters=30)
    mesh = make_mesh(n_chain=1, n_data=4, devices=jax.devices()[:4])

    ref = run_chains_sharded(t.data.counts, cfg, [0], mesh=mesh)
    sweep = make_pallas_sweep_sharded(mesh, interpret=INTERPRET)
    got = run_chains_sharded(t.data.counts, cfg, [0], mesh=mesh,
                             tau_sweep=sweep)
    agree = (np.asarray(ref.tau_star) == np.asarray(got.tau_star)).mean()
    assert agree > 0.99, f"tau agreement {agree}"
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-4)
