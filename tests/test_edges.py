"""Degenerate-shape edges: the sampler must not crash or NaN on tiny axes
(single sample, single position, single strain)."""
import jax
import jax.numpy as jnp
import numpy as np

from desman_tpu import synth
from desman_tpu.sampler import SamplerConfig, run_chain


def _run(V, S, G, seed=0):
    t = synth.generate(V=V, S=S, G=max(G, 1), coverage=30.0, seed=seed)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=G, burn=5, samples=5, nmf_iters=10)
    res = run_chain(n, cfg, jax.random.PRNGKey(seed))
    assert np.isfinite(float(res.star_loglik))
    assert np.isfinite(np.asarray(res.gamma_mean)).all()
    assert res.tau_star.shape == (V, G)
    np.testing.assert_allclose(np.asarray(res.gamma_mean).sum(axis=1), 1.0,
                               atol=1e-5)
    return res


def test_single_sample():
    _run(V=40, S=1, G=2)


def test_single_position():
    _run(V=1, S=6, G=2)


def test_single_strain():
    res = _run(V=30, S=4, G=1)
    # G=1: gamma must be the all-ones column (verify skill contract)
    np.testing.assert_allclose(np.asarray(res.gamma_mean), 1.0, atol=1e-6)


def test_more_strains_than_samples():
    _run(V=50, S=2, G=4)
