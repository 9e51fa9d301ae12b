"""Checkpoint/resume: interrupted runs must reproduce uninterrupted ones
bitwise (counter-based PRNG on absolute sweep indices)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from desman_tpu.checkpoint import load, run_chain_checkpointed, save
from desman_tpu.sampler import SamplerConfig, run_chain


def test_checkpointed_equals_straight(small_synth, tmp_path):
    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=2, burn=10, samples=10, nmf_iters=50)
    key = jax.random.PRNGKey(4)

    ref = run_chain(n, cfg, key)
    ckpt = str(tmp_path / "chain.npz")
    got = run_chain_checkpointed(n, cfg, key, ckpt, checkpoint_every=7)

    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.gamma_mean),
                               np.asarray(got.gamma_mean), rtol=1e-6)


def test_resume_after_interrupt(small_synth, tmp_path):
    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    key = jax.random.PRNGKey(4)
    ckpt = str(tmp_path / "chain.npz")

    # "crash" after the first segment: run a truncated config with the same
    # checkpoint cadence, then resume the full run from the file
    partial_cfg = SamplerConfig(G=2, burn=10, samples=4, nmf_iters=50)
    full_cfg = SamplerConfig(G=2, burn=10, samples=10, nmf_iters=50)
    run_chain_checkpointed(n, partial_cfg, key, ckpt, checkpoint_every=7)
    state, accum, it, trace = load(ckpt)
    assert it == 14

    got = run_chain_checkpointed(n, full_cfg, key, ckpt, checkpoint_every=7)
    ref = run_chain(n, full_cfg, key)
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)


def test_save_load_roundtrip(small_synth, tmp_path):
    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    from desman_tpu.sampler import init_accum, init_state

    cfg = SamplerConfig(G=2, nmf_iters=20)
    state = init_state(n, cfg, jax.random.PRNGKey(0))
    accum = init_accum(t.data.V, t.data.S, 2)
    p = str(tmp_path / "snap.npz")
    save(p, state, accum, 3, np.zeros(3, np.float32))
    s2, a2, it, trace = load(p)
    assert it == 3
    assert np.array_equal(np.asarray(state.tau), np.asarray(s2.tau))
    assert np.array_equal(np.asarray(state.key), np.asarray(s2.key))


def test_pt_checkpointed_equals_straight(small_synth, tmp_path):
    """Segmented PT (resume machinery) == uninterrupted run_chain_pt."""
    from desman_tpu.checkpoint import run_chain_pt_checkpointed
    from desman_tpu.sampler import run_chain_pt

    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    key = jax.random.PRNGKey(9)
    cfg = SamplerConfig(G=2, burn=8, samples=8, nmf_iters=30)

    ref = run_chain_pt(n, cfg, key, n_replicas=3, max_temp=4.0)
    got = run_chain_pt_checkpointed(
        n, cfg, key, str(tmp_path / "pt.npz"), checkpoint_every=5,
        n_replicas=3, max_temp=4.0,
    )
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)
    np.testing.assert_allclose(float(ref.pt_swap_accept),
                               float(got.pt_swap_accept), atol=1e-6)


def test_pt_resume_after_interrupt(small_synth, tmp_path):
    from desman_tpu.checkpoint import load_pt, run_chain_pt_checkpointed
    from desman_tpu.sampler import run_chain_pt

    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    key = jax.random.PRNGKey(11)
    ckpt = str(tmp_path / "pt_chain.npz")

    partial_cfg = SamplerConfig(G=2, burn=6, samples=1, nmf_iters=30)
    full_cfg = SamplerConfig(G=2, burn=6, samples=6, nmf_iters=30)
    run_chain_pt_checkpointed(n, partial_cfg, key, ckpt, checkpoint_every=7,
                              n_replicas=3, max_temp=4.0)
    _, _, _, it, _, _, _ = load_pt(ckpt)
    assert it == 7

    got = run_chain_pt_checkpointed(n, full_cfg, key, ckpt,
                                    checkpoint_every=7, n_replicas=3,
                                    max_temp=4.0)
    ref = run_chain_pt(n, full_cfg, key, n_replicas=3, max_temp=4.0)
    assert np.array_equal(np.asarray(ref.tau_star), np.asarray(got.tau_star))
    np.testing.assert_allclose(np.asarray(ref.loglik_trace),
                               np.asarray(got.loglik_trace), rtol=1e-6)
