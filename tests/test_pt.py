"""Parallel tempering (replica exchange) tests.

The cold rung must leave the posterior invariant (tempering only helps
mixing): check against the exact enumerated posterior like
tests/test_exactness.py, plus swap-rate sanity and a multimodal case where
tempering has to cross a likelihood valley that plain Gibbs cannot.
"""
import jax
import jax.numpy as jnp
import numpy as np

from desman_tpu import synth
from desman_tpu.geneassign import assign_gene_tau
from desman_tpu.sampler import SamplerConfig, run_chain_pt


def test_pt_matches_exact_posterior():
    """With gamma/eta frozen, the PT cold rung's tau posterior mean must
    match exact enumeration — tempering and exchange must not shift the
    T=1 target."""
    t = synth.generate(V=24, S=3, G=2, coverage=6.0, seed=42)
    n = jnp.asarray(t.data.counts, jnp.float32)
    _, exact_mean = assign_gene_tau(t.data.counts, t.gamma, t.eta)

    cfg = SamplerConfig(
        G=2, burn=500, samples=4000, fix_gamma=True, fix_eta=True,
        anneal_temp0=1.0, adapt_kappa=False, nmf_iters=10,
    )
    res = run_chain_pt(
        n, cfg, jax.random.PRNGKey(0), n_replicas=3, max_temp=4.0,
        eta_init=jnp.asarray(t.eta, jnp.float32),
        gamma_init=jnp.asarray(t.gamma, jnp.float32),
    )
    got = np.asarray(res.tau_mean)
    want = np.asarray(exact_mean)
    err = np.abs(got - want).max()
    assert err < 0.05, f"max |PT - exact| = {err}"
    assert np.abs(got - want).mean() < 0.01
    assert 0.0 < float(res.pt_swap_accept) <= 1.0


def test_pt_calibration_free_run():
    """Full PT run (gamma/eta sampled): posterior mode must match truth and
    the swap acceptance must be in a healthy band."""
    t = synth.generate(V=60, S=8, G=3, coverage=50.0, seed=7)
    n = jnp.asarray(t.data.counts, jnp.float32)
    cfg = SamplerConfig(G=3, burn=100, samples=100, nmf_iters=50,
                        anneal_temp0=1.0)
    res = run_chain_pt(n, cfg, jax.random.PRNGKey(1), n_replicas=4,
                       max_temp=8.0)
    from desman_tpu.utils import snp_distance_perm

    dist = snp_distance_perm(t.tau_idx, np.asarray(res.tau_star))
    assert dist <= 2, f"SNP distance {dist}"
    rate = float(res.pt_swap_accept)
    assert 0.0 < rate <= 1.0, rate


def test_pt_crosses_modes_plain_gibbs_cannot():
    """Started in a half-label-swapped state with the pairwise swap move
    disabled, single-site Gibbs is stuck: fixing a swapped position means
    passing through a both-strains-same-base valley. PT's hot rungs flatten
    the valley and the repaired configurations percolate to the cold rung —
    same init, same budget, PT must end far closer to the truth."""
    from desman_tpu.sampler import run_chain
    from desman_tpu.utils import snp_distance_perm

    rng = np.random.default_rng(3)
    # low coverage keeps the both-strains-same-base valley shallow enough
    # for a 6-rung ladder to T=16 to cross, while the 0.8/0.2 abundance gap
    # keeps the correct labeling strongly identified (T=1 posterior sharp)
    V, S, G = 40, 4, 2
    tau_idx = rng.integers(0, 4, size=(V, G))
    same = tau_idx[:, 0] == tau_idx[:, 1]
    tau_idx[same, 1] = (tau_idx[same, 0] + 1) % 4
    gamma = np.tile(np.array([0.8, 0.2]), (S, 1))        # identifiable labels
    eta = np.full((4, 4), 0.01 / 3) + np.eye(4) * (0.99 - 0.01 / 3)
    onehot = np.eye(4)[tau_idx]                          # [V,G,4]
    mix = np.einsum("vga,sg->vsa", onehot, gamma)
    probs = np.einsum("vsa,ab->vsb", mix, eta)
    counts = rng.poisson(5.0 * probs).astype(np.int32)
    n = jnp.asarray(counts, jnp.float32)

    # init: truth with strain labels exchanged at the second half of positions
    tau0 = tau_idx.copy()
    tau0[V // 2:] = tau0[V // 2:, ::-1]
    common = dict(
        eta_init=jnp.asarray(eta, jnp.float32),
        gamma_init=jnp.asarray(gamma, jnp.float32),
        tau_init=jnp.asarray(tau0, jnp.int32),
    )
    cfg = SamplerConfig(G=2, burn=200, samples=200, nmf_iters=0,
                        anneal_temp0=1.0, swap_moves=False,
                        fix_gamma=True, fix_eta=True)

    plain = run_chain(n, cfg, jax.random.PRNGKey(0), **common)
    pt = run_chain_pt(n, cfg, jax.random.PRNGKey(0), n_replicas=6,
                      max_temp=16.0, **common)

    d_plain = snp_distance_perm(tau_idx, np.asarray(plain.tau_star))
    d_pt = snp_distance_perm(tau_idx, np.asarray(pt.tau_star))
    # same init, same budget: PT recovers the truth, plain stays partially
    # pinned in the swapped mode with a clearly worse star state
    assert d_pt <= 2, f"PT star SNP distance {d_pt}/{V * G} (plain: {d_plain})"
    assert d_plain > d_pt, (d_plain, d_pt)
    assert float(pt.star_loglik) > float(plain.star_loglik) + 5.0


def test_pt_store_samples_cold_chain(small_synth):
    """PT draw storage (r3): stored draws are the COLD chain's post-burn
    states, thinned, and storage must not perturb the trajectory."""
    t = small_synth
    n = jnp.asarray(t.data.counts, jnp.float32)
    key = jax.random.PRNGKey(4)
    cfg_s = SamplerConfig(G=2, burn=10, samples=12, nmf_iters=30,
                          store_samples=True, store_thin=3)
    res = run_chain_pt(n, cfg_s, key, n_replicas=3)
    assert res.tau_samples.shape == (4, t.data.V, 2)
    assert res.tau_samples.dtype == jnp.int8
    assert res.gamma_samples.shape == (4, t.data.S, 2)
    np.testing.assert_allclose(np.asarray(res.gamma_samples).sum(-1), 1.0,
                               rtol=1e-5)

    ref = run_chain_pt(n, SamplerConfig(G=2, burn=10, samples=12,
                                        nmf_iters=30), key, n_replicas=3)
    np.testing.assert_array_equal(np.asarray(res.loglik_trace),
                                  np.asarray(ref.loglik_trace))
    np.testing.assert_array_equal(np.asarray(res.tau_star),
                                  np.asarray(ref.tau_star))
