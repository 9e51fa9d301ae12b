"""Property-based tests (hypothesis) for the core math invariants.

The reference has no unit tests at all (SURVEY.md §4); these pin down the
algebraic contracts the samplers rely on, over randomized inputs rather
than fixed cases.
"""
import numpy as np
import scipy.special
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from desman_tpu.likelihood import mixture, probs
from desman_tpu.utils import (
    bh_fdr, compress_tau, log_multinomial_coeff, match_gamma_perm,
    normalize_rows, one_hot_tau, snp_distance_perm,
)

SMALL = settings(max_examples=25, deadline=None)


@SMALL
@given(arrays(np.int64, (7, 3), elements=st.integers(0, 3)))
def test_tau_onehot_roundtrip(tau):
    assert np.array_equal(np.asarray(compress_tau(one_hot_tau(tau))), tau)


@SMALL
@given(arrays(np.int64, (9, 3), elements=st.integers(0, 3)),
       st.permutations(list(range(3))))
def test_snp_distance_permutation_invariant(tau, perm):
    """Distance to any strain relabeling of yourself is zero; symmetry."""
    assert snp_distance_perm(tau, tau[:, list(perm)]) == 0
    other = (tau + 1) % 4
    assert snp_distance_perm(tau, other) == snp_distance_perm(other, tau)


@SMALL
@given(arrays(np.float64, (12,), elements=st.floats(1e-8, 1.0)))
def test_bh_fdr_properties(p):
    q = bh_fdr(p)
    assert ((q >= 0) & (q <= 1)).all()
    assert (q >= p - 1e-12).all()            # BH never shrinks below p
    # monotone in p-rank: sorting by p sorts q non-decreasingly
    order = np.argsort(p)
    assert (np.diff(q[order]) >= -1e-12).all()


@SMALL
@given(arrays(np.int64, (4, 4), elements=st.integers(0, 50)))
def test_log_multinomial_coeff_matches_scipy(n):
    got = np.asarray(log_multinomial_coeff(n.astype(np.float32)))
    for i in range(n.shape[0]):
        row = n[i]
        total = row.sum()
        want = (scipy.special.gammaln(total + 1)
                - scipy.special.gammaln(row + 1).sum())
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=1e-4)


@SMALL
@given(arrays(np.float64, (5, 2), elements=st.floats(0.01, 10.0)),
       arrays(np.int64, (6, 2), elements=st.integers(0, 3)))
def test_mixture_and_probs_are_distributions(gamma_raw, tau):
    gamma = gamma_raw / gamma_raw.sum(axis=1, keepdims=True)   # [S,G]
    oh = one_hot_tau(tau)                                      # [V,G,4]
    mix = np.asarray(mixture(oh, gamma.astype(np.float32)))    # [V,S,4]
    np.testing.assert_allclose(mix.sum(axis=2), 1.0, atol=1e-5)
    eta = np.asarray(normalize_rows(np.eye(4) * 50 + 1.0))
    p = np.asarray(probs(oh, gamma.astype(np.float32), eta.astype(np.float32)))
    np.testing.assert_allclose(p.sum(axis=2), 1.0, atol=1e-5)
    assert (p > 0).all()


@SMALL
@given(arrays(np.float64, (4, 3), elements=st.floats(0.05, 1.0)),
       st.permutations(list(range(3))))
def test_match_gamma_perm_finds_relabeling(g_raw, perm):
    g = g_raw / g_raw.sum(axis=1, keepdims=True)
    mae, _ = match_gamma_perm(g, g[:, list(perm)])
    assert mae < 1e-12

