"""Variant-filter behavior: true variants kept, noise-only positions dropped,
eta recovered (self-consistency gate until the reference mount provides
goldens — SURVEY.md §7.2 step 3)."""
import numpy as np

from desman_tpu import synth
from desman_tpu.filter import FilterConfig, FilterResult, filter_variants
from desman_tpu.io import CountsData


def _mixed_dataset(V_var=80, V_noise=120, S=12, seed=0, error_rate=0.01):
    """Concatenate true variant positions with monomorphic (noise-only) ones."""
    rng = np.random.default_rng(seed)
    t = synth.generate(V=V_var, S=S, G=3, coverage=80.0, seed=seed,
                       error_rate=error_rate)
    eta = t.eta
    # monomorphic positions: one true base + error
    base = rng.integers(0, 4, size=V_noise)
    depth = rng.poisson(80.0, size=(V_noise, S))
    noise = np.zeros((V_noise, S, 4), dtype=np.int32)
    for v in range(V_noise):
        for s in range(S):
            if depth[v, s] > 0:
                noise[v, s] = rng.multinomial(depth[v, s], eta[base[v]])
    counts = np.concatenate([t.data.counts, noise], axis=0)
    data = CountsData(
        counts=counts,
        contigs=np.array(["c"] * (V_var + V_noise)),
        positions=np.arange(V_var + V_noise),
        samples=t.data.samples,
    )
    truth = np.concatenate([np.ones(V_var, bool), np.zeros(V_noise, bool)])
    return data, truth, eta


def test_filter_separates_variants_from_noise():
    data, truth, eta = _mixed_dataset()
    res = filter_variants(data)
    # sensitivity: misses only strain-composition corner cases
    sens = res.selected[truth].mean()
    fpr = res.selected[~truth].mean()
    assert sens > 0.9, f"sensitivity {sens}"
    assert fpr < 0.1, f"false positive rate {fpr}"


def test_filter_recovers_eta():
    data, truth, eta = _mixed_dataset(V_var=40, V_noise=400)
    res = filter_variants(data)
    assert np.abs(res.eta - eta).max() < 0.01


def test_min_coverage_gate():
    data, truth, eta = _mixed_dataset(V_var=10, V_noise=10)
    data.counts[0] = 0  # zero coverage position (was a true variant)
    res = filter_variants(data, FilterConfig(min_coverage=5.0))
    assert not res.selected[0]
    assert res.qvalues[0] == 1.0


def test_pvalues_in_unit_interval():
    data, _, _ = _mixed_dataset(V_var=20, V_noise=20)
    res = filter_variants(data)
    assert ((res.pvalues >= 0) & (res.pvalues <= 1)).all()
    assert ((res.qvalues >= 0) & (res.qvalues <= 1)).all()
    assert (res.llr >= 0).all()
