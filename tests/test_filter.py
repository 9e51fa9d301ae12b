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


def _null_dataset(V, S, coverage, error_rate, seed):
    """All positions monomorphic: one true base + sequencing error (H0)."""
    rng = np.random.default_rng(seed)
    eta = synth.make_eta(error_rate)
    base = rng.integers(0, 4, size=V)
    depth = rng.poisson(coverage, size=(V, S))
    counts = np.zeros((V, S, 4), dtype=np.int32)
    for a in range(4):  # vectorized multinomials per true base
        m = base == a
        counts[m] = rng.multinomial(
            depth[m].ravel(), eta[a]
        ).reshape(-1, S, 4)
    return CountsData(
        counts=counts, contigs=np.array(["c"] * V), positions=np.arange(V),
        samples=[f"s{i}" for i in range(S)],
    )


def test_null_calibration():
    """chi2_df calibration gate (VERDICT r1 weak #2): on pure-noise data the
    default df must keep the marginal p-values near-uniform (mild boundary
    inflation tolerated, measured 0.072 at nominal 0.05 — see the note in
    filter.py) and the BH-FDR selection must make ~zero false calls."""
    data = _null_dataset(V=4000, S=16, coverage=30.0, error_rate=0.01, seed=1)
    for per_sample in (False, True):
        res = filter_variants(data, FilterConfig(per_sample=per_sample))
        frac05 = float((res.pvalues < 0.05).mean())
        assert frac05 < 0.10, (per_sample, frac05)
        fpr = float(res.selected.mean())
        assert fpr < 1e-3, (per_sample, fpr)  # <=4 false selections in 4000


def test_low_prevalence_variant_per_sample_mode():
    """VERDICT r1 weak #3: a variant present in ONE of many samples is
    diluted ~S-fold by the pooled test (to below the error rate here); the
    per-sample H1 (the DESMAN generative model's own shape) must recover
    it."""
    rng = np.random.default_rng(7)
    V_var, V_noise, S, depth_mean = 40, 400, 48, 20.0
    eta = synth.make_eta(0.01)
    counts = np.zeros((V_var + V_noise, S, 4), dtype=np.int32)
    base = rng.integers(0, 4, size=V_var + V_noise)
    depth = rng.poisson(depth_mean, size=(V_var + V_noise, S))
    for v in range(V_var + V_noise):
        for s in range(S):
            counts[v, s] = rng.multinomial(depth[v, s], eta[base[v]])
    # inject the variant: in sample 0 only, 30% of reads carry another base
    # -> pooled frequency 0.3/48 ~ 0.6%, UNDER the 1% error rate
    for v in range(V_var):
        alt = (base[v] + 1 + rng.integers(3)) % 4
        mix = 0.7 * eta[base[v]] + 0.3 * eta[alt]
        counts[v, 0] = rng.multinomial(max(depth[v, 0], 15), mix)
    data = CountsData(
        counts=counts, contigs=np.array(["c"] * len(base)),
        positions=np.arange(len(base)), samples=[f"s{i}" for i in range(S)],
    )
    truth = np.concatenate([np.ones(V_var, bool), np.zeros(V_noise, bool)])

    pooled = filter_variants(data, FilterConfig(per_sample=False))
    per_s = filter_variants(data, FilterConfig(per_sample=True))
    sens_pooled = pooled.selected[truth].mean()
    sens_per_s = per_s.selected[truth].mean()
    fpr_per_s = per_s.selected[~truth].mean()
    # the pooled test dilutes the signal ~48x; per-sample must beat it
    # decisively while holding the false-positive rate
    assert sens_per_s > 0.9, f"per-sample sensitivity {sens_per_s}"
    assert sens_per_s > sens_pooled + 0.3, (sens_per_s, sens_pooled)
    assert fpr_per_s < 0.02, f"per-sample FPR {fpr_per_s}"
