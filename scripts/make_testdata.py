"""Generate the bundled TestData quickstart dataset (deterministic).

The reference ships a TestData counts CSV (single contig, ~1k positions,
quickstart run at G=5 — SURVEY.md §2 'Bundled data'); the reference mount was
empty, so this synthesizes an equivalent from the generative model with known
ground truth, which the quickstart and golden tests validate against.

Run from the repo root:  python scripts/make_testdata.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from desman_tpu import io, synth

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "TestData")


def main():
    os.makedirs(OUT, exist_ok=True)
    V, S = 1000, 16
    t = synth.generate(
        V=V, S=S, G=5, coverage=40.0, error_rate=0.005,
        gamma_alpha=2.0, seed=2017,   # 2017: the DESMAN paper year
    )
    # append an equal number of monomorphic positions: realistic input for
    # the filter (it learns eta from exactly these; SURVEY.md §3.2)
    rng = np.random.default_rng(2017)
    mono_base = rng.integers(0, 4, size=V)
    mono = rng.poisson(
        40.0 * t.eta[mono_base][:, None, :].repeat(S, axis=1)
    ).astype(np.int32)
    full = io.CountsData(
        counts=np.concatenate([t.data.counts, mono], axis=0),
        contigs=np.array(["contig_test"] * (2 * V)),
        positions=np.arange(2 * V),
        samples=t.data.samples,
    )
    io.write_counts_csv(os.path.join(OUT, "variant_counts.csv"), full)
    # truth covers the variant positions (0..V-1) only (fresh name array —
    # writing into the synth <U5 contig array would silently truncate)
    io.write_tau_star_csv(os.path.join(OUT, "true_tau.csv"), t.tau_idx,
                          np.array(["contig_test"] * V), np.arange(V))
    io.write_gamma_csv(os.path.join(OUT, "true_gamma.csv"), t.gamma,
                       t.data.samples)
    io.write_eta_csv(os.path.join(OUT, "true_eta.csv"), t.eta)
    print(f"wrote TestData: {V} variant + {V} monomorphic positions, "
          f"S={S}, G=5 -> {OUT}")


if __name__ == "__main__":
    main()
