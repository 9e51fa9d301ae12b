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
    t = synth.generate(
        V=1000, S=16, G=5, coverage=40.0, error_rate=0.005,
        gamma_alpha=2.0, seed=2017,   # 2017: the DESMAN paper year
    )
    t.data.contigs[:] = "contig_test"
    io.write_counts_csv(os.path.join(OUT, "variant_counts.csv"), t.data)
    io.write_tau_star_csv(os.path.join(OUT, "true_tau.csv"), t.tau_idx,
                          t.data.contigs, t.data.positions)
    io.write_gamma_csv(os.path.join(OUT, "true_gamma.csv"), t.gamma,
                       t.data.samples)
    io.write_eta_csv(os.path.join(OUT, "true_eta.csv"), t.eta)
    print(f"wrote TestData: V={t.data.V} S={t.data.S} G=5 -> {OUT}")


if __name__ == "__main__":
    main()
