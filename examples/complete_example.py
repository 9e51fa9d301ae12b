"""The complete_example pipeline, end to end (reference L4 — SURVEY.md §3.5).

The reference's complete_example walks an E. coli mock community from
assembly to strain genomes; everything upstream of the variant-count matrix
(assembly/binning/mapping) is external tooling and out of scope (SURVEY.md
§3.5 note). This example generates an equivalent mock community — core-gene
variant counts + accessory-gene coverage with known ground truth — and runs
the full in-scope pipeline:

    counts CSV -> variant filter -> desman G=1..Gmax x seeds (on-device grid)
    -> resolvenhap model selection -> validateSNP vs truth
    -> GeneAssign accessory-genome recovery

Run:  python examples/complete_example.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small config for CI")
    ap.add_argument("--paper", action="store_true",
                    help="published-mock scale: S=64 samples, ~7k core SNVs, "
                    "G=5 strains, 8G x 5 seeds grid, 1500 accessory genes "
                    "(BASELINE.json configs #2/#3/#4; VERDICT r3 missing #2)")
    ap.add_argument("--prune", action="store_true",
                    help="after selection, drop bulky CSVs from non-selected "
                    "run dirs (keep fit.txt/metrics.json) so outputs commit")
    ap.add_argument("--outdir", default="complete_example_out")
    ap.add_argument("--seed", type=int, default=2017)
    args = ap.parse_args()

    from desman_tpu import io, synth
    from desman_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from desman_tpu.filter import filter_variants
    from desman_tpu.geneassign import (
        GeneAssignConfig, assign_genes, strain_coverage,
    )
    from desman_tpu.model_selection import fit_grid, resolve_nhap
    from desman_tpu.utils import match_gamma_perm
    from desman_tpu.validation import compare_tau

    gen_kw = {}
    if args.quick:
        V, S, G_true, gmax, seeds, iters, D = 200, 12, 3, 5, [0, 1], 80, 40
    elif args.paper:
        # the published E. coli mock's shape: tens of samples, thousands of
        # core SNVs, 5 strains, skewed per-sample abundances; biallelic
        # positions (point mutations on a phylogeny)
        V, S, G_true, gmax, seeds, iters, D = (
            7000, 64, 5, 8, [0, 1, 2, 3, 4], 250, 1500)
        gen_kw = dict(max_alleles=2, gamma_alpha=0.6)
    else:
        V, S, G_true, gmax, seeds, iters, D = 1000, 16, 5, 8, [0, 1, 2], 250, 200

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # ---- mock community ground truth ----
    # variant positions + an equal number of monomorphic ones: real counts
    # tables are mostly non-variant, and the filter learns the error matrix
    # eta precisely from those positions (SURVEY.md §3.2) — without them the
    # fitted eta is no better than its initializer and the fixed-eta
    # deviance floor rises by tens of thousands
    t = synth.generate(V=V, S=S, G=G_true, coverage=50.0, error_rate=0.005,
                       gamma_alpha=gen_kw.pop("gamma_alpha", 2.0),
                       seed=args.seed, **gen_kw)
    mono_base = rng.integers(0, 4, size=V)
    mono = rng.poisson(
        50.0 * t.eta[mono_base][:, None, :].repeat(S, axis=1)
    ).astype(np.int32)
    full = io.CountsData(
        counts=np.concatenate([t.data.counts, mono], axis=0),
        contigs=np.array(["synth"] * (2 * V)),
        positions=np.arange(2 * V),
        samples=t.data.samples,
    )
    is_variant = np.concatenate([np.ones(V, bool), np.zeros(V, bool)])
    counts_csv = os.path.join(args.outdir, "core_counts.csv")
    io.write_counts_csv(counts_csv, full)
    print(f"[1/5] mock community: {V} variant + {V} monomorphic positions, "
          f"S={S}, true G={G_true} -> {counts_csv}")

    # ---- variant filter ----
    data = io.read_counts_csv(counts_csv)
    fres = filter_variants(data)
    sel = data.select(np.flatnonzero(fres.selected))
    sens = fres.selected[is_variant].mean()
    fpr = fres.selected[~is_variant].mean()
    io.write_eta_csv(os.path.join(args.outdir, "tran_df.csv"), fres.eta)
    print(f"[2/5] filter: kept {sel.V} positions "
          f"(sensitivity {sens:.3f}, FPR {fpr:.3f}); "
          f"eta max err {np.abs(fres.eta - t.eta).max():.4f}")

    # ---- G-grid + model selection ----
    t0 = time.time()
    records = fit_grid(
        sel.counts, g_values=list(range(1, gmax + 1)), seeds=seeds,
        iterations=iters, eta_init=fres.eta, fix_eta=True,
        out_stub=os.path.join(args.outdir, "run"), data=sel,
    )
    selres = resolve_nhap(records)
    print(f"[3/5] grid {gmax}G x {len(seeds)} seeds in {time.time()-t0:.1f}s; "
          f"selected G={selres.G} (true {G_true}), "
          f"uncertainty={selres.uncertainty:.4f}")

    # ---- validate haplotypes vs truth ----
    # align on (Contig, Position): prediction covers the selected positions
    # (true variants + any false positives, which have no truth row)
    pred_tau, pc, pp = io.read_tau_star_csv(
        os.path.join(selres.run_dir, "Filtered_Tau_star.csv"))
    rep = compare_tau(
        pred_tau, t.tau_idx,
        pred_keys=list(zip(map(str, pc), map(int, pp))),
        true_keys=[("synth", i) for i in range(V)],
    )
    gmae, _ = match_gamma_perm(
        t.gamma, io.read_gamma_csv(os.path.join(selres.run_dir, "Gamma_mean.csv")))
    print(f"[4/5] validate: SNP error rate {rep.error_rate:.5f} "
          f"({rep.snp_errors} errors / {rep.n_positions} positions), "
          f"gamma MAE {gmae:.5f}")

    # ---- accessory genes ----
    total_cov = t.data.counts.sum(2).mean(0)
    gamma_inf = io.read_gamma_csv(os.path.join(selres.run_dir, "Gamma_mean.csv"))
    cov_inf = strain_coverage(gamma_inf, total_cov)
    etaG_true = rng.integers(0, 2, size=(D, G_true))
    etaG_true[etaG_true.sum(1) == 0, 0] = 1
    cov_true = strain_coverage(t.gamma, total_cov)
    x = rng.poisson(np.maximum(etaG_true @ cov_true, 1e-9)).astype(np.float64)
    gres = assign_genes(x, cov_inf, GeneAssignConfig())
    # match inferred strain order to truth before scoring
    _, (ti, pi) = match_gamma_perm(t.gamma, gamma_inf)
    acc = (np.asarray(gres.eta_star)[:, pi] == etaG_true[:, ti]).mean()
    print(f"[5/5] geneassign: presence accuracy {acc:.4f} over {D} genes")

    ok = (selres.G == G_true and rep.error_rate < 0.02 and gmae < 0.02
          and acc > 0.9)

    import json

    summary = {
        "scale": ("paper" if args.paper else "quick" if args.quick else
                  "default"),
        "V_variant": V, "S": S, "G_true": G_true, "gmax": gmax,
        "seeds": seeds, "iterations": iters, "n_genes": D,
        "filter_sensitivity": round(float(sens), 4),
        "filter_fpr": round(float(fpr), 4),
        "selected_G": selres.G,
        "snv_uncertainty": round(float(selres.uncertainty), 5),
        "snp_errors": int(rep.snp_errors),
        "snp_error_rate": round(float(rep.error_rate), 6),
        "gamma_mae": round(float(gmae), 6),
        "gene_presence_accuracy": round(float(acc), 5),
        "pass": bool(ok),
    }
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    if args.prune:
        import glob

        keep = {"fit.txt", "metrics.json"}
        for d in glob.glob(os.path.join(args.outdir, "run_*")):
            if os.path.abspath(d) == os.path.abspath(selres.run_dir or ""):
                continue
            for fpath in os.listdir(d):
                if fpath not in keep:
                    os.remove(os.path.join(d, fpath))
    print("COMPLETE_EXAMPLE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
