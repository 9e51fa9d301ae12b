"""Plot posterior mean deviance vs G from collated fit records.

Equivalent of the reference's PlotDev.R (SURVEY.md §2 misc scripts).
Input: the CSV written by `desman_tpu.cli collate` (or run-dir globs).
Usage: python scripts/plot_deviance.py collated_fits.csv -o dev.png
"""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("collated_csv")
    ap.add_argument("-o", "--output", default="deviance_vs_G.png")
    args = ap.parse_args()

    import pandas as pd

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; printing table instead", file=sys.stderr)
        df = pd.read_csv(args.collated_csv)
        print(df.groupby("G")["mean_deviance"].min().to_string())
        return 0

    df = pd.read_csv(args.collated_csv)
    best = df.groupby("G")["mean_deviance"].min()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.scatter(df["G"], df["mean_deviance"], alpha=0.4, label="replicates")
    ax.plot(best.index, best.values, "o-", color="black", label="best")
    ax.set_xlabel("number of strains G")
    ax.set_ylabel("posterior mean deviance")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
