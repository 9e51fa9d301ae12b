"""Plot per-sample strain abundances from a Gamma CSV.

Equivalent of the reference's R abundance plots (SURVEY.md §2 misc
scripts): stacked bars of gamma[S,G] per sample, one color per strain.
Input: Gamma_mean.csv / Gamma_star.csv from a run dir.
Usage: python scripts/plot_abundances.py run_5_0/Gamma_mean.csv -o gamma.png
"""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("gamma_csv", help="Gamma_mean.csv / Gamma_star.csv")
    ap.add_argument("-o", "--output", default="abundances.png")
    args = ap.parse_args(argv)

    import pandas as pd

    df = pd.read_csv(args.gamma_csv, index_col=0)  # [S samples x G strains]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; printing table instead", file=sys.stderr)
        print(df.to_string())
        return 0

    fig, ax = plt.subplots(figsize=(max(6, 0.45 * len(df)), 4))
    bottom = None
    for g, col in enumerate(df.columns):
        vals = df[col].to_numpy()
        ax.bar(range(len(df)), vals, bottom=bottom, label=col, width=0.8)
        bottom = vals if bottom is None else bottom + vals
    ax.set_xticks(range(len(df)))
    ax.set_xticklabels(df.index, rotation=90, fontsize=7)
    ax.set_ylabel("relative abundance")
    ax.set_ylim(0, 1)
    ax.set_title("strain abundances per sample")
    ax.legend(fontsize=7, ncols=min(len(df.columns), 8))
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
