"""Contig taxonomy assignment from protein-hit tables.

Equivalent of the reference's ``scripts/ClassifyContigNR.py`` [M name —
SURVEY.md §2 'Misc pipeline scripts']: given gene-vs-NR alignment hits
(DIAMOND/BLAST outfmt-6 tabular) and a subject->lineage mapping, assign each
contig a taxonomy by bitscore-weighted voting at every rank, reporting the
deepest rank whose winning taxon holds more than ``--min_frac`` of the
contig's hit weight. The NR search itself (diamond/blast against the NR
database) stays external, like all read-mapping upstream of the counts CSV
(SURVEY.md §3.5).

Inputs:
  hits:    qseqid sseqid pident length mismatch gapopen qstart qend sstart
           send evalue bitscore   (tab-separated, outfmt 6; only qseqid,
           sseqid, bitscore are used)
  lineage: TSV/CSV mapping sseqid (or its accession prefix) to a
           semicolon-separated lineage, e.g.
           "Bacteria;Proteobacteria;Gammaproteobacteria;...;Escherichia coli"

Gene ids are mapped to contigs by stripping a trailing ``_<n>`` (prodigal's
gene numbering), overridable with --gene_regex.

Usage:
    python scripts/classify_contigs.py hits.tsv lineage.tsv -o contig_tax.tsv
"""
import argparse
import csv
import re
import sys
from collections import defaultdict

RANKS = ["domain", "phylum", "class", "order", "family", "genus", "species"]


def read_lineage(path):
    """sseqid -> [taxon per rank]; separator sniffed from the first line."""
    lineage = {}
    with open(path) as f:
        first = f.readline()
        sep = "\t" if "\t" in first else ","
        f.seek(0)
        for row in csv.reader(f, delimiter=sep):
            if len(row) < 2 or row[0].lower() in ("sseqid", "accession", "subject"):
                continue
            lineage[row[0]] = [t.strip() for t in row[1].split(";")]
    return lineage


def gene_to_contig(qseqid, pattern):
    m = re.match(pattern, qseqid)
    return m.group(1) if m else qseqid


def classify(hits_path, lineage, gene_regex, min_frac, top_per_gene):
    """contig -> (assignment per rank, support fraction per rank, n_hits)."""
    # bitscore-weighted votes: contig -> rank -> taxon -> weight
    votes = defaultdict(lambda: [defaultdict(float) for _ in RANKS])
    totals = defaultdict(lambda: [0.0] * len(RANKS))
    nhits = defaultdict(int)
    kept = defaultdict(int)  # (gene) -> hits used so far
    with open(hits_path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 12:
                continue
            qseqid, sseqid = parts[0], parts[1]
            if top_per_gene and kept[qseqid] >= top_per_gene:
                continue
            lin = lineage.get(sseqid) or lineage.get(sseqid.split(".")[0])
            if lin is None:
                continue
            try:
                bits = float(parts[11])
            except ValueError:
                continue
            kept[qseqid] += 1
            contig = gene_to_contig(qseqid, gene_regex)
            nhits[contig] += 1
            for r, taxon in enumerate(lin[: len(RANKS)]):
                if not taxon:
                    continue
                votes[contig][r][taxon] += bits
                totals[contig][r] += bits
    out = {}
    for contig, rank_votes in votes.items():
        assign, support = [], []
        for r, tv in enumerate(rank_votes):
            if not tv or totals[contig][r] <= 0:
                assign.append("")
                support.append(0.0)
                continue
            taxon, w = max(tv.items(), key=lambda kv: kv[1])
            frac = w / totals[contig][r]
            if frac >= min_frac:
                assign.append(taxon)
                support.append(frac)
            else:
                assign.append("")
                support.append(frac)
        # taxonomy must be hierarchical: blank out ranks below the first miss
        for r in range(len(assign)):
            if not assign[r]:
                for r2 in range(r + 1, len(assign)):
                    assign[r2] = ""
                break
        out[contig] = (assign, support, nhits[contig])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("hits", help="DIAMOND/BLAST outfmt-6 tabular hits")
    ap.add_argument("lineage", help="sseqid -> semicolon lineage TSV/CSV")
    ap.add_argument("-o", "--output", default="contig_tax.tsv")
    ap.add_argument("--min_frac", type=float, default=0.5,
                    help="min weighted vote fraction to assign a rank")
    ap.add_argument("--top_per_gene", type=int, default=10,
                    help="use at most this many hits per gene (0 = all)")
    ap.add_argument("--gene_regex", default=r"(.+)_\d+$",
                    help="regex whose group 1 maps gene id -> contig id")
    args = ap.parse_args(argv)

    lineage = read_lineage(args.lineage)
    if not lineage:
        print("classify: empty lineage mapping", file=sys.stderr)
        return 1
    res = classify(args.hits, lineage, args.gene_regex, args.min_frac,
                   args.top_per_gene)
    with open(args.output, "w") as out:
        out.write("contig\tn_hits\t" + "\t".join(RANKS) + "\t"
                  + "\t".join(f"{r}_frac" for r in RANKS) + "\n")
        for contig in sorted(res):
            assign, support, n = res[contig]
            out.write(contig + f"\t{n}\t" + "\t".join(assign) + "\t"
                      + "\t".join(f"{s:.3f}" for s in support) + "\n")
    print(f"classify: {len(res)} contigs -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
