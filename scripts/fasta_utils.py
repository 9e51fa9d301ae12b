"""FASTA utilities: contig lengths + bin splitting.

Equivalents of the reference's ``scripts/Lengths.py`` and ``CompSplit.py``
misc pipeline scripts (SURVEY.md §2): emit a contig-length table, and split
an assembly FASTA into per-cluster files given a clustering CSV
(contig,cluster — the CONCOCT output format the reference pipeline uses).

Usage:
    python scripts/fasta_utils.py lengths assembly.fasta -o lengths.tsv
    python scripts/fasta_utils.py split assembly.fasta clustering.csv -o bins/
"""
import argparse
import os
import sys


def iter_fasta(path):
    """Yield (name, sequence) from a FASTA file (plain text).

    Kept dependency-free on purpose (this script runs standalone, outside
    the package); desman_tpu.strainfasta.read_fasta is the in-package twin.
    """
    name, chunks = None, []
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                tokens = line[1:].split()
                if not tokens:
                    raise ValueError(f"{path}:{lineno}: empty FASTA header")
                name = tokens[0]
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)


def cmd_lengths(args):
    with open(args.output, "w") as out:
        out.write("contig\tlength\n")
        n = 0
        for name, seq in iter_fasta(args.fasta):
            out.write(f"{name}\t{len(seq)}\n")
            n += 1
    print(f"lengths: {n} contigs -> {args.output}")
    return 0


def cmd_split(args):
    import csv

    cluster_of = {}
    with open(args.clustering) as f:
        for row in csv.reader(f):
            if len(row) < 2 or row[0].lower() in ("contig", "contig_id"):
                continue
            cluster_of[row[0]] = row[1]

    os.makedirs(args.output_dir, exist_ok=True)
    handles = {}
    counts = {}
    try:
        for name, seq in iter_fasta(args.fasta):
            cluster = cluster_of.get(name)
            if cluster is None:
                continue
            if cluster not in handles:
                handles[cluster] = open(
                    os.path.join(args.output_dir, f"bin_{cluster}.fasta"), "w")
                counts[cluster] = 0
            handles[cluster].write(f">{name}\n{seq}\n")
            counts[cluster] += 1
    finally:
        for h in handles.values():
            h.close()
    for cluster in sorted(counts):
        print(f"bin_{cluster}: {counts[cluster]} contigs")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    lp = sub.add_parser("lengths")
    lp.add_argument("fasta")
    lp.add_argument("-o", "--output", default="lengths.tsv")
    lp.set_defaults(fn=cmd_lengths)
    sp = sub.add_parser("split")
    sp.add_argument("fasta")
    sp.add_argument("clustering", help="CSV: contig,cluster")
    sp.add_argument("-o", "--output_dir", default="bins")
    sp.set_defaults(fn=cmd_split)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
