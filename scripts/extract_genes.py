#!/usr/bin/env python
"""Gene-calling glue: prodigal GFF + assembly FASTA -> gene table (+ FASTA).

The reference pipeline calls genes with prodigal and carries (gene, contig,
start, end) coordinates into count extraction and gene-coverage tables
(SURVEY.md §3.5 'gene calling (prodigal)'; the ExtractGenes-style script in
the reference's scripts/ tail, §2 'Misc pipeline scripts' [M]). This tool
turns a GFF3 (prodigal's -f gff output, or any GFF with CDS features) into:

- a gene table TSV (gene, contig, start, end) — the exact format
  ``desman genecov``/``desman extract -g`` consume
  (desman_tpu/genecov.py::read_gene_table), 0-based half-open coordinates;
- optionally a per-gene FASTA (--fasta_out), strand-aware (reverse
  complement for '-' strand genes).

Host-side glue, no JAX: this is pipeline plumbing, not a hot path.
"""
from __future__ import annotations

import argparse
import sys

_COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def iter_fasta(path):
    name, chunks = None, []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name, chunks = line[1:].split()[0], []
            elif line:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)


def parse_gff(path, feature="CDS"):
    """Yield (gene_id, contig, start0, end, strand) from a GFF3 file.

    GFF is 1-based inclusive; emitted coordinates are 0-based half-open
    (the gene-table convention). The gene id is the ID= attribute when
    present (prodigal writes ID=<n>_<m>), else contig_<n> by order.
    """
    count = {}
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 8 or parts[2] != feature:
                continue
            contig, start, end, strand = parts[0], int(parts[3]), int(parts[4]), parts[6]
            attrs = parts[8] if len(parts) > 8 else ""
            gid = None
            for field in attrs.split(";"):
                if field.strip().startswith("ID="):
                    gid = field.strip()[3:]
                    break
            if gid is None:
                count[contig] = count.get(contig, 0) + 1
                gid = f"{contig}_{count[contig]}"
            yield gid, contig, start - 1, end, strand


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("gff", help="prodigal GFF3 (or any GFF with CDS rows)")
    ap.add_argument("-o", "--gene_table", required=True,
                    help="output TSV: gene, contig, start, end (0-based "
                    "half-open; desman genecov format)")
    ap.add_argument("--fasta", default=None,
                    help="assembly FASTA (required for --fasta_out)")
    ap.add_argument("--fasta_out", default=None,
                    help="write per-gene sequences here (strand-aware)")
    ap.add_argument("--feature", default="CDS",
                    help="GFF feature type to extract (default CDS)")
    ap.add_argument("--contigs", default=None,
                    help="comma-separated contig allowlist (e.g. one bin)")
    args = ap.parse_args(argv)

    allow = set(args.contigs.split(",")) if args.contigs else None
    genes = [g for g in parse_gff(args.gff, args.feature)
             if allow is None or g[1] in allow]
    if not genes:
        print("extract_genes: no matching features", file=sys.stderr)
        return 1

    with open(args.gene_table, "w") as f:
        f.write("gene\tcontig\tstart\tend\n")
        for gid, contig, start, end, _ in genes:
            f.write(f"{gid}\t{contig}\t{start}\t{end}\n")

    if args.fasta_out:
        if not args.fasta:
            print("extract_genes: --fasta_out requires --fasta",
                  file=sys.stderr)
            return 2
        seqs = dict(iter_fasta(args.fasta))
        with open(args.fasta_out, "w") as f:
            for gid, contig, start, end, strand in genes:
                if contig not in seqs:
                    print(f"extract_genes: contig {contig!r} not in FASTA",
                          file=sys.stderr)
                    return 1
                seq = seqs[contig][start:end]
                if strand == "-":
                    seq = revcomp(seq)
                f.write(f">{gid} {contig}:{start}-{end}({strand})\n{seq}\n")
    print(f"extract_genes: wrote {len(genes)} genes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
