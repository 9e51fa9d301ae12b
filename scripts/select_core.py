#!/usr/bin/env python
"""Core-gene (COG/SCG) selection: gene->COG hits + core-COG list -> gene table.

The reference pipeline identifies single-copy core genes on the target bin by
assigning genes to COGs (rpsblast) and keeping those matching a curated core
set; variants are then called on core genes only (SURVEY.md §3.5 'core-gene
identification (COGs)'; the ExtractCogs-style script in the reference's
scripts/ tail [M]). This tool joins:

- a hits table: gene + COG id per row (rpsblast outfmt-6 style TSV — gene id
  in column 1, subject in column 2, e.g. "gnl|CDD|223251 COG0016"; or a
  simple 2-column gene,cog file), best (first) hit per gene wins;
- a core-COG list (one id per line, '#' comments ok);
- the gene table from extract_genes.py,

and writes the core-gene subset table (same format), ready for
``desman extract -g`` / ``desman genecov``. Host-side glue, no JAX.
"""
from __future__ import annotations

import argparse
import re
import sys

_COG_RE = re.compile(r"(COG\d{4})")


def read_hits(path):
    """gene -> first COG id seen (best hit first, as blast emits)."""
    hits = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = re.split(r"[\t,]", line)
            if len(parts) < 2:
                continue
            m = _COG_RE.search(" ".join(parts[1:]))
            if m is None:
                continue
            hits.setdefault(parts[0], m.group(1))
    return hits


def read_core_list(path):
    cogs = set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                cogs.add(line.split()[0])
    return cogs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("gene_table", help="TSV from extract_genes.py")
    ap.add_argument("hits", help="gene->COG hits (blast outfmt 6 or 2-col)")
    ap.add_argument("core_cogs", help="core COG ids, one per line")
    ap.add_argument("-o", "--output", required=True,
                    help="core-gene subset table (gene,contig,start,end TSV)")
    ap.add_argument("--unique", action="store_true",
                    help="drop core COGs hit by more than one gene "
                    "(single-copy enforcement within the bin)")
    args = ap.parse_args(argv)

    hits = read_hits(args.hits)
    core = read_core_list(args.core_cogs)

    rows = []
    with open(args.gene_table) as f:
        header = f.readline()
        if not header.lower().startswith("gene"):
            rows.append(header.rstrip("\n"))  # headerless table
        rows.extend(line.rstrip("\n") for line in f if line.strip())

    kept, by_cog = [], {}
    for row in rows:
        gene = row.split("\t")[0].split(",")[0]
        cog = hits.get(gene)
        if cog in core:
            kept.append((gene, cog, row))
            by_cog.setdefault(cog, []).append(gene)

    if args.unique:
        multi = {c for c, genes in by_cog.items() if len(genes) > 1}
        kept = [k for k in kept if k[1] not in multi]

    with open(args.output, "w") as f:
        f.write("gene\tcontig\tstart\tend\n")
        for _, _, row in kept:
            f.write(row + "\n")
    print(f"select_core: kept {len(kept)}/{len(rows)} genes "
          f"({len({c for _, c, _ in kept})} core COGs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
