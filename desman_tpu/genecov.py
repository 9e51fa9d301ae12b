"""Gene coverage extraction (ExtractCountFreqGenes-equivalent, SURVEY.md §2).

The reference's count-extraction scripts turn mapped reads into (a) the
core-gene variant counts CSV and (b) per-gene mean-coverage tables for
GeneAssign. Upstream read mapping stays external (SURVEY.md §3.5); this
module covers the downstream transform: given a per-position counts CSV over
gene regions and a gene annotation table (gene, contig, start, end), emit the
[D, S] mean-coverage matrix GeneAssign consumes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import pandas as pd

from .io import CountsData


@dataclass
class GeneTable:
    names: List[str]
    contigs: np.ndarray
    starts: np.ndarray   # inclusive
    ends: np.ndarray     # exclusive


def read_gene_table(path: str) -> GeneTable:
    """TSV/CSV with columns: gene, contig, start, end (header optional)."""
    sep = "\t" if path.endswith((".tsv", ".bed")) else ","
    df = pd.read_csv(path, sep=sep)
    cols = [c.lower() for c in df.columns]
    if not {"gene", "contig", "start", "end"}.issubset(cols):
        # headerless: assume the 4-column order
        df = pd.read_csv(path, sep=sep, header=None,
                         names=["gene", "contig", "start", "end"])
    else:
        df.columns = cols
    return GeneTable(
        names=[str(g) for g in df["gene"]],
        contigs=df["contig"].to_numpy(),
        starts=df["start"].to_numpy(dtype=np.int64),
        ends=df["end"].to_numpy(dtype=np.int64),
    )


def gene_coverage(data: CountsData, genes: GeneTable) -> pd.DataFrame:
    """Mean per-sample coverage over each gene's positions -> [D, S] frame.

    Positions absent from the counts table contribute nothing; genes with no
    covered position get zero coverage (flagged by the 'n_positions' column
    consumers may drop).
    """
    cov = data.counts.sum(axis=2)                       # [V, S]
    order = np.lexsort((data.positions, data.contigs.astype(str)))
    sorted_contigs = data.contigs.astype(str)[order]
    sorted_pos = data.positions[order]
    sorted_cov = cov[order]

    rows = []
    nps = []
    for name, contig, start, end in zip(
        genes.names, genes.contigs.astype(str), genes.starts, genes.ends
    ):
        lo = np.searchsorted(sorted_contigs, contig, side="left")
        hi = np.searchsorted(sorted_contigs, contig, side="right")
        pos = sorted_pos[lo:hi]
        a = lo + np.searchsorted(pos, start, side="left")
        b = lo + np.searchsorted(pos, end, side="left")
        npos = b - a
        rows.append(sorted_cov[a:b].mean(axis=0) if npos > 0
                    else np.zeros(data.S))
        nps.append(npos)

    df = pd.DataFrame(np.asarray(rows), index=genes.names, columns=data.samples)
    df.insert(0, "n_positions", nps)
    return df
