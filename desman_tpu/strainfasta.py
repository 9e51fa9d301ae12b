"""Strain haplotype FASTA assembly from tau calls.

The reference pipeline's final artifact is per-strain sequences: haplotype
base calls (``Filtered_Tau_star.csv``) substituted back into the bin's
contigs (the complete_example's last step — SURVEY.md §3.5; script-level
equivalent of the reference's haplotype-sequence writers [M names, mount was
empty]). Two modes:

* full mode — given the contig FASTA, write each strain's full contig
  sequences with its variant bases substituted at the called positions;
* variants-only mode — no FASTA needed: concatenate each strain's called
  bases over the variant positions (the compact haplotype string used for
  strain comparison / phylogenetics).

Positions are 1-based (samtools/DESMAN convention).
"""
from __future__ import annotations

import numpy as np

from .io import read_tau_star_csv

BASES = "ACGT"


def read_fasta(path: str) -> dict:
    """name -> sequence (first whitespace-delimited token as name)."""
    seqs = {}
    name, chunks = None, []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks)
    return seqs


def strain_sequences(tau_idx: np.ndarray, contigs, positions,
                     ref_seqs: dict) -> dict:
    """strain g -> {contig -> sequence with strain bases substituted}.

    Raises on positions outside the reference contig (off-by-one and
    wrong-reference mistakes surface loudly instead of as silent truncation).
    """
    V, G = tau_idx.shape
    out = {g: {} for g in range(G)}
    touched = set()
    for c, p in zip(contigs, positions):
        touched.add(str(c))
    for name in touched:
        if name not in ref_seqs:
            raise ValueError(f"contig {name!r} not in reference FASTA")
    for g in range(G):
        seqs = {name: list(ref_seqs[name]) for name in touched}
        for v in range(V):
            name = str(contigs[v])
            pos = int(positions[v]) - 1  # 1-based -> 0-based
            if not 0 <= pos < len(seqs[name]):
                raise ValueError(
                    f"position {positions[v]} outside contig {name!r} "
                    f"(length {len(seqs[name])})")
            seqs[name][pos] = BASES[int(tau_idx[v, g])]
        out[g] = {name: "".join(s) for name, s in seqs.items()}
    return out


def variant_haplotypes(tau_idx: np.ndarray) -> list:
    """strain g -> concatenated called bases over the variant positions."""
    return ["".join(BASES[b] for b in tau_idx[:, g])
            for g in range(tau_idx.shape[1])]


def write_strain_fasta(tau_file: str, out_path: str,
                       ref_fasta: str = None) -> int:
    """Write strain sequences; returns the number of strains written."""
    tau_idx, contigs, positions = read_tau_star_csv(tau_file)
    G = tau_idx.shape[1]
    with open(out_path, "w") as f:
        if ref_fasta:
            seqs = strain_sequences(tau_idx, contigs, positions,
                                    read_fasta(ref_fasta))
            for g in range(G):
                for name, s in sorted(seqs[g].items()):
                    f.write(f">{name}_hap{g + 1}\n")
                    for i in range(0, len(s), 80):
                        f.write(s[i:i + 80] + "\n")
        else:
            for g, h in enumerate(variant_haplotypes(tau_idx)):
                f.write(f">hap{g + 1} variants={len(h)}\n")
                for i in range(0, len(h), 80):
                    f.write(h[i:i + 80] + "\n")
    return G
