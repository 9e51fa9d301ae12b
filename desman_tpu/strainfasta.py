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
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks)
                tokens = line[1:].split()
                if not tokens:
                    raise ValueError(f"{path}:{lineno}: empty FASTA header")
                name = tokens[0]
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks)
    return seqs


def strain_sequences(tau_idx: np.ndarray, contigs, positions,
                     ref_seqs: dict) -> dict:
    """strain g -> {contig -> sequence with strain bases substituted}.

    Every reference contig is emitted (contigs without variant calls are
    identical across strains — they are still part of each strain's genome).
    Raises on positions outside the reference contig (off-by-one and
    wrong-reference mistakes surface loudly instead of as silent truncation).
    """
    V, G = tau_idx.shape
    touched = {str(c) for c in contigs}
    missing = touched - set(ref_seqs)
    if missing:
        raise ValueError(
            f"contigs {sorted(missing)} not in reference FASTA")
    out = {}
    for g in range(G):
        seqs = {name: list(s) for name, s in ref_seqs.items()}
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
