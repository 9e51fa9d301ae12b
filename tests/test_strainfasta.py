"""Strain-FASTA assembly tests (pipeline final artifact, SURVEY.md §3.5)."""
import numpy as np
import pytest

from desman_tpu import io
from desman_tpu.cli import main
from desman_tpu.strainfasta import (
    read_fasta, strain_sequences, variant_haplotypes, write_strain_fasta,
)


@pytest.fixture()
def tau_files(tmp_path):
    # two contigs; 3 variant positions; 2 strains
    tau_idx = np.array([[0, 3],   # c1 pos 2: A vs T
                        [1, 1],   # c1 pos 4: C both
                        [2, 0]])  # c2 pos 1: G vs A
    contigs = np.array(["c1", "c1", "c2"], dtype=object)
    positions = np.array([2, 4, 1])
    tau_csv = tmp_path / "Filtered_Tau_star.csv"
    io.write_tau_star_csv(str(tau_csv), tau_idx, contigs, positions)
    ref = tmp_path / "bin.fasta"
    ref.write_text(">c1 descr\nTTTTTT\n>c2\nCCC\n")
    return tau_csv, ref, tau_idx


def test_strain_sequences(tau_files):
    tau_csv, ref, tau_idx = tau_files
    idx, contigs, positions = io.read_tau_star_csv(str(tau_csv))
    np.testing.assert_array_equal(idx, tau_idx)
    seqs = strain_sequences(idx, contigs, positions, read_fasta(str(ref)))
    assert seqs[0]["c1"] == "TATCTT"   # pos2->A, pos4->C
    assert seqs[0]["c2"] == "GCC"      # pos1->G
    assert seqs[1]["c1"] == "TTTCTT"   # pos2->T, pos4->C
    assert seqs[1]["c2"] == "ACC"


def test_variant_haplotypes(tau_files):
    _, _, tau_idx = tau_files
    assert variant_haplotypes(tau_idx) == ["ACG", "TCA"]


def test_cli_full_and_variants(tau_files, tmp_path):
    tau_csv, ref, _ = tau_files
    out = tmp_path / "strains.fasta"
    assert main(["strainfasta", str(tau_csv), "-f", str(ref),
                 "-o", str(out)]) == 0
    seqs = read_fasta(str(out))
    assert seqs["c1_hap1"] == "TATCTT" and seqs["c2_hap2"] == "ACC"
    out2 = tmp_path / "haps.fasta"
    assert main(["strainfasta", str(tau_csv), "-o", str(out2)]) == 0
    seqs2 = read_fasta(str(out2))
    assert seqs2 == {"hap1": "ACG", "hap2": "TCA"}


def test_untouched_contigs_emitted(tau_files, tmp_path):
    """Contigs without variant calls still appear in every strain genome."""
    tau_csv, _, _ = tau_files
    ref = tmp_path / "ref3.fasta"
    ref.write_text(">c1\nTTTTTT\n>c2\nCCC\n>c3_novars\nAAAA\n")
    out = tmp_path / "full.fasta"
    assert main(["strainfasta", str(tau_csv), "-f", str(ref),
                 "-o", str(out)]) == 0
    seqs = read_fasta(str(out))
    assert seqs["c3_novars_hap1"] == "AAAA" and seqs["c3_novars_hap2"] == "AAAA"


def test_bare_header_raises(tmp_path):
    bad = tmp_path / "bad.fasta"
    bad.write_text(">\nACGT\n")
    with pytest.raises(ValueError, match="empty FASTA header"):
        read_fasta(str(bad))


def test_errors(tau_files, tmp_path):
    tau_csv, ref, _ = tau_files
    bad_ref = tmp_path / "bad.fasta"
    bad_ref.write_text(">c1\nTT\n>c2\nCCC\n")  # pos 4 outside c1
    with pytest.raises(ValueError, match="outside contig"):
        write_strain_fasta(str(tau_csv), str(tmp_path / "x.fasta"),
                           ref_fasta=str(bad_ref))
    missing = tmp_path / "missing.fasta"
    missing.write_text(">c1\nTTTTTT\n")
    with pytest.raises(ValueError, match="not in reference"):
        write_strain_fasta(str(tau_csv), str(tmp_path / "y.fasta"),
                           ref_fasta=str(missing))
