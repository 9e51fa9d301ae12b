"""Pipeline-script tests: fasta utilities + contig taxonomy classification
(the reference's scripts/ long tail — SURVEY.md §2 'Misc pipeline scripts')."""
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
sys.path.insert(0, SCRIPTS)

import classify_contigs  # noqa: E402
import fasta_utils  # noqa: E402


@pytest.fixture()
def fasta(tmp_path):
    p = tmp_path / "asm.fasta"
    p.write_text(
        ">contig_1 len=9\nACGTACGTA\n"
        ">contig_2\nGG\nGG\n"
        ">contig_3\nTTTT\n"
    )
    return p


def test_lengths(fasta, tmp_path):
    out = tmp_path / "lengths.tsv"
    fasta_utils.main(["lengths", str(fasta), "-o", str(out)])
    rows = dict(l.split("\t") for l in out.read_text().splitlines()[1:])
    assert rows == {"contig_1": "9", "contig_2": "4", "contig_3": "4"}


def test_split(fasta, tmp_path):
    clust = tmp_path / "clustering.csv"
    clust.write_text("contig_1,0\ncontig_2,1\ncontig_3,0\n")
    outdir = tmp_path / "bins"
    fasta_utils.main(["split", str(fasta), str(clust), "-o", str(outdir)])
    files = sorted(os.listdir(outdir))
    assert len(files) == 2
    bin0 = (outdir / files[0]).read_text()
    assert ">contig_1" in bin0 and ">contig_3" in bin0 and ">contig_2" not in bin0


def _hit(gene, subj, bits):
    return (f"{gene}\t{subj}\t98.0\t100\t1\t0\t1\t100\t1\t100\t1e-50\t{bits}")


def test_classify_contigs(tmp_path):
    # contig_1: two genes, hits dominated by E. coli; one dissenting genus
    # hit — species-level vote should fail min_frac, genus retained
    hits = tmp_path / "hits.tsv"
    hits.write_text("\n".join([
        _hit("contig_1_1", "ECOLI1", 500),
        _hit("contig_1_1", "ECOLI2", 450),
        _hit("contig_1_2", "SFLEX1", 400),
        _hit("contig_2_1", "BSUB1", 300),
        _hit("contig_2_1", "UNKNOWN_SUBJ", 999),   # no lineage -> ignored
    ]) + "\n")
    ecoli = ("Bacteria;Pseudomonadota;Gammaproteobacteria;Enterobacterales;"
             "Enterobacteriaceae;Escherichia;Escherichia coli")
    sflex = ("Bacteria;Pseudomonadota;Gammaproteobacteria;Enterobacterales;"
             "Enterobacteriaceae;Shigella;Shigella flexneri")
    bsub = ("Bacteria;Bacillota;Bacilli;Bacillales;Bacillaceae;Bacillus;"
            "Bacillus subtilis")
    lineage = tmp_path / "lineage.tsv"
    lineage.write_text(
        f"ECOLI1\t{ecoli}\nECOLI2\t{ecoli}\nSFLEX1\t{sflex}\nBSUB1\t{bsub}\n")
    out = tmp_path / "tax.tsv"
    rc = classify_contigs.main([str(hits), str(lineage), "-o", str(out),
                                "--min_frac", "0.8"])
    assert rc == 0
    lines = out.read_text().splitlines()
    header = lines[0].split("\t")
    rows = {l.split("\t")[0]: dict(zip(header, l.split("\t"))) for l in lines[1:]}
    c1 = rows["contig_1"]
    assert c1["family"] == "Enterobacteriaceae"       # unanimous to family
    assert c1["genus"] == ""                          # 950/1350 < 0.8 -> blank
    assert c1["species"] == ""                        # hierarchical blanking
    c2 = rows["contig_2"]
    assert c2["species"] == "Bacillus subtilis"       # unanimous all the way
    assert int(c2["n_hits"]) == 1                     # unknown subject dropped


def test_classify_top_per_gene(tmp_path):
    # 3 weak hits to taxon A first, then 1 strong to B: --top_per_gene 2
    # keeps only the first two
    hits = tmp_path / "hits.tsv"
    hits.write_text("\n".join([
        _hit("c_1", "A1", 100), _hit("c_1", "A2", 100),
        _hit("c_1", "B1", 900),
    ]) + "\n")
    lineage = tmp_path / "lin.tsv"
    lineage.write_text("A1\tBacteria;PA\nA2\tBacteria;PA\nB1\tBacteria;PB\n")
    out = tmp_path / "tax.tsv"
    classify_contigs.main([str(hits), str(lineage), "-o", str(out),
                           "--top_per_gene", "2", "--gene_regex", r"(.+)_\d+$"])
    row = out.read_text().splitlines()[1].split("\t")
    assert row[0] == "c" and row[3] == "PA"


def test_plot_abundances(tmp_path):
    import pandas as pd

    import plot_abundances  # noqa: E402 (scripts dir on sys.path above)

    gamma = pd.DataFrame([[0.6, 0.4], [0.3, 0.7]],
                         index=["s1", "s2"], columns=["H1", "H2"])
    csv = tmp_path / "Gamma_mean.csv"
    gamma.to_csv(csv)
    out = tmp_path / "g.png"
    assert plot_abundances.main([str(csv), "-o", str(out)]) == 0
    assert out.exists() and out.stat().st_size > 0


def test_extract_genes_and_select_core(tmp_path):
    """extract_genes: GFF -> gene table (+ strand-aware FASTA);
    select_core: COG hits + core list -> core subset; the table round-trips
    into genecov.read_gene_table."""
    import extract_genes
    import select_core

    asm = tmp_path / "asm.fasta"
    asm.write_text(">c1\nACGTACGTAA\n>c2\nTTTTGGGGCC\n")
    gff = tmp_path / "genes.gff"
    gff.write_text(
        "##gff-version 3\n"
        "c1\tprodigal\tCDS\t1\t6\t.\t+\t0\tID=g1;partial=00\n"
        "c1\tprodigal\tCDS\t7\t10\t.\t-\t0\tID=g2\n"
        "c2\tprodigal\tCDS\t3\t8\t.\t+\t0\tID=g3\n"
        "c2\tprodigal\tmRNA\t1\t4\t.\t+\t0\tID=skipme\n"
    )
    table = tmp_path / "genes.tsv"
    gene_fa = tmp_path / "genes.fa"
    rc = extract_genes.main([str(gff), "-o", str(table), "--fasta", str(asm),
                             "--fasta_out", str(gene_fa)])
    assert rc == 0
    lines = table.read_text().splitlines()
    assert lines[0] == "gene\tcontig\tstart\tend"
    assert lines[1:] == ["g1\tc1\t0\t6", "g2\tc1\t6\t10", "g3\tc2\t2\t8"]
    fa = dict(extract_genes.iter_fasta(str(gene_fa)))
    assert fa["g1"] == "ACGTAC"
    assert fa["g2"] == "TTAC"          # revcomp of GTAA
    assert fa["g3"] == "TTGGGG"

    from desman_tpu.genecov import read_gene_table

    gt = read_gene_table(str(table))
    assert gt.names == ["g1", "g2", "g3"] and list(gt.ends) == [6, 10, 8]

    hits = tmp_path / "hits.tsv"
    hits.write_text(
        "g1\tgnl|CDD|223251 COG0016\t98.2\n"
        "g1\tgnl|CDD|999999 COG9999\t55.0\n"   # worse hit, ignored
        "g2\tgnl|CDD|224121 COG0090\n"
        "g3\tgnl|CDD|225000 COG0541\n"
    )
    core = tmp_path / "core.txt"
    core.write_text("# SCGs\nCOG0016\nCOG0541\n")
    out = tmp_path / "core_genes.tsv"
    rc = select_core.main([str(table), str(hits), str(core), "-o", str(out)])
    assert rc == 0
    kept = out.read_text().splitlines()[1:]
    assert kept == ["g1\tc1\t0\t6", "g3\tc2\t2\t8"]

    # --unique drops multi-copy core COGs
    hits.write_text("g1\tCOG0016\ng2\tCOG0016\ng3\tCOG0541\n")
    rc = select_core.main([str(table), str(hits), str(core), "-o", str(out),
                           "--unique"])
    assert rc == 0
    assert out.read_text().splitlines()[1:] == ["g3\tc2\t2\t8"]
