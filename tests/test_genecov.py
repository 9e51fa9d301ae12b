import numpy as np
import pandas as pd

from desman_tpu import synth
from desman_tpu.genecov import GeneTable, gene_coverage, read_gene_table


def _data():
    t = synth.generate(V=100, S=4, G=2, coverage=30.0, seed=0)
    t.data.contigs[:60] = "c1"
    t.data.contigs[60:] = "c2"
    t.data.positions[:60] = np.arange(60)
    t.data.positions[60:] = np.arange(40)
    return t.data


def test_gene_coverage_means():
    data = _data()
    genes = GeneTable(
        names=["gA", "gB", "gEmpty"],
        contigs=np.array(["c1", "c2", "c1"]),
        starts=np.array([10, 0, 500]),
        ends=np.array([20, 40, 600]),
    )
    df = gene_coverage(data, genes)
    cov = data.counts.sum(axis=2)
    want_a = cov[10:20].mean(axis=0)
    np.testing.assert_allclose(df.loc["gA"][data.samples].to_numpy(), want_a)
    want_b = cov[60:100].mean(axis=0)
    np.testing.assert_allclose(df.loc["gB"][data.samples].to_numpy(), want_b)
    assert df.loc["gEmpty", "n_positions"] == 0
    assert (df.loc["gEmpty"][data.samples] == 0).all()


def test_read_gene_table(tmp_path):
    p = tmp_path / "genes.csv"
    pd.DataFrame({
        "gene": ["g1"], "contig": ["c1"], "start": [0], "end": [10],
    }).to_csv(p, index=False)
    gt = read_gene_table(str(p))
    assert gt.names == ["g1"]
    assert gt.ends[0] == 10


def test_read_gene_table_headerless(tmp_path):
    p = tmp_path / "genes.tsv"
    p.write_text("g1\tc1\t0\t10\ng2\tc1\t10\t30\n")
    gt = read_gene_table(str(p))
    assert gt.names == ["g1", "g2"]
