"""Pileup extraction tests (ExtractCountFreqGenes equivalent, SURVEY.md §2).

Covers the htslib bases-column grammar, quality filtering, gene restriction,
the CLI, and differential testing of the native C++ scanner against the
pure-Python oracle on randomized pileups.
"""
import subprocess
import sys

import numpy as np
import pytest

from desman_tpu import io, native
from desman_tpu.pileup import read_pileup, read_pileup_py, read_sample_names

BASES = "ACGT"


def synth_pileup_line(rng, contig, pos, ref, counts_row, quals_ok=True):
    """Render one mpileup line for counts_row [S,4], exercising the grammar."""
    fields = [contig, str(pos), ref]
    ref_idx = BASES.index(ref) if ref in BASES else -1
    for s in range(counts_row.shape[0]):
        syms, quals = [], []
        total = int(counts_row[s].sum())
        if total == 0 and rng.random() < 0.5:
            fields += ["0", "*", "*"]  # htslib zero-depth form
            continue
        for b in range(4):
            for _ in range(int(counts_row[s, b])):
                if b == ref_idx and rng.random() < 0.7:
                    sym = "." if rng.random() < 0.5 else ","
                else:
                    sym = BASES[b] if rng.random() < 0.5 else BASES[b].lower()
                if rng.random() < 0.15:          # read start + mapq char
                    sym = "^" + chr(rng.integers(33, 90)) + sym
                if rng.random() < 0.15:          # read end
                    sym = sym + "$"
                if rng.random() < 0.1:           # indel after the base
                    ln = int(rng.integers(1, 5))
                    ins = "".join(rng.choice(list("ACGTacgt"), ln))
                    sym = sym + ("+" if rng.random() < 0.5 else "-") + str(ln) + ins
                syms.append(sym)
                quals.append(chr(int(rng.integers(63, 74))))  # q30..q40
        # deletion placeholders / ref skips: cover the site, no base counted
        for _ in range(int(rng.integers(0, 2))):
            syms.append(rng.choice(["*", ">", "<"]))
            quals.append("I")
        order = rng.permutation(len(syms))
        syms = [syms[i] for i in order]
        quals = [quals[i] for i in order]
        fields += [str(total), "".join(syms), "".join(quals)]
    return "\t".join(fields)


def synth_pileup(path, rng, V=40, S=5, max_count=6):
    counts = rng.integers(0, max_count, size=(V, S, 4)).astype(np.int32)
    contigs = np.array([f"contig_{i % 3}" for i in range(V)], dtype=object)
    positions = np.arange(100, 100 + V, dtype=np.int64)
    with open(path, "w") as f:
        for v in range(V):
            ref = BASES[int(rng.integers(0, 4))] if rng.random() < 0.9 else "N"
            f.write(synth_pileup_line(rng, contigs[v], positions[v], ref,
                                      counts[v]) + "\n")
    return counts, contigs, positions


@pytest.fixture(scope="module")
def pileup_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    path = tmp_path_factory.mktemp("pileup") / "sim.pileup"
    counts, contigs, positions = synth_pileup(path, rng)
    return str(path), counts, contigs, positions


def test_python_parser_exact(pileup_file):
    path, counts, contigs, positions = pileup_file
    data = read_pileup_py(path)
    np.testing.assert_array_equal(data.counts, counts)
    assert list(data.contigs) == list(contigs)
    np.testing.assert_array_equal(data.positions, positions)
    assert data.samples == [f"Sample{i+1}" for i in range(counts.shape[1])]


@pytest.mark.skipif(not native.pileup_available(), reason="no native lib")
def test_native_matches_python(pileup_file):
    path, counts, _, _ = pileup_file
    d_py = read_pileup_py(path)
    d_nat = native.read_pileup_native(path)
    np.testing.assert_array_equal(d_nat.counts, d_py.counts)
    assert list(d_nat.contigs) == list(d_py.contigs)
    np.testing.assert_array_equal(d_nat.positions, d_py.positions)


@pytest.mark.skipif(not native.pileup_available(), reason="no native lib")
def test_native_fuzz_parity(tmp_path):
    """Randomized differential test: native == python on 10 random pileups."""
    for seed in range(10):
        rng = np.random.default_rng(100 + seed)
        path = str(tmp_path / f"fuzz_{seed}.pileup")
        counts, _, _ = synth_pileup(path, rng, V=15, S=3)
        d_py = read_pileup_py(path)
        d_nat = native.read_pileup_native(path)
        np.testing.assert_array_equal(d_py.counts, counts)
        np.testing.assert_array_equal(d_nat.counts, counts)


def test_quality_filter(tmp_path):
    # two reads q40 ('I'), one read q2 ('#') — min_baseq=20 keeps only q40
    path = tmp_path / "q.pileup"
    path.write_text("c\t10\tA\t3\t..T\tII#\n")
    d0 = read_pileup_py(str(path), min_baseq=0)
    np.testing.assert_array_equal(d0.counts[0, 0], [2, 0, 0, 1])
    d20 = read_pileup_py(str(path), min_baseq=20)
    np.testing.assert_array_equal(d20.counts[0, 0], [2, 0, 0, 0])
    if native.pileup_available():
        d_nat = native.read_pileup_native(str(path), min_baseq=20)
        np.testing.assert_array_equal(d_nat.counts, d20.counts)


def test_grammar_edge_cases(tmp_path):
    # ^$ : read starts whose mapq char is '$' / '.', indel digits multi-char,
    # ref N (matches count nothing), * placeholder consuming a qual char
    lines = [
        "c\t1\tA\t2\t^$.^..\tII",       # mapq chars '$' and '.' after ^
        "c\t2\tN\t3\t.,T\tIII",          # ref N: './,' count nothing, T counts
        "c\t3\tG\t1\t.+12ACGTACGTACGT\tI",  # 2-digit indel length
        "c\t4\tT\t2\t*.\tII",            # deletion placeholder + match
    ]
    path = tmp_path / "edge.pileup"
    path.write_text("\n".join(lines) + "\n")
    d = read_pileup_py(str(path))
    np.testing.assert_array_equal(d.counts[0, 0], [2, 0, 0, 0])
    np.testing.assert_array_equal(d.counts[1, 0], [0, 0, 0, 1])
    np.testing.assert_array_equal(d.counts[2, 0], [0, 0, 1, 0])
    np.testing.assert_array_equal(d.counts[3, 0], [0, 0, 0, 1])
    if native.pileup_available():
        d_nat = native.read_pileup_native(str(path))
        np.testing.assert_array_equal(d_nat.counts, d.counts)


def test_malformed_raises(tmp_path):
    bad = {
        "fields": "c\t1\tA\t1\t.\n",              # 5 fields
        "dangling": "c\t1\tA\t1\t.^\tI\n",         # ^ at end
        "qual_short": "c\t1\tA\t2\t..\tI\n",       # quals too short
        "indel": "c\t1\tA\t1\t.+\tI\n",            # indel with no length
        "position": "c\tabc\tA\t1\t.\tI\n",        # non-numeric position
        "position2": "c\t1x\tA\t1\t.\tI\n",        # trailing junk in position
    }
    for name, text in bad.items():
        path = tmp_path / f"{name}.pileup"
        path.write_text(text)
        with pytest.raises(ValueError):
            read_pileup_py(str(path))
        if native.pileup_available():
            with pytest.raises(ValueError):
                native.read_pileup_native(str(path))


def test_gene_restrict_matches_bruteforce(tmp_path):
    """restrict_to_genes (searchsorted) == the obvious O(V*D) loop."""
    from desman_tpu.genecov import GeneTable
    from desman_tpu.pileup import restrict_to_genes

    rng = np.random.default_rng(5)
    V = 200
    data = io.CountsData(
        counts=rng.integers(0, 5, size=(V, 3, 4)).astype(np.int32),
        contigs=np.array([f"c{i % 4}" for i in range(V)], dtype=object),
        positions=np.asarray(rng.integers(0, 500, size=V), dtype=np.int64),
        samples=["a", "b", "c"],
    )
    genes = GeneTable(
        names=[f"g{i}" for i in range(10)],
        contigs=np.array([f"c{i % 4}" for i in range(10)]),
        starts=np.asarray(rng.integers(0, 400, size=10), dtype=np.int64),
        ends=np.asarray(rng.integers(400, 520, size=10), dtype=np.int64),
    )
    sub, labels = restrict_to_genes(data, genes)
    expect = []
    for i, (c, p) in enumerate(zip(data.contigs, data.positions)):
        for g, gc, s, e in zip(genes.names, genes.contigs.astype(str),
                               genes.starts, genes.ends):
            if c == gc and s <= p < e:
                expect.append((i, g))
                break
    assert sub.V == len(expect)
    np.testing.assert_array_equal(sub.positions,
                                  data.positions[[i for i, _ in expect]])
    assert list(labels) == [g for _, g in expect]


def test_sample_names(tmp_path):
    path = tmp_path / "n.pileup"
    path.write_text("c\t1\tA\t1\t.\tI\t1\tT\tI\n")
    names = tmp_path / "names.txt"
    names.write_text("s1\ns2\n")
    d = read_pileup(str(path), samples=read_sample_names(str(names)))
    assert d.samples == ["s1", "s2"]
    with pytest.raises(ValueError):
        read_pileup_py(str(path), samples=["only_one"])


def test_write_pileup_roundtrip(tmp_path):
    """write_pileup (demo inverse transform) round-trips exactly."""
    from desman_tpu.pileup import write_pileup

    rng = np.random.default_rng(11)
    counts = rng.integers(0, 8, size=(25, 4, 4)).astype(np.int32)
    data = io.CountsData(
        counts=counts,
        contigs=np.array([f"c{i % 2}" for i in range(25)], dtype=object),
        positions=np.arange(1, 26, dtype=np.int64),
        samples=[f"s{i}" for i in range(4)],
    )
    path = str(tmp_path / "rt.pileup")
    write_pileup(path, data)
    back = read_pileup(path, samples=data.samples)
    np.testing.assert_array_equal(back.counts, data.counts)
    np.testing.assert_array_equal(back.positions, data.positions)
    assert back.samples == data.samples


def test_extract_cli(tmp_path):
    rng = np.random.default_rng(3)
    pl = tmp_path / "x.pileup"
    counts, contigs, positions = synth_pileup(str(pl), rng, V=30, S=4)
    genes = tmp_path / "genes.csv"
    genes.write_text(
        "gene,contig,start,end\n"
        "geneA,contig_0,100,120\n"
        "geneB,contig_1,100,140\n"
    )
    out = tmp_path / "counts.csv"
    gc = tmp_path / "gene_cov.csv"
    r = subprocess.run(
        [sys.executable, "-m", "desman_tpu.cli", "extract", str(pl),
         "-G", str(genes), "--gene_cov", str(gc), "-o", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    data = io.read_counts_csv(str(out))
    # every kept position is inside a gene interval on its contig
    assert data.V > 0
    for c, p in zip(data.contigs, data.positions):
        assert (c == "contig_0" and 100 <= p < 120) or (
            c == "contig_1" and 100 <= p < 140)
    # parsed counts round-trip through the CSV
    mask = [(c == "contig_0" and 100 <= p < 120) or
            (c == "contig_1" and 100 <= p < 140)
            for c, p in zip(contigs, positions)]
    np.testing.assert_array_equal(data.counts, counts[np.asarray(mask)])
    assert gc.exists()
