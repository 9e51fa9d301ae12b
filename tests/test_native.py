"""Native C++ counts reader: exact agreement with the pandas reader."""
import numpy as np
import pytest

from desman_tpu import io, synth

native = pytest.importorskip("desman_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built and no compiler"
)


def test_matches_pandas(tmp_path):
    t = synth.generate(V=200, S=5, G=2, seed=3)
    t.data.contigs[:100] = "contigA"
    t.data.contigs[100:] = "contigB"
    p = str(tmp_path / "c.csv")
    io.write_counts_csv(p, t.data)
    a = io.read_counts_csv(p, prefer_native=False)
    b = native.read_counts_csv_native(p)
    assert a.samples == b.samples
    assert np.array_equal(a.counts, b.counts)
    assert np.array_equal(a.positions, b.positions)
    assert list(a.contigs) == list(b.contigs)


def test_native_error_on_garbage(tmp_path):
    p = str(tmp_path / "bad.csv")
    open(p, "w").write("Contig,Position,only-one-col\nx,1,2\n")
    with pytest.raises(ValueError):
        native.read_counts_csv_native(p)


def test_default_reader_uses_native(tmp_path, monkeypatch):
    t = synth.generate(V=20, S=3, G=2, seed=0)
    p = str(tmp_path / "c.csv")
    io.write_counts_csv(p, t.data)
    d = io.read_counts_csv(p)
    assert np.array_equal(d.counts, t.data.counts)


def test_native_fuzz_vs_pandas(tmp_path):
    """Randomized format edge cases: odd contig names, CRLF, no trailing
    newline, zero rows of counts — native must match pandas exactly."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        V, S = int(rng.integers(1, 40)), int(rng.integers(1, 6))
        t = synth.generate(V=max(V, 2), S=S, G=2, coverage=10.0, seed=trial)
        data = t.data
        names = ["ctg-1", "c.2", "NODE_77_len=1201", "x y", "c,quoted"][: max(1, trial)]
        data.contigs[:] = [names[i % len(names)].replace(",", "_")
                           for i in range(data.V)]
        p = str(tmp_path / f"f{trial}.csv")
        io.write_counts_csv(p, data)
        raw = open(p, "rb").read()
        if trial % 2 == 0:
            raw = raw.replace(b"\n", b"\r\n")          # CRLF
        if trial % 3 == 0:
            raw = raw.rstrip(b"\r\n")                   # no trailing newline
        open(p, "wb").write(raw)
        a = io.read_counts_csv(p, prefer_native=False)
        b = native.read_counts_csv_native(p)
        assert np.array_equal(a.counts, b.counts), f"trial {trial}"
        assert list(a.contigs) == list(b.contigs), f"trial {trial}"
        assert a.samples == b.samples, f"trial {trial}"
