"""Reference-parity harness — fires the moment /root/reference populates.

VERDICT r1 item 3: the north-star accuracy gate (BASELINE.json: star
haplotypes bit-identical, gamma <1e-3 on the mock) has been unverifiable
every round because the reference mount is empty (SURVEY.md provenance
warning). This file makes mount day cost zero: every test below auto-skips
while the mount is empty and otherwise executes SURVEY.md §9's
verify-on-mount checklist programmatically:

  §9.1  file inventory discovered and reported
  §9.5  `bin/desman` argparse flag letters vs our CLI surface
  §9.4  fit.txt schema absorbed by io.read_fit_txt's adapter seam
        (io.FIT_COLUMN_ALIASES is the one-line fix point)
  §9.9  reference TestData loads through our counts reader
  north star: run both stacks on the reference TestData and compare
        permutation-matched star haplotypes + gamma

Everything degrades gracefully: each test skips with a precise reason when
its specific input is missing (e.g. the reference is present but its Cython
extension can't build in this environment).
"""
from __future__ import annotations

import fnmatch
import glob
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REF = os.environ.get("DESMAN_REFERENCE", "/root/reference")


def _ref_files():
    if not os.path.isdir(REF):
        return []
    return sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(REF) for f in fs
    )


REF_FILES = _ref_files()

needs_mount = pytest.mark.skipif(
    not REF_FILES, reason=f"reference mount {REF} is empty (SURVEY.md provenance)"
)


def test_mount_status_always_runs(capsys):
    """Always-on canary: reports the mount state every test run so an empty
    mount is visible in CI logs, and re-checks it at the start of every
    round (VERDICT r1 standing instruction)."""
    print(f"reference mount {REF}: {len(REF_FILES)} files")
    assert isinstance(REF_FILES, list)


def _find(*patterns):
    """First reference file whose path matches any of the glob patterns."""
    for pat in patterns:
        hits = [f for f in REF_FILES if fnmatch.fnmatch(f.lower(), pat)]
        if hits:
            return hits[0]
    return None


def _find_all(pattern):
    return [f for f in REF_FILES if fnmatch.fnmatch(f.lower(), pattern)]


@needs_mount
def test_inventory_report():
    """SURVEY §9.1: record the true file list for the judge/builder to diff
    against SURVEY.md §2's component inventory."""
    py = _find_all("*.py")
    native = _find_all("*.pyx") + _find_all("*.c") + _find_all("*.cpp")
    print(f"{len(REF_FILES)} files; {len(py)} python, {len(native)} native")
    assert py, "reference populated but contains no python files?"


def _main_cli_source():
    path = _find("*/bin/desman", "*bin/desman*", "*/desman.py")
    if path is None:
        return None
    with open(path, errors="replace") as f:
        return f.read()


@needs_mount
def test_cli_flag_letters_match():
    """SURVEY §9.5: every single-letter flag the reference's main CLI defines
    must be accepted by our `desman` subcommand (flag letters were [M])."""
    src = _main_cli_source()
    if src is None:
        pytest.skip("no bin/desman-like entry found in the mount")
    ref_flags = set(re.findall(r"add_argument\(\s*['\"](-[a-zA-Z])['\"]", src))
    if not ref_flags:
        pytest.skip("reference CLI defines no single-letter flags?")
    from desman_tpu import cli as our_cli

    ours = set(re.findall(r"['\"](-[a-zA-Z])['\"]", open(our_cli.__file__).read()))
    missing = ref_flags - ours
    assert not missing, (
        f"reference desman flags {sorted(missing)} not in our CLI "
        f"(ref has {sorted(ref_flags)})"
    )


@needs_mount
def test_reference_testdata_loads():
    """SURVEY §9.9: the bundled TestData counts CSV parses through our
    reader with a sane shape."""
    counts = _find("*testdata*.csv", "*test_data*.csv", "*contig*.csv")
    if counts is None:
        pytest.skip("no TestData-like counts CSV in the mount")
    from desman_tpu import io

    data = io.read_counts_csv(counts)
    print(f"{counts}: V={data.V} S={data.S}")
    assert data.V > 0 and data.S > 0 and data.counts.shape[2] == 4


@needs_mount
def test_fit_txt_adapter_covers_reference_schema(tmp_path):
    """SURVEY §9.4: if the mount carries any committed fit.txt (example
    outputs), our adapter must parse it; a failure here is fixed by one
    entry in io.FIT_COLUMN_ALIASES / FIT_HEADERLESS_COLUMNS."""
    fits = _find_all("*fit.txt")
    if not fits:
        pytest.skip("no fit.txt committed in the mount")
    from desman_tpu import io

    for fp in fits[:5]:
        rec = io.read_fit_txt(fp)
        assert rec["G"] >= 1 and np.isfinite(rec["mean_deviance"]), (fp, rec)


def _try_run_reference(counts_csv, outdir, G=5, iters=50, seed=0):
    """Best-effort execution of the reference desman on a counts CSV.

    Returns the output dir on success, or a skip reason string. The
    reference needs Cython+GSL; in this image that may or may not build."""
    exe = _find("*bin/desman")
    if exe is None:
        return "no bin/desman in the mount"
    env = dict(os.environ)
    pkg_root = os.path.dirname(os.path.dirname(exe))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, exe, counts_csv, "-g", str(G), "-i", str(iters),
           "-s", str(seed), "-o", outdir]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                           env=env)
    except (subprocess.TimeoutExpired, OSError) as e:
        return f"reference run failed to execute: {e}"
    if r.returncode != 0:
        return f"reference run exited {r.returncode}: {r.stderr[-400:]}"
    return outdir


@needs_mount
def test_north_star_parity(tmp_path):
    """BASELINE.json north star: both stacks on the reference TestData;
    star haplotypes must agree under the best strain permutation and gamma
    within 1e-3 (posterior-mode agreement — SURVEY.md §7.3 interprets
    'bit-identical' as the converged MAP calls, not the RNG stream)."""
    counts = _find("*testdata*.csv", "*test_data*.csv", "*contig*.csv")
    if counts is None:
        pytest.skip("no TestData-like counts CSV in the mount")

    ref_out = _try_run_reference(counts, str(tmp_path / "ref_out"))
    if not os.path.isdir(str(ref_out)):
        pytest.skip(str(ref_out))

    from desman_tpu import io
    from desman_tpu.run import RunConfig, run
    from desman_tpu.utils import snp_distance_perm

    data = io.read_counts_csv(counts)
    ours = run(data, RunConfig(G=5, iterations=200, seed=0,
                               out_dir=str(tmp_path / "our_out")))

    # locate the reference's star outputs (names [M] — adapt here on mount day)
    ref_tau = glob.glob(os.path.join(ref_out, "*Tau_star*.csv"))
    ref_gamma = glob.glob(os.path.join(ref_out, "*Gamma_star*.csv"))
    assert ref_tau and ref_gamma, f"reference outputs missing in {os.listdir(ref_out)}"
    tau_ref, _, _ = io.read_tau_star_csv(ref_tau[0])
    gamma_ref = io.read_gamma_csv(ref_gamma[0])

    dist, perm = snp_distance_perm(
        np.asarray(ours.tau_star), tau_ref, return_perm=True
    )
    frac = dist / tau_ref.size
    print(f"star SNP distance {dist} ({frac:.2%}), perm {perm}")
    assert dist == 0, "north star: star haplotypes must match bit-identically"
    gamma_ours = np.asarray(ours.gamma_star)[:, list(perm)]
    assert np.max(np.abs(gamma_ours - gamma_ref)) < 1e-3


def _try_run_script(script, args, timeout=1800):
    """Execute a reference script with the mount on PYTHONPATH.
    Returns (ok, reason_or_stdout)."""
    env = dict(os.environ)
    pkg_root = os.path.dirname(os.path.dirname(script))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, script, *map(str, args)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env)
    except (subprocess.TimeoutExpired, OSError) as e:
        return False, f"{script} failed to execute: {e}"
    if r.returncode != 0:
        return False, f"{script} exited {r.returncode}: {r.stderr[-400:]}"
    return True, r.stdout


@needs_mount
def test_filter_parity(tmp_path):
    """SURVEY §9.6 (VERDICT r3 next #8): run the reference's variant filter
    on TestData and ours on the same CSV; the selected-position set must
    agree (small symmetric difference tolerated at decision boundaries) and
    the fitted error matrix tran_df must match to 1e-2."""
    counts = _find("*testdata*.csv", "*test_data*.csv", "*contig*.csv")
    if counts is None:
        pytest.skip("no TestData-like counts CSV in the mount")
    script = _find("*scripts/variant_filter.py", "*variant_filter*.py")
    if script is None:
        pytest.skip("no Variant_Filter script in the mount")

    stub = str(tmp_path / "ref_")
    ok, why = _try_run_script(script, [counts, "-o", stub])
    if not ok:
        pytest.skip(why)

    from desman_tpu import io
    from desman_tpu.filter import filter_variants

    data = io.read_counts_csv(counts)
    ours = filter_variants(data)

    ref_sel = glob.glob(stub + "*sel_var*.csv")
    assert ref_sel, f"reference filter wrote no sel_var: {os.listdir(tmp_path)}"
    ref_positions = {
        (str(c), int(p)) for c, p in zip(
            *io.read_selected_positions(ref_sel[0]))
    } if hasattr(io, "read_selected_positions") else None
    if ref_positions is None:
        import pandas as pd

        df = pd.read_csv(ref_sel[0])
        ref_positions = set(zip(df.iloc[:, 0].astype(str),
                                df.iloc[:, 1].astype(int)))
    our_positions = {
        (str(data.contigs[i]), int(data.positions[i]))
        for i in np.flatnonzero(ours.selected)
    }
    sym = ref_positions ^ our_positions
    denom = max(len(ref_positions | our_positions), 1)
    assert len(sym) / denom < 0.05, (
        f"selected-variant sets differ on {len(sym)}/{denom} positions")

    ref_eta_files = glob.glob(stub + "*tran_df*.csv")
    if ref_eta_files:
        eta_ref = io.read_eta_csv(ref_eta_files[0])
        assert np.max(np.abs(eta_ref - ours.eta)) < 1e-2


@needs_mount
def test_resolvenhap_parity(tmp_path):
    """SURVEY §9.7 (VERDICT r3 next #8): the selection rule in
    model_selection.resolve_nhap is an [M] invention — validate it against
    the reference's resolvenhap.py on an identical run grid: run OUR grid
    (reference-format fit.txt + output dirs), hand the dirs to the
    reference's script, and compare the (G, best run) decision."""
    counts = _find("*testdata*.csv", "*test_data*.csv", "*contig*.csv")
    if counts is None:
        pytest.skip("no TestData-like counts CSV in the mount")
    script = _find("*scripts/resolvenhap.py", "*resolvenhap*.py")
    if script is None:
        pytest.skip("no resolvenhap script in the mount")

    from desman_tpu import io
    from desman_tpu.model_selection import fit_grid, resolve_nhap

    data = io.read_counts_csv(counts)
    records = fit_grid(
        data.counts, g_values=[1, 2, 3, 4, 5, 6], seeds=[0, 1],
        iterations=100, out_stub=str(tmp_path / "run"), data=data,
    )
    ours = resolve_nhap(records)

    ok, out = _try_run_script(script, [str(tmp_path / "run") + "*"])
    if not ok:
        pytest.skip(out)
    # reference emits a CSV-ish summary line starting with the chosen G
    m = re.search(r"^(\d+)[,\s]", out.strip().splitlines()[-1])
    assert m, f"cannot parse reference resolvenhap output: {out[-400:]}"
    ref_G = int(m.group(1))
    print(f"selection: ours G={ours.G}, reference G={ref_G}")
    assert ours.G == ref_G, (
        "selection rule disagrees with the reference on an identical grid — "
        "adapt model_selection.resolve_nhap's dev_cutoff/unc_cutoff")
