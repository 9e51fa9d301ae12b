"""Fault injection + elastic recovery (SURVEY.md §5 'failure detection').

The reference's failure story is "replicates are independent OS processes;
re-run what crashed". The rebuild's stronger contract, verified here with a
REAL fault (SIGKILL, not a simulated early-return):

1. a desman run killed -9 mid-flight resumes from its checkpoint to outputs
   bitwise identical to a never-interrupted run, and
2. a crashed model-selection grid rerun does only the missing work
   (fit_grid's elastic resume) while returning the same records.
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

import desman_tpu.synth as synth
from desman_tpu import io

pytestmark = pytest.mark.slow  # long MCMC / subprocess fault injection (make test-fast skips)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _desman(args, log):
    return subprocess.Popen(
        [sys.executable, "-m", "desman_tpu", "desman"] + args,
        env=_env(), cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
    )


def test_sigkill_mid_run_resume_is_bitwise(tmp_path):
    t = synth.generate(V=60, S=6, G=2, coverage=30.0, seed=0)
    csv = str(tmp_path / "c.csv")
    io.write_counts_csv(csv, t.data)
    ck = str(tmp_path / "ck.npz")
    # enough sweeps that plenty of work remains after the first checkpoint
    base = [csv, "-g", "2", "-i", "4000", "-s", "0",
            "--checkpoint_every", "25"]

    ref_out = str(tmp_path / "ref")
    with open(tmp_path / "ref.log", "w") as log:
        rc = _desman(base + ["-o", ref_out,
                             "--checkpoint", str(tmp_path / "ref_ck.npz")],
                     log).wait(timeout=600)
    assert rc == 0

    vic_out = str(tmp_path / "vic")
    with open(tmp_path / "vic.log", "w") as log:
        p = _desman(base + ["-o", vic_out, "--checkpoint", ck], log)
        deadline = time.time() + 300
        while not os.path.exists(ck) and p.poll() is None:
            if time.time() > deadline:
                p.kill()
                pytest.fail("no checkpoint appeared within 300s")
            time.sleep(0.05)
        if p.poll() is not None:  # lost the race: the run finished already
            pytest.skip("run completed before the fault could be injected")
        os.kill(p.pid, signal.SIGKILL)   # the real fault
        assert p.wait(timeout=60) == -signal.SIGKILL

    it = int(np.load(ck)["it"])
    assert 0 < it < 4000, "kill did not land mid-run"

    with open(tmp_path / "vic2.log", "w") as log:  # resume to completion
        rc = _desman(base + ["-o", vic_out, "--checkpoint", ck],
                     log).wait(timeout=600)
    assert rc == 0

    for fname in ("fit.txt", "Filtered_Tau_star.csv", "Gamma_star.csv",
                  "Gamma_mean.csv", "Eta_star.csv", "loglik_trace.csv"):
        ref_b = open(os.path.join(ref_out, fname), "rb").read()
        vic_b = open(os.path.join(vic_out, fname), "rb").read()
        assert ref_b == vic_b, f"{fname} differs after SIGKILL+resume"


def test_fit_grid_elastic_resume(tmp_path):
    """A partially-complete grid reruns only the missing G values."""
    from desman_tpu.model_selection import fit_grid

    t = synth.generate(V=40, S=6, G=2, coverage=30.0, seed=0)
    stub = str(tmp_path / "run")
    kw = dict(g_values=[1, 2, 3], seeds=[0, 1], iterations=16,
              out_stub=stub, data=t.data)
    recs = fit_grid(t.data.counts, **kw)
    assert len(recs) == 6

    # simulate a crash that lost G=3's outputs, and record what survives
    import shutil

    for s in (0, 1):
        shutil.rmtree(f"{stub}_3_{s}")
    mtimes = {g: os.path.getmtime(f"{stub}_{g}_0/metrics.json")
              for g in (1, 2)}
    time.sleep(0.05)

    recs2 = fit_grid(t.data.counts, **kw)
    assert len(recs2) == 6
    # completed G values were NOT recomputed (files untouched) ...
    for g in (1, 2):
        assert os.path.getmtime(f"{stub}_{g}_0/metrics.json") == mtimes[g]
    # ... the lost G was, and the records agree with the original fit
    by_key = {(r.G, r.seed): r for r in recs}
    for r in recs2:
        np.testing.assert_allclose(
            r.mean_deviance, by_key[(r.G, r.seed)].mean_deviance,
            rtol=1e-9, err_msg=f"G={r.G} seed={r.seed}",
        )

    # resume=False forces a full recompute
    fit_grid(t.data.counts, **kw, resume=False)
    assert os.path.getmtime(f"{stub}_1_0/metrics.json") > mtimes[1]


def test_fit_grid_resume_rejects_stale_config(tmp_path):
    """Elastic resume must NOT reuse directories computed under a different
    config: a rerun with changed iterations recomputes instead of serving
    stale records (VERDICT r3 weak #2 — fingerprint gate)."""
    from desman_tpu.model_selection import fit_grid

    t = synth.generate(V=40, S=6, G=2, coverage=30.0, seed=0)
    stub = str(tmp_path / "run")
    base = dict(g_values=[2], seeds=[0], out_stub=stub, data=t.data)
    fit_grid(t.data.counts, iterations=16, **base)
    mtime = os.path.getmtime(f"{stub}_2_0/metrics.json")
    time.sleep(0.05)

    # same config -> reused (file untouched)
    fit_grid(t.data.counts, iterations=16, **base)
    assert os.path.getmtime(f"{stub}_2_0/metrics.json") == mtime

    # changed -i -> fingerprint mismatch -> recomputed
    (rec,) = fit_grid(t.data.counts, iterations=24, **base)
    assert os.path.getmtime(f"{stub}_2_0/metrics.json") > mtime
    import json

    with open(f"{stub}_2_0/metrics.json") as f:
        assert json.load(f)["sweeps"] == 24

    # changed data content (same shape) -> recomputed too
    mtime = os.path.getmtime(f"{stub}_2_0/metrics.json")
    time.sleep(0.05)
    counts2 = t.data.counts.copy()
    counts2[0, 0, 0] += 1
    fit_grid(counts2, iterations=24, **base)
    assert os.path.getmtime(f"{stub}_2_0/metrics.json") > mtime


def test_metrics_seed_is_authoritative(tmp_path):
    """scan_run_dirs prefers metrics.json's seed over directory-name parsing
    (VERDICT r1 weak #9)."""
    from desman_tpu.model_selection import fit_grid, scan_run_dirs

    t = synth.generate(V=40, S=6, G=2, coverage=30.0, seed=0)
    stub = str(tmp_path / "oddname")
    fit_grid(t.data.counts, g_values=[2], seeds=[7], iterations=16,
             out_stub=stub, data=t.data)
    src = f"{stub}_2_7"
    dst = str(tmp_path / "renamed_without_suffix")
    os.rename(src, dst)
    (rec,) = scan_run_dirs([dst])
    assert rec.seed == 7


def test_sigterm_preemption_graceful_exit(tmp_path):
    """SIGTERM (pod preemption) -> the run finishes its segment, commits the
    checkpoint, and exits 75 (EX_TEMPFAIL); rerunning resumes bitwise."""
    t = synth.generate(V=60, S=6, G=2, coverage=30.0, seed=0)
    csv = str(tmp_path / "c.csv")
    io.write_counts_csv(csv, t.data)
    ck = str(tmp_path / "ck.npz")
    base = [csv, "-g", "2", "-i", "4000", "-s", "0", "-o",
            str(tmp_path / "out"), "--checkpoint", ck,
            "--checkpoint_every", "25"]
    with open(tmp_path / "run.log", "w") as log:
        p = _desman(base, log)
        deadline = time.time() + 300
        while not os.path.exists(ck) and p.poll() is None:
            if time.time() > deadline:
                p.kill()
                pytest.fail("no checkpoint appeared within 300s")
            time.sleep(0.05)
        if p.poll() is not None:
            pytest.skip("run completed before SIGTERM could be sent")
        p.terminate()                      # the preemption notice
        rc = p.wait(timeout=120)
    assert rc == 75, (tmp_path / "run.log").read_text()[-2000:]
    it = int(np.load(ck)["it"])
    assert 0 < it < 4000

    with open(tmp_path / "run2.log", "w") as log:  # resume to completion
        assert _desman(base, log).wait(timeout=600) == 0
    assert os.path.exists(tmp_path / "out" / "fit.txt")
