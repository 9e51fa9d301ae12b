"""Measure the observed-base-compressed tau kernel vs the full kernel on
TPU (VERDICT r3 next #2). Two data regimes at the north-star shape
(V=1e4, S=64, G=8):

  - biallelic: max_alleles=2, error_rate=0 -> every cell nnz<=2, the
    compressed kernel applies (realistic for point-mutation SNVs).
  - northstar: the bench.py generator (uniform tau over 4 bases) -> 96% of
    cells have 3-4 observed bases, compressed kernel inapplicable (raises).

Reports tau-sweep-only ms and full-chain sweeps/s for each applicable
kernel. Run on the TPU: `python scripts/bench_topk.py`.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def bench_sweep(sweep, n, tau, mix, gamma, eta, iters=50):
    import jax

    key = jax.random.PRNGKey(0)
    t, m = sweep(n, tau, mix, gamma, eta, key)      # compile
    jax.block_until_ready(m)

    # time a chained loop so dispatch overhead amortizes
    @jax.jit
    def chain(tau, mix):
        def body(i, c):
            t, m = c
            return sweep(n, t, m, gamma, eta, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, iters, body, (tau, mix))

    t0 = time.time()
    out = chain(tau, mix)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = chain(tau, mix)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    ms = sorted(times)[1] / iters * 1e3
    return ms, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from desman_tpu import synth
    from desman_tpu.likelihood import mixture
    from desman_tpu.ops import make_tau_sweep_topk, tau_sweep_pallas
    from desman_tpu.sampler import SamplerConfig, run_chain, tau_sweep_xla
    from desman_tpu.utils import one_hot_tau

    V, S, G = 10_000, 64, 8
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    interp = jax.default_backend() not in ("tpu", "axon")

    for regime, kw in (("biallelic", dict(error_rate=0.0, max_alleles=2)),
                       ("northstar", {})):
        t = synth.generate(V=V, S=S, G=G, coverage=50.0, seed=0, **kw)
        nnz = (t.data.counts > 0).sum(axis=2)
        print(f"[{regime}] cell-nnz histogram: "
              f"{np.bincount(nnz.ravel(), minlength=5) / nnz.size}")
        n = jnp.asarray(t.data.counts, jnp.float32)
        rng = np.random.default_rng(0)
        tau = jnp.asarray(rng.integers(0, 4, size=(V, G)), jnp.int32)
        gamma = jnp.asarray(rng.dirichlet(np.ones(G), size=S), jnp.float32)
        eta = jnp.asarray(synth.make_eta(0.01), jnp.float32)
        mix = mixture(one_hot_tau(tau), gamma)

        kernels = {"xla": tau_sweep_xla,
                   "pallas": partial(tau_sweep_pallas, interpret=interp)}
        try:
            kernels["topk"] = make_tau_sweep_topk(t.data.counts)
        except ValueError as e:
            print(f"[{regime}] topk inapplicable: {e}")

        for name, sweep in kernels.items():
            if name == "xla" and regime == "northstar":
                pass  # measured in PERF.md; keep for the biallelic row
            ms, comp = bench_sweep(sweep, n, tau, mix, gamma, eta)
            print(f"[{regime}] tau-only {name}: {ms:.3f} ms/sweep "
                  f"({1e3 / ms:.0f}/s; compile {comp:.1f}s)")

        # full-chain sweeps/s with the winning kernels
        cfg = SamplerConfig(G=G, burn=0, samples=100, nmf_iters=50)
        for name, sweep in kernels.items():
            if name == "xla":
                continue
            run = partial(run_chain, tau_sweep=sweep)
            res = run(n, cfg, jax.random.PRNGKey(0))
            jax.block_until_ready(res.loglik_trace)
            times = []
            for i in range(3):
                t0 = time.time()
                res = run(n, cfg, jax.random.PRNGKey(i + 1))
                jax.block_until_ready(res.loglik_trace)
                times.append(time.time() - t0)
            sps = cfg.samples / sorted(times)[1]
            print(f"[{regime}] full chain {name}: {sps:.0f} sweeps/s "
                  f"(final loglik {float(np.asarray(res.loglik_trace)[-1]):.1f})")


if __name__ == "__main__":
    main()
