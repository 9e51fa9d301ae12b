"""On-chip kernel gate: assert pallas == xla on REAL TPU hardware.

VERDICT r1 item 7: tests/test_pallas.py checks kernel semantics in
interpreter mode on the CPU CI backend; this script is the committed
hardware gate. Run it whenever a chip is available (bench.py already
tunnels to one) and append the PASS line to PERF.md for the round:

    python scripts/tpu_smoke.py

Checks, all on the device jax.devices()[0] (must be a TPU/axon chip):
  1. single tau sweep: compiled Pallas kernel vs pure-XLA sweep from the
     same state + Gumbel noise -> >=99% identical base draws, mix close
  2. full chains (north-star-shaped config, scaled down): run_chain with
     the Pallas sweep vs the XLA sweep -> star haplotypes >=99% agreement,
     final loglik within rtol 1e-4 (float-associativity near-ties are the
     only allowed source of divergence)
  3. the kernel's returned mixture cache is consistent with its own tau

Exit code 0 + one JSON line on success; nonzero with a message otherwise.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"tpu_smoke: needs a TPU device, got backend={backend!r}; "
              "run under the chip tunnel", file=sys.stderr)
        return 2
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    from functools import partial

    from desman_tpu import synth
    from desman_tpu.likelihood import mixture
    from desman_tpu.ops import tau_sweep_pallas
    from desman_tpu.sampler import SamplerConfig, run_chain, tau_sweep_xla
    from desman_tpu.utils import one_hot_tau

    V, S, G = 2048, 32, 8
    t = synth.generate(V=V, S=S, G=G, coverage=50.0, seed=0)
    n = jax.device_put(jnp.asarray(t.data.counts, jnp.float32), dev)

    # --- 1. single-sweep equivalence (compiled kernel, not interpret) ---
    rng = np.random.default_rng(0)
    tau0 = jnp.asarray(rng.integers(0, 4, size=(V, G)), jnp.int32)
    gamma0 = jnp.asarray(t.gamma, jnp.float32)
    eta0 = jnp.asarray(t.eta, jnp.float32)
    mix0 = mixture(one_hot_tau(tau0), gamma0)
    key = jax.random.PRNGKey(3)
    tau_x, mix_x = tau_sweep_xla(n, tau0, mix0, gamma0, eta0, key)
    tau_p, mix_p = tau_sweep_pallas(n, tau0, mix0, gamma0, eta0, key)
    sweep_agree = float((np.asarray(tau_x) == np.asarray(tau_p)).mean())
    if sweep_agree <= 0.99:
        print(f"tpu_smoke: FAIL single-sweep agreement {sweep_agree:.4f}",
              file=sys.stderr)
        return 1
    np.testing.assert_allclose(np.asarray(mix_p), np.asarray(mix_x),
                               rtol=1e-4, atol=1e-5)

    # --- 3. kernel mix cache consistent with its own tau ---
    want = mixture(one_hot_tau(tau_p), gamma0)
    np.testing.assert_allclose(np.asarray(mix_p), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    # --- 1.5 fused swap epilogue vs the XLA swap (ops/swap_pallas) ---
    from desman_tpu.sampler import tau_swap_move

    ks = jax.random.fold_in(key, 12345)
    ta, ma = tau_swap_move(n, tau_p, mix_p, gamma0, eta0, ks)
    tb, mb = tau_sweep_pallas(n, tau0, mix0, gamma0, eta0, key, swap_key=ks)
    swap_agree = float((np.asarray(ta) == np.asarray(tb)).mean())
    if swap_agree <= 0.999:  # knife-edge log-ratio ties only
        print(f"tpu_smoke: FAIL fused-swap agreement {swap_agree:.5f}",
              file=sys.stderr)
        return 1
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma),
                               rtol=1e-4, atol=1e-5)

    # --- 2. full-chain trajectory equivalence ---
    # strict comparison runs BOTH chains with the XLA swap move (the fused
    # kernel swap's reduction order differs, so a knife-edge accept could
    # legitimately fork trajectories); the production fused path is then
    # held to the same star/loglik gates against the XLA chain.
    def pallas_unfused(n, tau, mix, gamma, eta, key, temp=1.0):
        return tau_sweep_pallas(n, tau, mix, gamma, eta, key, temp=temp)

    cfg = SamplerConfig(G=G, burn=30, samples=30, nmf_iters=50)
    ck = jax.random.PRNGKey(7)
    res_x = run_chain(n, cfg, ck, tau_sweep=tau_sweep_xla)
    ll_x = np.asarray(res_x.loglik_trace)
    res_u = run_chain(n, cfg, ck, tau_sweep=pallas_unfused)
    ll_u = np.asarray(res_u.loglik_trace)
    t0 = time.time()
    res_p = run_chain(n, cfg, ck, tau_sweep=tau_sweep_pallas)  # fused swap
    ll_p = np.asarray(res_p.loglik_trace)
    t_pallas = time.time() - t0

    star_agree = float(
        (np.asarray(res_u.tau_star) == np.asarray(res_x.tau_star)).mean()
    )
    rel = abs(float(ll_u[-1]) - float(ll_x[-1])) / abs(float(ll_x[-1]))
    star_fused = float(
        (np.asarray(res_p.tau_star) == np.asarray(res_x.tau_star)).mean()
    )
    rel_fused = abs(float(ll_p[-1]) - float(ll_x[-1])) / abs(float(ll_x[-1]))
    if (star_agree <= 0.99 or rel > 1e-4 or not np.isfinite(ll_p).all()
            or star_fused <= 0.99 or rel_fused > 1e-4):
        print(f"tpu_smoke: FAIL chain star_agree={star_agree:.4f} "
              f"final_ll_rel={rel:.2e} star_fused={star_fused:.4f} "
              f"final_ll_rel_fused={rel_fused:.2e}", file=sys.stderr)
        return 1

    # --- 4. resident whole-sweep path vs the XLA chain (r5) ---
    from desman_tpu.resident import run_chain_resident

    res_r = run_chain_resident(n, cfg, ck)
    ll_r = np.asarray(res_r.loglik_trace)
    star_res = float(
        (np.asarray(res_r.tau_star) == np.asarray(res_x.tau_star)).mean()
    )
    rel_res = abs(float(ll_r[-1]) - float(ll_x[-1])) / abs(float(ll_x[-1]))
    if star_res <= 0.99 or rel_res > 1e-4 or not np.isfinite(ll_r).all():
        print(f"tpu_smoke: FAIL resident star={star_res:.4f} "
              f"final_ll_rel={rel_res:.2e}", file=sys.stderr)
        return 1

    print(json.dumps({
        "check": "tpu_smoke_pallas_eq_xla",
        "device": str(dev),
        "sweep_agreement": round(sweep_agree, 5),
        "swap_agreement": round(swap_agree, 5),
        "star_agreement": round(star_agree, 5),
        "star_agreement_fused_swap": round(star_fused, 5),
        "star_agreement_resident": round(star_res, 5),
        "final_loglik_rel_diff": float(f"{rel:.3e}"),
        "final_loglik_rel_diff_fused": float(f"{rel_fused:.3e}"),
        "final_loglik_rel_diff_resident": float(f"{rel_res:.3e}"),
        "pallas_chain_s": round(t_pallas, 2),
        "pass": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
