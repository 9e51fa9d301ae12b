"""End-to-end run driver: counts -> sampler -> DESMAN-format output dir.

The TPU-native equivalent of the reference's ``bin/desman`` main path
(SURVEY.md §3.1): load the counts CSV, optionally subsample positions (-r)
and apply min coverage (-m), run the Gibbs sampler (optionally with a fixed
eta from the filter's tran_df, -e), and write the output directory the
downstream tooling (resolvenhap / validateSNP equivalents) consumes:
fit.txt, Gamma_{mean,star}.csv, Eta_{mean,star}.csv, Filtered_Tau_star.csv,
Tau_mean.csv.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from . import io
from .sampler import (
    SamplerConfig, SamplerResult, deviance_from_loglik, run_chain, total_coeff,
)


@dataclass
class RunConfig:
    """Host-side run options (the reference CLI's flag surface, SURVEY.md §8)."""

    G: int                           # -g number of strains
    iterations: int = 250            # -i total sweeps (burn = half, like burn+sample split)
    seed: int = 0                    # -s
    eta_file: Optional[str] = None   # -e tran_df.csv (fixes eta unless sample_eta)
    sample_eta: bool = False         # sample eta even when eta_file seeds it
    min_coverage: float = 0.0        # -m drop positions below this total coverage
    n_positions: int = 0             # -r random position subsample (0 = all)
    out_dir: str = "desman_out"      # -o
    burn_frac: float = 0.5
    # 0.0 = warm-start the MH proposal concentrations from the data's
    # posterior curvature (see SamplerConfig.kappa_* notes); positive pins
    kappa_gamma: float = 0.0
    kappa_eta: float = 0.0
    checkpoint_path: Optional[str] = None   # enables segmented run + resume
    checkpoint_every: int = 50
    profile_dir: Optional[str] = None       # jax.profiler trace output
    tau_file: Optional[str] = None          # -t/-f: tau-star CSV to init from
    fix_tau: bool = False                   # -f: freeze tau (fit gamma/eta only)
    pt_replicas: int = 0                    # >=2: parallel tempering rungs
    pt_max_temp: float = 8.0                # hottest rung temperature
    auto_burn: bool = False                 # plateau-detected burn-in length
    auto_tol: float = 1e-5                  # relative plateau tolerance
    auto_max_burn: int = 2000
    # >0: extend sampling until post-burn bulk ESS reaches this target
    # (loglik trace; min gamma ESS too when --store_every draws exist)
    auto_samples: float = 0.0
    auto_max_samples: int = 2000            # sampling-extension cap
    eta_update: str = "joint"               # "joint" (1 psum/sweep) | "rows"
    store_every: int = 0                    # >0: write every k-th post-burn draw


def bind_kernel(tau_sweep, counts, mesh=None):
    """Resolve a CLI kernel selection against the post-prepare counts/mesh.

    - ``pallas_topk`` factories (``needs_counts``) bind their static top-2
      layout here — per position shard under a mesh (the r4 "--kernel
      pallas_topk --mesh" exclusion, closed by the pre-split layout in
      parallel.make_topk_sweep_sharded).
    - the plain pallas kernel gets the shard_map wrapper under a mesh: a
      raw pallas_call cannot be GSPMD-partitioned, so passing it through
      unwrapped would crash in lowering.
    """
    if tau_sweep is None:
        return None
    if getattr(tau_sweep, "resident", False):
        return tau_sweep  # routed to resident.run_chain(s)_resident
    if getattr(tau_sweep, "needs_counts", False):
        return (tau_sweep(counts, mesh=mesh) if mesh is not None
                else tau_sweep(counts))
    if mesh is not None:
        from .ops import tau_sweep_pallas

        if tau_sweep is tau_sweep_pallas:
            from .parallel import make_pallas_sweep_sharded

            return make_pallas_sweep_sharded(mesh, true_V=counts.shape[0])
    return tau_sweep


def prepare_data(
    data: io.CountsData, min_coverage: float, n_positions: int, seed: int
) -> io.CountsData:
    """Coverage gate + optional random subsample of positions (reference -r/-m)."""
    keep = data.counts.sum(axis=(1, 2)) >= min_coverage
    data = data.select(np.flatnonzero(keep))
    if n_positions and data.V > n_positions:
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(data.V, size=n_positions, replace=False))
        data = data.select(idx)
    return data


def sampler_config(rc: RunConfig) -> SamplerConfig:
    burn = int(rc.iterations * rc.burn_frac)
    if rc.store_every and (rc.iterations - burn) % rc.store_every != 0:
        raise ValueError(
            f"store_every={rc.store_every} must divide the sampling sweeps "
            f"({rc.iterations - burn} = iterations - burn)"
        )
    return SamplerConfig(
        G=rc.G,
        burn=burn,
        samples=rc.iterations - burn,
        kappa_gamma=rc.kappa_gamma,
        kappa_eta=rc.kappa_eta,
        fix_eta=(rc.eta_file is not None and not rc.sample_eta),
        fix_tau=rc.fix_tau,
        eta_update=rc.eta_update,
        store_samples=rc.store_every > 0,
        store_thin=max(rc.store_every, 1),
    )


def load_tau_init(tau_file: str, data: io.CountsData) -> "np.ndarray":
    """Load a Filtered_Tau_star.csv and align it to data's positions.

    Every (Contig, Position) of `data` must appear in the tau file (the
    reference's fixed/initial-tau input shares the filter's position set).
    """
    tau, contigs, positions = io.read_tau_star_csv(tau_file)
    index = {
        (str(c), int(p)): i for i, (c, p) in enumerate(zip(contigs, positions))
    }
    rows = []
    for c, p in zip(data.contigs, data.positions):
        key = (str(c), int(p))
        if key not in index:
            raise ValueError(f"tau file missing position {key}")
        rows.append(index[key])
    return tau[rows]


def run(data: io.CountsData, rc: RunConfig, tau_sweep=None) -> SamplerResult:
    """Execute one chain and write the output directory. Returns the result."""
    import jax.numpy as jnp

    from .sampler import tau_sweep_xla

    data = prepare_data(data, rc.min_coverage, rc.n_positions, rc.seed)
    cfg = sampler_config(rc)
    eta_init = None
    if rc.eta_file:
        eta_init = jnp.asarray(io.read_eta_csv(rc.eta_file), jnp.float32)
    tau_init = None
    if rc.tau_file:
        tau_init = jnp.asarray(load_tau_init(rc.tau_file, data), jnp.int32)
    elif rc.fix_tau:
        raise ValueError("fix_tau requires tau_file")

    n = jnp.asarray(data.counts, jnp.float32)
    tau_sweep = bind_kernel(tau_sweep, data.counts)
    from .profiling import device_trace

    t0 = time.time()
    # --auto_burn / --auto_samples: data-driven run length (converge.py).
    # Without auto_burn the burn is pinned at cfg.burn (max_burn=cfg.burn
    # makes phase 1 burn exactly that, segment-wise — same trajectory).
    auto = rc.auto_burn or rc.auto_samples > 0
    auto_kw = dict(
        rel_tol=rc.auto_tol,
        max_burn=rc.auto_max_burn if rc.auto_burn else cfg.burn,
        ess_target=rc.auto_samples, max_samples=rc.auto_max_samples,
    )
    with device_trace(rc.profile_dir):
        if getattr(tau_sweep, "resident", False):
            # run-mode fields the resident path cannot honor must not be
            # silently dropped (API callers bypass the CLI guard)
            if auto or rc.pt_replicas >= 2 or rc.checkpoint_path:
                raise ValueError(
                    "the resident kernel supports plain runs only — "
                    "auto_burn/auto_samples/pt/checkpoint need the "
                    "composable 'pallas' kernel")
            from .resident import run_chain_resident

            res = run_chain_resident(
                n, cfg, jax.random.PRNGKey(rc.seed), eta_init=eta_init,
                tau_init=tau_init,
            )
        elif auto and rc.pt_replicas >= 2:
            from dataclasses import replace as _replace

            from .converge import run_chain_pt_auto

            if not rc.auto_burn:  # fixed burn: plateau phase pinned off
                auto_kw["max_burn"] = cfg.burn
            res, burn_used, samples_used = run_chain_pt_auto(
                n, cfg, jax.random.PRNGKey(rc.seed),
                n_replicas=rc.pt_replicas, max_temp=rc.pt_max_temp,
                eta_init=eta_init, tau_init=tau_init,
                tau_sweep=tau_sweep or tau_sweep_xla,
                auto_burn=rc.auto_burn, **auto_kw,
            )
            cfg = _replace(cfg, burn=burn_used, samples=samples_used)
        elif auto and rc.checkpoint_path:
            import jax.tree_util as jtu

            from .converge import run_chains_auto

            res_v, burn_used, samples_used = run_chains_auto(
                n, cfg, jax.random.PRNGKey(rc.seed)[None], eta_init=eta_init,
                tau_init=tau_init, checkpoint_path=rc.checkpoint_path,
                tau_sweep=tau_sweep or tau_sweep_xla, **auto_kw,
            )
            res = jtu.tree_map(lambda x: x[0], res_v)
            from dataclasses import replace as _replace

            cfg = _replace(cfg, burn=burn_used, samples=samples_used)
        elif auto:
            from .converge import run_chain_auto

            res, burn_used, samples_used = run_chain_auto(
                n, cfg, jax.random.PRNGKey(rc.seed), eta_init=eta_init,
                tau_init=tau_init, tau_sweep=tau_sweep or tau_sweep_xla,
                **auto_kw,
            )
            from dataclasses import replace as _replace

            # metrics report real sweeps
            cfg = _replace(cfg, burn=burn_used, samples=samples_used)
        elif rc.checkpoint_path and rc.pt_replicas >= 2:
            from .checkpoint import run_chain_pt_checkpointed

            res = run_chain_pt_checkpointed(
                n, cfg, jax.random.PRNGKey(rc.seed), rc.checkpoint_path,
                checkpoint_every=rc.checkpoint_every,
                n_replicas=rc.pt_replicas, max_temp=rc.pt_max_temp,
                eta_init=eta_init, tau_init=tau_init,
                tau_sweep=tau_sweep or tau_sweep_xla,
            )
        elif rc.checkpoint_path:
            from .checkpoint import run_chain_checkpointed

            res = run_chain_checkpointed(
                n, cfg, jax.random.PRNGKey(rc.seed), rc.checkpoint_path,
                checkpoint_every=rc.checkpoint_every, eta_init=eta_init,
                tau_init=tau_init, tau_sweep=tau_sweep or tau_sweep_xla,
            )
        elif rc.pt_replicas >= 2:
            from .sampler import run_chain_pt

            res = run_chain_pt(
                n, cfg, jax.random.PRNGKey(rc.seed),
                n_replicas=rc.pt_replicas, max_temp=rc.pt_max_temp,
                eta_init=eta_init, tau_init=tau_init,
                tau_sweep=tau_sweep or tau_sweep_xla,
            )
        else:
            res = run_chain(
                n, cfg, jax.random.PRNGKey(rc.seed), eta_init=eta_init,
                tau_init=tau_init, tau_sweep=tau_sweep or tau_sweep_xla,
            )
        jax.block_until_ready(res.loglik_trace)
    elapsed = time.time() - t0

    write_outputs(rc.out_dir, data, res, cfg, elapsed, seed=rc.seed)
    if res.tau_samples is not None:
        io.write_draws(os.path.join(rc.out_dir, "draws.npz"),
                       res.tau_samples, res.gamma_samples, res.eta_samples,
                       burn=cfg.burn, thin=cfg.store_thin)
    return res


def run_sharded_checkpointed(
    data: io.CountsData, rc: RunConfig, mesh, tau_sweep=None,
) -> SamplerResult:
    """Single position-sharded chain with checkpoint/resume (--mesh +
    --checkpoint): the long big-V regime (docs/SCALING.md)."""
    import jax.numpy as jnp

    from .parallel import run_chain_sharded_checkpointed
    from .sampler import tau_sweep_xla

    data = prepare_data(data, rc.min_coverage, rc.n_positions, rc.seed)
    cfg = sampler_config(rc)
    eta_init = None
    if rc.eta_file:
        eta_init = jnp.asarray(io.read_eta_csv(rc.eta_file), jnp.float32)
    tau_init = load_tau_init(rc.tau_file, data) if rc.tau_file else None
    tau_sweep = bind_kernel(tau_sweep, data.counts, mesh)
    t0 = time.time()
    res = run_chain_sharded_checkpointed(
        data.counts, cfg, jax.random.PRNGKey(rc.seed), rc.checkpoint_path,
        checkpoint_every=rc.checkpoint_every, mesh=mesh, eta_init=eta_init,
        tau_init=tau_init, tau_sweep=tau_sweep or tau_sweep_xla,
    )
    jax.block_until_ready(res.star_loglik)
    write_outputs(rc.out_dir, data, res, cfg, time.time() - t0,
                  seed=rc.seed)
    if res.tau_samples is not None:  # --store_every draws (shard-assembled)
        io.write_draws(os.path.join(rc.out_dir, "draws.npz"),
                       res.tau_samples, res.gamma_samples, res.eta_samples,
                       burn=cfg.burn, thin=cfg.store_thin)
    return res


def run_pt_sharded(
    data: io.CountsData, rc: RunConfig, mesh, tau_sweep=None,
) -> SamplerResult:
    """Parallel tempering on a (chain, data) mesh (--pt + --mesh): replicas
    shard over the chain axis, positions over the data axis. With
    rc.checkpoint_path the run checkpoints through the multi-host shard
    scheme (--pt --mesh --checkpoint, VERDICT r3 missing #3)."""
    import jax.numpy as jnp

    from .parallel import (
        run_chain_pt_sharded, run_chain_pt_sharded_checkpointed,
    )
    from .sampler import tau_sweep_xla

    data = prepare_data(data, rc.min_coverage, rc.n_positions, rc.seed)
    cfg = sampler_config(rc)
    eta_init = None
    if rc.eta_file:
        eta_init = jnp.asarray(io.read_eta_csv(rc.eta_file), jnp.float32)
    tau_init = load_tau_init(rc.tau_file, data) if rc.tau_file else None
    tau_sweep = bind_kernel(tau_sweep, data.counts, mesh)
    t0 = time.time()
    if rc.checkpoint_path:
        res = run_chain_pt_sharded_checkpointed(
            data.counts, cfg, jax.random.PRNGKey(rc.seed), rc.checkpoint_path,
            checkpoint_every=rc.checkpoint_every,
            n_replicas=rc.pt_replicas, max_temp=rc.pt_max_temp, mesh=mesh,
            eta_init=eta_init, tau_init=tau_init,
            tau_sweep=tau_sweep or tau_sweep_xla,
        )
    else:
        res = run_chain_pt_sharded(
            data.counts, cfg, jax.random.PRNGKey(rc.seed),
            n_replicas=rc.pt_replicas, max_temp=rc.pt_max_temp, mesh=mesh,
            eta_init=eta_init, tau_init=tau_init,
            tau_sweep=tau_sweep or tau_sweep_xla,
        )
    jax.block_until_ready(res.star_loglik)
    write_outputs(rc.out_dir, data, res, cfg, time.time() - t0,
                  seed=rc.seed)
    if res.tau_samples is not None:  # cold-rung draws (--store_every --pt --mesh)
        io.write_draws(os.path.join(rc.out_dir, "draws.npz"),
                       res.tau_samples, res.gamma_samples, res.eta_samples,
                       burn=cfg.burn, thin=cfg.store_thin)
    return res


def run_multi(
    data: io.CountsData, rc: RunConfig, n_chains: int, tau_sweep=None,
    mesh=None,
) -> SamplerResult:
    """Run n_chains vmapped chains (seeds rc.seed..rc.seed+n-1) on one device
    program and write the best-by-star-likelihood chain's outputs (the
    reference's multi-replicate loop collapsed on-device, SURVEY.md §2.2).

    Composes with the other run modes (VERDICT r1 item 4): --pt gives
    n_chains independent tempering runs, --checkpoint snapshots/resumes the
    whole vmapped ensemble, --auto_burn burns until every chain plateaus.
    """
    import jax.numpy as jnp

    from .sampler import run_chains, tau_sweep_xla

    data = prepare_data(data, rc.min_coverage, rc.n_positions, rc.seed)
    cfg = sampler_config(rc)
    eta_init = None
    if rc.eta_file:
        eta_init = jnp.asarray(io.read_eta_csv(rc.eta_file), jnp.float32)
    tau_init = None
    if rc.tau_file:
        tau_init = jnp.asarray(load_tau_init(rc.tau_file, data), jnp.int32)
    elif rc.fix_tau:
        raise ValueError("fix_tau requires tau_file")

    n = jnp.asarray(data.counts, jnp.float32)
    tau_sweep = bind_kernel(tau_sweep, data.counts, mesh)
    seeds = list(range(rc.seed, rc.seed + n_chains))
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    sweep_kw = {"tau_sweep": tau_sweep or tau_sweep_xla}
    t0 = time.time()
    if getattr(tau_sweep, "resident", False):
        if (rc.auto_burn or rc.auto_samples > 0 or rc.pt_replicas >= 2
                or rc.checkpoint_path or mesh is not None):
            raise ValueError(
                "the resident kernel supports plain/--chains runs only — "
                "auto_burn/auto_samples/pt/checkpoint/mesh need the "
                "composable 'pallas' kernel")
        from .resident import run_chains_resident

        res = run_chains_resident(n, cfg, seeds, eta_init=eta_init,
                                  tau_init=tau_init)
    elif rc.auto_burn or rc.auto_samples > 0:
        from .converge import run_chains_auto

        res, burn_used, samples_used = run_chains_auto(
            n, cfg, keys, eta_init=eta_init, tau_init=tau_init,
            rel_tol=rc.auto_tol,
            max_burn=rc.auto_max_burn if rc.auto_burn else cfg.burn,
            ess_target=rc.auto_samples, max_samples=rc.auto_max_samples,
            checkpoint_path=rc.checkpoint_path, mesh=mesh, **sweep_kw,
        )
        from dataclasses import replace as _replace

        # metrics report real sweeps
        cfg = _replace(cfg, burn=burn_used, samples=samples_used)
    elif rc.pt_replicas >= 2:
        from .sampler import run_chains_pt

        res = run_chains_pt(
            n, cfg, seeds, n_replicas=rc.pt_replicas,
            max_temp=rc.pt_max_temp, eta_init=eta_init, tau_init=tau_init,
            **sweep_kw,
        )
    elif rc.checkpoint_path and mesh is not None:
        from .parallel import run_chains_sharded_checkpointed

        res = run_chains_sharded_checkpointed(
            data.counts, cfg, seeds, rc.checkpoint_path,
            checkpoint_every=rc.checkpoint_every, mesh=mesh,
            eta_init=eta_init, tau_init=tau_init, **sweep_kw,
        )
    elif rc.checkpoint_path:
        from .checkpoint import run_chains_checkpointed

        res = run_chains_checkpointed(
            n, cfg, keys, rc.checkpoint_path,
            checkpoint_every=rc.checkpoint_every, eta_init=eta_init,
            tau_init=tau_init, **sweep_kw,
        )
    elif mesh is not None:
        from .parallel import run_chains_sharded

        res = run_chains_sharded(data.counts, cfg, seeds, mesh=mesh,
                                 eta_init=eta_init, tau_init=tau_init,
                                 **sweep_kw)
    else:
        res = run_chains(n, cfg, seeds, eta_init=eta_init,
                         tau_init=tau_init, **sweep_kw)
    jax.block_until_ready(res.loglik_trace)
    elapsed = time.time() - t0

    best = int(np.argmax(np.asarray(res.star_loglik)))
    best_res = jax.tree_util.tree_map(lambda x: x[best], res)
    write_outputs(rc.out_dir, data, best_res, cfg, elapsed,
                  seed=seeds[best])
    if best_res.tau_samples is not None:
        io.write_draws(os.path.join(rc.out_dir, "draws.npz"),
                       best_res.tau_samples, best_res.gamma_samples,
                       best_res.eta_samples, burn=cfg.burn,
                       thin=cfg.store_thin)

    from .diagnostics import ess_bulk, replicate_agreement, split_rhat

    post = np.asarray(res.loglik_trace)[:, cfg.burn:]
    agree = replicate_agreement(list(np.asarray(res.tau_star)))
    with open(os.path.join(rc.out_dir, "chains.json"), "w") as f:
        json.dump(
            {"seeds": seeds, "best_seed": seeds[best],
             "star_logliks": np.asarray(res.star_loglik).tolist(),
             "loglik_split_rhat": split_rhat(post),
             "loglik_ess_bulk": ess_bulk(post),
             "tau_star_pairwise_snp": agree.tolist()}, f, indent=2,
        )
    return best_res


def write_outputs(
    out_dir: str,
    data: io.CountsData,
    res: SamplerResult,
    cfg: SamplerConfig,
    elapsed: Optional[float] = None,
    seed: Optional[int] = None,
    extra_metrics: Optional[dict] = None,
) -> None:
    """Write the DESMAN-compatible output file set (SURVEY.md §8).

    Deviances are computed in float64 on host (star: exact re-evaluation of
    the star state; mean: math.fsum over the post-burn f32 trace) so the
    numbers model selection discriminates on never carry the f32 device
    reduction error (SURVEY.md §7.3; VERDICT r1 item 5).
    """
    import math

    from .likelihood import log_likelihood_host_f64, total_coeff_host_f64

    io.ensure_dir(out_dir)
    coeff = total_coeff_host_f64(data.counts)
    post = np.asarray(res.loglik_trace, np.float64)[cfg.burn:]
    if post.size:
        mean_ll = math.fsum(post.tolist()) / post.size
    else:  # degenerate all-burn config: fall back to the device accumulator
        mean_ll = float(res.mean_loglik)
    mean_dev = deviance_from_loglik(mean_ll, coeff)
    star_ll_f64 = log_likelihood_host_f64(
        data.counts, np.asarray(res.tau_star), np.asarray(res.gamma_star),
        np.asarray(res.eta_star), include_coeff=False,
    )
    star_dev = deviance_from_loglik(star_ll_f64, coeff)

    io.write_fit_txt(
        os.path.join(out_dir, "fit.txt"),
        G=cfg.G, V=data.V, S=data.S,
        mean_deviance=mean_dev, star_deviance=star_dev,
        star_loglik=float(res.star_loglik) + coeff,
    )
    io.write_gamma_csv(
        os.path.join(out_dir, "Gamma_mean.csv"), np.asarray(res.gamma_mean), data.samples
    )
    io.write_gamma_csv(
        os.path.join(out_dir, "Gamma_star.csv"), np.asarray(res.gamma_star), data.samples
    )
    io.write_eta_csv(os.path.join(out_dir, "Eta_mean.csv"), np.asarray(res.eta_mean))
    io.write_eta_csv(os.path.join(out_dir, "Eta_star.csv"), np.asarray(res.eta_star))
    io.write_tau_star_csv(
        os.path.join(out_dir, "Filtered_Tau_star.csv"),
        np.asarray(res.tau_star), data.contigs, data.positions,
    )
    io.write_tau_mean_csv(
        os.path.join(out_dir, "Tau_mean.csv"),
        np.asarray(res.tau_mean), data.contigs, data.positions,
    )
    # structured per-run metrics (rebuild's observability upgrade, SURVEY.md §5)
    # self-announcing MC efficiency (VERDICT r4 weak #1/#2): post-burn
    # acceptance and the post-burn loglik bulk-ESS ship in every run's
    # metrics; per-parameter gamma/eta ESS whenever draws were stored
    from .diagnostics import draws_diagnostics, ess_bulk

    ess_fields = {}
    if post.size >= 4:
        ess_fields["loglik_ess_bulk"] = float(ess_bulk(post[None, :]))
    if res.gamma_samples is not None and res.gamma_samples.shape[0] >= 4:
        d = draws_diagnostics({"gamma": np.asarray(res.gamma_samples),
                               "eta": np.asarray(res.eta_samples)})
        ess_fields.update({k: d[k] for k in
                           ("gamma_ess_min", "gamma_ess_median",
                            "eta_ess_min")})
    metrics = {
        "G": cfg.G, "V": data.V, "S": data.S,
        **({"seed": int(seed)} if seed is not None else {}),
        "sweeps": cfg.total_sweeps,
        "sampling_sweeps": cfg.samples,
        "mean_deviance": mean_dev,
        "star_deviance": star_dev,
        "accept_gamma": float(res.accept_gamma),
        "accept_eta": float(res.accept_eta),
        **({"accept_gamma_post": float(res.accept_gamma_post)}
           if res.accept_gamma_post is not None else {}),
        **({"accept_eta_post": float(res.accept_eta_post)}
           if res.accept_eta_post is not None else {}),
        **ess_fields,
        **({"pt_swap_accept": float(res.pt_swap_accept)}
           if res.pt_swap_accept is not None else {}),
        "final_loglik": float(np.asarray(res.loglik_trace)[-1]),
        "elapsed_s": elapsed,
        "sweeps_per_s": (cfg.total_sweeps / elapsed) if elapsed else None,
        **(extra_metrics or {}),
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    np.savetxt(
        os.path.join(out_dir, "loglik_trace.csv"),
        np.asarray(res.loglik_trace), delimiter=",",
    )
