import time

import jax
import jax.numpy as jnp
import numpy as np

from desman_tpu import synth
from desman_tpu.sampler import SamplerConfig, run_chains

t = synth.generate(V=1000, S=16, G=5, coverage=40.0, seed=0)
n = jnp.asarray(t.data.counts, jnp.float32)

for G in (2, 3, 4, 5):
    cfg = SamplerConfig(G=G, burn=125, samples=125)
    t0 = time.time()
    res = run_chains(n, cfg, [0, 1, 2])
    jax.block_until_ready(res.loglik_trace)
    t1 = time.time()
    res = run_chains(n, cfg, [3, 4, 5])
    jax.block_until_ready(res.loglik_trace)
    t2 = time.time()
    print(f"G={G}: first call {t1-t0:.2f}s (compile+run), steady {t2-t1:.2f}s")
