"""Quick TPU validation of the df Gram Mosaic kernel: accuracy at n=1024
(vs f64 host) and wall time at n=16384."""
import time
import numpy as np
import jax, jax.numpy as jnp
from stpy_tpu.ops.pallas_gram_df import gram_se_df
from stpy_tpu.utils.metrics import time_jitted

rng = np.random.default_rng(0)
x = rng.uniform(-1, 1, (1024, 8)).astype(np.float32)
K64 = np.exp(-((x.astype(np.float64)[:, None, :]
                - x.astype(np.float64)[None, :, :])**2).sum(-1) / (2 * 0.25))
hi, lo = gram_se_df(jnp.asarray(x), jnp.asarray(x), 0.5, 1.0)
K = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
rel = np.abs(K - K64) / np.maximum(K64, 1e-300)
print(f"TPU Mosaic df kernel n=1024: rel max {rel.max():.2e} "
      f"median {np.median(rel):.2e}", flush=True)

x16 = jnp.asarray(rng.uniform(-1, 1, (16384, 8)), jnp.float32)
f = jax.jit(lambda x: [jnp.sum(o) for o in gram_se_df(x, x, 0.5, 1.0)])
ct, rt = time_jitted(f, x16, reps=3)
print(f"df gram n=16k: {rt*1e3:.1f} ms (incl ~31 ms dispatch; compile {ct:.0f}s)",
      flush=True)
# compare: plain f32 pallas gram
from stpy_tpu.ops.pallas_gram import gram_se
g = jax.jit(lambda x: jnp.sum(gram_se(x, x, 0.5)))
ct, rt = time_jitted(g, x16, reps=3)
print(f"f32 gram n=16k: {rt*1e3:.1f} ms", flush=True)
