import numpy as np, jax, jax.numpy as jnp
from pyipm_tpu.config import IPMConfig
from pyipm_tpu.models.random_nlp import make_qp_batch_solver, sample_qp_batch

B, D, L = 10000, 16, 4
cfg = IPMConfig(float_dtype="float32", verbosity=0, Ktol=1e-4)
key = jax.random.key(42)
data = sample_qp_batch(key, B, D, nlin=L)
x0 = jnp.zeros((B, D), jnp.float32)
solver = make_qp_batch_solver(cfg, nvar=D, nlin=L)
res = jax.block_until_ready(solver(x0, data))
it = np.asarray(res.iter_count)
sig = np.asarray(res.signal)
kkt = np.asarray(res.kkt)
print("signals:", {int(k): int(v) for k, v in zip(*np.unique(sig, return_counts=True))})
print("iter percentiles:", np.percentile(it, [50, 90, 99, 99.9, 100]).tolist())
bad = sig != 1
print("n bad:", bad.sum(), "bad iters:", it[bad][:20].tolist())
print("bad kkt max (per cond):", kkt[bad].max(axis=0) if bad.any() else None)
print("bad kkt rows:", kkt[bad][:10])
print("bad mu:", np.asarray(res.mu)[bad][:10], "delta:", np.asarray(res.delta)[bad][:10])
print("bad reg_retries:", np.asarray(res.reg_retries)[bad][:10])
