import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax

rng = np.random.default_rng(0)
n = 2048
A = rng.normal(size=(n, n)).astype(np.float32)
K = jnp.asarray(A @ A.T + n*np.eye(n, dtype=np.float32))

f = jax.jit(lambda s: s + 1.0)
s = jnp.float32(0.)
t0=time.perf_counter(); float(f(s)); print("lat-warm %.1f s" % (time.perf_counter()-t0), flush=True)
ts=[]
for _ in range(10):
    t0=time.perf_counter(); float(f(s)); ts.append(time.perf_counter()-t0)
lat = min(ts)
print(f"fetch latency: {lat*1e3:.2f} ms", flush=True)

def cholstep(Kin):
    L = lax.linalg.cholesky(Kin)
    return Kin + (L[0, 0] * 0.0)
cholstep = jax.jit(cholstep)
t0=time.perf_counter(); float(jnp.sum(cholstep(K))); print("warm %.1f s" % (time.perf_counter()-t0), flush=True)
t0 = time.perf_counter()
X = K
for _ in range(30): X = cholstep(X)
float(jnp.sum(X))
t = (time.perf_counter()-t0-lat)/30
print(f"chol chained: {t*1e3:.3f} ms -> {(n**3/3)/t/1e12:.3f} TFLOP/s", flush=True)
