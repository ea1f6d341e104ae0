import time
import numpy as np, jax, jax.numpy as jnp
import pygpr_tpu as gp
from pygpr_tpu.config import Config

rng = np.random.default_rng(42)
n, dim = 2048, 3
x = rng.uniform(0, 2, (n, dim)).astype(np.float32)
y = (np.sin(2*x.sum(-1)) + 0.1*rng.normal(size=n)).astype(np.float32)
p0 = np.ones(dim+2, np.float32); p0[-1] = 0.1
cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))

f = jax.jit(lambda s: s + 1.0)
s = jnp.float32(0.)
t0=time.perf_counter(); float(f(s)); print("lat-warm %.1f s" % (time.perf_counter()-t0), flush=True)
ts=[]
for _ in range(10):
    t0=time.perf_counter(); float(f(s)); ts.append(time.perf_counter()-t0)
lat = min(ts)
print(f"fetch latency: {lat*1e3:.2f} ms", flush=True)

# correctness of fused kernel on TPU
from pygpr_tpu.ops.pallas_cholesky import cholesky_inverse_pallas
A = rng.normal(size=(512, 512))
K = jnp.asarray((A @ A.T + 512*np.eye(512)).astype(np.float32))
t0=time.perf_counter()
L, T = jax.jit(cholesky_inverse_pallas)(K)
L, T = np.asarray(L), np.asarray(T)
print("fused compile+run %.1f s" % (time.perf_counter()-t0), flush=True)
Lref = np.linalg.cholesky(np.asarray(K, np.float64))
print("L err:", np.abs(L-Lref).max(), " TL-I:", np.abs(T@L-np.eye(512)).max(), flush=True)

def chained(name, stepf, init, reps=30):
    t0=time.perf_counter(); jnp.sum(stepf(init)).item(); print(f"  warm {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    X = init
    for _ in range(reps): X = stepf(X)
    jnp.sum(X).item()
    t = (time.perf_counter()-t0-lat)/reps
    print(f"{name}: {t*1e3:.3f} ms -> {1/t:.1f} evals/s", flush=True)
    return t

cfg_p = Config(grad_mode="fast", use_pallas=True)
def vg_pallas(p):
    v, g = gp.nlml_value_and_grad(cov, p, x, y, cfg_p)
    return p + 0.0*g + 0.0*v
t = chained("vg_FAST+pallas n=2048", jax.jit(vg_pallas), jnp.asarray(p0), 30)

# numeric agreement vs f64 reference
import jax.numpy as jnp2
v, g = jax.jit(lambda p: gp.nlml_value_and_grad(cov, p, x, y, cfg_p))(jnp.asarray(p0))
print("value:", float(v), "grad:", np.asarray(g), flush=True)
