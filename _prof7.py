import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
import pygpr_tpu as gp

rng = np.random.default_rng(0)
n, dim = 2048, 3
A = rng.normal(size=(n, n)).astype(np.float32)
K = jnp.asarray(A @ A.T + n*np.eye(n, dtype=np.float32))
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

def run_chained(name, stepf, init, reps, flops=None):
    t0=time.perf_counter(); jnp.sum(stepf(init)).item(); print(f"  warm {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    X = init
    for _ in range(reps): X = stepf(X)
    jnp.sum(X).item()
    t = (time.perf_counter()-t0-lat)/reps
    extra = f" -> {flops/t/1e12:.2f} TFLOP/s" if flops else f" -> {1/t:.1f}/s"
    print(f"{name}: {t*1e3:.3f} ms{extra}", flush=True)
    return t

tristep = jax.jit(lambda Kin: Kin + lax.linalg.triangular_solve(Kin, Kin, left_side=True, lower=True)[0,0]*0.0)
run_chained("trisolve n rhs", tristep, K, 30, flops=n**3)

def vgstep(p):
    v, g = gp.nlml_value_and_grad(cov, p, x, y)
    return p + 0.0*g + 0.0*v
vgstep = jax.jit(vgstep)
run_chained("nlml_vg_AD", vgstep, jnp.asarray(p0), 30)

def vastep(p):
    v, g = gp.nlml_and_grad_analytic(cov, p, x, y)
    return p + 0.0*g + 0.0*v
vastep = jax.jit(vastep)
run_chained("nlml_vg_analytic", vastep, jnp.asarray(p0), 30)
