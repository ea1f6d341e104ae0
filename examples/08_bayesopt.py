"""Bayesian optimization of a black-box function with the GP engine.

The reference stops at regression; this drives the standard consumer
of a GP posterior: sequential model-based minimization with a
numerically-stable log-EI acquisition, jitted multi-start gradient
ascent for the proposal, and incremental block-Cholesky state
extension per observation (``pygpr_tpu.extend_state`` — no
refactorization between hyperparameter refits).

Minimizes the 2-D Branin function (global minimum 0.397887).

Run: python examples/08_bayesopt.py           (TPU or CPU)
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.optimize.bayesopt import BayesOpt


def branin(x):
    a, b, c = 1.0, 5.1 / (4 * np.pi**2), 5 / np.pi
    r, s, t = 6.0, 10.0, 1 / (8 * np.pi)
    x1, x2 = x[..., 0], x[..., 1]
    return (
        a * (x2 - b * x1**2 + c * x1 - r) ** 2
        + s * (1 - t) * np.cos(x1)
        + s
    )


lo, hi = np.array([-5.0, 0.0]), np.array([10.0, 15.0])
rng = np.random.default_rng(0)
x0 = (lo + (hi - lo) * rng.uniform(size=(8, 2))).astype(np.float32)
y0 = branin(x0).astype(np.float32)

bo = BayesOpt(
    gp.RBF() + gp.WhiteNoise(),
    x0,
    y0,
    (lo.astype(np.float32), hi.astype(np.float32)),
    acq="log_ei",
    refit_every=5,
    seed=0,
)

for i in range(25):
    xn = bo.ask()
    yn = float(branin(np.asarray(xn)))
    bo.tell(xn, yn)
    _, y_best = bo.best
    print(f"iter {i + 1:2d}  f(x)={yn:8.4f}  best={float(y_best):8.4f}")

x_best, y_best = bo.best
print(f"\nbest found: f({np.asarray(x_best)}) = {float(y_best):.4f}")
print("global optimum: 0.3979")
assert float(y_best) < 1.5, "BO failed to approach the Branin optimum"
