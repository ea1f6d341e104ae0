"""scikit-learn interop (reference ``PyGPR/scikit_model.py``).

``SKWrap`` mirrors the reference ``SK_WRAP`` (``scikit_model.py:15-36``)
with its two latent bugs fixed:

  * ``fit`` rebinds the training data **and marks the model dirty** —
    the reference sets ``need_upd`` on the *wrapper* instead of the
    model (``scikit_model.py:33``), leaving a stale Cholesky after
    refit (SURVEY.md §2.8).
  * ``fit(..., optimize=True)`` optionally runs the on-device L-BFGS
    hyperparameter fit (the reference ``fit`` does no optimization at
    all, ``scikit_model.py:24-29``).
  * ``predict`` returns the posterior mean; ``return_std=True`` adds
    the predictive standard deviation, the sklearn-conventional API
    (the reference's ``var="none"`` path returns ``NotImplemented``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from sklearn.base import BaseEstimator, RegressorMixin

from pygpr_tpu.models.exact_gp import ExactGP


class SKWrap(RegressorMixin, BaseEstimator):
    """sklearn Regressor facade over any house GP model.

    Accepts :class:`ExactGP` (reference parity) and, beyond the
    reference, any model with the ``set_data``/``train``/``predict``
    OO contract (:class:`~pygpr_tpu.models.sgpr.SGPR`,
    :class:`~pygpr_tpu.models.iterative.IterativeGP`).
    """

    def __init__(self, model, optimize: bool = False,
                 max_iter: int = 200):
        self.model = model
        self.optimize = optimize
        self.max_iter = max_iter

    def fit(self, x, y):
        self.model.set_data(jnp.asarray(x), jnp.asarray(y))
        if self.optimize:
            if hasattr(self.model, "train"):
                self.model.train(max_iter=self.max_iter)
            else:
                from pygpr_tpu.optimize.lbfgs import fit_mle

                res = fit_mle(
                    self.model.cov,
                    self.model.params,
                    self.model.x,
                    self.model.y,
                    config=self.model.config,
                    max_iter=self.max_iter,
                )
                self.model.set_params(res.params)
        return self

    def predict(self, xp, return_std: bool = False):
        if return_std:
            mean, var = self.model.predict(jnp.asarray(xp), var="diag")
            return np.asarray(mean), np.sqrt(np.asarray(var))
        mean, _ = self.model.predict(jnp.asarray(xp), var="none")
        return np.asarray(mean)


#: Reference-parity alias (``SK_WRAP``, ``scikit_model.py:15``).
SK_WRAP = SKWrap
