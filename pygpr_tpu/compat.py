"""Reference-name compatibility namespace.

``from pygpr_tpu.compat import *`` exposes every public name of the
reference's flat API (``PyGPR/__init__.py:1-7``) under its original
spelling, bound to the TPU-native implementations — so a PyGPR user can
switch imports and keep their code:

    from pygpr_tpu.compat import (
        Exact_GP, Squared_exponential, White_noise, Compose,
        MLE, CG, Nelder_Mead, GRBCM, UNIFORM, MATERN1, sample_gp, ...
    )

Semantics follow the reference except where the reference is broken —
see PARITY.md (``GRBCM.train``, ``log_likelihood_batched``,
``sample_gp``'s stale API, ``SK_WRAP``'s stale dirty flag).
"""

from pygpr_tpu.interop.sklearn import SK_WRAP
from pygpr_tpu.models.exact_gp import ExactGP as Exact_GP
from pygpr_tpu.models.exact_gp import GPR  # abstract base (gpr.py:13-43)
from pygpr_tpu.models.grbcm import GRBCM
from pygpr_tpu.models.likelihood import MLE, Loss, log_likelihood_batched
from pygpr_tpu.ops.kernels import Kernel as Covar
from pygpr_tpu.ops.kernels import RBF as Squared_exponential
from pygpr_tpu.ops.kernels import Sum as Compose
from pygpr_tpu.ops.kernels import WhiteNoise as White_noise
from pygpr_tpu.optimize.classic import CG, BFGSQuad as BFGS_Quad
from pygpr_tpu.optimize.classic import CGQuad as CG_Quad
from pygpr_tpu.optimize.classic import NelderMead as Nelder_Mead
from pygpr_tpu.optimize.classic import Opt, hessian
from pygpr_tpu.optimize.step_size import get_learn_rate
from pygpr_tpu.sample.designs import (
    Matern1 as MATERN1,
    Uniform as UNIFORM,
    cluster_samples,
    euclidean_dist,
    sample_gp,
)

__all__ = [
    "GPR", "Exact_GP",
    "Squared_exponential", "Covar", "Compose", "White_noise",
    "Loss", "MLE",
    "Opt", "CG", "Nelder_Mead", "BFGS_Quad", "CG_Quad", "hessian",
    "GRBCM", "log_likelihood_batched",
    "UNIFORM", "MATERN1", "sample_gp", "cluster_samples",
    "euclidean_dist",
    "SK_WRAP", "get_learn_rate",
]
