"""pygpr_tpu — a TPU-native Gaussian-process inference engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
sarath-srinivas/PyGPR (see SURVEY.md): exact GP regression with
composable ARD kernels, log-marginal-likelihood hyperparameter selection
with on-device gradients and optimizers, GP sampling utilities, MCMC
hyperparameter sampling, and the generalized robust Bayesian Committee
Machine (grBCM) for large-N regression, with experts/chains sharded over
TPU device meshes.

The public namespace is flat, mirroring the reference's
``PyGPR/__init__.py``.
"""

from pygpr_tpu.config import DEFAULT, Config, default_dtype
from pygpr_tpu.ops.kernels import (
    ActiveDims,
    ArcCosine,
    RBF,
    ChangePoint,
    Constant,
    Kernel,
    Linear,
    Matern,
    Periodic,
    Product,
    RationalQuadratic,
    Separable,
    SpectralMixture,
    Sum,
    WhiteNoise,
    kernel_and_grad,
    kernel_diag,
    kernel_matrix,
    sq_distance,
)
from pygpr_tpu.ops.linalg import (
    add_diag,
    cholesky_solve,
    inv_from_chol,
    safe_cholesky,
    spd_solve,
)
from pygpr_tpu.models.exact_gp import (
    GPR,
    ExactGP,
    GPState,
    extend_state,
    factorize,
    fit_predict,
    precompute_tinv,
    predict,
    sample_predictive,
)
from pygpr_tpu.models.likelihood import (
    MLE,
    Loss,
    nlml,
    nlml_and_grad_analytic,
    nlml_fast,
    nlml_value_and_grad,
)
from pygpr_tpu.models.dkl import DeepKernel, fit_dkl
from pygpr_tpu.models.grbcm import GRBCM
from pygpr_tpu.models.sgpr import SGPR
from pygpr_tpu.models.iterative import IterativeGP
from pygpr_tpu.models.ski import SKIGP
from pygpr_tpu.models import (
    committee,
    ep,
    grbcm,
    heteroscedastic,
    iterative,
    kronecker,
    laplace,
    multifidelity,
    obs,
    rff,
    sgpr,
    ski,
    statespace,
    tprocess,
    svgp,
    warped,
)
from pygpr_tpu.models.laplace import LaplaceGP
from pygpr_tpu.models.ep import EPGP
from pygpr_tpu.models.warped import WarpedGP
from pygpr_tpu.models.kronecker import KroneckerGP
from pygpr_tpu.models.statespace import StateSpaceGP
from pygpr_tpu.models.tprocess import TProcess
from pygpr_tpu.models.multifidelity import MultiFidelityGP
from pygpr_tpu.models.heteroscedastic import HeteroscedasticGP
from pygpr_tpu.models.deepgp import DeepGP
from pygpr_tpu.models.derivative import DerivativeGP
from pygpr_tpu.models.gplvm import GPLVM
from pygpr_tpu.models.svgp import SVGP
from pygpr_tpu.models.obs import (
    BernoulliLogit,
    BernoulliProbit,
    GaussianLik,
    PoissonLik,
    StudentTLik,
)
from pygpr_tpu.ops.coregion import ICM, TaskNoise, stack_outputs, with_task
from pygpr_tpu.ops.fixed_noise import FixedNoise, with_noise
from pygpr_tpu.models.means import (
    ConstantMean,
    LinearMean,
    Mean,
    ZeroMean,
    fit_gp_mean,
)
from pygpr_tpu.models import means, priors
from pygpr_tpu.models.priors import Gamma, HalfNormal, LogNormal
from pygpr_tpu.models import metrics
from pygpr_tpu.models.metrics import loo_cv, loo_nlpd
from pygpr_tpu.models.committee import (
    aggregate_committee,
    fit_committee,
    predict_committee,
)
from pygpr_tpu.models.likelihood import log_likelihood_batched
from pygpr_tpu.optimize import (
    CG,
    BayesOpt,
    BFGSQuad,
    CGQuad,
    FitResult,
    NelderMead,
    Opt,
    fit_map,
    fit_mle,
    get_learn_rate,
    hessian,
    learn_rate,
    minimize_lbfgs,
)

from pygpr_tpu import interop, optimize, parallel, sample, utils
from pygpr_tpu.sample import (
    Matern1,
    Sobol,
    Uniform,
    cluster_samples,
    euclidean_dist,
    sample_gp,
    sample_posterior,
)
from pygpr_tpu.interop import SK_WRAP, SKWrap

__version__ = "0.1.0"
