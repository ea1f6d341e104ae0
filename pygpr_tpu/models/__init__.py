from pygpr_tpu.models.exact_gp import (
    GPR,
    ExactGP,
    GPState,
    extend_state,
    factorize,
    fit_predict,
    predict,
)
from pygpr_tpu.models.likelihood import (
    MLE,
    Loss,
    nlml,
    nlml_and_grad_analytic,
    nlml_fast,
    nlml_value_and_grad,
)
from pygpr_tpu.models.grbcm import GRBCM
from pygpr_tpu.models.committee import (
    aggregate_committee,
    fit_committee,
    predict_committee,
)
from pygpr_tpu.models.sgpr import SGPR
from pygpr_tpu.models.svgp import SVGP
from pygpr_tpu.models.obs import (
    BernoulliLogit,
    BernoulliProbit,
    GaussianLik,
    PoissonLik,
    StudentTLik,
)
from pygpr_tpu.models.dkl import DeepKernel, DKLFit, fit_dkl
from pygpr_tpu.models.laplace import LaplaceGP
from pygpr_tpu.models.ep import EPGP
from pygpr_tpu.models import kronecker, multifidelity, rff, statespace, tprocess, warped
from pygpr_tpu.models.multifidelity import MultiFidelityGP
from pygpr_tpu.models import heteroscedastic
from pygpr_tpu.models.heteroscedastic import HeteroscedasticGP
from pygpr_tpu.models.tprocess import TProcess
from pygpr_tpu.models.statespace import StateSpaceGP
from pygpr_tpu.models.kronecker import KroneckerGP
from pygpr_tpu.models.warped import WarpedGP
from pygpr_tpu.models.deepgp import DeepGP
from pygpr_tpu.models.derivative import DerivativeGP
from pygpr_tpu.models.gplvm import GPLVM
from pygpr_tpu.models.iterative import IterativeGP
from pygpr_tpu.models.ski import SKIGP
from pygpr_tpu.models.means import (
    ConstantMean,
    LinearMean,
    Mean,
    ZeroMean,
    fit_gp_mean,
    nlml_mean,
)
from pygpr_tpu.models import metrics, priors
from pygpr_tpu.models.priors import Gamma, HalfNormal, LogNormal, Uniform
from pygpr_tpu.models.metrics import loo_cv, loo_nlpd, nlpd, rmse
