from pygpr_tpu.optimize.classic import (
    CG,
    BFGSQuad,
    CGQuad,
    NelderMead,
    Opt,
    hessian,
)
from pygpr_tpu.optimize.lbfgs import FitResult, fit_map, fit_mle, minimize_lbfgs
from pygpr_tpu.optimize.step_size import get_learn_rate, learn_rate
from pygpr_tpu.optimize.resumable import fit_mle_resumable
from pygpr_tpu.optimize.bayesopt import (
    BayesOpt,
    expected_improvement,
    log_expected_improvement,
    lower_confidence_bound,
    probability_of_improvement,
    propose,
    propose_batch,
    thompson_sample,
)
