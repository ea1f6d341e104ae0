from pygpr_tpu.parallel.mesh import (
    CHAIN_AXIS,
    EXPERT_AXIS,
    expert_sharding,
    is_coordinator,
    make_mesh,
    multihost_init,
    replicated,
)
from pygpr_tpu.parallel.sharded import (
    committee_predict_sharded,
    grbcm_fit_sharded,
    grbcm_predict_sharded,
    mcmc_sharded,
)
from pygpr_tpu.parallel.data_parallel import (
    sgpr_fit_dp,
    sgpr_neg_elbo_dp,
    sgpr_predict_dp,
    svgp_fit_dp,
)
from pygpr_tpu.parallel.iterative_dp import (
    fit_dp as iterative_fit_dp,
    make_matvec_dp,
    nlml_value_and_grad_dp,
)
from pygpr_tpu.parallel.dist_cholesky import (
    dist_cholesky,
    dist_cholesky_solve,
    dist_gram,
    dist_nlml,
)
from pygpr_tpu.parallel.ski_dp import compute_stats_dp
from pygpr_tpu.parallel.statespace_dp import fit_ss_dp, nlml_ss_dp
