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
    grbcm_fit_sharded,
    grbcm_predict_sharded,
    mcmc_sharded,
)
