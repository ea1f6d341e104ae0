from pygpr_tpu.sample.designs import (
    Matern1,
    Sobol,
    Uniform,
    assign_clusters,
    cluster_samples,
    euclidean_dist,
    sample_gp,
)
from pygpr_tpu.sample.ess import (
    ESSResult,
    predictive_latent_mixture,
    sample_latent,
)
from pygpr_tpu.sample.nuts import (
    NUTSResult,
    run_nuts,
    sample_posterior_nuts,
)
from pygpr_tpu.sample.mcmc import (
    MCMCResult,
    effective_sample_size,
    log_posterior_fn,
    posterior_moments,
    predictive_mixture,
    sample_posterior,
    sample_posterior_hmc,
    split_rhat,
)
