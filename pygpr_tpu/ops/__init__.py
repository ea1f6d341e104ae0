from pygpr_tpu.ops import kernels, linalg
from pygpr_tpu.ops.kernels import (
    RBF,
    Kernel,
    Matern,
    Sum,
    WhiteNoise,
    kernel_and_grad,
    kernel_diag,
    kernel_matrix,
    sq_distance,
)
from pygpr_tpu.ops.linalg import (
    CholResult,
    add_diag,
    cholesky_solve,
    inv_from_chol,
    logdet_from_chol,
    safe_cholesky,
    tri_inverse_doubling,
    spd_solve,
)
