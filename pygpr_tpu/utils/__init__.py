from pygpr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from pygpr_tpu.utils.trace import OptTrace
from pygpr_tpu.utils.diagnostics import (
    check_state,
    checkify_nlml,
    expert_mask,
    summarize,
)
from pygpr_tpu.utils.profiling import annotate, trace
