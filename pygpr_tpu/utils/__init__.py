from pygpr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from pygpr_tpu.utils.trace import OptTrace
