from hank_tpu.blocks.assemble import (
    assemble_full_xmat,
    residuals,
    shift_lag,
    shift_lead,
)
from hank_tpu.blocks.backward import backward_iteration
from hank_tpu.blocks.forward import forward_iteration

__all__ = [
    "assemble_full_xmat",
    "backward_iteration",
    "forward_iteration",
    "residuals",
    "shift_lag",
    "shift_lead",
]
