from hank_tpu.solvers.steady_state import SteadyState, find_ss, get_steady_states
from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian
from hank_tpu.solvers.newton import make_full_residual_fn, newton_raphson_hank

__all__ = [
    "SteadyState",
    "find_ss",
    "get_steady_states",
    "get_steady_state_jacobian",
    "make_full_residual_fn",
    "newton_raphson_hank",
]
