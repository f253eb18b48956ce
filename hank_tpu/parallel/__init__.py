from hank_tpu.parallel.mesh import make_mesh, ensemble_sharding, replicated_sharding
from hank_tpu.parallel.ensemble import solve_ensemble, residual_ensemble

__all__ = [
    "ensemble_sharding",
    "make_mesh",
    "replicated_sharding",
    "residual_ensemble",
    "solve_ensemble",
]
