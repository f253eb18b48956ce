from hank_tpu.model.structures import (
    CompSpec,
    HeterogeneityDimension,
    SequenceModel,
    SteadyStateSpec,
    Variable,
)
from hank_tpu.model.parser import build_model_from_yaml, compile_residuals, detect_max_lag_lead
from hank_tpu.model import grids

__all__ = [
    "CompSpec",
    "HeterogeneityDimension",
    "SequenceModel",
    "SteadyStateSpec",
    "Variable",
    "build_model_from_yaml",
    "compile_residuals",
    "detect_max_lag_lead",
    "grids",
]
