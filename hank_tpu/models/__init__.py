"""Built-in model families.

Each model is a (YAML spec, Python function file) pair — the same two-file
user surface as the reference (`KrusellSmith.yaml` + `KrusellSmith.jl`).
`load_model(name)` builds the SequenceModel for a shipped model.
"""

from __future__ import annotations

import os

from hank_tpu.model.parser import build_model_from_yaml

_HERE = os.path.dirname(os.path.abspath(__file__))

SHIPPED = {
    "krusell_smith": "krusell_smith.yaml",
    "ks_large_grid": "ks_large_grid.yaml",
    "hank_one_asset": "hank_one_asset.yaml",
    "hank_two_asset": "hank_two_asset.yaml",
}


def model_path(name: str) -> str:
    if name not in SHIPPED:
        raise KeyError(f"Unknown shipped model '{name}'. Available: {sorted(SHIPPED)}")
    return os.path.join(_HERE, SHIPPED[name])


def load_model(name: str, params=None, **overrides):
    """Build a shipped model; `overrides` patch CompSpec fields (e.g. T=50);
    `params` patches model parameters (e.g. params={"portfolio_reg": 0.0}
    for the unregularized two-asset split — A/B probes and the χ=0 limit).
    Parameters are part of the artifact-cache model hash, so patched models
    solve their own steady states."""
    import dataclasses

    model = build_model_from_yaml(model_path(name))
    if params:
        unknown = set(params) - set(model.params)
        if unknown:
            raise KeyError(f"Unknown parameter override(s) {sorted(unknown)} "
                           f"for model '{name}'; available: "
                           f"{sorted(model.params)}")
        merged = dict(model.params)
        merged.update({k: float(v) for k, v in params.items()})
        model = dataclasses.replace(model, params=merged)
    if overrides:
        model = dataclasses.replace(
            model, compspec=dataclasses.replace(model.compspec, **overrides))
    return model
