"""get_or_solve must refuse a large on-device SS solve on TPU backends.

The full-size two-asset VFI crashed the axon TPU worker in rounds 3 AND 4
(the round-4 trigger: an edited value_fn changed the artifact hash, the
cache missed, and a measurement job silently fell into on-device VFI).
"""

import pytest

from hank_tpu.utils.checkpoint import _guard_on_device_ss_solve


class _Dim:
    def __init__(self, n):
        self.n = n


class _Model:
    name = "fake_big"

    def __init__(self, dims):
        self.heterogeneity = {f"d{i}": _Dim(n) for i, n in enumerate(dims)}


def test_guard_raises_on_tpu_for_big_states(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("HANK_TPU_ALLOW_DEVICE_SS", raising=False)
    with pytest.raises(RuntimeError, match="build_artifacts"):
        _guard_on_device_ss_solve(_Model((40, 20, 5, 2)))   # 8000 states
    # Small state spaces (test models, KS probes) stay allowed.
    _guard_on_device_ss_solve(_Model((40, 5)))
    # Explicit override allowed.
    monkeypatch.setenv("HANK_TPU_ALLOW_DEVICE_SS", "1")
    _guard_on_device_ss_solve(_Model((40, 20, 5, 2)))


def test_guard_noop_on_cpu():
    _guard_on_device_ss_solve(_Model((100, 100, 10)))
