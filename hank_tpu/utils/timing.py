"""Structured timing / solver observability.

The reference's observability is `println` progress lines (SURVEY §5). Here:
a phase timer that blocks on device results for honest wall-clock numbers,
plus an iteration-record helper used by the solvers and bench harness.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


@contextlib.contextmanager
def phase(name: str, records: list[dict] | None = None, verbose: bool = True):
    """Time a phase, blocking on async dispatch at exit."""
    t0 = time.perf_counter()
    yield
    # Block so the measurement covers device execution, not just dispatch.
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[hank_tpu] {name}: {dt:.3f}s")
    if records is not None:
        records.append({"phase": name, "seconds": dt})


def block(tree: Any) -> Any:
    """Block until all arrays in a pytree are ready (for timing)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def timeit(fn, *args, warmup: int = 1, iters: int = 5) -> float:
    """Median wall-clock seconds of `fn(*args)` with compile warmup."""
    for _ in range(warmup):
        block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        block(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
