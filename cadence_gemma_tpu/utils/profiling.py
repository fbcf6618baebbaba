"""First-class profiling: phase timers and jax.profiler traces.

The reference's observability is ad-hoc (a ``memory_profiler`` import and a
binary ``val.prof`` artifact, SURVEY §5); here per-phase wall timing
(preprocess / prefill / decode) and on-demand XLA traces are library
features, since the headline metrics are decode tokens/sec/chip and p50
TTFT.

On remote-queue backends ``jax.block_until_ready`` may not synchronize;
:func:`sync` forces completion through a host fetch of a scalar, which is
the only reliable barrier there.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree: Any) -> None:
  """Blocks until every array in ``tree`` is computed (host-fetch barrier)."""
  for leaf in jax.tree_util.tree_leaves(tree):
    if hasattr(leaf, "dtype"):
      np.asarray(jax.device_get(jnp.sum(leaf)))


class PhaseTimer:
  """Accumulates wall times per named phase; reports p50/p90/mean."""

  def __init__(self):
    self._times: dict[str, list[float]] = {}

  @contextlib.contextmanager
  def phase(self, name: str, result_tree: Any = None) -> Iterator[None]:
    """Times a block; pass the block's outputs via ``observe`` for sync."""
    t0 = time.perf_counter()
    yield
    self._times.setdefault(name, []).append(time.perf_counter() - t0)

  def time_fn(
      self, name: str, fn: Callable[..., Any], *args, **kwargs
  ) -> Any:
    """Runs ``fn``, synchronizes on its outputs, records the wall time."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    sync(out)
    self._times.setdefault(name, []).append(time.perf_counter() - t0)
    return out

  def summary(self) -> dict[str, dict[str, float]]:
    out = {}
    for name, times in self._times.items():
      s = sorted(times)
      out[name] = {
          "n": len(s),
          "mean_ms": 1e3 * statistics.mean(s),
          "p50_ms": 1e3 * s[len(s) // 2],
          "p90_ms": 1e3 * s[min(len(s) - 1, int(0.9 * len(s)))],
          "total_s": sum(s),
      }
    return out

  def report(self) -> str:
    lines = []
    for name, stats in self.summary().items():
      lines.append(
          f"{name:>12}: n={stats['n']:<4} p50={stats['p50_ms']:8.2f}ms "
          f"p90={stats['p90_ms']:8.2f}ms mean={stats['mean_ms']:8.2f}ms"
      )
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
  """Captures a jax.profiler trace (viewable in XProf/TensorBoard)."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def device_memory_stats() -> dict[str, int]:
  """Best-effort live/peak device memory from the backend."""
  try:
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", -1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
        "bytes_limit": stats.get("bytes_limit", -1),
    }
  except Exception:  # Backend may not expose memory stats.
    return {}
