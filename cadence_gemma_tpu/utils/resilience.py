"""Failure detection and recovery for long training runs.

The reference has none of this (SURVEY §5: no retries, no preemption
handling, params-only checkpoints saved after training ends,
``/root/reference/training/train.py:295-298``). TPU pods make it
table stakes: preemptible capacity gets SIGTERM'd, input pipelines hit
transient filesystem errors, and bf16 training can throw a non-finite step.

Three independent guards, composable with the train loop:

  * :class:`PreemptionHandler` — converts SIGTERM/SIGINT into a cooperative
    flag the loop polls; the loop saves a resumable train state
    (params + optimizer + step, ``checkpoint/io.py``) and exits cleanly,
    so a rescheduled job resumes with ``TrainingConfig.resume_from``.
  * :func:`with_retries` — bounded exponential-backoff retry for host-side
    IO (data loading, image decode, checkpoint writes).
  * :func:`skip_nonfinite_updates` — optax wrapper: a step whose gradients
    contain NaN/Inf applies a zero update instead of poisoning the params;
    after ``max_consecutive_errors`` such steps it stops masking (a real
    divergence should fail loudly, not silently stall).
"""

from __future__ import annotations

import functools
import signal
import threading
import time
from typing import Any, Callable, Iterable, Type

import optax


class PreemptionHandler:
  """Cooperative SIGTERM/SIGINT watcher.

  Use as a context manager around a training run; inside, ``triggered``
  flips to True when a shutdown signal arrives (instead of killing the
  process mid-step). Previously-installed handlers are restored on exit
  and chained on signal delivery, so nesting is safe.

  Also usable for tests and manual triggering via :meth:`trigger`.
  """

  def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
    self._signals = tuple(signals)
    self._event = threading.Event()
    self._previous: dict[int, Any] = {}

  @property
  def triggered(self) -> bool:
    return self._event.is_set()

  def trigger(self) -> None:
    self._event.set()

  def _handle(self, signum, frame) -> None:
    self._event.set()
    prev = self._previous.get(signum)
    if callable(prev):
      prev(signum, frame)

  def __enter__(self) -> "PreemptionHandler":
    for s in self._signals:
      self._previous[s] = signal.getsignal(s)
      signal.signal(s, self._handle)
    return self

  def __exit__(self, *exc) -> None:
    for s, prev in self._previous.items():
      signal.signal(s, prev)
    self._previous.clear()


def with_retries(
    fn: Callable | None = None,
    *,
    retries: int = 3,
    exceptions: tuple[Type[BaseException], ...] = (OSError, IOError),
    backoff_s: float = 0.1,
    on_retry: Callable[[int, BaseException], None] | None = None,
):
  """Retries ``fn`` up to ``retries`` extra times with exponential backoff.

  Usable as ``@with_retries`` / ``@with_retries(retries=5)`` or inline:
  ``with_retries(loader.load, retries=5)(path)``. The final failure
  re-raises the original exception.
  """

  def decorate(f):
    @functools.wraps(f)
    def wrapped(*args, **kwargs):
      for attempt in range(retries + 1):
        try:
          return f(*args, **kwargs)
        except exceptions as e:
          if attempt == retries:
            raise
          if on_retry is not None:
            on_retry(attempt, e)
          time.sleep(backoff_s * (2**attempt))

    return wrapped

  return decorate if fn is None else decorate(fn)


def skip_nonfinite_updates(
    optimizer: optax.GradientTransformation,
    max_consecutive_errors: int = 3,
) -> optax.GradientTransformation:
  """Zero-out update steps whose gradients are not finite.

  Thin, named wrapper over ``optax.apply_if_finite`` so the train loop's
  failure-handling reads as policy; ``nonfinite_count`` reports how many
  consecutive steps were skipped (for metric hooks).
  """
  return optax.apply_if_finite(optimizer, max_consecutive_errors)


def nonfinite_count(opt_state: Any) -> int:
  """Consecutive skipped steps inside an ``apply_if_finite`` state.

  Looks through wrapper states (e.g. ``optax.MultiSteps``'s
  ``inner_opt_state`` when gradient accumulation is on).
  """
  if hasattr(opt_state, "notfinite_count"):
    return int(opt_state.notfinite_count)
  if hasattr(opt_state, "inner_opt_state"):
    return nonfinite_count(opt_state.inner_opt_state)
  return 0
