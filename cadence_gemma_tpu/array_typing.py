"""Runtime array shape/type checking and shape-grammar aliases.

TPU-native counterpart of reference ``recurrentgemma/jax/array_typing.py``.
Every public model entry point is wrapped in :func:`typed`, giving
jaxtyping-grammar runtime validation of shapes and dtypes — the framework's
first line of defense against silent broadcasting bugs (the reference has no
sanitizers; this is its closest analogue, see SURVEY §5).

Checking adds Python-level overhead at *trace* time only (inside ``jit`` the
decorator runs once per compilation), so it is enabled by default. Set the
environment variable ``CADENCE_GEMMA_DISABLE_TYPED=1`` to turn it into a
no-op (e.g. for microbenchmarking trace time).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Mapping, TypeVar

import jax
import jaxtyping as jt

F = TypeVar("F", bound=Callable[..., Any])

# dtype annotation used in module attribute declarations.
dtype = Any

_DISABLED = os.environ.get("CADENCE_GEMMA_DISABLE_TYPED", "0") == "1"


def typed(fn: F) -> F:
  """Wraps ``fn`` with jaxtyping's runtime shape/dtype checker."""
  if _DISABLED:
    return fn
  try:
    from typeguard import typechecked  # pytype: disable=import-error
  except ImportError:  # pragma: no cover - typeguard is a baked-in dep.
    return fn
  return functools.wraps(fn)(jt.jaxtyped(fn, typechecker=typechecked))


# ---------------------------------------------------------------------------
# Shape grammar aliases. `*b` = optional leading batch axes, `t` = time,
# `d`/`e` = model/expanded width, `v` = vocab, `n` = heads, `h` = head dim,
# `s` = key/cache time, `w` = window, `p` = vision patches, `i` = vision width.
# ---------------------------------------------------------------------------

# Token / position arrays.
Tokens = jt.Integer[jt.Array, "*b t"]
SegmentPos = jt.Integer[jt.Array, "*b t"]
NumTokens = jt.Integer[jt.Array, "*b"]

# Activations.
Activations = jt.Shaped[jt.Array, "*b t d"]
ExpandedActivations = jt.Shaped[jt.Array, "*b t e"]
# Output time axis ("ot") binds independently of the input time axis: when an
# image is spliced into the prompt the logits cover more positions than the
# token inputs.
TokenLogits = jt.Float[jt.Array, "*b ot v"]

# Attention.
Queries = jt.Shaped[jt.Array, "*b t n h"]
Keys = jt.Shaped[jt.Array, "*b t 1 h"]
Values = jt.Shaped[jt.Array, "*b t 1 h"]
CachedKeys = jt.Shaped[jt.Array, "*b w 1 h"]
CachedValues = jt.Shaped[jt.Array, "*b w 1 h"]
AttentionMask = jt.Bool[jt.Array, "*b t s"]
QuerySegmentIds = jt.Integer[jt.Array, "*b t"]
KeySegmentIds = jt.Integer[jt.Array, "*b t"]

# Recurrent state. The state width ("sd") binds independently of the
# activation width ("d"): Griffin configs may use lru_width != width
# (e.g. the 7B presets: width 4096, lru_width 5632).
RNNState = jt.Shaped[jt.Array, "*b sd"]
Conv1DState = jt.Shaped[jt.Array, "*b tw sd"]
# Pending conv material for speculative decoding: [old tail | chunk inputs],
# a fresh symbolic length so it can coexist with a bound tw/t in one call.
Conv1DPending = jt.Shaped[jt.Array, "*b twt sd"]
# Pending RG-LRU material: per-step fp32 carries [b, t, d].
RNNStatePending = jt.Shaped[jt.Array, "*b t sd"]
RNNDiagonal = jt.Shaped[jt.Array, "sd"]

# Vision.
Image = jt.Shaped[jt.Array, "*b p i"]
ImagePixels = jt.Shaped[jt.Array, "*b c hh ww"]

# Parameter trees.
Params = Mapping[str, Any]

del jax
