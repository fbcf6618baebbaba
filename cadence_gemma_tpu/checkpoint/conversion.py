"""Flax ↔ PyTorch state-dict conversion for Griffin checkpoints.

API-compatible with the reference (``/root/reference/recurrentgemma/
conversion.py:26-127``): flatten/rename (``kernel`` ↔ ``weight``),
transpose 2-D Linear weights (conv1d excluded), round-trip bfloat16 through
float32 (numpy has no bf16), rebuild the nested flax tree.

Extends the reference by accepting the ``vl_connector`` top-level key in
addition to ``blocks`` / ``embedder`` / ``final_norm``.

Torch is imported lazily so the library works without it installed.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

_FLAX_TOP_KEYS = ("blocks", "embedder", "final_norm", "vl_connector")


def jax_array_to_torch_tensor(x: jax.Array):
  """JAX array → torch tensor (bf16 via an fp32 intermediate)."""
  import torch  # pytype: disable=import-error

  if x.dtype == jnp.bfloat16:
    return torch.tensor(
        np.asarray(x.astype(jnp.float32)), dtype=torch.bfloat16
    )
  return torch.tensor(np.asarray(x), dtype=getattr(torch, str(x.dtype)))


def torch_tensor_to_jax_array(x) -> jax.Array:
  """Torch tensor → JAX array (bf16 via an fp32 intermediate)."""
  import torch  # pytype: disable=import-error

  if x.dtype == torch.bfloat16:
    return jnp.asarray(x.float().numpy(), dtype=jnp.bfloat16)
  return jnp.asarray(x.numpy(), dtype=str(x.dtype).split(".")[1])


def flatten_nested_dict(
    nested: Mapping[str, Any], prefix: str = ""
) -> dict[str, Any]:
  flat: dict[str, Any] = {}
  for key, value in nested.items():
    full = prefix + key
    if isinstance(value, Mapping):
      flat.update(flatten_nested_dict(value, full + "."))
    else:
      flat[full] = value
  return flat


def _is_linear_weight(key: str, ndim: int) -> bool:
  return key.endswith(("weight", "kernel")) and ndim == 2 and (
      "conv1d" not in key
  )


def flax_params_to_pytorch_state_dict(
    params: Mapping[str, Any],
) -> Mapping[str, Any]:
  """Nested flax params → flat torch state dict (transposed Linears)."""
  state = {}
  for key, value in flatten_nested_dict(params).items():
    key = key.replace("kernel", "weight")
    tensor = jax_array_to_torch_tensor(value)
    if _is_linear_weight(key, tensor.ndim):
      tensor = tensor.T
    state[key] = tensor
  return state


def pytorch_state_dict_to_flax_params(
    state_dict: Mapping[str, Any],
) -> Mapping[str, Any]:
  """Flat torch state dict → nested flax params tree.

  Keys are expected as ``params.<top>.<...>`` with ``<top>`` one of
  ``blocks`` (then a layer index), ``embedder``, ``final_norm``, or
  ``vl_connector``; ``blocks.<i>`` becomes a single ``blocks.i`` key to
  match the flax module names.
  """
  flax_params: dict[str, Any] = {"params": {}}

  for key, value in state_dict.items():
    key = key.replace("weight", "kernel")
    array = torch_tensor_to_jax_array(value)
    if _is_linear_weight(key, array.ndim):
      array = array.T

    path = key.split(".")
    assert path[0] == "params" and path[1] in _FLAX_TOP_KEYS, key
    current = flax_params[path[0]]
    if path[1] == "blocks":
      next_key = f"{path[1]}.{path[2]}"
      rest = path[3:]
    else:
      next_key = path[1]
      rest = path[2:]

    for part in rest:
      current = current.setdefault(next_key, {})
      next_key = part
    current[next_key] = array

  return flax_params
