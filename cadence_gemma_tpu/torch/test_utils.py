"""Cross-framework golden-parity harness.

Generalizes the reference's ``torch/test_utils.py:59-107``
(``numerically_compare_modules``): initialize the Flax module, convert its
parameters to a torch state dict via ``checkpoint/conversion.py``, load them
into the torch twin, then require both frameworks to agree on (a) a full
forward pass and (b) unrolled cache-decode steps. This is the bit-level
fidelity check between the TPU path and the torch pathway.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cadence_gemma_tpu.checkpoint import conversion


def flax_params_to_torch_module(params: Any, torch_module) -> None:
  """Loads converted flax params into a torch module (strict)."""
  state = conversion.flax_params_to_pytorch_state_dict({"params": params})
  state = {k.removeprefix("params."): v for k, v in state.items()}
  # flax's Embedder stores the table as `input_embedding`; identical name in
  # torch, nothing to remap.
  missing, unexpected = torch_module.load_state_dict(state, strict=False)
  assert not missing, f"missing keys: {missing}"
  assert not unexpected, f"unexpected keys: {unexpected}"


def to_torch(x) -> torch.Tensor:
  return torch.tensor(np.asarray(x))


def compare_forward_and_decode(
    *,
    flax_module,
    torch_module,
    flax_params: Any,
    x: jax.Array,
    segment_pos: jax.Array,
    flax_cache: Any = None,
    torch_cache: Any = None,
    atol: float = 1e-5,
    decode_steps: int = 2,
    cache_to_torch: Callable[[Any], Any] | None = None,
) -> None:
  """Asserts forward outputs and unrolled decode steps agree."""
  flax_params_to_torch_module(flax_params, torch_module)

  # Full forward.
  y_jax, cache_jax = flax_module.apply(
      {"params": flax_params}, x, segment_pos, flax_cache
  )
  with torch.no_grad():
    y_torch, cache_torch = torch_module(
        to_torch(x), to_torch(segment_pos), torch_cache
    )
  np.testing.assert_allclose(
      np.asarray(y_jax), y_torch.numpy(), atol=atol,
      err_msg="forward outputs diverge",
  )

  # Unrolled decode from the produced caches.
  t = x.shape[1]
  for step in range(decode_steps):
    x_step = x[:, step % t][:, None]
    pos_step = segment_pos[:, -1:] + step + 1
    y_jax, cache_jax = flax_module.apply(
        {"params": flax_params}, x_step, pos_step, cache_jax
    )
    with torch.no_grad():
      y_torch, cache_torch = torch_module(
          to_torch(x_step), to_torch(pos_step), cache_torch
      )
    np.testing.assert_allclose(
        np.asarray(y_jax), y_torch.numpy(), atol=atol,
        err_msg=f"decode step {step} diverges",
    )
