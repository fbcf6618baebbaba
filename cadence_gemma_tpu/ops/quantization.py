"""Weight-only int8 quantization for serving.

Decode of a 2B model on one chip is weight-bandwidth-bound (every step
streams all matmul weights from HBM); storing them as int8 with per-output-
channel scales halves the traffic and nearly doubles decode tokens/sec at
negligible quality cost. XLA fuses the dequantization multiply into the
matmul's operand read, so int8 is what actually crosses HBM.

This is a capability the reference does not have (its serving path is pure
bf16). Usage:

    qparams = quantize_params(params)
    model = Griffin(config, quantized=True)
    sampler = Sampler(model, vocab, qparams)

Quantized tensors are stored as a ``{"q": int8, "scale": f32}`` subtree in
place of the original parameter leaf; everything not worth quantizing
(biases, norms, conv/gate tensors, the RG-LRU Λ) stays bf16/f32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# Scales live on every non-contracted ("output") axis so the dequant is a
# broadcastable multiply; _contract_axes below is the single source of truth
# for what gets quantized and along which axes.
# Einsum weights are quantized when the *parent* module matches:
# ffw_up w (2, d, D) and vl_connector ffw_up w (1, vis, D) contract axis 1.
_EINSUM_PARENTS = ("ffw_up",)
# BlockDiagonalLinear gate weights (h, i, j) contract axis 1.
_BLOCKDIAG_PARENTS = ("input_gate", "a_gate")


def _contract_axes(path: tuple[str, ...], value: Any) -> tuple[int, ...] | None:
  name = path[-1]
  parent = path[-2] if len(path) > 1 else ""
  if name == "kernel" and value.ndim == 2:
    return (0,)
  if name == "input_embedding":
    return (1,)
  if name == "w" and parent in _EINSUM_PARENTS and value.ndim == 3:
    return (1,)
  if name == "w" and parent in _BLOCKDIAG_PARENTS and value.ndim == 3:
    return (1,)
  return None


def quantize_tensor(
    w: jax.Array, contract_axes: tuple[int, ...]
) -> tuple[jax.Array, jax.Array]:
  """Symmetric per-output-channel int8 quantization → (q, scale)."""
  w32 = w.astype(jnp.float32)
  absmax = jnp.max(jnp.abs(w32), axis=contract_axes, keepdims=True)
  scale = jnp.maximum(absmax / 127.0, 1e-12)
  q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
  return q, jnp.squeeze(scale, axis=contract_axes)


def dequantize_tensor(
    q: jax.Array,
    scale: jax.Array,
    contract_axes: tuple[int, ...],
    dtype=jnp.bfloat16,
) -> jax.Array:
  """int8 → ``dtype`` weights; XLA fuses this into the consuming matmul."""
  shape = list(q.shape)
  for ax in contract_axes:
    shape[ax] = 1
  # Re-insert the squeezed contraction axes for broadcasting.
  scale = scale.reshape(shape)
  return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_activations(x: jax.Array) -> tuple[jax.Array, jax.Array]:
  """Dynamic symmetric per-row int8 activation quantization.

  Returns ``(q, scale)`` with ``q`` int8 of ``x``'s shape and ``scale``
  float32 of shape ``x.shape[:-1] + (1,)`` such that ``q * scale ≈ x``.
  Used by ``act_quant`` layers to feed the MXU's native int8 path; the
  absmax/round pass is pure VPU work that XLA fuses with the producer.
  """
  x32 = x.astype(jnp.float32)
  absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
  scale = jnp.maximum(absmax, 1e-12) / 127.0
  q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
  return q, scale


def quantize_params(params: Any) -> Any:
  """Quantizes all heavy matmul weights of a Griffin parameter tree.

  Each eligible array leaf ``name`` is replaced by two sibling leaves
  ``name_q`` (int8) and ``name_scale`` (float32) — the layout the
  ``quantized=True`` model variants declare.
  """

  def visit(tree, path=()):
    if not isinstance(tree, dict):
      return tree
    out = {}
    for key, value in tree.items():
      sub_path = path + (key,)
      if isinstance(value, dict):
        out[key] = visit(value, sub_path)
      else:
        axes = _contract_axes(sub_path, value)
        if axes is None:
          out[key] = value
        else:
          q, scale = quantize_tensor(value, axes)
          out[key + "_q"] = q
          out[key + "_scale"] = scale
    return out

  return visit(params)


def quantized_bytes(params: Any) -> int:
  """Total parameter bytes after quantization (for roofline estimates)."""
  total = 0
  for leaf in jax.tree_util.tree_leaves(params):
    total += leaf.size * leaf.dtype.itemsize
  return total
