"""Fused residual-add + RMSNorm Pallas epilogue for the decode step.

The r3 decode-roofline breakdown (BASELINE.md §Decode-roofline) attributed
the remaining ~12% gap to the weight-stream floor to per-block fusion
boundaries: between every temporal block and its MLP, XLA materializes
``x + residual`` to HBM/VMEM, then a second fusion re-reads it for the
RMSNorm (mean-of-squares reduction, rsqrt, ``*(scale+1)``). This kernel
computes both in one pass —

    y      = x + residual                 (new residual, input dtype)
    normed = y * rsqrt(mean_f32(y^2) + eps) * (scale + 1)

— emitting both outputs from a single VMEM-resident read of ``x`` and
``residual``. It exists for the A/B experiment prescribed by VERDICT r4
Next #8: ``ResidualBlock(fused_epilogue=True)`` swaps it in between the
temporal block and the channel pre-norm, and the decode ablation loop
(``benchmarks/multimodal_bench.py::bench_decode_roofline``) measures the
delta. The flag is OFF by default; whichever way the measurement lands is
recorded in BASELINE.md.

Deliberate numerics deviation (documented per CLAUDE.md style): the
mean-of-squares accumulates in float32 even for bfloat16 activations,
where the unfused module path (``layers.RMSNorm`` matching the reference's
``recurrentgemma/jax/layers.py`` RMSNorm semantics) reduces in the promoted
activation dtype. fp32 accumulation is strictly more accurate; the parity
test bounds the drift at bf16 resolution.

The backward pass recomputes through the pure-XLA composition (two cheap
elementwise ops), so ``fused_epilogue=True`` is safe under ``jax.grad`` —
though its purpose is the inference step, where there is no backward.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

_ROW_BLOCK = 8  # one sublane tile of rows per grid cell


def reference_add_rmsnorm(
    x: jax.Array, residual: jax.Array, scale: jax.Array, eps: float = 1e-6
) -> tuple[jax.Array, jax.Array]:
  """Unfused composition with the kernel's fp32-accumulation semantics."""
  y = x + residual
  yf = y.astype(jnp.float32)
  var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True)
  normed = yf * jax.lax.rsqrt(var + eps)
  normed = normed * (scale.astype(jnp.float32) + 1.0)
  return y, normed.astype(x.dtype)


def _kernel(x_ref, res_ref, scale_ref, y_ref, out_ref, *, eps: float,
            width: int):
  y = x_ref[...] + res_ref[...]
  y_ref[...] = y
  yf = y.astype(jnp.float32)
  # Row padding (when rows % _ROW_BLOCK != 0) only ever adds extra rows;
  # the reduction is per-row, so pad rows cannot pollute real ones.
  var = jnp.sum(yf * yf, axis=-1, keepdims=True) * (1.0 / width)
  normed = yf * jax.lax.rsqrt(var + eps)
  normed = normed * (scale_ref[...].astype(jnp.float32) + 1.0)
  out_ref[...] = normed.astype(out_ref.dtype)


def _pallas_add_rmsnorm(x, residual, scale, eps):
  orig_shape = x.shape
  width = orig_shape[-1]
  rows = 1
  for d in orig_shape[:-1]:
    rows *= d
  x2 = x.reshape(rows, width)
  r2 = residual.reshape(rows, width)
  s2 = scale.reshape(1, width)
  grid = (pl.cdiv(rows, _ROW_BLOCK),)
  y, normed = pl.pallas_call(
      functools.partial(_kernel, eps=eps, width=width),
      grid=grid,
      in_specs=[
          pl.BlockSpec((_ROW_BLOCK, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((_ROW_BLOCK, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, width), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((_ROW_BLOCK, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((_ROW_BLOCK, width), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((rows, width), x.dtype),
          jax.ShapeDtypeStruct((rows, width), x.dtype),
      ],
  )(x2, r2, s2)
  return y.reshape(orig_shape), normed.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_add_rmsnorm(x, residual, scale, eps=1e-6):
  """``(x + residual, rmsnorm(x + residual) * (scale + 1))`` in one kernel.

  Args:
    x: ``[..., width]`` activations (any float dtype; bf16 in production).
    residual: same shape/dtype as ``x``.
    scale: ``[width]`` RMSNorm gain (the module's ``scale`` param; the
      kernel applies the reference's ``+ 1`` internally).
    eps: variance epsilon (static).

  Returns:
    ``(y, normed)`` — the new residual stream and the normed MLP input,
    both in ``x.dtype``.
  """
  return _pallas_add_rmsnorm(x, residual, scale, eps)


def _fwd(x, residual, scale, eps):
  out = _pallas_add_rmsnorm(x, residual, scale, eps)
  return out, (x, residual, scale)


def _bwd(eps, saved, cotangents):
  x, residual, scale = saved
  _, vjp = jax.vjp(
      lambda a, b, s: reference_add_rmsnorm(a, b, s, eps), x, residual, scale
  )
  return vjp(cotangents)


fused_add_rmsnorm.defvjp(_fwd, _bwd)
