"""Fused residual-add + RMSNorm epilogue kernel (interpret mode on CPU).

Covers the VERDICT-r4 #8 decode-epilogue experiment: kernel-vs-composition
parity (fp32 exact-ish, bf16 bounded), ragged row counts, the custom-vjp
backward, and the flag-gated ``ResidualBlock(fused_epilogue=True)`` path
against the unfused block with identical params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import modules
from cadence_gemma_tpu.ops import fused_epilogue


def _inputs(key, shape, dtype):
  kx, kr, ks = jax.random.split(key, 3)
  x = jax.random.normal(kx, shape, jnp.float32).astype(dtype)
  r = jax.random.normal(kr, shape, jnp.float32).astype(dtype)
  s = 0.1 * jax.random.normal(ks, (shape[-1],), jnp.float32)
  return x, r, s


class TestKernelParity:

  @pytest.mark.parametrize("shape", [(1, 1, 2560), (3, 1, 256), (2, 7, 384)])
  def test_fp32_matches_reference(self, shape):
    x, r, s = _inputs(jax.random.PRNGKey(0), shape, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
      y, normed = fused_epilogue.fused_add_rmsnorm(x, r, s)
    y_ref, normed_ref = fused_epilogue.reference_add_rmsnorm(x, r, s)
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=0)
    np.testing.assert_allclose(normed, normed_ref, rtol=1e-6, atol=1e-6)

  def test_bf16_drift_bounded(self):
    x, r, s = _inputs(jax.random.PRNGKey(1), (2, 3, 512), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
      y, normed = fused_epilogue.fused_add_rmsnorm(x, r, s)
    y_ref, normed_ref = fused_epilogue.reference_add_rmsnorm(x, r, s)
    assert y.dtype == jnp.bfloat16 and normed.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        y.astype(jnp.float32), y_ref.astype(jnp.float32), rtol=0, atol=0
    )
    # Same fp32 accumulation on both sides; drift is bf16 output rounding.
    np.testing.assert_allclose(
        normed.astype(jnp.float32),
        normed_ref.astype(jnp.float32),
        rtol=2e-2,
        atol=2e-2,
    )

  def test_backward_matches_composition(self):
    x, r, s = _inputs(jax.random.PRNGKey(2), (2, 2, 256), jnp.float32)

    def loss_fused(x, r, s):
      with pltpu.force_tpu_interpret_mode():
        y, normed = fused_epilogue.fused_add_rmsnorm(x, r, s)
      return jnp.sum(jnp.sin(y)) + jnp.sum(normed**2)

    def loss_ref(x, r, s):
      y, normed = fused_epilogue.reference_add_rmsnorm(x, r, s)
      return jnp.sum(jnp.sin(y)) + jnp.sum(normed**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, r, s)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, r, s)
    for a, b in zip(g_fused, g_ref):
      np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestResidualBlockFlag:

  @pytest.mark.parametrize(
      "block_type",
      [common.TemporalBlockType.RECURRENT, common.TemporalBlockType.ATTENTION],
  )
  def test_fused_block_matches_unfused(self, block_type):
    kwargs = dict(
        width=256,
        mlp_expanded_width=512,
        num_heads=2,
        attention_window_size=8,
        temporal_block_type=block_type,
        lru_width=256,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    base = modules.ResidualBlock(**kwargs)
    fused = modules.ResidualBlock(fused_epilogue=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 256), jnp.float32)
    pos = jnp.tile(jnp.arange(8)[None], (2, 1))
    params = base.init(jax.random.PRNGKey(4), x, pos, return_cache=False)
    out_base, _ = base.apply(params, x, pos, return_cache=False)
    with pltpu.force_tpu_interpret_mode():
      out_fused, _ = fused.apply(params, x, pos, return_cache=False)
    np.testing.assert_allclose(out_fused, out_base, rtol=2e-5, atol=2e-5)
