"""Windowed flash-attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
import numpy as np
import pytest

from cadence_gemma_tpu.models import modules
from cadence_gemma_tpu.ops import pallas_attention as fa


def _inputs(b, t, n, h, seed=0, dtype=jnp.float32, docs=False):
  k = jax.random.PRNGKey(seed)
  q = jax.random.normal(k, (b, t, n, h), dtype)
  kk = jax.random.normal(jax.random.fold_in(k, 1), (b, t, 1, h), dtype)
  v = jax.random.normal(jax.random.fold_in(k, 2), (b, t, 1, h), dtype)
  if docs:
    starts = jax.random.bernoulli(jax.random.fold_in(k, 3), 0.05, (b, t))
    starts = starts.at[:, 0].set(True)
    idx = jnp.arange(t)[None]
    doc_start = jax.lax.cummax(jnp.where(starts, idx, 0), axis=1)
    seg = (idx - doc_start).astype(jnp.int32)  # within-doc positions
  else:
    seg = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1))
  return q, kk, v, seg


class TestFlashWindowAttention:

  @pytest.mark.parametrize(
      "t,window,docs",
      [(256, 64, False), (300, 128, True), (128, 512, False)],
  )
  def test_matches_einsum(self, t, window, docs):
    q, k, v, seg = _inputs(1, t, 2, 128, docs=docs)
    ref = fa._reference_attention(q, k, v, seg, window)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_window_attention(q, k, v, seg, window)
    np.testing.assert_allclose(out, ref, atol=2e-5)

  def test_bf16(self):
    q, k, v, seg = _inputs(1, 256, 2, 128, dtype=jnp.bfloat16)
    ref = fa._reference_attention(q, k, v, seg, 64)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_window_attention(q, k, v, seg, 64)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.04
    )

  def test_gradients_match_reference(self):
    q, k, v, seg = _inputs(1, 128, 2, 128)

    def loss_flash(q, k, v):
      with pltpu.force_tpu_interpret_mode():
        out = fa.flash_window_attention(q, k, v, seg, 64)
      return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
      out = fa._reference_attention(q, k, v, seg, 64)
      return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
      np.testing.assert_allclose(a, b, atol=2e-5)

  def test_attention_block_flash_path_matches_einsum(self):
    """The module's flash path == its einsum path on the same params."""
    b, t, width, window = 1, 256, 8, 64
    block_einsum = modules.LocalAttentionBlock(
        width=width, num_heads=2, window_size=window,
        use_flash_attention=False, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    block_flash = modules.LocalAttentionBlock(
        width=width, num_heads=2, window_size=window,
        use_flash_attention=True, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, width))
    pos = jnp.tile(jnp.arange(t)[None], (b, 1))
    params = block_einsum.init(jax.random.PRNGKey(1), x, pos)
    y_e, cache_e = block_einsum.apply(params, x, pos)
    with pltpu.force_tpu_interpret_mode():
      y_f, cache_f = block_flash.apply(params, x, pos)
    np.testing.assert_allclose(y_f, y_e, atol=1e-4)
    np.testing.assert_allclose(cache_f.keys, cache_e.keys, atol=1e-6)

  def test_auto_dispatch_off_when_window_covers(self):
    assert not modules._should_use_flash_attention(128, 2048, None)
    assert modules._should_use_flash_attention(4096, 2048, True)
    assert not modules._should_use_flash_attention(4096, 2048, False)
