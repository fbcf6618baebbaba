"""Layer tests: shapes, golden values, cache contracts.

Mirrors the reference's layer test strategy (``jax/layers_test.py:44-109``):
tiny configs, exact shape checks, RMSNorm golden values, and decode-cache
equivalence for Conv1D and RGLRU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import layers


class TestRMSNorm:

  def test_golden(self):
    # With zero-initialized scale, output = x / sqrt(mean(x^2) + eps).
    x = jnp.array([[[1.0, 2.0, 3.0, 4.0]]])
    norm = layers.RMSNorm(width=4)
    params = norm.init(jax.random.PRNGKey(0), x)
    out = norm.apply(params, x)
    expected = x / np.sqrt(np.mean(np.square(x)) + 1e-6)
    np.testing.assert_allclose(out, expected, rtol=1e-6)

  def test_scale_plus_one(self):
    x = jnp.ones((1, 2, 4))
    norm = layers.RMSNorm(width=4)
    params = {"params": {"scale": jnp.full((4,), 0.5)}}
    out = norm.apply(params, x)
    base = x / np.sqrt(1.0 + 1e-6)
    np.testing.assert_allclose(out, base * 1.5, rtol=1e-6)


class TestBlockDiagonalLinear:

  def test_matches_dense_blocks(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8))
    layer = layers.BlockDiagonalLinear(width=8, num_blocks=2)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    w = params["params"]["w"]
    b = params["params"]["b"]
    expected = np.concatenate(
        [x[..., :4] @ w[0] + b[0], x[..., 4:] @ w[1] + b[1]], axis=-1
    )
    np.testing.assert_allclose(out, expected, atol=1e-5)


class TestSqrtBoundDerivative:

  def test_forward_is_sqrt(self):
    x = jnp.array([0.0, 1.0, 4.0])
    np.testing.assert_allclose(
        layers.sqrt_bound_derivative(x, 1000), jnp.sqrt(x)
    )

  def test_gradient_clipped(self):
    g = jax.grad(lambda v: layers.sqrt_bound_derivative(v, 1000.0))(0.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, 1000.0, rtol=1e-5)
    # Away from zero the clip must not bite.
    g4 = jax.grad(lambda v: layers.sqrt_bound_derivative(v, 1000.0))(4.0)
    np.testing.assert_allclose(g4, 0.25, rtol=1e-5)


class TestRnnParamInit:

  def test_radius_in_ring(self):
    init = layers.rnn_param_init(min_rad=0.9, max_rad=0.999)
    lam = init(jax.random.PRNGKey(0), (1000,))
    a = np.exp(-np.logaddexp(0, -lam) * 0 - jax.nn.softplus(lam))
    assert (a > 0.89).all() and (a < 0.9995).all()


class TestRGLRU:

  @pytest.mark.parametrize("seq_len", [1, 8])
  def test_shapes_and_state_dtype(self, seq_len):
    b, w = 2, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, seq_len, w))
    pos = jnp.tile(jnp.arange(seq_len)[None], (b, 1))
    layer = layers.RGLRU(
        width=w, num_heads=2, scan_type=common.ScanType.LINEAR_NATIVE
    )
    params = layer.init(jax.random.PRNGKey(1), x, pos)
    cache = layers.RGLRU.init_cache(b, w)
    y, new_state = layer.apply(params, x, pos, cache)
    assert y.shape == (b, seq_len, w)
    assert new_state.shape == (b, w)
    assert new_state.dtype == jnp.float32

  def test_prefill_equals_stepwise(self):
    """The cache invariant: full forward == token-by-token decode."""
    b, t, w = 1, 6, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, w))
    pos = jnp.arange(t)[None]
    layer = layers.RGLRU(
        width=w, num_heads=2, scan_type=common.ScanType.LINEAR_NATIVE
    )
    params = layer.init(jax.random.PRNGKey(1), x, pos)
    y_full, _ = layer.apply(params, x, pos, layers.RGLRU.init_cache(b, w))
    state = layers.RGLRU.init_cache(b, w)
    for i in range(t):
      y_i, state = layer.apply(params, x[:, i:i+1], pos[:, i:i+1], state)
      np.testing.assert_allclose(y_full[:, i], y_i[:, 0], atol=1e-5)

  def test_reset_at_document_start(self):
    b, t, w = 1, 4, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, w))
    layer = layers.RGLRU(
        width=w, num_heads=2, scan_type=common.ScanType.LINEAR_NATIVE
    )
    pos_two_docs = jnp.array([[0, 1, 0, 1]])
    params = layer.init(jax.random.PRNGKey(1), x, pos_two_docs)
    y, _ = layer.apply(params, x, pos_two_docs)
    # The second document's outputs must equal running it standalone.
    y2, _ = layer.apply(params, x[:, 2:], jnp.array([[0, 1]]))
    np.testing.assert_allclose(y[:, 2:], y2, atol=1e-5)


class TestConv1D:

  def test_prefill_equals_stepwise(self):
    b, t, w = 2, 7, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, w))
    pos = jnp.tile(jnp.arange(t)[None], (b, 1))
    layer = layers.Conv1D(width=w, temporal_width=4)
    params = layer.init(jax.random.PRNGKey(1), x, pos)
    y_full, _ = layer.apply(params, x, pos)
    state = layers.Conv1D.init_cache(b, w, x.dtype, 4)
    for i in range(t):
      y_i, state = layer.apply(params, x[:, i:i+1], pos[:, i:i+1], state)
      np.testing.assert_allclose(y_full[:, i], y_i[:, 0], atol=1e-5)

  def test_document_mask_blocks_lookback(self):
    b, t, w = 1, 6, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, w))
    layer = layers.Conv1D(width=w, temporal_width=4)
    pos = jnp.array([[0, 1, 2, 0, 1, 2]])
    params = layer.init(jax.random.PRNGKey(1), x, pos)
    y, _ = layer.apply(params, x, pos)
    y2, _ = layer.apply(params, x[:, 3:], jnp.array([[0, 1, 2]]))
    np.testing.assert_allclose(y[:, 3:], y2, atol=1e-5)

  def test_short_sequence(self):
    # Sequence shorter than temporal width exercises the "valid" clamp.
    b, t, w = 1, 2, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, w))
    pos = jnp.arange(t)[None]
    layer = layers.Conv1D(width=w, temporal_width=4)
    params = layer.init(jax.random.PRNGKey(1), x, pos)
    y, cache = layer.apply(params, x, pos)
    assert y.shape == (b, t, w)
    assert cache.shape == (b, 3, w)


class TestEinsum:

  def test_shape_and_value(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4))
    layer = layers.Einsum(
        w_shape=(2, 4, 6), b_shape=(2, 1, 1, 6), eqn="...td,cdD->c...tD"
    )
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (2, 2, 3, 6)
    w, b = params["params"]["w"], params["params"]["b"]
    np.testing.assert_allclose(
        out, jnp.einsum("...td,cdD->c...tD", x, w) + b, atol=1e-5
    )
