"""Module tests: attention cache semantics, blocks, embedder, VL connector.

Mirrors reference ``jax/modules_test.py:26-160`` (output shapes for
seq_len ∈ {1, 8}, cache-write correctness) and adds chunked-prefill coverage
the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import modules


def _attn(width=8, heads=2, window=4, dtype=jnp.float32):
  return modules.LocalAttentionBlock(
      width=width, num_heads=heads, window_size=window, dtype=dtype
  )


class TestRoPE:

  def test_zero_position_is_identity(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 8))
    out = modules.apply_rope(x, jnp.zeros((1, 1), jnp.int32))
    np.testing.assert_allclose(out, x, atol=1e-6)

  def test_second_half_passthrough(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 2, 8))
    out = modules.apply_rope(x, jnp.arange(3)[None])
    np.testing.assert_allclose(out[..., 4:], x[..., 4:], atol=1e-6)

  def test_rotation_preserves_norm(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 2, 8))
    out = modules.apply_rope(x, jnp.arange(5)[None])
    np.testing.assert_allclose(
        jnp.linalg.norm(out[..., :4], axis=-1),
        jnp.linalg.norm(x[..., :4], axis=-1),
        rtol=1e-5,
    )


class TestLocalAttention:

  @pytest.mark.parametrize("seq_len", [1, 8])
  def test_output_and_cache_shapes(self, seq_len):
    b, width, window = 2, 8, 4
    block = _attn(window=window)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, seq_len, width))
    pos = jnp.tile(jnp.arange(seq_len)[None], (b, 1))
    params = block.init(jax.random.PRNGKey(1), x, pos)
    cache = modules.LocalAttentionBlock.init_cache(b, window, 4, x.dtype)
    out, new_cache = block.apply(params, x, pos, cache)
    assert out.shape == (b, seq_len, width)
    assert new_cache.keys.shape == (b, window, 1, 4)
    assert (new_cache.num_tokens == seq_len).all()

  def test_prefill_equals_stepwise(self):
    b, t, width, window = 1, 8, 8, 4
    block = _attn(window=window)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, width))
    pos = jnp.arange(t)[None]
    params = block.init(jax.random.PRNGKey(1), x, pos)
    y_full, _ = block.apply(params, x, pos)
    cache = modules.LocalAttentionBlock.init_cache(b, window, 4, x.dtype)
    for i in range(t):
      y_i, cache = block.apply(params, x[:, i:i+1], pos[:, i:i+1], cache)
      np.testing.assert_allclose(y_full[:, i], y_i[:, 0], atol=1e-4)

  def test_chunked_prefill_matches_full(self):
    """Chunks of width < window (reference raises NotImplementedError)."""
    b, t, width, window = 1, 8, 8, 4
    block = _attn(window=window)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, width))
    pos = jnp.arange(t)[None]
    params = block.init(jax.random.PRNGKey(1), x, pos)
    y_full, full_cache = block.apply(params, x, pos)
    cache = modules.LocalAttentionBlock.init_cache(b, window, 4, x.dtype)
    outs = []
    for lo, hi in [(0, 3), (3, 6), (6, 8)]:
      y_c, cache = block.apply(params, x[:, lo:hi], pos[:, lo:hi], cache)
      outs.append(y_c)
    np.testing.assert_allclose(
        jnp.concatenate(outs, axis=1), y_full, atol=1e-4
    )
    np.testing.assert_allclose(cache.keys, full_cache.keys, atol=1e-5)
    assert (cache.num_tokens == full_cache.num_tokens).all()

  def test_window_limits_attention(self):
    """Tokens outside the window must not influence the output."""
    b, t, width, window = 1, 10, 8, 3
    block = _attn(window=window)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, width))
    pos = jnp.arange(t)[None]
    params = block.init(jax.random.PRNGKey(1), x, pos)
    y1, _ = block.apply(params, x, pos)
    # Perturb a token far outside the window of the last position.
    x2 = x.at[:, 0].set(100.0)
    y2, _ = block.apply(params, x2, pos)
    np.testing.assert_allclose(y1[:, -1], y2[:, -1], atol=1e-4)

  def test_ring_cache_wraparound(self):
    """Decode far past the window; ring slots must keep masks consistent."""
    b, width, window = 1, 8, 4
    block = _attn(window=window)
    x_all = jax.random.normal(jax.random.PRNGKey(0), (b, 12, width))
    pos_all = jnp.arange(12)[None]
    params = block.init(jax.random.PRNGKey(1), x_all, pos_all)
    # Ground truth: full forward.
    y_full, _ = block.apply(params, x_all, pos_all)
    cache = modules.LocalAttentionBlock.init_cache(b, window, 4, x_all.dtype)
    for i in range(12):
      y_i, cache = block.apply(
          params, x_all[:, i:i+1], pos_all[:, i:i+1], cache
      )
      np.testing.assert_allclose(y_full[:, i], y_i[:, 0], atol=1e-4)


class TestRecurrentBlock:

  @pytest.mark.parametrize("seq_len", [1, 8])
  def test_shapes(self, seq_len):
    b, width = 2, 8
    block = modules.RecurrentBlock(
        width=width, num_heads=2, lru_width=8,
        scan_type=common.ScanType.LINEAR_NATIVE,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, seq_len, width))
    pos = jnp.tile(jnp.arange(seq_len)[None], (b, 1))
    params = block.init(jax.random.PRNGKey(1), x, pos)
    cache = modules.RecurrentBlock.init_cache(b, 8, x.dtype)
    out, new_cache = block.apply(params, x, pos, cache)
    assert out.shape == (b, seq_len, width)
    assert new_cache.rg_lru_state.dtype == jnp.float32
    assert new_cache.conv1d_state.shape == (b, 3, 8)


class TestResidualBlock:

  @pytest.mark.parametrize(
      "block_type",
      [common.TemporalBlockType.RECURRENT, common.TemporalBlockType.ATTENTION],
  )
  def test_prefill_equals_stepwise(self, block_type):
    b, t, width = 1, 6, 8
    block = modules.ResidualBlock(
        width=width, mlp_expanded_width=16, num_heads=2,
        attention_window_size=4, temporal_block_type=block_type,
        lru_width=8, scan_type=common.ScanType.LINEAR_NATIVE,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, width))
    pos = jnp.arange(t)[None]
    params = block.init(jax.random.PRNGKey(1), x, pos)
    y_full, _ = block.apply(params, x, pos)
    cache = modules.ResidualBlock.init_cache(
        batch_size=b, width=width, num_heads=2, attention_window_size=4,
        temporal_block_type=block_type, dtype=x.dtype, lru_width=8,
    )
    for i in range(t):
      y_i, cache = block.apply(params, x[:, i:i+1], pos[:, i:i+1], cache)
      np.testing.assert_allclose(y_full[:, i], y_i[:, 0], atol=1e-4)


class TestEmbedder:

  def test_encode_decode_tied(self):
    emb = modules.Embedder(vocab_size=16, embed_dim=8, scale_by_sqrt_dim=False)
    tokens = jnp.array([[1, 2, 3]])
    params = emb.init(jax.random.PRNGKey(0), tokens, method=emb.encode)
    x = emb.apply(params, tokens, method=emb.encode)
    assert x.shape == (1, 3, 8)
    logits = emb.apply(params, x, method=emb.decode)
    assert logits.shape == (1, 3, 16)
    table = params["params"]["input_embedding"]
    np.testing.assert_allclose(logits, x @ table.T, atol=1e-5)

  def test_sqrt_dim_scaling_bf16_rounded(self):
    emb = modules.Embedder(vocab_size=16, embed_dim=8, scale_by_sqrt_dim=True)
    tokens = jnp.array([[5]])
    params = emb.init(jax.random.PRNGKey(0), tokens, method=emb.encode)
    x = emb.apply(params, tokens, method=emb.encode)
    table = params["params"]["input_embedding"]
    scale = jnp.sqrt(8.0).astype(jnp.bfloat16)
    np.testing.assert_allclose(x[0, 0], table[5] * scale, rtol=1e-6)


class TestVisionLanguageConnector:

  def test_projection_shape(self):
    conn = modules.VisionLanguageConnector(
        width=8, expanded_width=16, vision_width=12
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 12))
    params = conn.init(jax.random.PRNGKey(1), img)
    out = conn.apply(params, img)
    assert out.shape == (2, 5, 8)
    assert set(params["params"].keys()) == {"ffw_up", "ffw_down"}
