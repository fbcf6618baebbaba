"""Griffin backbone tests: shapes, caches, config round-trip, multimodal.

Mirrors reference ``jax/griffin_test.py:25-89`` and adds multimodal and
sharded-mesh coverage the reference lacks (SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.parallel import sharding


def tiny_config(**overrides):
  kwargs = dict(
      vocab_size=48,
      width=16,
      mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=8,
      logits_soft_cap=30.0,
      lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=4,
      vision_width=12,
      vl_expanded_width=20,
  )
  kwargs.update(overrides)
  return common.GriffinConfig(**kwargs)


@pytest.fixture(scope="module")
def model_and_params():
  config = tiny_config()
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  tokens = jnp.zeros((2, 6), jnp.int32)
  pos = jnp.tile(jnp.arange(6)[None], (2, 1))
  params = model.init(jax.random.PRNGKey(0), tokens, pos)
  return model, params


class TestForward:

  def test_logits_shape_and_cache(self, model_and_params):
    model, params = model_and_params
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 48)
    pos = jnp.tile(jnp.arange(6)[None], (2, 1))
    logits, cache = model.apply(params, tokens, pos)
    assert logits.shape == (2, 6, 48)
    assert set(cache.keys()) == {"blocks.0", "blocks.1", "blocks.2"}
    assert cache["blocks.0"].rg_lru_state.dtype == jnp.float32
    assert cache["blocks.2"].keys.shape == (2, 8, 1, 8)

  def test_soft_cap_bounds_logits(self, model_and_params):
    model, params = model_and_params
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0, 48)
    pos = jnp.arange(4)[None]
    logits, _ = model.apply(params, tokens, pos)
    assert (jnp.abs(logits) <= 30.0).all()

  def test_return_flags(self, model_and_params):
    model, params = model_and_params
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4)[None]
    logits, cache = model.apply(params, tokens, pos, return_logits=False)
    assert logits is None and cache is not None
    logits, cache = model.apply(params, tokens, pos, return_cache=False)
    assert logits is not None and cache is None

  def test_prefill_equals_decode(self, model_and_params):
    model, params = model_and_params
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, 48)
    pos = jnp.tile(jnp.arange(6)[None], (2, 1))
    logits_full, _ = model.apply(params, tokens, pos)
    cache = None
    for i in range(6):
      step_logits, cache = model.apply(
          params, tokens[:, i:i+1], pos[:, i:i+1], cache
      )
      np.testing.assert_allclose(
          logits_full[:, i], step_logits[:, 0], atol=2e-4
      )

  def test_init_cache_structure(self, model_and_params):
    model, params = model_and_params
    cache = model.apply(
        params, method=lambda m: m.init_cache(batch_size=2, dtype=jnp.float32)
    )
    assert cache["blocks.0"].rg_lru_state.shape == (2, 16)
    assert cache["blocks.2"].num_tokens.shape == (2,)


class TestMultimodal:

  def test_image_splice_extends_logits(self, model_and_params):
    model, params = model_and_params
    tokens = jnp.zeros((2, 6), jnp.int32)
    pos = jnp.tile(jnp.arange(6)[None], (2, 1))
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 12))
    logits, _ = model.apply(params, tokens, pos, image=img)
    assert logits.shape == (2, 6 + 4, 48)

  def test_splice_after_bos(self, model_and_params):
    """Visual tokens insert after the first token, not before it."""
    model, params = model_and_params
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0, 48)
    pos = jnp.arange(5)[None]
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 12))
    logits_mm, _ = model.apply(params, tokens, pos, image=img)
    logits_text, _ = model.apply(params, tokens, pos)
    # Position 0 (BOS) attends to nothing else: identical logits.
    np.testing.assert_allclose(logits_mm[:, 0], logits_text[:, 0], atol=1e-5)

  def test_multimodal_prefill_then_decode(self, model_and_params):
    """A decode step after an image prefill uses consistent positions."""
    model, params = model_and_params
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 5), 0, 48)
    pos = jnp.arange(5)[None]
    img = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 12))
    n_img = 4
    # Ground truth: everything in one forward pass.
    logits_full, _ = model.apply(params, tokens, pos, image=img)
    # Prefill all but last token (with image), then step the last token.
    _, cache = model.apply(params, tokens[:, :-1], pos[:, :-1], image=img)
    step_logits, _ = model.apply(
        params, tokens[:, -1:], pos[:, -1:] + n_img, cache
    )
    np.testing.assert_allclose(
        logits_full[:, -1], step_logits[:, 0], atol=2e-4
    )


class TestConfigRoundTrip:

  def test_from_flax_params(self, model_and_params):
    _, params = model_and_params
    rec = common.GriffinConfig.from_flax_params_or_variables(
        params,
        embeddings_scale_by_sqrt_dim=True,
        attention_window_size=8,
        logits_soft_cap=30.0,
    )
    config = tiny_config()
    assert rec.width == config.width
    assert rec.num_heads == config.num_heads
    assert rec.lru_width == config.lru_width
    assert rec.block_types == config.block_types
    assert rec.vocab_size == config.vocab_size

  def test_presets(self):
    for preset in common.Preset:
      config = common.GriffinConfig.from_preset(preset)
      assert config.num_layers == len(config.block_types)
      assert config.max_cache_length == config.attention_window_size
    cfg = common.GriffinConfig.from_preset(
        common.Preset.RECURRENT_GEMMA_2B_V1
    )
    assert cfg.width == 2560 and cfg.num_layers == 26 and cfg.num_heads == 10

  def test_max_sequence_length_clamps_window(self):
    cfg = common.GriffinConfig.from_preset(
        common.Preset.RECURRENT_GEMMA_2B_V1, max_sequence_length=512
    )
    assert cfg.attention_window_size == 512


class TestShardedModel:
  """Whole-model forward under a data x sequence mesh (8 virtual devices)."""

  def test_dp_sp_forward_matches_single(self):
    config = tiny_config(scan_type=common.ScanType.LINEAR_NATIVE)
    mesh = sharding.make_mesh((2, 4), ("data", "sequence"))
    spec = sharding.ShardingSpec(
        mesh=mesh, batch_axis_name="data", sequence_axis_name="sequence"
    )
    model_sh = griffin.Griffin(
        config, scan_sharding_spec=spec,
        dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False,
    )
    model = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 48)
    pos = jnp.tile(jnp.arange(8)[None], (2, 1))
    params = model.init(jax.random.PRNGKey(1), tokens, pos)
    ref_logits, _ = model.apply(params, tokens, pos)
    sh_logits, _ = model_sh.apply(params, tokens, pos)
    np.testing.assert_allclose(ref_logits, sh_logits, atol=2e-4)
