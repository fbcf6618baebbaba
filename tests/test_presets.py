"""Shape sanity for every published preset (7B/9B widths included).

eval_shape only — no FLOPs — so odd widths (lru 5632) and deep stacks are
checked for free on CPU.
"""

import jax
import jax.numpy as jnp
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin


@pytest.mark.parametrize("preset", list(common.Preset))
def test_preset_forward_shapes(preset):
  config = common.GriffinConfig.from_preset(preset, vocab_size=1000)
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens = jnp.zeros((1, 4), jnp.int32)
  pos = jnp.arange(4)[None]

  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens, pos)
  )
  params = shapes["params"]
  assert f"blocks.{config.num_layers - 1}" in params
  assert params["embedder"]["input_embedding"].shape == (1000, config.width)

  out = jax.eval_shape(
      lambda p: model.apply(p, tokens, pos, return_cache=True), shapes
  )
  logits, cache = out
  assert logits.shape == (1, 4, 1000)
  # Recurrent state must match lru_width, attention cache the window.
  for i, block_type in enumerate(config.block_types):
    entry = cache[f"blocks.{i}"]
    if block_type is common.TemporalBlockType.RECURRENT:
      assert entry.rg_lru_state.shape == (
          1, config.lru_width or config.width
      )
    else:
      assert entry.keys.shape == (
          1, config.attention_window_size, 1,
          config.width // config.num_heads,
      )


@pytest.mark.parametrize("preset", list(common.Preset))
def test_preset_quantized_tree_matches(preset):
  from cadence_gemma_tpu.ops import quantization

  config = common.GriffinConfig.from_preset(preset, vocab_size=1000)
  model = griffin.Griffin(config, gradient_checkpointing=False)
  qmodel = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=True
  )
  tokens = jnp.zeros((1, 4), jnp.int32)
  pos = jnp.arange(4)[None]
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens, pos)
  )["params"]
  qshapes = jax.eval_shape(quantization.quantize_params, shapes)
  expected = jax.eval_shape(
      lambda: qmodel.init(jax.random.PRNGKey(0), tokens, pos)
  )["params"]
  got = {
      jax.tree_util.keystr(p): (v.shape, v.dtype)
      for p, v in jax.tree_util.tree_leaves_with_path(qshapes)
  }
  want = {
      jax.tree_util.keystr(p): (v.shape, v.dtype)
      for p, v in jax.tree_util.tree_leaves_with_path(expected)
  }
  assert got == want
