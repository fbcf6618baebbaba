"""Conversion round-trip tests (mirrors reference conversion_test.py:41-81)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cadence_gemma_tpu import common  # noqa: E402
from cadence_gemma_tpu.checkpoint import conversion  # noqa: E402
from cadence_gemma_tpu.models import griffin  # noqa: E402


@pytest.fixture(scope="module")
def params():
  config = common.GriffinConfig(
      vocab_size=32,
      width=16,
      mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=4,
      logits_soft_cap=30.0,
      lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=2,
      vision_width=8,
      vl_expanded_width=12,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  tokens = jnp.zeros((1, 4), jnp.int32)
  pos = jnp.arange(4)[None]
  return model.init(jax.random.PRNGKey(0), tokens, pos)


class TestRoundTrip:

  def test_flax_torch_flax_identity(self, params):
    state = conversion.flax_params_to_pytorch_state_dict(params)
    back = conversion.pytorch_state_dict_to_flax_params(state)

    flat_orig = conversion.flatten_nested_dict(params)
    flat_back = conversion.flatten_nested_dict(back)
    assert set(flat_orig) == set(flat_back)
    for key in flat_orig:
      np.testing.assert_array_equal(
          np.asarray(flat_orig[key]), np.asarray(flat_back[key]), err_msg=key
      )
      assert flat_orig[key].dtype == flat_back[key].dtype, key

  def test_linear_weights_transposed(self, params):
    state = conversion.flax_params_to_pytorch_state_dict(params)
    orig = params["params"]["blocks.1"]["attention_block"]["proj_q"]["kernel"]
    converted = state["params.blocks.1.attention_block.proj_q.weight"]
    assert tuple(converted.shape) == tuple(orig.shape[::-1])

  def test_conv1d_not_transposed(self, params):
    state = conversion.flax_params_to_pytorch_state_dict(params)
    orig = params["params"]["blocks.0"]["recurrent_block"]["conv_1d"]["w"]
    # conv_1d's 'w' param doesn't end in kernel/weight so it's untouched.
    converted = state["params.blocks.0.recurrent_block.conv_1d.w"]
    assert tuple(converted.shape) == tuple(orig.shape)

  def test_bfloat16_round_trip(self):
    x = jnp.array([1.5, -2.25, 0.125], dtype=jnp.bfloat16)
    t = conversion.jax_array_to_torch_tensor(x)
    assert t.dtype == torch.bfloat16
    back = conversion.torch_tensor_to_jax_array(t)
    assert back.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(x, np.float32), np.asarray(back, np.float32)
    )

  def test_config_from_converted_torch_params(self, params):
    state = conversion.flax_params_to_pytorch_state_dict(params)
    stripped = {
        k.removeprefix("params."): v for k, v in state.items()
    }
    cfg = common.GriffinConfig.from_torch_params(
        {k: v for k, v in stripped.items()},
        embeddings_scale_by_sqrt_dim=True,
        attention_window_size=4,
        logits_soft_cap=30.0,
    )
    assert cfg.width == 16
    assert cfg.block_types == (
        common.TemporalBlockType.RECURRENT,
        common.TemporalBlockType.ATTENTION,
    )
