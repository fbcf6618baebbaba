"""Training tests: loss semantics, frozen stage, sharded step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.parallel import partitioning, sharding
from cadence_gemma_tpu.training import trainer


@pytest.fixture(scope="module")
def setup():
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
      config, dtype=jnp.float32, param_dtype=jnp.float32
  )
  tokens = jnp.ones((2, 6), jnp.int32)
  pos = jnp.tile(jnp.arange(6)[None], (2, 1))
  params = model.init(jax.random.PRNGKey(0), tokens, pos)["params"]
  return config, model, params


def _batch(config, seed=0, b=2, t=6):
  k = jax.random.PRNGKey(seed)
  tokens = jax.random.randint(k, (b, t), 3, config.vocab_size)
  mask = jnp.ones((b, t), jnp.bool_)
  img = jax.random.normal(
      jax.random.fold_in(k, 1), (b, config.vision_tokens, config.vision_width)
  )
  return tokens, mask, img


class TestLoss:

  def test_positions_from_padding(self):
    # Reference semantics (train_jax.py:485-493): pads share position 0
    # with the first real token, so document resets cover them.
    tokens = jnp.array([[0, 0, 5, 6, 7]])
    pos = trainer.get_positions(tokens, pad_id=0)
    np.testing.assert_array_equal(pos, [[0, 0, 0, 1, 2]])

  def test_text_loss_is_masked_nll(self, setup):
    config, model, params = setup
    tokens, mask, _ = _batch(config)
    positions = trainer.get_positions(tokens, 0)
    loss = trainer.forward_and_loss_fn(
        params, model=model, input_tokens=tokens, input_mask=mask,
        positions=positions,
    )
    logits, _ = model.apply(
        {"params": params}, tokens, positions, None,
        return_logits=True, return_cache=False,
    )
    logp = jax.nn.log_softmax(logits[:, :-1])
    picked = jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    expected = -(picked * mask[:, 1:]).sum() / mask[:, 1:].sum()
    np.testing.assert_allclose(loss, expected, rtol=1e-5)

  @pytest.mark.parametrize("with_image", [False, True])
  def test_chunked_loss_matches_single_chunk(self, setup, with_image):
    """Time-chunked vocab loss (values AND grads) == whole-sequence loss.

    t=6 (+2 visual) with chunk 3 forces multiple chunks and tail padding.
    """
    config, model, params = setup
    tokens, mask, img = _batch(config)
    img = img if with_image else None
    positions = trainer.get_positions(tokens, 0)

    def loss(p, chunk):
      return trainer.forward_and_loss_fn(
          p, model=model, input_tokens=tokens, input_mask=mask,
          positions=positions, image=img, vocab_chunk_size=chunk,
      )

    v1, g1 = jax.value_and_grad(loss)(params, 1024)
    v3, g3 = jax.value_and_grad(loss)(params, 3)
    np.testing.assert_allclose(v1, v3, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g1, g3
    )

  def test_multimodal_loss_finite_and_image_sensitive(self, setup):
    config, model, params = setup
    tokens, mask, img = _batch(config)
    positions = trainer.get_positions(tokens, 0)
    loss1 = trainer.forward_and_loss_fn(
        params, model=model, input_tokens=tokens, input_mask=mask,
        positions=positions, image=img,
    )
    loss2 = trainer.forward_and_loss_fn(
        params, model=model, input_tokens=tokens, input_mask=mask,
        positions=positions, image=img * 3,
    )
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert not np.allclose(loss1, loss2)


class TestSteps:

  def test_train_step_reduces_loss(self, setup):
    config, model, params = setup
    optimizer = trainer.make_optimizer(1e-2)
    # Copy: train_step donates its params (the fixture is module-scoped).
    p = jax.tree_util.tree_map(jnp.copy, params)
    o = optimizer.init(p)
    tokens, mask, img = _batch(config)
    losses = []
    for _ in range(5):
      loss, p, o = trainer.train_step(
          model, p, optimizer, o, 0, tokens, mask, img
      )
      losses.append(float(loss))
    assert losses[-1] < losses[0]

  def test_frozen_step_only_updates_connector(self, setup):
    config, model, params = setup
    params = jax.tree_util.tree_map(jnp.copy, params)
    optimizer = trainer.make_optimizer(1e-2, use_decay_mask=False)
    opt_state = optimizer.init(params["vl_connector"])
    tokens, mask, img = _batch(config)
    before = jax.tree_util.tree_map(jnp.copy, params)
    loss, params, _ = trainer.frozen_train_step(
        model, params, optimizer, opt_state, 0, tokens, mask, img
    )
    assert np.isfinite(loss)
    for key in before:
      changed = any(
          not np.allclose(a, b)
          for a, b in zip(
              jax.tree_util.tree_leaves(before[key]),
              jax.tree_util.tree_leaves(params[key]),
          )
      )
      assert changed == (key == "vl_connector"), key

  def test_validation_step_matches_loss(self, setup):
    config, model, params = setup
    tokens, mask, img = _batch(config)
    v = trainer.validation_step(model, params, 0, tokens, mask, img)
    direct = trainer.forward_and_loss_fn(
        params, model=model, input_tokens=tokens, input_mask=mask,
        positions=trainer.get_positions(tokens, 0), image=img,
    )
    np.testing.assert_allclose(v, direct, rtol=1e-6)


class TestWeightDecayMask:

  def test_mask_rules(self, setup):
    _, _, params = setup
    mask = trainer.griffin_weight_decay_mask(params)
    assert not jax.tree_util.tree_leaves(mask["embedder"])[0]
    rb = mask["blocks.0"]["recurrent_block"]
    assert not any(jax.tree_util.tree_leaves(rb["rg_lru"]))
    assert rb["linear_x"]["kernel"]
    assert not rb["linear_x"]["bias"]
    assert not mask["final_norm"]["scale"]


class TestShardedTraining:

  def test_sharded_step_matches_single_device(self, setup):
    config, model, params = setup
    optimizer = trainer.make_optimizer(1e-2)
    tokens, mask, img = _batch(config, b=4)

    # Single-device ground truth.
    opt_state = optimizer.init(params)
    loss_ref, params_ref, _ = trainer.train_step(
        model, jax.tree_util.tree_map(jnp.copy, params), optimizer,
        opt_state, 0, tokens, mask, img,
    )

    mesh = sharding.make_mesh(
        (2, 2, 2),
        (partitioning.BATCH_AXIS, partitioning.SEQUENCE_AXIS,
         partitioning.MODEL_AXIS),
    )
    step_fn, shard_params = trainer.make_sharded_train_step(
        model, optimizer, mesh, pad_id=0, example_params=params
    )
    params_sh = shard_params(jax.tree_util.tree_map(jnp.copy, params))
    opt_state_sh = optimizer.init(params_sh)
    loss_sh, params_sh, _ = step_fn(
        params_sh, opt_state_sh, tokens, mask, img
    )
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_ref),
        jax.tree_util.tree_leaves(params_sh),
    ):
      np.testing.assert_allclose(a, b, atol=2e-5)
