"""Torch-twin SFT training: loss/gradient parity with the JAX trainer.

The reference trains its torch path with DDP/Accelerate
(``/root/reference/training/train.py:159-298``); here the torch twin gets a
standalone eager trainer whose loss is defined to be the *same function* as
the JAX trainer's, so cross-framework parity can be asserted end-to-end:
loss values, full gradient trees (through the checkpoint converter), and
optimization behavior (decay groups, frozen stage, accumulation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cadence_gemma_tpu import common  # noqa: E402
from cadence_gemma_tpu.checkpoint import conversion  # noqa: E402
from cadence_gemma_tpu.models import griffin as jx_griffin  # noqa: E402
from cadence_gemma_tpu.torch import griffin as th_griffin  # noqa: E402
from cadence_gemma_tpu.torch import test_utils  # noqa: E402
from cadence_gemma_tpu.torch import trainer as th_trainer  # noqa: E402
from cadence_gemma_tpu.training import trainer as jx_trainer  # noqa: E402

PAD = 0


def _config():
  return common.GriffinConfig(
      vocab_size=32, width=16, mlp_expanded_width=32, num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=4,
      logits_soft_cap=30.0, lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=3, vision_width=12, vl_expanded_width=20,
  )


def _batch():
  # Ragged: row 1 right-padded; mask covers "answer" positions only.
  tokens = jnp.array([[1, 4, 9, 2, 7, 5], [1, 6, 3, 8, PAD, PAD]])
  mask = jnp.array(
      [[False, False, True, True, True, True],
       [False, True, True, True, False, False]]
  )
  img = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 12))
  return tokens, mask, img


@pytest.fixture(scope="module")
def stack():
  config = _config()
  fl = jx_griffin.Griffin(config, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          gradient_checkpointing=False)
  tokens, _, img = _batch()
  pos = jnp.tile(jnp.arange(tokens.shape[1])[None], (2, 1))
  params = fl.init(jax.random.PRNGKey(0), tokens, pos, image=img)["params"]
  th = th_griffin.Griffin(config)
  test_utils.flax_params_to_torch_module(params, th)
  return config, fl, th, params


def _torch_batch():
  tokens, mask, img = _batch()
  return (
      test_utils.to_torch(tokens).long(),
      test_utils.to_torch(mask),
      test_utils.to_torch(img),
  )


class TestLossParity:

  @pytest.mark.parametrize("with_image", [False, True])
  def test_loss_matches_jax(self, stack, with_image):
    _, fl, th, params = stack
    tokens, mask, img = _batch()
    loss_jax = jx_trainer.forward_and_loss_fn(
        params, model=fl, input_tokens=tokens, input_mask=mask,
        positions=jx_trainer.get_positions(tokens, PAD),
        image=img if with_image else None,
    )
    t_tokens, t_mask, t_img = _torch_batch()
    loss_th = th_trainer.forward_and_loss_fn(
        th, t_tokens, t_mask, PAD, image=t_img if with_image else None
    )
    np.testing.assert_allclose(
        float(loss_jax), float(loss_th), rtol=1e-4
    )

  def test_positions_match_jax(self):
    tokens, _, _ = _batch()
    want = np.asarray(jx_trainer.get_positions(tokens, PAD))
    got = th_trainer.get_positions(
        test_utils.to_torch(tokens).long(), PAD
    ).numpy()
    np.testing.assert_array_equal(got, want)

  def test_full_gradient_tree_matches_jax(self, stack):
    """Every converted gradient tensor agrees across frameworks."""
    _, fl, th, params = stack
    tokens, mask, img = _batch()
    g_jax = jax.grad(jx_trainer.forward_and_loss_fn)(
        params, model=fl, input_tokens=tokens, input_mask=mask,
        positions=jx_trainer.get_positions(tokens, PAD), image=img,
    )
    th.zero_grad(set_to_none=True)
    t_tokens, t_mask, t_img = _torch_batch()
    loss = th_trainer.forward_and_loss_fn(
        th, t_tokens, t_mask, PAD, image=t_img
    )
    loss.backward()

    # The converter maps grads exactly as it maps params (same tree, same
    # transposes), so torch's .grad must match name-for-name.
    g_state = conversion.flax_params_to_pytorch_state_dict(
        {"params": g_jax}
    )
    g_state = {k.removeprefix("params."): v for k, v in g_state.items()}
    named = dict(th.named_parameters())
    assert set(g_state) == set(named)
    checked = 0
    for name, g_want in g_state.items():
      g_got = named[name].grad
      assert g_got is not None, name
      scale = max(float(g_want.abs().max()), 1e-6)
      np.testing.assert_allclose(
          g_got.numpy() / scale, g_want.numpy() / scale,
          atol=5e-4, err_msg=name,
      )
      checked += 1
    assert checked > 20  # the whole tree, not a token few


class TestOptimization:

  def test_loss_decreases(self, stack):
    config, _, _, params = stack
    th = th_griffin.Griffin(config)
    test_utils.flax_params_to_torch_module(params, th)
    opt = th_trainer.make_optimizer(th, learning_rate=5e-2)
    t_tokens, t_mask, t_img = _torch_batch()
    losses = [
        float(th_trainer.train_step(th, opt, PAD, t_tokens, t_mask, t_img))
        for _ in range(4)
    ]
    assert losses[-1] < losses[0], losses

  def test_frozen_step_only_updates_connector(self, stack):
    config, _, _, params = stack
    th = th_griffin.Griffin(config)
    test_utils.flax_params_to_torch_module(params, th)
    th_trainer.set_trainable(th, frozen_llm=True)
    opt = th_trainer.make_optimizer(th, learning_rate=5e-2)
    before = {
        n: p.detach().clone() for n, p in th.named_parameters()
    }
    t_tokens, t_mask, t_img = _torch_batch()
    th_trainer.frozen_train_step(th, opt, PAD, t_tokens, t_mask, t_img)
    for name, p in th.named_parameters():
      changed = not torch.equal(before[name], p.detach())
      assert changed == name.startswith("vl_connector"), name

  def test_decay_groups_mirror_jax_mask(self, stack):
    """Param-group membership equals the optax decay mask after conversion."""
    _, _, th, params = stack
    groups = th_trainer.weight_decay_param_groups(th, weight_decay=0.1)
    decay_ids = {id(p) for p in groups[0]["params"]}

    mask = jx_trainer.griffin_weight_decay_mask(params)
    mask_state = conversion.flax_params_to_pytorch_state_dict(
        {"params": jax.tree_util.tree_map(
            lambda m, p: jnp.full(jnp.shape(p), m), mask, params)}
    )
    mask_state = {
        k.removeprefix("params."): bool(v.flatten()[0])
        for k, v in mask_state.items()
    }
    for name, p in th.named_parameters():
      want = mask_state[name]
      # `a_param` lives under rg_lru in flax; both sides exempt it.
      assert (id(p) in decay_ids) == want, name

  def test_gradient_accumulation_matches_full_batch(self, stack):
    """Two half-batch microsteps == one full-batch step (same update)."""
    config, _, _, params = stack
    t_tokens, t_mask, t_img = _torch_batch()

    def fresh():
      m = th_griffin.Griffin(config)
      test_utils.flax_params_to_torch_module(params, m)
      return m, torch.optim.SGD(m.parameters(), lr=1e-1)

    # Full batch. (SGD isolates the accumulation math from AdamW state.)
    m_full, opt_full = fresh()
    th_trainer.train_step(m_full, opt_full, PAD, t_tokens, t_mask, t_img,
                          grad_clip_norm=None)

    # The same rows as two microbatches. Per-row losses are averaged with
    # equal weight, so this matches when both rows have equal mask counts —
    # use a mask-balanced batch.
    balanced_mask = t_mask.clone()
    balanced_mask[0] = balanced_mask[1].roll(1)
    m_full2, opt_full2 = fresh()
    th_trainer.train_step(m_full2, opt_full2, PAD, t_tokens, balanced_mask,
                          t_img, grad_clip_norm=None)
    m_acc, opt_acc = fresh()
    for i in range(2):
      th_trainer.train_step(
          m_acc, opt_acc, PAD, t_tokens[i : i + 1],
          balanced_mask[i : i + 1], t_img[i : i + 1],
          grad_clip_norm=None, accumulation_steps=2, accumulation_index=i,
      )
    for (n, a), (_, b) in zip(
        m_acc.named_parameters(), m_full2.named_parameters()
    ):
      np.testing.assert_allclose(
          a.detach().numpy(), b.detach().numpy(), atol=1e-6, err_msg=n
      )

  def test_validation_step_no_grad(self, stack):
    _, _, th, _ = stack
    t_tokens, t_mask, t_img = _torch_batch()
    loss = th_trainer.validation_step(th, PAD, t_tokens, t_mask, t_img)
    assert loss.requires_grad is False and np.isfinite(float(loss))


class TestFusedAdamW:
  """Reference ``train.py:144-157``: per-param AdamW stepped in backward."""

  def _fresh_pair(self, stack):
    config, _, _, params = stack
    out = []
    for _ in range(2):
      m = th_griffin.Griffin(config)
      test_utils.flax_params_to_torch_module(params, m)
      out.append(m)
    return out

  def test_matches_standard_adamw(self, stack):
    m_std, m_fused = self._fresh_pair(stack)
    t_tokens, t_mask, t_img = _torch_batch()

    opt = th_trainer.make_optimizer(m_std, 1e-2)
    th_trainer.train_step(m_std, opt, PAD, t_tokens, t_mask, t_img,
                          grad_clip_norm=None)

    fused = th_trainer.FusedAdamW(m_fused, 1e-2)
    loss = th_trainer.fused_train_step(m_fused, fused, PAD, t_tokens,
                                       t_mask, t_img)
    assert np.isfinite(float(loss))
    # Gradients were consumed inside backward — nothing left materialized.
    assert all(p.grad is None for p in m_fused.parameters())
    for (n, a), (_, b) in zip(
        m_fused.named_parameters(), m_std.named_parameters()
    ):
      np.testing.assert_allclose(
          a.detach().numpy(), b.detach().numpy(), atol=1e-6, err_msg=n
      )

  def test_state_roundtrip_and_remove(self, stack):
    m, m2 = self._fresh_pair(stack)
    t_tokens, t_mask, t_img = _torch_batch()
    fused = th_trainer.FusedAdamW(m, 1e-2)
    th_trainer.fused_train_step(m, fused, PAD, t_tokens, t_mask, t_img)
    states = fused.state_dict()
    fused2 = th_trainer.FusedAdamW(m2, 1e-2)
    fused2.load_state_dict(states)
    assert len(states) == len(fused2.state_dict())
    # After remove(), backward accumulates grads instead of stepping.
    before = [p.detach().clone() for p in m.parameters()]
    fused.remove()
    loss = th_trainer.forward_and_loss_fn(m, t_tokens, t_mask, PAD,
                                          image=t_img)
    loss.backward()
    assert any(p.grad is not None for p in m.parameters())
    for p0, (n, p1) in zip(before, m.named_parameters()):
      np.testing.assert_array_equal(p0.numpy(), p1.detach().numpy(),
                                    err_msg=n)


class TestPeriodicSave:

  def test_train_epoch_saves_checkpoint(self, stack, tmp_path):
    config, _, _, params = stack
    m = th_griffin.Griffin(config)
    test_utils.flax_params_to_torch_module(params, m)
    opt = th_trainer.make_optimizer(m, 1e-3)
    t_tokens, t_mask, _ = _torch_batch()
    path = str(tmp_path / "ckpt.pt")
    th_trainer.train_epoch(
        m, opt, PAD, [(t_tokens, t_mask)] * 3,
        save_every=2, save_path=path,
    )
    saved = torch.load(path)
    state = m.state_dict()
    assert set(saved["params"]) == set(state)
    # Saved at step 2 of 3 — an intermediate state, not the final one.
    assert any(
        not torch.equal(saved["params"][k], state[k]) for k in state
    )
