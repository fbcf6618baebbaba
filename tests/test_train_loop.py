"""Train-loop tests: two-stage schedule, checkpoints, resume, data builder."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.checkpoint import io as checkpoint_io
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.tokenizers import SimpleVocab
from cadence_gemma_tpu.training import data as data_lib
from cadence_gemma_tpu.training import train_loop
from cadence_gemma_tpu.training import trainer


@pytest.fixture(scope="module")
def setup():
  vocab = SimpleVocab([f"w{i}" for i in range(20)])
  config = common.GriffinConfig(
      vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=4,
      logits_soft_cap=30.0, lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=2, vision_width=8, vl_expanded_width=12,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32
  )
  tokens = jnp.ones((1, 6), jnp.int32)
  params = model.init(
      jax.random.PRNGKey(0), tokens, jnp.arange(6)[None]
  )["params"]
  return vocab, config, model, params


def _dataset(vocab, d, n=6, batch=2):
  recs = [
      {"conversations": [
          {"from": "human", "value": f"w{i % 5} w{(i + 1) % 5}"},
          {"from": "gpt", "value": f"w{(i + 2) % 5}"},
      ]}
      for i in range(n)
  ]
  path = os.path.join(d, "train.json")
  with open(path, "w") as f:
    json.dump(recs, f)
  return data_lib.DatasetBuilder(
      vocab=vocab, json_path=path, max_seq_len=16, batch_size=batch
  )


class TestDatasetBuilder:

  def test_batches_and_masks(self, setup):
    vocab, *_ = setup
    with tempfile.TemporaryDirectory() as d:
      ds = _dataset(vocab, d)
      batches = list(ds)
      assert len(batches) == 3
      b = batches[0]
      assert b.input_tokens.shape == (2, 16)
      assert b.input_tokens[0, 0] == vocab.bos_id()
      # Loss mask covers answer tokens + EOS, never the prompt.
      assert b.target_mask.any() and not b.target_mask[:, 0].any()

  def test_image_paths_carried(self, setup):
    vocab, *_ = setup
    with tempfile.TemporaryDirectory() as d:
      recs = [{"image": "a.jpg", "conversations": [
          {"from": "human", "value": "w1"},
          {"from": "gpt", "value": "w2"}]}]
      path = os.path.join(d, "t.json")
      with open(path, "w") as f:
        json.dump(recs, f)
      ds = data_lib.DatasetBuilder(
          vocab=vocab, json_path=path, image_root="/imgs",
          max_seq_len=8, batch_size=1,
      )
      batch = next(iter(ds))
      assert batch.image_paths == ["/imgs/a.jpg"]


class TestTrainLoop:

  def test_two_stage_runs_and_updates(self, setup):
    vocab, _, model, params = setup
    with tempfile.TemporaryDirectory() as d:
      stage = train_loop.TrainingConfig(
          learning_rate=1e-3, max_steps=2, eval_every_n=1,
          checkpoint_every_n=None,
      )
      logged = []
      out = train_loop.two_stage_sft(
          model,
          jax.tree_util.tree_map(jnp.copy, params),
          lambda: _dataset(vocab, d),
          stage, stage,
          log_metrics=lambda m, s: logged.append((s, m)),
          pad_id=vocab.pad_id(),
      )
      assert logged, "metrics hook never called"
      assert any("train_loss" in m for _, m in logged)
      # Full stage must have changed LM weights.
      changed = not np.allclose(
          np.asarray(out["embedder"]["input_embedding"]),
          np.asarray(params["embedder"]["input_embedding"]),
      )
      assert changed

  def test_checkpoint_and_resume(self, setup):
    vocab, _, model, params = setup
    optimizer = trainer.make_optimizer(1e-3)
    p = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = optimizer.init(p)
    with tempfile.TemporaryDirectory() as d:
      ckpt = os.path.join(d, "state")
      checkpoint_io.save_train_state(ckpt, p, opt_state, step=7)
      rp, ro, rs = checkpoint_io.load_train_state(ckpt)
      assert rs == 7
      for a, b in zip(
          jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(rp)
      ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
      # Optimizer state round-trips structurally.
      assert len(jax.tree_util.tree_leaves(ro)) == len(
          jax.tree_util.tree_leaves(opt_state)
      )


class TestPrefetch:

  def test_order_and_device(self):
    batches = [
        data_lib.TrainingInput(
            input_tokens=np.full((1, 4), i, np.int32),
            target_mask=np.ones((1, 4), bool),
        )
        for i in range(5)
    ]
    got = list(data_lib.prefetch_to_device(iter(batches), buffer_size=2))
    assert [int(b.input_tokens[0, 0]) for b in got] == list(range(5))
    assert isinstance(got[0].input_tokens, jax.Array)
    assert got[0].image_paths is None and got[0].pixels is None

  def test_exception_propagates(self):
    def gen():
      yield data_lib.TrainingInput(
          input_tokens=np.zeros((1, 2), np.int32),
          target_mask=np.ones((1, 2), bool),
      )
      raise RuntimeError("boom")

    it = data_lib.prefetch_to_device(gen(), buffer_size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
      next(it)

  def test_train_loop_prefetch_matches_sync(self, setup):
    vocab, _, model, params = setup
    losses = {}
    with tempfile.TemporaryDirectory() as d:
      for name, pf in [("sync", 0), ("prefetch", 3)]:
        logged = []
        cfg = train_loop.TrainingConfig(
            learning_rate=1e-3, max_steps=3, eval_every_n=1,
            checkpoint_every_n=None, prefetch_batches=pf,
        )
        train_loop.train_loop(
            model,
            jax.tree_util.tree_map(jnp.copy, params),
            _dataset(vocab, d),
            cfg,
            pad_id=vocab.pad_id(),
            log_metrics=lambda m, s, log=logged: log.append(m),
        )
        losses[name] = [
            m["train_loss"] for m in logged if "train_loss" in m
        ]
      assert losses["sync"], losses
      np.testing.assert_allclose(
          losses["sync"], losses["prefetch"], rtol=1e-6
      )


class TestGradAccumulation:
  """gradient_accumulation_steps: K-window averaging via optax.MultiSteps."""

  def _run(self, model, params, vocab, batches, cfg):
    return train_loop.train_loop(
        model, jax.tree_util.tree_map(jnp.copy, params), batches, cfg,
        pad_id=vocab.pad_id(),
        log_metrics=lambda m, s: None,
    )

  def test_accum_over_repeated_batches_matches_plain(self, setup):
    import dataclasses

    vocab, _, model, params = setup
    with tempfile.TemporaryDirectory() as d:
      batches = list(_dataset(vocab, d))  # 3 batches
    # Each batch fed twice under K=2 averages two identical gradients,
    # so every optimizer update equals the plain single-step update.
    doubled = [b for b in batches for _ in range(2)]
    cfg_plain = train_loop.TrainingConfig(
        learning_rate=1e-3, max_steps=3, eval_every_n=100,
        checkpoint_every_n=None,
    )
    cfg_accum = dataclasses.replace(
        cfg_plain, max_steps=6, gradient_accumulation_steps=2
    )
    out_plain = self._run(model, params, vocab, batches, cfg_plain)
    out_accum = self._run(model, params, vocab, doubled, cfg_accum)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out_plain)[0],
        jax.tree_util.tree_flatten_with_path(out_accum)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(p)
      )

  def test_partial_window_applies_no_update(self, setup):
    vocab, _, model, params = setup
    with tempfile.TemporaryDirectory() as d:
      batches = list(_dataset(vocab, d))[:1]
    cfg = train_loop.TrainingConfig(
        learning_rate=1e-1, max_steps=1, eval_every_n=100,
        checkpoint_every_n=None, gradient_accumulation_steps=2,
    )
    out = self._run(model, params, vocab, batches, cfg)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(out)[0],
    ):
      np.testing.assert_array_equal(
          np.asarray(a), np.asarray(b), err_msg=str(p)
      )

  def test_nonfinite_count_seen_through_multisteps(self):
    import optax

    from cadence_gemma_tpu.utils import resilience

    tx = resilience.skip_nonfinite_updates(optax.sgd(1.0))
    tx = optax.MultiSteps(tx, every_k_schedule=2).gradient_transformation()
    p = {"w": jnp.ones((2,))}
    state = tx.init(p)
    assert resilience.nonfinite_count(state) == 0
    bad = {"w": jnp.full((2,), jnp.nan)}
    for _ in range(2):  # one full window of NaN gradients
      _, state = tx.update(bad, state, p)
    assert resilience.nonfinite_count(state) == 1

  def test_accum_composes_with_mesh(self, setup):
    import dataclasses

    from cadence_gemma_tpu.parallel import sharding as sh

    vocab, _, model, params = setup
    with tempfile.TemporaryDirectory() as d:
      batches = list(_dataset(vocab, d))
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    cfg = train_loop.TrainingConfig(
        learning_rate=1e-3, max_steps=6, eval_every_n=100,
        checkpoint_every_n=None, gradient_accumulation_steps=2,
    )
    doubled = [b for b in batches for _ in range(2)]
    out_one = self._run(model, params, vocab, doubled, cfg)
    out_mesh = train_loop.train_loop(
        model, jax.tree_util.tree_map(jnp.copy, params), doubled, cfg,
        pad_id=vocab.pad_id(), mesh=mesh,
    )
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out_one)[0],
        jax.tree_util.tree_flatten_with_path(out_mesh)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(p)
      )


class TestShardedLoop:
  """train_loop(mesh=...) runs the pjit-ted step with loop features intact."""

  def _losses(self, model, params, vocab, d, cfg, mesh=None):
    logged = []
    out = train_loop.train_loop(
        model, jax.tree_util.tree_map(jnp.copy, params),
        _dataset(vocab, d), cfg, pad_id=vocab.pad_id(),
        log_metrics=lambda m, s, log=logged: log.append(m), mesh=mesh,
    )
    return out, [m["train_loss"] for m in logged if "train_loss" in m]

  def test_mesh_loop_matches_single_device(self, setup):
    from cadence_gemma_tpu.parallel import sharding as sh

    vocab, _, model, params = setup
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    cfg = train_loop.TrainingConfig(
        learning_rate=1e-3, max_steps=3, eval_every_n=1,
        checkpoint_every_n=None,
    )
    with tempfile.TemporaryDirectory() as d:
      out_one, losses_one = self._losses(model, params, vocab, d, cfg)
      out_mesh, losses_mesh = self._losses(
          model, params, vocab, d, cfg, mesh=mesh
      )
    assert losses_one
    np.testing.assert_allclose(losses_one, losses_mesh, rtol=1e-5)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out_one)[0],
        jax.tree_util.tree_flatten_with_path(out_mesh)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(p)
      )

  def test_mesh_lora_loop_matches_single_device(self, setup):
    from cadence_gemma_tpu.parallel import sharding as sh
    from cadence_gemma_tpu.training import lora as lora_lib

    vocab, config, _, _ = setup
    lora_model = griffin.Griffin(
        config, lora_rank=2, dtype=jnp.float32, param_dtype=jnp.float32
    )
    tokens = jnp.ones((1, 6), jnp.int32)
    params = lora_model.init(
        jax.random.PRNGKey(3), tokens, jnp.arange(6)[None]
    )["params"]
    # Non-zero lora_b so both loops traverse a non-trivial adapter path.
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01 if "lora_b" in str(p[-1]) else v, params
    )
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    cfg = train_loop.TrainingConfig(
        learning_rate=1e-3, max_steps=2, eval_every_n=1,
        checkpoint_every_n=None, lora=True,
    )
    with tempfile.TemporaryDirectory() as d:
      out_one, losses_one = self._losses(lora_model, params, vocab, d, cfg)
      out_mesh, losses_mesh = self._losses(
          lora_model, params, vocab, d, cfg, mesh=mesh
      )
    assert losses_one
    np.testing.assert_allclose(losses_one, losses_mesh, rtol=1e-5)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out_one)[0],
        jax.tree_util.tree_flatten_with_path(out_mesh)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(p)
      )

  def test_mesh_resume_matches_uninterrupted(self, setup):
    from cadence_gemma_tpu.parallel import sharding as sh

    vocab, _, model, params = setup
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    with tempfile.TemporaryDirectory() as d:
      ckdir = os.path.join(d, "ck")
      full_cfg = train_loop.TrainingConfig(
          learning_rate=1e-3, max_steps=2, eval_every_n=100,
          checkpoint_every_n=None,
      )
      out_full, _ = self._losses(model, params, vocab, d, full_cfg, mesh)
      # Interrupted: 1 step + checkpoint, then resume to step 2 on the mesh.
      cfg1 = train_loop.TrainingConfig(
          learning_rate=1e-3, max_steps=1, eval_every_n=100,
          checkpoint_every_n=1, checkpoint_dir=ckdir,
      )
      self._losses(model, params, vocab, d, cfg1, mesh)
      cfg2 = train_loop.TrainingConfig(
          learning_rate=1e-3, max_steps=2, eval_every_n=100,
          checkpoint_every_n=None,
          resume_from=os.path.join(ckdir, "step_1"),
      )
      out_resumed, _ = self._losses(model, params, vocab, d, cfg2, mesh)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out_full)[0],
        jax.tree_util.tree_flatten_with_path(out_resumed)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(p)
      )

  def test_lora_ignores_weight_decay_with_warning(self, setup):
    import warnings

    vocab, _, model, params = setup
    cfg = train_loop.TrainingConfig(
        max_steps=1, lora=True, weight_decay=0.3
    )
    with warnings.catch_warnings(record=True) as caught:
      warnings.simplefilter("always")
      with pytest.raises(ValueError, match="no lora_a/lora_b"):
        train_loop.train_loop(model, params, [], cfg)
    assert any("weight_decay is ignored" in str(w.message) for w in caught)

  def test_lora_with_freeze_llm_raises(self, setup):
    vocab, _, model, params = setup
    cfg = train_loop.TrainingConfig(max_steps=1, lora=True, freeze_llm=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
      train_loop.train_loop(model, params, [], cfg)

  def test_mesh_with_freeze_llm_raises(self, setup):
    from cadence_gemma_tpu.parallel import sharding as sh

    vocab, _, model, params = setup
    mesh = sh.make_mesh((2,), ("data",), jax.devices()[:2])
    cfg = train_loop.TrainingConfig(max_steps=1, freeze_llm=True)
    with pytest.raises(ValueError, match="freeze_llm"):
      train_loop.train_loop(model, params, [], cfg, mesh=mesh)

  def test_two_stage_mesh_applies_to_full_stage_only(self, setup):
    from cadence_gemma_tpu.parallel import sharding as sh

    vocab, _, model, params = setup
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    stage = train_loop.TrainingConfig(
        learning_rate=1e-3, max_steps=2, eval_every_n=1,
        checkpoint_every_n=None,
    )
    with tempfile.TemporaryDirectory() as d:
      out = train_loop.two_stage_sft(
          model, jax.tree_util.tree_map(jnp.copy, params),
          lambda: _dataset(vocab, d), stage, stage,
          pad_id=vocab.pad_id(), mesh=mesh,
      )
    changed = not np.allclose(
        np.asarray(out["embedder"]["input_embedding"]),
        np.asarray(params["embedder"]["input_embedding"]),
    )
    assert changed


class TestAsyncCheckpoints:

  def test_async_periodic_checkpoints_resumable(self, setup):
    """Background saves survive buffer donation and restore exactly."""
    vocab, _, model, params = setup
    with tempfile.TemporaryDirectory() as d:
      ckdir = os.path.join(d, "ck")
      cfg = train_loop.TrainingConfig(
          learning_rate=1e-3, max_steps=4, eval_every_n=100,
          checkpoint_every_n=2, checkpoint_dir=ckdir,
          async_checkpoints=True,
      )
      final = train_loop.train_loop(
          model, jax.tree_util.tree_map(jnp.copy, params),
          _dataset(vocab, d, n=8), cfg, pad_id=vocab.pad_id(),
      )
      # The context manager waited for the writes; both must be durable.
      for step in (2, 4):
        rp, ro, rs = checkpoint_io.load_train_state(
            os.path.join(ckdir, f"step_{step}")
        )
        assert rs == step
      # The step-4 save ran while subsequent work donated buffers; its
      # VALUES must equal the params train_loop returned at max_steps=4
      # (garbage here would mean the snapshot raced the donation).
      for a, b in zip(
          jax.tree_util.tree_leaves(final), jax.tree_util.tree_leaves(rp)
      ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
