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
