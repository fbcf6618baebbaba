"""Failure detection / recovery: preemption, IO retries, non-finite steps.

The reference has no failure handling at all (SURVEY §5); these tests pin
the recovery contract: a SIGTERM mid-run yields a resumable train state
that continues exactly where it stopped, flaky IO is retried with backoff,
and a NaN gradient step leaves parameters untouched.
"""

import json
import os
import signal
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.tokenizers import SimpleVocab
from cadence_gemma_tpu.training import data as data_lib
from cadence_gemma_tpu.training import train_loop
from cadence_gemma_tpu.utils import resilience


class TestPreemptionHandler:

  def test_sigterm_sets_flag_instead_of_killing(self):
    with resilience.PreemptionHandler() as handler:
      assert not handler.triggered
      os.kill(os.getpid(), signal.SIGTERM)
      assert handler.triggered  # still alive, flag set

  def test_previous_handler_restored(self):
    before = signal.getsignal(signal.SIGTERM)
    with resilience.PreemptionHandler():
      assert signal.getsignal(signal.SIGTERM) != before
    assert signal.getsignal(signal.SIGTERM) == before


class TestRetries:

  def test_retries_then_succeeds(self):
    calls = []

    @resilience.with_retries(retries=3, backoff_s=0.0)
    def flaky():
      calls.append(1)
      if len(calls) < 3:
        raise OSError("transient")
      return "ok"

    assert flaky() == "ok"
    assert len(calls) == 3

  def test_exhausted_retries_reraise(self):
    @resilience.with_retries(retries=2, backoff_s=0.0)
    def always_fails():
      raise OSError("permanent")

    with pytest.raises(OSError, match="permanent"):
      always_fails()

  def test_unlisted_exception_not_retried(self):
    calls = []

    @resilience.with_retries(retries=3, backoff_s=0.0)
    def boom():
      calls.append(1)
      raise ValueError("logic bug")

    with pytest.raises(ValueError):
      boom()
    assert len(calls) == 1


class TestNonfiniteGuard:

  def test_nan_step_is_skipped_finite_step_applies(self):
    tx = resilience.skip_nonfinite_updates(optax.sgd(1.0))
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)

    nan_grads = {"w": jnp.array([1.0, jnp.nan, 1.0])}
    updates, state = tx.update(nan_grads, state, params)
    after_nan = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(after_nan["w"], params["w"])
    assert resilience.nonfinite_count(state) == 1

    good = {"w": jnp.full((3,), 0.5)}
    updates, state = tx.update(good, state, params)
    after_good = optax.apply_updates(params, updates)
    np.testing.assert_allclose(after_good["w"], 0.5 * np.ones(3))
    assert resilience.nonfinite_count(state) == 0


@pytest.fixture(scope="module")
def tiny():
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
  model = griffin.Griffin(config, dtype=jnp.float32, param_dtype=jnp.float32)
  params = model.init(
      jax.random.PRNGKey(0), jnp.ones((1, 6), jnp.int32), jnp.arange(6)[None]
  )["params"]
  return vocab, model, params


def _dataset(vocab, d, n=8):
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
      vocab=vocab, json_path=path, max_seq_len=16, batch_size=1
  )


class TestPreemptibleTraining:

  def test_preempted_run_saves_state_and_resumes(self, tiny):
    vocab, model, params = tiny
    # The train step donates param buffers; work on a private copy so the
    # module-scoped fixture survives for other tests.
    params = jax.tree_util.tree_map(jnp.copy, params)
    with tempfile.TemporaryDirectory() as d:
      ds = _dataset(vocab, d)

      handler = resilience.PreemptionHandler()

      def interrupted(ds, at_step):
        """Yields batches, delivering SIGTERM during batch `at_step`."""
        for i, batch in enumerate(ds):
          if i == at_step - 1:
            os.kill(os.getpid(), signal.SIGTERM)
          yield batch

      cfg = train_loop.TrainingConfig(
          learning_rate=1e-2, eval_every_n=100,
          checkpoint_dir=os.path.join(d, "ckpt"),
          checkpoint_every_n=None,
      )
      with handler:
        out = train_loop.train_loop(
            model, params, interrupted(ds, at_step=3), cfg,
            pad_id=vocab.pad_id(), preemption=handler,
        )
      save_dir = os.path.join(d, "ckpt", "preempted_step_3")
      assert os.path.isdir(save_dir)  # stopped at step 3 of 8, state saved

      # Resume: continues from step 3 and finishes the remaining batches.
      resumed_cfg = train_loop.TrainingConfig(
          learning_rate=1e-2, eval_every_n=100,
          resume_from=save_dir, max_steps=8,
      )
      final = train_loop.train_loop(
          model, out, _dataset(vocab, d), resumed_cfg,
          pad_id=vocab.pad_id(),
      )
      # Training actually progressed past the preemption point.
      diff = jax.tree_util.tree_map(
          lambda a, b: float(jnp.abs(a - b).max()), final, out
      )
      assert max(jax.tree_util.tree_leaves(diff)) > 0

  def test_loop_with_nonfinite_guard_runs(self, tiny):
    vocab, model, params = tiny
    params = jax.tree_util.tree_map(jnp.copy, params)
    with tempfile.TemporaryDirectory() as d:
      cfg = train_loop.TrainingConfig(
          learning_rate=1e-2, eval_every_n=100, max_steps=2,
          skip_nonfinite_updates=True,
      )
      out = train_loop.train_loop(
          model, params, _dataset(vocab, d), cfg, pad_id=vocab.pad_id()
      )
      assert jax.tree_util.tree_leaves(out)
