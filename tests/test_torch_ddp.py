"""Torch DDP (gloo) data-parallel training: exactness vs single process.

The reference trains its torch path with DDP over NCCL
(``/root/reference/training/train.py:597-624,708-709``); this framework's
gloo twin (:mod:`cadence_gemma_tpu.torch.distributed`) is defined so the
2-rank DDP step reproduces the single-process step on the concatenated
global batch *exactly* (global-mask-count loss normalization — the same
semantics the JAX sharded trainer gets from GSPMD's global
``sum(target_mask)``). These tests spawn real worker processes and assert:

  * per-rank scaled losses all-reduce to the single-process loss;
  * post-step parameters are bit-identical across ranks (DDP averaged
    gradients + deterministic AdamW, no broadcast needed);
  * post-step parameters match the single-process full-batch step
    (text-only, image-spliced, and 2-microbatch accumulation variants).
"""

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not torch.distributed.is_available():  # pragma: no cover
  pytest.skip("torch.distributed unavailable", allow_module_level=True)

from cadence_gemma_tpu import common  # noqa: E402
from cadence_gemma_tpu.torch import distributed as th_dist  # noqa: E402
from cadence_gemma_tpu.torch import griffin as th_griffin  # noqa: E402
from cadence_gemma_tpu.torch import trainer as th_trainer  # noqa: E402

PAD = 0
WORLD = 2


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


def _global_batch(rows=4, seq=6, seed=3):
  """Deterministic ragged batch whose mask counts DIFFER between the rank
  slices — the case where naive per-rank normalization diverges from the
  global-batch gradient."""
  g = torch.Generator().manual_seed(seed)
  tokens = torch.randint(1, 32, (rows, seq), generator=g)
  mask = torch.zeros(rows, seq, dtype=torch.bool)
  for r in range(rows):
    mask[r, 1 + (r % 3):] = True  # rows carry 5/4/3/5... masked targets
    if r % 2:
      tokens[r, -1] = PAD
  img = torch.randn(rows, 3, 12, generator=g)
  return tokens, mask, img


def _fresh_model(seed=0):
  torch.manual_seed(seed)
  return th_griffin.Griffin(_config())


def _single_step(with_image, accumulation, lr=1e-2):
  """Single-process oracle on the full global batch."""
  model = _fresh_model()
  opt = th_trainer.make_optimizer(model, lr)
  if accumulation == "tail":
    tokens, mask, _ = _global_batch(rows=12)
    loss = th_trainer.train_epoch(
        model, opt, PAD,
        [(tokens[4 * i:4 * (i + 1)], mask[4 * i:4 * (i + 1)])
         for i in range(3)],
        accumulation_steps=2,
    )
    return model, loss
  tokens, mask, img = _global_batch(rows=8 if accumulation else 4)
  if accumulation:
    losses = []
    for i in range(2):
      sl = slice(4 * i, 4 * (i + 1))
      losses.append(th_trainer.train_step(
          model, opt, PAD, tokens[sl], mask[sl],
          img_embed=img[sl] if with_image else None,
          accumulation_steps=2, accumulation_index=i,
      ))
    loss = losses
  else:
    loss = th_trainer.train_step(
        model, opt, PAD, tokens, mask,
        img_embed=img if with_image else None,
    )
  return model, loss


CASES = [  # (name, with_image, accumulation)
    ("text", False, False),
    ("image", True, False),
    ("accum2", False, True),
    # 3 microbatches with accumulation_steps=2: the partial tail group
    # must still step (manual all-reduce flush), matching train_epoch.
    ("tail", False, "tail"),
]


def _worker(rank, world, tmpdir):
  """Runs ALL cases in one process group — jax/torch import dominates
  spawn cost, so one spawn for the whole matrix is ~3x faster than one
  per case."""
  from torch.distributed.algorithms.ddp_comm_hooks import default_hooks

  th_dist.setup(rank, world,
                init_method=f"file://{os.path.join(tmpdir, 'store')}")
  try:
    out = {}
    for name, with_image, accumulation in CASES:
      model = th_dist.wrap_ddp(_fresh_model())
      # Count gradient-sync all-reduces: under correct no_sync usage the
      # hook fires once per completed group x bucket, NOT per microbatch
      # (DDP latches the sync flag at FORWARD time — wrapping only the
      # backward silently syncs every microbatch).
      syncs = {"n": 0}

      def counting_hook(state, bucket, _c=syncs):
        _c["n"] += 1
        return default_hooks.allreduce_hook(state, bucket)

      model.register_comm_hook(None, counting_hook)
      opt = th_trainer.make_optimizer(model, 1e-2)
      if accumulation == "tail":
        tokens, mask, _ = _global_batch(rows=12)
        losses = th_dist.ddp_train_epoch(
            model, opt, PAD,
            [(th_dist.shard_batch(tokens[4 * i:4 * (i + 1)], rank, world),
              th_dist.shard_batch(mask[4 * i:4 * (i + 1)], rank, world))
             for i in range(3)],
            accumulation_steps=2,
        )
        out[name] = {
            "losses": losses,
            "sync_calls": syncs["n"],
            "state": {k: v.clone()
                      for k, v in model.module.state_dict().items()},
        }
        continue
      tokens, mask, img = _global_batch(rows=8 if accumulation else 4)
      losses = []
      if accumulation:
        # 2 microbatches x 2 ranks x 2 rows; rank r takes its slice of
        # each global microbatch.
        for i in range(2):
          mb = slice(4 * i, 4 * (i + 1))
          t = th_dist.shard_batch(tokens[mb], rank, world)
          m = th_dist.shard_batch(mask[mb], rank, world)
          im = (th_dist.shard_batch(img[mb], rank, world)
                if with_image else None)
          loss = th_dist.ddp_train_step(
              model, opt, PAD, t, m, img_embed=im,
              accumulation_steps=2, accumulation_index=i,
          )
          losses.append(float(th_dist.reduce_mean_loss(loss)))
      else:
        t = th_dist.shard_batch(tokens, rank, world)
        m = th_dist.shard_batch(mask, rank, world)
        im = th_dist.shard_batch(img, rank, world) if with_image else None
        loss = th_dist.ddp_train_step(model, opt, PAD, t, m, img_embed=im)
        losses.append(float(th_dist.reduce_mean_loss(loss)))
      out[name] = {
          "losses": losses,
          "sync_calls": syncs["n"],
          "state": {k: v.clone()
                    for k, v in model.module.state_dict().items()},
      }
    torch.save(out, os.path.join(tmpdir, f"rank{rank}.pt"))
  finally:
    th_dist.cleanup()


@pytest.fixture(scope="module")
def ddp_results():
  import torch.multiprocessing as mp

  with tempfile.TemporaryDirectory() as tmpdir:
    mp.spawn(_worker, args=(WORLD, tmpdir), nprocs=WORLD, join=True)
    return [torch.load(os.path.join(tmpdir, f"rank{r}.pt"))
            for r in range(WORLD)]


@pytest.mark.parametrize("name,with_image,accumulation", CASES,
                         ids=[c[0] for c in CASES])
def test_ddp_matches_single_process(ddp_results, name, with_image,
                                    accumulation):
  results = [r[name] for r in ddp_results]
  oracle_model, oracle_loss = _single_step(with_image, accumulation)

  # Ranks bit-identical after the step (averaged grads + same optimizer).
  for k, v in results[0]["state"].items():
    assert torch.equal(v, results[1]["state"][k]), k

  # All-reduced loss == single-process full-batch loss. With accumulation
  # the oracle's per-microbatch losses use that microbatch's own (global)
  # count — same as the DDP normalization per microbatch.
  oracle_losses = (
      [float(l) for l in oracle_loss] if accumulation
      else [float(oracle_loss)]
  )
  np.testing.assert_allclose(results[0]["losses"], oracle_losses,
                             rtol=1e-5, atol=1e-6)

  # Post-step parameters match the full-batch single-process step (fp32
  # summation-order tolerance: per-rank partial sums + one all-reduce).
  oracle_state = oracle_model.state_dict()
  for k, v in results[0]["state"].items():
    np.testing.assert_allclose(
        v.numpy(), oracle_state[k].numpy(), rtol=2e-4, atol=2e-5,
        err_msg=k,
    )


def test_shard_batch_partitions():
  rows = torch.arange(12).reshape(6, 2)
  parts = [th_dist.shard_batch(rows, r, 3) for r in range(3)]
  assert torch.equal(torch.cat(parts), rows)
  with pytest.raises(ValueError):
    th_dist.shard_batch(rows, 0, 4)


def test_gradient_sync_fires_once_per_group(ddp_results):
  """Every case completes exactly ONE synced accumulation group, so the
  comm-hook call count (groups x buckets) must be identical across the
  1-microbatch, 2-microbatch, and 2+tail cases — a per-microbatch sync
  (the wrap-only-backward no_sync bug) would double it for accum2/tail."""
  counts = {name: ddp_results[0][name]["sync_calls"]
            for name, _, _ in CASES}
  assert counts["accum2"] == counts["text"], counts
  assert counts["tail"] == counts["text"], counts
  assert counts["text"] > 0, counts
