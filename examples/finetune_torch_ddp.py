"""Torch-path DDP fine-tune CLI (counterpart of reference training/train.py).

The reference script spawns one NCCL rank per GPU and wraps Griffin in
DDP (``train.py:597-624,708-709``). This twin does the same on the gloo
backend — ``--world_size`` CPU ranks on one host — with this framework's
exact-global-batch loss normalization (see
``cadence_gemma_tpu/torch/distributed.py``). Checkpoints load from a
torch ``.pt`` state dict or an orbax/flax directory (converted on the
fly) and save periodically like the reference's every-100-steps
``torch.save`` (``train.py:295-298``), but to an explicit path, written
atomically, and only from rank 0.

Flag values are snapshotted into a plain dict before ``mp.spawn``: the
spawned workers re-import this module without parsing argv, so absl
flags must not be read inside them.

Example (smoke-run on synthetic data):
  python examples/finetune_torch_ddp.py --world_size=2 --steps=4
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from absl import app
from absl import flags

_CHECKPOINT = flags.DEFINE_string(
    "checkpoint_path", None,
    "torch .pt state dict, or an orbax checkpoint directory; omit for a "
    "small randomly-initialized smoke model.",
)
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece.")
_TRAIN_JSON = flags.DEFINE_string("train_json", None, "LLaVA-style JSON.")
_IMAGE_ROOT = flags.DEFINE_string("image_root", "", "Image directory.")
_OUTPUT = flags.DEFINE_string("output_path", "./cadence_torch_ddp.pt",
                              "Checkpoint path (rank 0 writes).")
_WORLD = flags.DEFINE_integer("world_size", 2, "Number of DDP ranks.")
_BATCH = flags.DEFINE_integer("batch_size", 4, "GLOBAL batch size.")
_SEQ_LEN = flags.DEFINE_integer("max_seq_len", 256, "Sequence length.")
_LR = flags.DEFINE_float("learning_rate", 1e-5, "AdamW learning rate.")
_STEPS = flags.DEFINE_integer("steps", 100, "Optimizer steps.")
_ACCUM = flags.DEFINE_integer(
    "accumulation_steps", 1,
    "Microbatches per optimizer step (reference uses 4 via Accelerate, "
    "train.py:37; here via DDP no_sync).")
_SAVE_EVERY = flags.DEFINE_integer("save_every", 100, "Save period.")


def _load_model(opts):
  import torch

  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.torch import griffin as th_griffin

  if opts["checkpoint"]:
    import cadence_gemma_tpu as cg
    from cadence_gemma_tpu.torch import test_utils

    if os.path.isdir(opts["checkpoint"]):
      params = cg.load_parameters(opts["checkpoint"])
      config = cg.GriffinConfig.from_flax_params_or_variables(params)
      model = th_griffin.Griffin(config)
      test_utils.flax_params_to_torch_module(params, model)
    else:
      state = torch.load(opts["checkpoint"], map_location="cpu")
      state = state.get("params", state)
      config = cg.GriffinConfig.from_torch_params(state)
      model = th_griffin.Griffin(config)
      model.load_state_dict(state, strict=False)
    return model, config

  torch.manual_seed(0)
  config = common.GriffinConfig(
      vocab_size=256, width=64, mlp_expanded_width=128, num_heads=4,
      block_types=(common.TemporalBlockType.RECURRENT,
                   common.TemporalBlockType.ATTENTION),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=32,
      logits_soft_cap=30.0, lru_width=64,
      scan_type=common.ScanType.LINEAR_NATIVE,
  )
  return th_griffin.Griffin(config), config


def _batches(opts, config, rank):
  """Per-rank shards of each global batch; every rank yields equally."""
  import torch

  from cadence_gemma_tpu.torch import distributed as th_dist

  n = opts["steps"] * opts["accum"]
  if opts["train_json"]:
    import cadence_gemma_tpu as cg
    from cadence_gemma_tpu.training import data as data_lib

    builder = data_lib.DatasetBuilder(
        vocab=cg.load_sentencepiece(opts["tokenizer"]),
        json_path=opts["train_json"], image_root=opts["image_root"],
        max_seq_len=opts["seq_len"], batch_size=opts["batch"],
    )
    src = iter(builder)
    for _ in range(n):
      try:
        b = next(src)
      except StopIteration:
        return
      tokens = torch.from_numpy(b.input_tokens).long()
      mask = torch.from_numpy(b.target_mask)
      yield (th_dist.shard_batch(tokens, rank, opts["world"]),
             th_dist.shard_batch(mask, rank, opts["world"]))
  else:
    g = torch.Generator().manual_seed(17)
    for _ in range(n):
      tokens = torch.randint(
          1, config.vocab_size, (opts["batch"], opts["seq_len"]),
          generator=g)
      mask = torch.ones_like(tokens, dtype=torch.bool)
      mask[:, 0] = False
      yield (th_dist.shard_batch(tokens, rank, opts["world"]),
             th_dist.shard_batch(mask, rank, opts["world"]))


def _worker(rank, world, opts):
  from cadence_gemma_tpu.torch import distributed as th_dist
  from cadence_gemma_tpu.torch import trainer as th_trainer

  th_dist.setup(rank, world)
  try:
    model, config = _load_model(opts)
    ddp = th_dist.wrap_ddp(model)
    opt = th_trainer.make_optimizer(ddp, opts["lr"])
    losses = th_dist.ddp_train_epoch(
        ddp, opt, 0, _batches(opts, config, rank),
        accumulation_steps=opts["accum"],
        save_every=opts["save_every"], save_path=opts["output"],
    )
    if rank == 0 and losses:
      for i in range(0, len(losses), 10):
        print(f"microbatch {i}: loss {losses[i]:.4f}")
      print(f"final loss {losses[-1]:.4f} over {len(losses)} microbatches")
      th_trainer.save_checkpoint(opts["output"], ddp.module)
      print(f"saved {opts['output']}")
  finally:
    th_dist.cleanup()


def main(argv):
  del argv
  from cadence_gemma_tpu.torch import distributed as th_dist

  opts = {
      "checkpoint": _CHECKPOINT.value,
      "tokenizer": _TOKENIZER.value,
      "train_json": _TRAIN_JSON.value,
      "image_root": _IMAGE_ROOT.value,
      "output": _OUTPUT.value,
      "world": _WORLD.value,
      "batch": _BATCH.value,
      "seq_len": _SEQ_LEN.value,
      "lr": _LR.value,
      "steps": _STEPS.value,
      "accum": _ACCUM.value,
      "save_every": _SAVE_EVERY.value,
  }
  th_dist.run_workers(_worker, _WORLD.value, (opts,))


if __name__ == "__main__":
  app.run(main)
