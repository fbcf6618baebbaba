"""Multimodal SFT CLI (counterpart of reference training/train_jax.py main).

Example:
  python examples/finetune.py \
      --checkpoint_path=/ckpts/2b-it --tokenizer_path=/ckpts/tok.model \
      --vision_checkpoint=/ckpts/dino_siglip \
      --train_json=llava_instruct_150k.json --image_root=/data/coco \
      --output_dir=/ckpts/cadence-2b
"""

import jax
from absl import app
from absl import flags

import cadence_gemma_tpu as cg
from cadence_gemma_tpu.models import vit as vit_lib
from cadence_gemma_tpu.training import data as data_lib
from cadence_gemma_tpu.training import train_loop
from cadence_gemma_tpu.utils import logging as logging_lib

_CHECKPOINT = flags.DEFINE_string("checkpoint_path", None, "LM checkpoint.")
_VISION_CKPT = flags.DEFINE_string("vision_checkpoint", None,
                                   "DinoSigLIPEncoder checkpoint.")
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece.")
_TRAIN_JSON = flags.DEFINE_string("train_json", None, "LLaVA-style JSON.")
_VAL_JSON = flags.DEFINE_string("val_json", None, "Validation JSON.")
_IMAGE_ROOT = flags.DEFINE_string("image_root", "", "Image directory.")
_OUTPUT = flags.DEFINE_string("output_dir", None, "Where to save params.")
_BATCH = flags.DEFINE_integer("batch_size", 1, "Batch size.")
_SEQ_LEN = flags.DEFINE_integer("max_seq_len", 1024, "Sequence length.")
_LR1 = flags.DEFINE_float("stage1_lr", 1e-4, "Frozen-stage learning rate.")
_LR2 = flags.DEFINE_float("stage2_lr", 1e-5, "Full-stage learning rate.")
_STEPS1 = flags.DEFINE_integer("stage1_steps", 1000, "Frozen-stage steps.")
_STEPS2 = flags.DEFINE_integer("stage2_steps", 4000, "Full-stage steps.")
_PRESET = flags.DEFINE_enum_class(
    "preset", cg.Preset.RECURRENT_GEMMA_2B_V1, cg.Preset, "Preset.")
_METRICS = flags.DEFINE_enum(
    "metrics", "stdout", ["stdout", "jsonl", "mlflow", "wandb"],
    "Metric-logging backend (utils/logging.py adapters; the reference "
    "hard-wires mlflow in train_jax.py:615,765).")
_METRICS_TARGET = flags.DEFINE_string(
    "metrics_target", "",
    "Backend target: mlflow tracking URI, wandb project, or jsonl path.")
_LORA_RANK = flags.DEFINE_integer(
    "lora_rank", 0,
    "When > 0, stage 2 trains LoRA adapters of this rank instead of the "
    "full tree (training/lora.py): the base stays frozen (optionally int8 "
    "via --lora_int8_base), gradients/Adam moments exist only at adapter "
    "size, and the final save folds the adapters into plain weights.")
_LORA_INT8 = flags.DEFINE_bool(
    "lora_int8_base", False,
    "QLoRA-style: quantize the frozen base to int8 before adapter "
    "training (fits the 9B preset on one 16 GB chip). The final save "
    "keeps base + adapters unmerged (int8 cannot be folded losslessly).")
_GRAD_ACCUM = flags.DEFINE_integer(
    "gradient_accumulation_steps", 1,
    "Average gradients over this many microbatches before each optimizer "
    "update (the reference torch loop uses Accelerate's "
    "gradient_accumulation_steps=4, train.py:37). Steps count "
    "microbatches.")
_MESH = flags.DEFINE_string(
    "mesh", "",
    "Device mesh for the full/LoRA stage as 'axis:size,...' (e.g. "
    "'data:2,model:4'): the stage runs the pjit-ted sharded step "
    "(train_loop(mesh=...)); axis names follow parallel/partitioning.py "
    "('data' shards the batch, 'model' applies Megatron TP layouts). "
    "The frozen connector stage always runs single-device. Empty = "
    "single device (the reference JAX loop's only mode).")


def _parse_mesh(spec: str):
  if not spec:
    return None
  from cadence_gemma_tpu.parallel import sharding as sharding_lib

  names, sizes = [], []
  for part in spec.split(","):
    name, _, size = part.partition(":")
    names.append(name.strip())
    sizes.append(int(size))
  return sharding_lib.make_mesh(sizes, names)


def main(argv):
  del argv
  params = cg.load_parameters(_CHECKPOINT.value, "single_device")
  params = params.get("params", params)
  config = cg.GriffinConfig.from_flax_params_or_variables(
      params, preset=_PRESET.value
  )
  model = cg.Griffin(config)
  vocab = cg.load_sentencepiece(_TOKENIZER.value)
  lora_rank = _LORA_RANK.value
  if _LORA_INT8.value and not lora_rank:
    raise app.UsageError(
        "--lora_int8_base requires --lora_rank > 0: without adapters the "
        "run is plain full-tree SFT and the int8 flag would be silently "
        "ignored."
    )

  encoder = vit_lib.DinoSigLIPEncoder()
  vision_params = cg.load_parameters(_VISION_CKPT.value, "single_device")
  vision_params = vision_params.get("params", vision_params)
  encode = jax.jit(
      lambda px: encoder.apply({"params": vision_params}, px)
  )

  def make_data():
    return data_lib.DatasetBuilder(
        vocab=vocab,
        json_path=_TRAIN_JSON.value,
        image_root=_IMAGE_ROOT.value,
        max_seq_len=_SEQ_LEN.value,
        batch_size=_BATCH.value,
        load_pixels=True,
    )

  val = None
  if _VAL_JSON.value:
    val = data_lib.DatasetBuilder(
        vocab=vocab,
        json_path=_VAL_JSON.value,
        image_root=_IMAGE_ROOT.value,
        max_seq_len=_SEQ_LEN.value,
        batch_size=_BATCH.value,
        load_pixels=True,
    )

  stage1 = train_loop.TrainingConfig(
      learning_rate=_LR1.value, max_steps=_STEPS1.value,
      batch_size=_BATCH.value, checkpoint_dir=_OUTPUT.value,
      gradient_accumulation_steps=_GRAD_ACCUM.value,
  )
  stage2 = train_loop.TrainingConfig(
      learning_rate=_LR2.value, max_steps=_STEPS2.value,
      batch_size=_BATCH.value, checkpoint_dir=_OUTPUT.value,
      gradient_accumulation_steps=_GRAD_ACCUM.value,
  )
  backend = _METRICS.value
  target = _METRICS_TARGET.value
  log_kwargs = {
      "jsonl": {"path": target or f"{_OUTPUT.value}/metrics.jsonl"},
      "mlflow": {"tracking_uri": target or None, "run_name": "sft"},
      "wandb": {"project": target or "cadence-gemma-tpu"},
      "stdout": {},
  }[backend]
  log_metrics = logging_lib.make_logger(backend, **log_kwargs)
  mesh = _parse_mesh(_MESH.value)

  if lora_rank:
    import dataclasses

    import jax.numpy as jnp

    # Stage 1 (connector) as usual, then LoRA-adapt everything else.
    params = train_loop.train_loop(
        model, params, make_data(),
        dataclasses.replace(stage1, freeze_llm=True),
        validation_data=val, encode_image=encode,
        pad_id=vocab.pad_id(), log_metrics=log_metrics,
    )
    lora_model = cg.Griffin(
        config, lora_rank=lora_rank, quantized=_LORA_INT8.value
    )
    if _LORA_INT8.value:
      params = cg.quantize_params(params)
    adapters = cg.lora.init_adapters(lora_model, jax.random.PRNGKey(0))
    adapters = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), adapters
    )
    params = cg.lora.merge_params(params, adapters)
    params = train_loop.train_loop(
        lora_model, params, make_data(),
        dataclasses.replace(stage2, lora=True),
        validation_data=val, encode_image=encode,
        pad_id=vocab.pad_id(), log_metrics=log_metrics, mesh=mesh,
    )
    if not _LORA_INT8.value:
      params = cg.lora.merge_lora(params)  # adapter-free serving tree
  else:
    params = train_loop.two_stage_sft(
        model, params, make_data, stage1, stage2,
        validation_data=val, encode_image=encode,
        pad_id=vocab.pad_id(), log_metrics=log_metrics, mesh=mesh,
    )
  cg.save_parameters(f"{_OUTPUT.value}/final", params)


if __name__ == "__main__":
  flags.mark_flags_as_required(
      ["checkpoint_path", "tokenizer_path", "train_json", "output_dir",
       "vision_checkpoint"]
  )
  app.run(main)
