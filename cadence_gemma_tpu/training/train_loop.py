"""Two-stage multimodal SFT loop (frozen-connector → full fine-tune).

Counterpart of reference ``train_loop`` (``training/train_jax.py:566-792``):
stage 1 trains only the vision-language connector with the LM frozen, stage
2 fine-tunes everything; periodic validation; optional metric-logging hook
(the reference hard-wires mlflow, ``train_jax.py:615,765``).

The vision encoder here is a jitted JAX module invoked inside the data →
device pipeline, not a host torch model per batch.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Iterable

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from cadence_gemma_tpu.checkpoint import io as checkpoint_io
from cadence_gemma_tpu.training import data as data_lib
from cadence_gemma_tpu.training import trainer
from cadence_gemma_tpu.utils import resilience


@chex.dataclass(frozen=True)
class TrainingConfig:
  """Hyper-parameters for one SFT stage (reference train_jax.py:46-57)."""

  learning_rate: float = 1e-5
  num_epochs: int = 1
  eval_every_n: int = 200
  batch_size: int = 1
  max_steps: int | None = None
  weight_decay: float = 0.1
  freeze_llm: bool = False
  # Train only LoRA adapter leaves (the model must be built with
  # lora_rank > 0 and ``params`` must contain the adapter leaves, e.g.
  # via training.lora.init_adapters + merge_params). The base tree —
  # bf16 or int8-quantized — stays frozen; gradients and Adam moments
  # exist only at adapter size, which is what fits 2B/9B fine-tuning in
  # one chip's HBM. Checkpoints and validation see the combined tree.
  lora: bool = False
  # Apply the optimizer update every K loop steps, averaging gradients
  # over the window (optax.MultiSteps) — the JAX equivalent of the
  # reference torch loop's Accelerate gradient_accumulation_steps=4
  # (``training/train.py:37``). ``max_steps``/``eval_every_n`` keep
  # counting microbatches (loop iterations), matching Accelerate.
  # Composes with ``skip_nonfinite_updates`` (a non-finite microbatch
  # voids that window's update, not the accumulator state) and with
  # ``mesh``/``lora`` (the accumulator shards like the gradients).
  gradient_accumulation_steps: int = 1
  checkpoint_every_n: int | None = 1000
  checkpoint_dir: str | None = None
  resume_from: str | None = None  # a save_train_state checkpoint
  # Apply a zero update (instead of poisoning params) on steps whose
  # gradients contain NaN/Inf; see utils.resilience.skip_nonfinite_updates.
  skip_nonfinite_updates: bool = False
  # Prefetch this many batches to the device on a background thread
  # (data.prefetch_to_device), hiding host tokenize/decode + H2D behind
  # device compute. 0 = synchronous (default); the producer runs ahead,
  # so keep 0 for iterators with step-synchronized side effects.
  prefetch_batches: int = 0
  # Write periodic checkpoints on a background thread (orbax async):
  # training continues during the write instead of pausing for it.
  # Preemption saves stay synchronous (they must be durable before exit).
  async_checkpoints: bool = False


def train_loop(
    model,
    params: Any,
    train_data: Iterable,
    config: TrainingConfig,
    validation_data: Iterable | None = None,
    encode_image: Callable[[Any], jax.Array] | None = None,
    log_metrics: Callable[[dict[str, float], int], None] | None = None,
    pad_id: int = 0,
    preemption: resilience.PreemptionHandler | None = None,
    mesh: jax.sharding.Mesh | None = None,
):
  """Runs one SFT stage; returns the updated params.

  Args:
    model: The Griffin model.
    params: Parameter tree (mutated functionally; donated per step).
    train_data: Iterable of ``TrainingInput`` batches.
    config: Stage hyper-parameters (``freeze_llm`` selects the frozen step).
    validation_data: Optional iterable re-iterated at each eval point.
    encode_image: Optional ``pixels|paths -> [b, n, vision_width]`` feature
      fn (e.g. a jitted DinoSigLIPEncoder); when None, batches must already
      carry feature tensors or be text-only.
    log_metrics: Optional callback ``(metrics_dict, step)``.
    pad_id: Tokenizer pad id.
    preemption: Optional SIGTERM watcher; when it fires, the loop saves a
      resumable train state under ``config.checkpoint_dir`` and returns
      early (restart with ``config.resume_from`` pointing at it).
    mesh: Optional device mesh. When given, the step is the pjit-ted
      sharded one (``trainer.make_sharded_train_step``, or
      ``lora.make_sharded_lora_step`` with ``config.lora``): parameters
      take the Megatron TP layouts when the mesh has a
      ``partitioning.MODEL_AXIS`` axis, batches shard over
      ``partitioning.BATCH_AXIS`` (batch size must divide by that axis
      size), and checkpoint/resume/preemption/eval work unchanged —
      restored state is re-placed onto the mesh before training resumes.
      ``freeze_llm`` stages are connector-only (tiny) and deliberately
      stay single-device.
  """
  if config.lora:
    if config.freeze_llm:
      raise ValueError(
          "config.lora and config.freeze_llm are mutually exclusive: the "
          "frozen stage trains the vl_connector with everything else "
          "frozen, LoRA trains adapters with the base frozen — pick one "
          "per stage (two_stage_sft runs freeze_llm first, then lora)."
      )
    if config.weight_decay != type(config).weight_decay:
      import warnings

      warnings.warn(
          "TrainingConfig.weight_decay is ignored when lora=True: LoRA "
          "adapters train with plain Adam (lora.make_optimizer), the "
          "standard no-decay setup for low-rank adapters.",
          stacklevel=2,
      )
    from cadence_gemma_tpu.training import lora as lora_lib

    adapters0, base0 = lora_lib.split_lora(params)
    if not adapters0:
      raise ValueError(
          "config.lora=True but the parameter tree has no lora_a/lora_b "
          "leaves — build the model with lora_rank > 0 and initialize "
          "adapters (training.lora.init_adapters)."
      )
    optimizer = lora_lib.make_optimizer(config.learning_rate)
  else:
    optimizer = trainer.make_optimizer(
        config.learning_rate, weight_decay=config.weight_decay
    )
  if config.skip_nonfinite_updates:
    optimizer = resilience.skip_nonfinite_updates(optimizer)
  if config.gradient_accumulation_steps > 1:
    # Outermost, so the inner optimizer (incl. apply_if_finite) only sees
    # the window-averaged gradient at each K-th step.
    optimizer = optax.MultiSteps(
        optimizer, every_k_schedule=config.gradient_accumulation_steps
    ).gradient_transformation()
  reshard_params = None
  if mesh is not None:
    if config.freeze_llm:
      raise ValueError(
          "mesh is not supported with freeze_llm=True: the frozen stage "
          "trains only the (tiny) vision-language connector — run it "
          "single-device and pass the mesh to the full stage."
      )
    if config.lora:
      sharded_step, lora_shard_fn = lora_lib.make_sharded_lora_step(
          model, optimizer, mesh, pad_id, adapters0, base0
      )

      def reshard_params(tree):
        adapters, base = lora_lib.split_lora(tree)
        adapters, base = lora_shard_fn(adapters, base)
        return lora_lib.merge_params(base, adapters)

      params = reshard_params(params)
      opt_state = optimizer.init(lora_lib.split_lora(params)[0])

      def step_fn(model, params, optimizer, opt_state, pad_id, tokens,
                  mask, img_embed=None):
        adapters, base = lora_lib.split_lora(params)
        loss, adapters, opt_state = sharded_step(
            adapters, base, opt_state, tokens, mask, img_embed
        )
        return loss, lora_lib.merge_params(base, adapters), opt_state

    else:
      sharded_step, reshard_params = trainer.make_sharded_train_step(
          model, optimizer, mesh, pad_id=pad_id, example_params=params
      )
      params = reshard_params(params)
      opt_state = optimizer.init(params)

      def step_fn(model, params, optimizer, opt_state, pad_id, tokens,
                  mask, img_embed=None):
        return sharded_step(params, opt_state, tokens, mask, img_embed)

  elif config.lora:
    # The loop threads the COMBINED tree (validation and checkpoints see
    # a complete, servable tree); each step splits it on the host, runs
    # the adapter-only jitted step (the frozen base rides as an explicit
    # argument — CLAUDE.md gotcha #8: closed-over weights lower as
    # multi-GB constants), and re-merges. Optimizer state is
    # adapter-sized throughout.
    opt_state = optimizer.init(adapters0)

    def step_fn(model, params, optimizer, opt_state, pad_id, tokens,
                mask, img_embed=None):
      adapters, base = lora_lib.split_lora(params)
      loss, adapters, opt_state = lora_lib.lora_train_step(
          model, adapters, base, optimizer, opt_state, pad_id, tokens,
          mask, img_embed,
      )
      return loss, lora_lib.merge_params(base, adapters), opt_state

  elif config.freeze_llm:
    opt_state = optimizer.init(params["vl_connector"])
    step_fn = trainer.frozen_train_step
  else:
    opt_state = optimizer.init(params)
    step_fn = trainer.train_step

  step = 0
  if config.resume_from:
    # Restore into the freshly-initialized structures so optax NamedTuple
    # states survive the round trip (saved params are always the full
    # tree; in frozen mode opt_state covers only the connector).
    if mesh is not None:
      # optimizer.init on sharded params produced correctly-sharded
      # moments (zeros_like preserves shardings); capture those layouts so
      # the restored values can be re-placed identically. Scalars like
      # optax's step count come out of init as UNCOMMITTED single-device
      # arrays (compatible with any mesh); committing a restored scalar
      # back to one device would conflict with the mesh-resident params,
      # so anything not already on this mesh is replicated instead.
      replicated = jax.sharding.NamedSharding(
          mesh, jax.sharding.PartitionSpec()
      )
      opt_shardings = jax.tree_util.tree_map(
          lambda x: x.sharding
          if isinstance(x.sharding, jax.sharding.NamedSharding)
          and x.sharding.mesh == mesh
          else replicated,
          opt_state,
      )
    params, opt_state, step = checkpoint_io.load_train_state(
        config.resume_from, target=(params, opt_state)
    )
    if mesh is not None:
      params = reshard_params(params)
      opt_state = jax.tree_util.tree_map(
          jax.device_put, opt_state, opt_shardings
      )

  t_start = time.perf_counter()
  saver_ctx = (
      checkpoint_io.AsyncTrainStateSaver()
      if config.async_checkpoints
      else contextlib.nullcontext(None)
  )
  with saver_ctx as saver:
    params = _run_stage(
        model, params, optimizer, opt_state, step, train_data, config,
        encode_image, pad_id, validation_data, log_metrics, preemption,
        step_fn, t_start, saver,
    )
  return params


def _run_stage(model, params, optimizer, opt_state, step, train_data,
               config, encode_image, pad_id, validation_data, log_metrics,
               preemption, step_fn, t_start, saver):
  """All epochs of one stage (factored so the async saver scope wraps it)."""
  for _ in range(config.num_epochs):
    epoch_data = (
        contextlib.closing(
            data_lib.prefetch_to_device(
                iter(train_data), config.prefetch_batches
            )
        )
        if config.prefetch_batches
        else contextlib.nullcontext(train_data)
    )
    with epoch_data as epoch_iter:
      # `closing` shuts the prefetch producer down deterministically on
      # every exit path (max_steps / preemption returns included).
      params, opt_state, step, finished = _run_epoch(
          model, params, optimizer, opt_state, step, epoch_iter, config,
          encode_image, pad_id, validation_data, log_metrics, preemption,
          step_fn, t_start, saver,
      )
    if finished:
      return params
  return params


def _run_epoch(model, params, optimizer, opt_state, step, epoch_iter,
               config, encode_image, pad_id, validation_data, log_metrics,
               preemption, step_fn, t_start, saver=None):
  """One epoch; returns (params, opt_state, step, stop_training)."""
  for skip, batch in enumerate(epoch_iter):
    if config.resume_from and skip < step:
      continue  # fast-forward the data stream to the resume point
    img = _features_for(batch, encode_image)
    loss, params, opt_state = step_fn(
        model, params, optimizer, opt_state, pad_id,
        jnp.asarray(batch.input_tokens), jnp.asarray(batch.target_mask),
        img,
    )
    step += 1

    if preemption is not None and preemption.triggered:
      if config.checkpoint_dir:
        path = f"{config.checkpoint_dir}/preempted_step_{step}"
        checkpoint_io.save_train_state(path, params, opt_state, step)
        if log_metrics is not None:
          log_metrics({"preempted_at": float(step)}, step)
        print(f"preemption: saved resumable state at {path}")
      return params, opt_state, step, True

    if step % config.eval_every_n == 0:
      metrics = {
          "train_loss": float(loss),
          "steps_per_sec": step / (time.perf_counter() - t_start),
      }
      skipped = resilience.nonfinite_count(opt_state)
      if skipped:
        metrics["consecutive_nonfinite_steps"] = float(skipped)
      if validation_data is not None:
        metrics["val_loss"] = _validate(
            model, params, validation_data, encode_image, pad_id
        )
      if log_metrics is not None:
        log_metrics(metrics, step)
      else:
        print(f"step {step}: {metrics}")

    if (
        config.checkpoint_every_n
        and config.checkpoint_dir
        and step % config.checkpoint_every_n == 0
    ):
      path = f"{config.checkpoint_dir}/step_{step}"
      if saver is not None:
        saver.save(path, params, opt_state, step)
      else:
        checkpoint_io.save_train_state(path, params, opt_state, step)

    if config.max_steps is not None and step >= config.max_steps:
      return params, opt_state, step, True
  return params, opt_state, step, False


def _features_for(batch, encode_image):
  if encode_image is None:
    return None
  if getattr(batch, "pixels", None) is not None:
    return encode_image(jnp.asarray(batch.pixels))
  if getattr(batch, "image_paths", None):
    return encode_image(batch.image_paths)
  return None


def _validate(model, params, validation_data, encode_image, pad_id) -> float:
  losses = []
  for batch in validation_data:
    img = _features_for(batch, encode_image)
    losses.append(
        float(
            trainer.validation_step(
                model, params, pad_id,
                jnp.asarray(batch.input_tokens),
                jnp.asarray(batch.target_mask),
                img,
            )
        )
    )
  return float(np.mean(losses)) if losses else float("nan")


def two_stage_sft(
    model,
    params: Any,
    train_data_factory: Callable[[], Iterable],
    stage1: TrainingConfig,
    stage2: TrainingConfig,
    **kwargs,
):
  """Reference two-stage schedule: frozen connector, then full fine-tune
  (train_jax.py:769-781).

  A ``mesh`` kwarg applies to stage 2 only: the frozen stage trains just
  the (tiny) connector and deliberately runs single-device (see
  ``train_loop``'s mesh docs), so routing the mesh there would raise.
  """
  mesh = kwargs.pop("mesh", None)
  params = train_loop(
      model, params, train_data_factory(),
      dataclasses.replace(stage1, freeze_llm=True), **kwargs,
  )
  return train_loop(
      model, params, train_data_factory(),
      dataclasses.replace(stage2, freeze_llm=False), mesh=mesh, **kwargs,
  )
