"""SFT training: loss, train/validation steps, optimizer, sharded variants.

TPU-native counterpart of the reference JAX training loop
(``/root/reference/training/train_jax.py:351-563``) with the same semantics:

  * masked next-token NLL; when an image is spliced, the one-hot targets are
    prefixed with ``vision_tokens`` zero rows so visual-position logits never
    receive loss (``train_jax.py:389-409``);
  * ``train_step`` — jitted, donated params/opt state, full fine-tune;
  * ``frozen_train_step`` — stage-1 SFT updating only ``vl_connector``
    (``train_jax.py:480-529``);
  * ``validation_step`` — loss only;
  * AdamW with the Griffin weight-decay mask (no decay on RG-LRU params,
    embedder, biases or norm scales, ``train_jax.py:551-563``).

Additions over the reference: :func:`make_sharded_train_step` jits the step
over a ``jax.sharding.Mesh`` with DP batch sharding + TP parameter layouts
(the reference's JAX loop is single-device with a "Make dynamic for DDP"
TODO, ``train_jax.py:618,630``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu.parallel import partitioning

Params = Any


def get_positions(tokens: jax.Array, pad_id: int) -> jax.Array:
  """0-indexed positions over non-pad tokens; pads before the start get -1.

  Mirrors reference ``train_jax.py:485-493``.
  """
  pad_mask = tokens != pad_id
  positions = jnp.cumsum(pad_mask, axis=-1)
  return positions - (positions >= 1)


# Sequences longer than this compute the loss in time-chunks of this size;
# below it, one chunk == the whole sequence (identical math either way).
_VOCAB_CHUNK = 2048


def forward_and_loss_fn(
    params: Params,
    *,
    model,
    input_tokens: jax.Array,
    input_mask: jax.Array,
    positions: jax.Array,
    image: jax.Array | None = None,
    vocab_chunk_size: int | None = None,
) -> jax.Array:
  """Masked next-token NLL, with zero loss on spliced visual positions.

  The [b, t, vocab] logits tensor is never materialized: the model returns
  final hidden states and the vocabulary projection + log-softmax + gather
  run per time-chunk (``lax.map`` + remat), so loss memory is
  O(b * chunk * vocab) — at 8k tokens and 256k vocab the full tensor is
  4-8 GB and dominates long-context training memory, beating attention to
  the OOM (measured; the reference loss materializes it AND a one-hot of
  the same shape, ``train_jax.py:391-407``).
  """
  hidden, _ = model.apply(
      {"params": params},
      input_tokens,
      positions,
      None,
      return_logits=True,
      return_cache=False,
      image=image,
      return_hidden=True,
  )
  # The last step has no target; the first token is never predicted.
  hidden = hidden[:, :-1]
  targets = input_tokens[:, 1:]
  target_mask = input_mask[:, 1:]

  if image is not None:
    # Visual tokens sit between BOS and the text: pad the targets to line up
    # and contribute no loss.
    n_img = hidden.shape[1] - targets.shape[1]
    targets = jnp.pad(targets, ((0, 0), (n_img, 0)))
    target_mask = jnp.pad(target_mask, ((0, 0), (n_img, 0)))

  return chunked_masked_nll(
      hidden,
      targets,
      target_mask,
      lambda h: model.apply({"params": params}, h, method="decode_hidden"),
      vocab_chunk_size=vocab_chunk_size,
  )


def chunked_masked_nll(
    hidden: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    decode_fn,
    vocab_chunk_size: int | None = None,
) -> jax.Array:
  """Masked mean NLL with the vocabulary projection run per time-chunk.

  ``decode_fn``: [b, c, width] hidden → [b, c, vocab] logits. The full
  [b, t, vocab] tensor is never materialized; ``lax.map`` + remat keep
  loss memory at O(b * chunk * vocab). Shared by the single-host trainer
  and the pipeline-parallel trainer (``parallel/pipeline.py``).
  """
  norm = 1.0 / (jnp.sum(target_mask) + 1e-8)

  batch, t, width = hidden.shape
  chunk = min(vocab_chunk_size or _VOCAB_CHUNK, t)
  pad = -t % chunk
  if pad:
    hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    targets = jnp.pad(targets, ((0, 0), (0, pad)))
    target_mask = jnp.pad(target_mask, ((0, 0), (0, pad)))
  n_chunks = (t + pad) // chunk

  def chunk_nll(args):
    h, tgt, m = args
    logits = decode_fn(h).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked * m.astype(picked.dtype))

  xs = (
      hidden.reshape(batch, n_chunks, chunk, width).swapaxes(0, 1),
      targets.reshape(batch, n_chunks, chunk).swapaxes(0, 1),
      target_mask.reshape(batch, n_chunks, chunk).swapaxes(0, 1),
  )
  if n_chunks == 1:
    total = chunk_nll(jax.tree_util.tree_map(lambda x: x[0], xs))
  else:
    # Sequential over chunks; remat makes the backward recompute each
    # chunk's logits instead of saving them all.
    total = jnp.sum(jax.lax.map(jax.checkpoint(chunk_nll), xs))
  return total * norm


@functools.partial(
    jax.jit,
    static_argnames=["model", "optimizer"],
    donate_argnames=["params", "opt_state"],
)
def train_step(
    model,
    params: Params,
    optimizer: optax.GradientTransformation,
    opt_state: optax.OptState,
    pad_id: int,
    input_tokens: jax.Array,
    input_mask: jax.Array,
    img_embed: jax.Array | None = None,
) -> tuple[jax.Array, Params, optax.OptState]:
  """One full fine-tuning step; returns (loss, params, opt_state)."""
  positions = get_positions(input_tokens, pad_id)
  loss, grads = jax.value_and_grad(forward_and_loss_fn)(
      params,
      model=model,
      input_tokens=input_tokens,
      input_mask=input_mask,
      positions=positions,
      image=img_embed,
  )
  updates, opt_state = optimizer.update(grads, opt_state, params)
  params = optax.apply_updates(params, updates)
  return loss, params, opt_state


@functools.partial(
    jax.jit,
    static_argnames=["model", "optimizer"],
    donate_argnames=["params", "opt_state"],
)
def frozen_train_step(
    model,
    params: Params,
    optimizer: optax.GradientTransformation,
    opt_state: optax.OptState,
    pad_id: int,
    input_tokens: jax.Array,
    input_mask: jax.Array,
    img_embed: jax.Array,
) -> tuple[jax.Array, Params, optax.OptState]:
  """Stage-1 step: only the VL connector trains, the LM stays frozen."""
  positions = get_positions(input_tokens, pad_id)
  loss, grads = jax.value_and_grad(forward_and_loss_fn)(
      params,
      model=model,
      input_tokens=input_tokens,
      input_mask=input_mask,
      positions=positions,
      image=img_embed,
  )
  updates, opt_state = optimizer.update(
      grads["vl_connector"], opt_state, params["vl_connector"]
  )
  params["vl_connector"] = optax.apply_updates(
      params["vl_connector"], updates
  )
  return loss, params, opt_state


@functools.partial(jax.jit, static_argnames=["model"])
def validation_step(
    model,
    params: Params,
    pad_id: int,
    input_tokens: jax.Array,
    input_mask: jax.Array,
    img_embed: jax.Array | None = None,
) -> jax.Array:
  return forward_and_loss_fn(
      params,
      model=model,
      input_tokens=input_tokens,
      input_mask=input_mask,
      positions=get_positions(input_tokens, pad_id),
      image=img_embed,
  )


def griffin_weight_decay_mask(params_like: optax.Params) -> Any:
  """True where AdamW weight decay applies (reference semantics)."""

  def enable(path, _) -> bool:
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    if "rg_lru" in keys or "embedder" in keys:
      return False
    if keys[-1] in ("b", "scale", "bias"):
      return False
    return True

  return jax.tree_util.tree_map_with_path(enable, params_like)


def make_optimizer(
    learning_rate: float | optax.Schedule,
    weight_decay: float = 0.1,
    b2: float = 0.96,
    grad_clip_norm: float | None = 1.0,
    use_decay_mask: bool = True,
) -> optax.GradientTransformation:
  """AdamW with the Griffin decay mask and optional gradient clipping."""
  adamw = optax.adamw(
      learning_rate=learning_rate,
      b2=b2,
      weight_decay=weight_decay,
      mask=griffin_weight_decay_mask if use_decay_mask else None,
  )
  if grad_clip_norm is None:
    return adamw
  return optax.chain(optax.clip_by_global_norm(grad_clip_norm), adamw)


def make_sharded_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: jax.sharding.Mesh,
    pad_id: int,
    batch_axis: str = partitioning.BATCH_AXIS,
    model_axis: str | None = partitioning.MODEL_AXIS,
    example_params: at.Params | None = None,
):
  """Builds a pjit-ted train step over ``mesh``.

  Parameters get TP layouts (when ``model_axis`` names a mesh axis and
  ``example_params`` is given), the batch is sharded over ``batch_axis``,
  and XLA inserts the DP gradient all-reduces and TP collectives from the
  shardings — the TPU-native replacement for the reference's
  NCCL DDP loop (``train.py:63-71,624``).

  Returns ``(step_fn, shard_params_fn)``.
  """
  if (model_axis is not None and model_axis in mesh.axis_names
      and example_params is None):
    raise ValueError("example_params needed to build TP layouts.")
  param_shardings = None if example_params is None else (
      partitioning.param_shardings_or_replicated(
          mesh, example_params, model_axis or ""
      )
  )

  data_shard = partitioning.data_sharding(mesh, batch_axis)

  def step(params, opt_state, input_tokens, input_mask, img_embed=None):
    positions = get_positions(input_tokens, pad_id)
    loss, grads = jax.value_and_grad(forward_and_loss_fn)(
        params,
        model=model,
        input_tokens=input_tokens,
        input_mask=input_mask,
        positions=positions,
        image=img_embed,
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return loss, params, opt_state

  opt_shardings = None
  if param_shardings is not None:
    opt_shardings = partitioning.opt_state_shardings(
        mesh, optimizer, example_params, model_axis or ""
    )
  jit_step = jax.jit(
      step,
      in_shardings=(
          param_shardings, opt_shardings, data_shard, data_shard, None,
      ),
      # Pin the output params AND opt state to the input layouts: left
      # unconstrained, GSPMD may emit differently-sharded outputs, which
      # then violate in_shardings (params) or key a fresh compilation
      # (opt state) when fed back in on the NEXT step (loops like
      # train_loop(mesh=...) call this repeatedly).
      out_shardings=(None, param_shardings, opt_shardings),
      donate_argnums=(0, 1),
  )
  if opt_shardings is None:
    step_fn = jit_step
  else:

    def step_fn(params, opt_state, *args):
      # Commit the opt state onto its pinned layouts up front (a no-op
      # for already-placed leaves): a fresh ``optimizer.init`` carries
      # uncommitted scalars (counters), and an uncommitted-vs-committed
      # argument keys a separate jit cache entry — i.e. a second full
      # compilation on step 2.
      opt_state = jax.device_put(opt_state, opt_shardings)
      return jit_step(params, opt_state, *args)

    step_fn._cache_size = jit_step._cache_size  # for recompile tests

  def shard_params(params):
    if param_shardings is None:
      return params
    return jax.device_put(params, param_shardings)

  return step_fn, shard_params
