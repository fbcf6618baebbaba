"""LoRA fine-tuning utilities: frozen base + trainable low-rank adapters.

A capability the reference lacks (its SFT loop at
``/root/reference/training/train_jax.py:566`` always trains the full
parameter tree): with ``Griffin(config, lora_rank=r)`` every Dense/Einsum
projection carries a ``lora_a``/``lora_b`` pair (zero-initialized ``b``,
so enabling it is an exact no-op) and only those pairs train here. Why it
matters on one TPU chip:

  * Full 2B SFT needs weights + grads + Adam moments ≈ 4x the 5.4 GB
    bf16 weights — past a 16 GB v5e even before activations. LoRA keeps
    grads/moments only for the adapters (rank 8 on the 2B preset is
    ~0.4% of parameters), so fine-tuning fits with room to spare.
  * The frozen base can be the **int8-quantized** tree (QLoRA-style):
    2.7 GB of weights + bf16 adapters makes even the 9B preset tunable
    on a single chip, and the tuned model serves through the existing
    int8 samplers with adapters applied at runtime.

Layout: adapters live as extra leaves inside each projection's scope
(``.../proj_q/{kernel, lora_a, lora_b}``), which keeps the base tree
checkpoint-compatible. :func:`split_lora` / :func:`merge_params` move
between the combined tree and (adapters, frozen-base) halves;
:func:`lora_train_step` differentiates w.r.t. the adapter half only, so
no full-tree gradient is ever materialized; :func:`merge_lora` folds
trained adapters back into plain bf16 weights for adapter-free serving.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cadence_gemma_tpu.training import trainer

Params = Any

LORA_LEAF_NAMES = ("lora_a", "lora_b")


def is_lora_path(path: tuple[str, ...]) -> bool:
  return bool(path) and path[-1] in LORA_LEAF_NAMES


def split_lora(params: Params) -> tuple[Params, Params]:
  """Splits a combined tree into (adapters, frozen base).

  Both halves keep the full nesting structure (empty dicts are pruned),
  so :func:`merge_params` can zip them back together.
  """

  def visit(tree):
    if not isinstance(tree, dict):
      return None, tree
    lora, base = {}, {}
    for key, value in tree.items():
      if key in LORA_LEAF_NAMES:
        lora[key] = value
      elif isinstance(value, dict):
        sub_lora, sub_base = visit(value)
        if sub_lora:
          lora[key] = sub_lora
        if sub_base:
          base[key] = sub_base
      else:
        base[key] = value
    return lora, base

  lora, base = visit(params)
  return lora or {}, base or {}


def merge_params(base: Params, lora: Params) -> Params:
  """Recombines the trees produced by :func:`split_lora`."""
  if not isinstance(lora, dict):
    return lora
  out = dict(base) if isinstance(base, dict) else {}
  for key, value in lora.items():
    if isinstance(value, dict):
      out[key] = merge_params(out.get(key, {}), value)
    else:
      out[key] = value
  return out


def lora_mask(params: Params) -> Params:
  """Boolean tree (True on adapter leaves) for ``optax.masked`` setups."""

  def visit(tree, path=()):
    if isinstance(tree, dict):
      return {k: visit(v, path + (k,)) for k, v in tree.items()}
    return is_lora_path(path)

  return visit(params)


def make_optimizer(
    learning_rate: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    clip_norm: float | None = 1.0,
) -> optax.GradientTransformation:
  """Adam over the adapter tree (no weight decay — standard for LoRA)."""
  tx = optax.adam(learning_rate, b1=b1, b2=b2)
  if clip_norm is not None:
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
  return tx


@functools.partial(
    jax.jit,
    static_argnames=["model", "optimizer"],
    donate_argnames=["lora_params", "opt_state"],
)
def lora_train_step(
    model,
    lora_params: Params,
    base_params: Params,
    optimizer: optax.GradientTransformation,
    opt_state: optax.OptState,
    pad_id: int,
    input_tokens: jax.Array,
    input_mask: jax.Array,
    img_embed: jax.Array | None = None,
) -> tuple[jax.Array, Params, optax.OptState]:
  """One adapter-only step; the base tree is a frozen argument.

  Differentiates w.r.t. ``lora_params`` only — gradients and optimizer
  state exist only at adapter size, which is what makes single-chip
  2B/9B fine-tuning fit. ``base_params`` may be the bf16 tree or the
  int8-quantized tree (the model must be built with matching
  ``quantized=...``); it is threaded as an explicit argument, never a
  closure, so it is not baked into the executable as constants.
  """
  return _step_body(
      model, optimizer, pad_id, lora_params, base_params, opt_state,
      input_tokens, input_mask, img_embed,
  )


def _step_body(
    model, optimizer, pad_id, lora_params, base_params, opt_state,
    input_tokens, input_mask, img_embed,
):
  """Shared adapter-step math for the jitted and pjit-ted variants."""
  positions = trainer.get_positions(input_tokens, pad_id)

  def loss_fn(lora_tree):
    return trainer.forward_and_loss_fn(
        merge_params(base_params, lora_tree),
        model=model,
        input_tokens=input_tokens,
        input_mask=input_mask,
        positions=positions,
        image=img_embed,
    )

  loss, grads = jax.value_and_grad(loss_fn)(lora_params)
  updates, opt_state = optimizer.update(grads, opt_state, lora_params)
  lora_params = optax.apply_updates(lora_params, updates)
  return loss, lora_params, opt_state


def make_sharded_lora_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh,
    pad_id: int,
    example_adapters: Params,
    example_base: Params,
    batch_axis: str | None = None,
    model_axis: str | None = None,
):
  """pjit-ted adapter-only step over a device mesh (DP x TP).

  Mirrors ``trainer.make_sharded_train_step``: the frozen base gets the
  Megatron TP layouts, adapters get the matching LoRA layouts
  (``parallel/partitioning.py`` — column parents shard ``lora_b``'s
  output dim, row parents shard ``lora_a``'s input dim), the batch
  shards over ``batch_axis``, and XLA inserts the DP gradient
  all-reduce (adapter-sized, not model-sized — LoRA also cuts the
  inter-chip gradient traffic by ~100x) and TP collectives.

  Returns ``(step_fn, shard_fn)`` where ``shard_fn(adapters, base)``
  places both trees.
  """
  from cadence_gemma_tpu.parallel import partitioning

  batch_axis = batch_axis or partitioning.BATCH_AXIS
  model_axis = model_axis or partitioning.MODEL_AXIS
  base_shardings = partitioning.param_shardings_or_replicated(
      mesh, example_base, model_axis
  )
  adapter_shardings = partitioning.param_shardings_or_replicated(
      mesh, example_adapters, model_axis
  )
  data_shard = partitioning.data_sharding(mesh, batch_axis)

  def step(adapters, base, opt_state, input_tokens, input_mask,
           img_embed=None):
    return _step_body(
        model, optimizer, pad_id, adapters, base, opt_state,
        input_tokens, input_mask, img_embed,
    )

  opt_shardings = partitioning.opt_state_shardings(
      mesh, optimizer, example_adapters, model_axis
  )
  jit_step = jax.jit(
      step,
      in_shardings=(
          adapter_shardings, base_shardings, opt_shardings, data_shard,
          data_shard, None,
      ),
      # Pin output adapters AND opt state to the input layouts so step
      # N's output is a valid input for step N+1 (GSPMD may otherwise
      # re-shard outputs, and a drifted opt-state layout keys a second
      # full compilation on the next call).
      out_shardings=(None, adapter_shardings, opt_shardings),
      donate_argnums=(0, 2),
  )

  def step_fn(adapters, base, opt_state, *args):
    # Commit the opt state onto its pinned layouts up front (a no-op for
    # already-placed leaves): a fresh ``optimizer.init`` carries
    # uncommitted scalars (counters), and an uncommitted-vs-committed
    # argument keys a separate jit cache entry — i.e. a second full
    # compilation on step 2.
    opt_state = jax.device_put(opt_state, opt_shardings)
    return jit_step(adapters, base, opt_state, *args)

  step_fn._cache_size = jit_step._cache_size  # for recompile tests

  def shard_fn(adapters, base):
    return (
        jax.device_put(adapters, adapter_shardings),
        jax.device_put(base, base_shardings),
    )

  return step_fn, shard_fn


def merge_lora(
    params: Params,
    lora_alpha: float | None = None,
) -> Params:
  """Folds trained adapters into the base weights; drops adapter leaves.

  Returns a plain (adapter-free) tree that reproduces the LoRA model's
  outputs exactly on a ``lora_rank=0`` model: ``kernel += a @ b * s`` for
  Dense, ``w[c] += a[c] @ b[c] * s`` for the fused Einsum layout, with
  ``s = alpha / rank`` (``alpha`` defaults to the rank, matching the
  module default). Quantized base trees cannot be folded losslessly —
  requantize after merging a bf16 tree instead.
  """

  def visit(tree):
    if not isinstance(tree, dict):
      return tree
    if "lora_a" in tree:
      a = tree["lora_a"]
      b = tree["lora_b"]
      rank = a.shape[-1]
      scaling = (
          lora_alpha if lora_alpha is not None else float(rank)
      ) / rank
      out = {
          k: visit(v) for k, v in tree.items() if k not in LORA_LEAF_NAMES
      }
      delta = jnp.matmul(
          a.astype(jnp.float32), b.astype(jnp.float32)
      ) * scaling
      if "kernel" in out:
        out["kernel"] = (
            out["kernel"].astype(jnp.float32) + delta
        ).astype(out["kernel"].dtype)
      elif "w" in out:
        out["w"] = (out["w"].astype(jnp.float32) + delta).astype(
            out["w"].dtype
        )
      else:
        raise ValueError(
            "LoRA adapters found beside neither 'kernel' nor 'w' — "
            f"keys: {sorted(tree.keys())}. Quantized trees ('kernel_q') "
            "cannot be folded losslessly; merge into the bf16 tree and "
            "requantize with ops.quantization.quantize_params instead."
        )
      return out
    return {k: visit(v) for k, v in tree.items()}

  return visit(params)


def init_adapters(model, rng: jax.Array) -> Params:
  """Fresh adapter tree for a ``lora_rank > 0`` model, without running init.

  Shapes come from ``jax.eval_shape`` over ``model.init`` (no FLOPs, no
  memory at model scale); ``lora_a`` leaves are then materialized with the
  module's own fan-in-scaled normal init and ``lora_b`` as zeros. Merge
  onto a loaded checkpoint with :func:`merge_params` before training.
  """
  tok = jnp.ones((1, 2), jnp.int32)
  pos = jnp.tile(jnp.arange(2)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda r: model.init(r, tok, pos, return_cache=False), rng
  )
  adapters, _ = split_lora(shapes["params"])
  flat, treedef = jax.tree_util.tree_flatten_with_path(adapters)
  leaves = []
  for i, (path, leaf) in enumerate(flat):
    name = str(path[-1])
    if "lora_b" in name:
      leaves.append(jnp.zeros(leaf.shape, leaf.dtype))
    else:
      # Matches QuantizableDense/Einsum's normal(fan_in**-0.5): the
      # contraction ("in") axis is the second-to-last of [.., in, rank].
      std = leaf.shape[-2] ** -0.5
      leaves.append(
          std
          * jax.random.normal(
              jax.random.fold_in(rng, i), leaf.shape, leaf.dtype
          )
      )
  return jax.tree_util.tree_unflatten(treedef, leaves)


def lora_parameter_count(lora_params: Params) -> int:
  return sum(
      leaf.size for leaf in jax.tree_util.tree_leaves(lora_params)
  )
