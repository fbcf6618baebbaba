"""Pipeline parallelism (GPipe) for the Griffin block stack.

Neither the reference nor its upstream implements pipeline parallelism
(SURVEY §2.6 marks it absent); this module adds it the TPU-native way: the
whole pipeline — microbatch injection, per-stage block application, and
stage-to-stage activation transfer via ``jax.lax.ppermute`` over a named
``stage`` mesh axis — is ONE jitted ``shard_map`` program. There is no
host-side scheduler: XLA sees a ``lax.scan`` over pipeline steps whose
collectives ride the ICI, and reverse-mode AD of that scan *is* the
backward pipeline (activation cotangents ppermute stage-to-stage in
reverse), so training needs no hand-written schedule.

Design notes:
  * Stage parameters are stacked on a leading ``[num_stages, ...]`` axis and
    sharded to ``PartitionSpec('stage')``: each device materializes only its
    own stage's weights — the memory scaling that is the point of PP.
  * The schedule is plain GPipe: ``M`` microbatches over ``S`` stages in
    ``M + S - 1`` steps with ``(S-1)/M`` bubble overhead. Bubble steps
    compute on zero/garbage inputs and are masked by the final buffer
    selection; ``jnp.where`` routes zero cotangents around them in the
    backward pass, so gradients are exact (tested against the unpipelined
    model).
  * Every device runs one traced stage body, so the per-stage block-type
    pattern must repeat identically across stages. Models whose depth does
    not split that way (the 2B preset's 26 blocks: the (R, R, A) cycle
    admits no uniform 2- or 4-way split) pipeline their largest
    pattern-aligned PREFIX (24 of 26 blocks at 2 or 4 stages) and run the
    short tail unpipelined after the pipeline, replicated across devices
    like the final norm. Results are exact — the tail is ordinary
    sequential block application — and the memory story holds to within
    the tail fraction (2/26 ≈ 8% for the 2B preset). PP composes with DP
    over a second mesh axis.

Embedding, the VL connector splice, the final norm, and the vocabulary
projection run outside the pipeline (they belong to no stage); XLA
partitions them under the same mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin as griffin_lib
from cadence_gemma_tpu.models import modules
from cadence_gemma_tpu.training import trainer

P = jax.sharding.PartitionSpec

STAGE_AXIS = "stage"

Params = Any


def _is_uniform(
    block_types: tuple[common.TemporalBlockType, ...], num_stages: int
) -> bool:
  per_stage = len(block_types) // num_stages
  pattern = block_types[:per_stage]
  return all(
      block_types[s * per_stage : (s + 1) * per_stage] == pattern
      for s in range(1, num_stages)
  )


def pipelined_prefix_length(
    block_types: tuple[common.TemporalBlockType, ...], num_stages: int
) -> int:
  """Largest ``m`` so blocks [0, m) split into identical-pattern stages.

  Blocks [m, num_layers) become the unpipelined tail. For cyclic patterns
  (the RECURRENT_GEMMA (R, R, A) cycle) this is the largest multiple of
  ``num_stages * cycle_length`` that fits — 24 of the 2B preset's 26
  blocks at 2 or 4 stages.
  """
  if num_stages < 1:
    raise ValueError(f"num_stages must be >= 1, got {num_stages}.")
  n = len(block_types)
  for m in range(n - n % num_stages, 0, -num_stages):
    if _is_uniform(block_types[:m], num_stages):
      return m
  raise ValueError(
      f"No prefix of {block_types} splits into {num_stages} "
      "identical-pattern stages."
  )


def stage_block_types(
    block_types: tuple[common.TemporalBlockType, ...], num_stages: int
) -> tuple[common.TemporalBlockType, ...]:
  """The per-stage block-type pattern of the pipelined prefix."""
  m = pipelined_prefix_length(block_types, num_stages)
  return block_types[: m // num_stages]


@dataclasses.dataclass(frozen=True)
class GriffinPipeline:
  """GPipe execution of a :class:`~models.griffin.Griffin` over a mesh axis.

  Attributes:
    model: The (unpipelined) model; supplies config, dtypes and the
      embedder/final-norm/VL-connector submodule behavior.
    mesh: Device mesh containing ``axis_name`` (other axes, e.g. ``data``,
      are free for DP — the pipeline is batch-elementwise outside its own
      microbatching).
    num_microbatches: GPipe microbatch count ``M``; the global batch must
      divide by it. Larger M shrinks the bubble (overhead ``(S-1)/M``).
    axis_name: Mesh axis carrying the stages.
  """

  model: griffin_lib.Griffin
  mesh: jax.sharding.Mesh
  num_microbatches: int
  axis_name: str = STAGE_AXIS

  @property
  def num_stages(self) -> int:
    return self.mesh.shape[self.axis_name]

  @property
  def pipelined_layers(self) -> int:
    """Blocks [0, pipelined_layers) run in the pipeline; the rest is tail."""
    return pipelined_prefix_length(
        self.model.config.block_types, self.num_stages
    )

  @property
  def layers_per_stage(self) -> int:
    return self.pipelined_layers // self.num_stages

  @property
  def tail_layers(self) -> tuple[int, ...]:
    """Indices of the unpipelined tail blocks (often empty)."""
    return tuple(
        range(self.pipelined_layers, self.model.config.num_layers)
    )

  def __post_init__(self):
    stage_block_types(self.model.config.block_types, self.num_stages)
    if len(self.tail_layers) > self.layers_per_stage:
      # A short tail (the 2B preset's 2 of 26 blocks) is the intended
      # design; a tail LARGER than a stage means the chosen stage count
      # misaligns badly with the block cycle and most of the model would
      # run replicated + sequential — surface it instead of silently
      # accepting it.
      import warnings

      warnings.warn(
          f"Pipeline split is poor: only {self.pipelined_layers} of "
          f"{self.model.config.num_layers} blocks pipeline over "
          f"{self.num_stages} stages; {len(self.tail_layers)} tail "
          "blocks run unpipelined (replicated). Pick a stage count "
          "aligned with the block-type cycle.",
          stacklevel=2,
      )

  # -- parameter layout -----------------------------------------------------

  def stack_params(self, params: Params) -> tuple[Params, Params]:
    """Splits a checkpoint tree into (stage-stacked blocks, shared rest).

    The stacked tree is keyed ``layer_{j}`` for in-stage slot ``j``; each
    leaf gains a leading ``[num_stages]`` axis (slot ``j`` of stage ``s``
    holds checkpoint ``blocks.{s * layers_per_stage + j}``). Place it with
    :meth:`stage_sharding` so each device stores only its stage. Tail
    blocks (beyond the pattern-aligned prefix) stay in ``shared`` under
    their checkpoint names and run unpipelined.
    """
    lps = self.layers_per_stage
    stacked = {
        f"layer_{j}": jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[
                params[f"blocks.{s * lps + j}"]
                for s in range(self.num_stages)
            ],
        )
        for j in range(lps)
    }
    pipelined = {
        f"blocks.{i}" for i in range(self.pipelined_layers)
    }
    shared = {k: v for k, v in params.items() if k not in pipelined}
    return stacked, shared

  def unstack_params(self, stacked: Params, shared: Params) -> Params:
    """Inverse of :meth:`stack_params` (e.g. to save a checkpoint)."""
    params = dict(shared)
    lps = self.layers_per_stage
    for j in range(lps):
      for s in range(self.num_stages):
        params[f"blocks.{s * lps + j}"] = jax.tree_util.tree_map(
            lambda leaf, s=s: leaf[s], stacked[f"layer_{j}"]
        )
    return params

  def stage_sharding(self, stacked: Params) -> Params:
    """NamedShardings placing each stage's slice on its own devices."""
    sharding = jax.sharding.NamedSharding(self.mesh, P(self.axis_name))
    return jax.tree_util.tree_map(lambda _: sharding, stacked)

  # -- stage body -------------------------------------------------------

  def _make_block(self, block_type) -> modules.ResidualBlock:
    cfg = self.model.config
    return modules.ResidualBlock(
        width=cfg.width,
        mlp_expanded_width=cfg.mlp_expanded_width,
        num_heads=cfg.num_heads,
        lru_width=cfg.lru_width,
        attention_window_size=cfg.attention_window_size,
        temporal_block_type=block_type,
        scan_type=cfg.scan_type,
        final_w_init_variance_scale=2.0 / cfg.num_layers,
        quantized=self.model.quantized,
        act_quant=getattr(self.model, "act_quant", False),
        use_flash_attention=self.model.use_flash_attention,
        dtype=self.model.dtype,
        param_dtype=self.model.param_dtype,
    )

  def _stage_blocks(self) -> list[modules.ResidualBlock]:
    pattern = stage_block_types(
        self.model.config.block_types, self.num_stages
    )
    return [self._make_block(block_type) for block_type in pattern]

  # -- pipelined forward over the block stack --------------------------------

  def apply_blocks(
      self,
      stacked: Params,
      x: jax.Array,
      segment_pos: jax.Array,
  ) -> jax.Array:
    """Runs the block stack as a GPipe pipeline; [b, t, d] -> [b, t, d].

    ``b`` must divide into ``num_microbatches``; ``x`` is the embedded
    (and image-spliced) activations.
    """
    batch = x.shape[0]
    n_mb, n_stages = self.num_microbatches, self.num_stages
    if batch % n_mb:
      raise ValueError(f"batch {batch} % num_microbatches {n_mb} != 0")
    mb = batch // n_mb
    blocks = self._stage_blocks()

    def stage_fn(stage_params, h, pos):
      for j, block in enumerate(blocks):
        h, _ = block.apply(
            {"params": stage_params[f"layer_{j}"]}, h, pos, None, False
        )
      return h

    def pipelined(stacked_local, x_full, pos_full):
      # shard_map gives [1, ...] leaves on the stage axis; drop it.
      local_params = jax.tree_util.tree_map(
          lambda leaf: leaf[0], stacked_local
      )
      stage = jax.lax.axis_index(self.axis_name)
      x_mb = x_full.reshape(n_mb, mb, *x_full.shape[1:])
      pos_mb = pos_full.reshape(n_mb, mb, *pos_full.shape[1:])

      def step(carry, k):
        held, outputs = carry
        # Activations flow one hop downstream; stage 0 receives zeros.
        incoming = jax.lax.ppermute(
            held,
            self.axis_name,
            [(i, i + 1) for i in range(n_stages - 1)],
        )
        m = jnp.clip(k - stage, 0, n_mb - 1)
        my_input = jnp.where(
            stage == 0,
            jax.lax.dynamic_index_in_dim(x_mb, m, keepdims=False),
            incoming,
        )
        pos = jax.lax.dynamic_index_in_dim(pos_mb, m, keepdims=False)
        out = jax.checkpoint(stage_fn)(local_params, my_input, pos)
        # Only the last stage's slot-m write survives: bubble steps
        # (k < n_stages - 1) overwrite slot 0 before its true write lands.
        slot = jnp.clip(k - (n_stages - 1), 0, n_mb - 1)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, out, slot, axis=0
        )
        return (out, outputs), None

      init = (
          jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype),
          jnp.zeros((n_mb, mb) + x_full.shape[1:], x_full.dtype),
      )
      (_, outputs), _ = jax.lax.scan(
          step, init, jnp.arange(n_mb + n_stages - 1)
      )
      # out_spec concatenates every stage's buffer on axis 0; the caller
      # keeps the last stage's slice.
      return outputs

    outputs = jax.shard_map(
        pipelined,
        mesh=self.mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(self.axis_name), stacked),
            P(),
            P(),
        ),
        out_specs=P(self.axis_name),
        check_vma=False,
    )(stacked, x, segment_pos)
    # [S * M, mb, t, d] -> last stage's [M, mb, t, d] -> [b, t, d].
    final = outputs[-n_mb:]
    return final.reshape(batch, *x.shape[1:])

  # -- full model -------------------------------------------------------

  def __call__(
      self,
      stacked: Params,
      shared: Params,
      tokens: jax.Array,
      segment_pos: jax.Array,
      image: jax.Array | None = None,
      return_hidden: bool = False,
  ) -> jax.Array:
    """Embeds, pipelines the blocks, and projects to logits."""
    model, variables = self.model, {"params": shared}
    x = model.apply(
        variables, tokens, method=lambda m, t: m.embedder.encode(t)
    )
    if image is not None:
      x, segment_pos = model.apply(
          variables,
          x,
          segment_pos,
          image,
          method=lambda m, *a: m._splice_image(*a),
      )
    x = self.apply_blocks(stacked, x, segment_pos)
    # Unpipelined tail: blocks beyond the pattern-aligned prefix run
    # sequentially, replicated like the final norm (see module docstring).
    for i in self.tail_layers:
      block = self._make_block(self.model.config.block_types[i])
      x, _ = block.apply(
          {"params": shared[f"blocks.{i}"]}, x, segment_pos, None, False
      )
    x = model.apply(variables, x, method=lambda m, h: m.final_norm(h))
    if return_hidden:
      return x
    return model.apply(variables, x, method="decode_hidden")

  # -- training ---------------------------------------------------------

  def loss_fn(
      self,
      stacked: Params,
      shared: Params,
      input_tokens: jax.Array,
      input_mask: jax.Array,
      positions: jax.Array,
      image: jax.Array | None = None,
  ) -> jax.Array:
    """Masked next-token NLL with the trainer's visual-row semantics.

    Like ``trainer.forward_and_loss_fn``, the [b, t, vocab] logits tensor
    is never materialized: the pipeline returns hidden states and the
    vocabulary projection + log-softmax + gather run per time-chunk —
    long-context training is exactly the workload PP targets, and at 8k
    tokens x 256k vocab the full logits tensor (4-8 GB fp32) would
    dominate memory.
    """
    hidden = self(
        stacked, shared, input_tokens, positions, image=image,
        return_hidden=True,
    )
    hidden = hidden[:, :-1]
    targets = input_tokens[:, 1:]
    target_mask = input_mask[:, 1:]
    if image is not None:
      n_img = hidden.shape[1] - targets.shape[1]
      targets = jnp.pad(targets, ((0, 0), (n_img, 0)))
      target_mask = jnp.pad(target_mask, ((0, 0), (n_img, 0)))
    variables = {"params": shared}
    return trainer.chunked_masked_nll(
        hidden,
        targets,
        target_mask,
        lambda h: self.model.apply(variables, h, method="decode_hidden"),
    )

  def make_train_step(self, optimizer: optax.GradientTransformation):
    """A jitted SFT step over (stacked, shared) params.

    Stage params and their optimizer state stay sharded on the stage axis
    end-to-end; gradients for them come out of AD already stage-local.
    """

    @functools.partial(
        jax.jit, donate_argnums=(0, 1, 2), static_argnums=()
    )
    def step(stacked, shared, opt_state, input_tokens, input_mask,
             positions, image=None):
      loss, grads = jax.value_and_grad(self.loss_fn, argnums=(0, 1))(
          stacked, shared, input_tokens, input_mask, positions, image
      )
      updates, opt_state = optimizer.update(
          grads, opt_state, (stacked, shared)
      )
      stacked, shared = optax.apply_updates((stacked, shared), updates)
      return loss, stacked, shared, opt_state

    return step
