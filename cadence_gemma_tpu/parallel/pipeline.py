"""Pipeline parallelism (GPipe + interleaved) for the Griffin block stack.

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
  * Stage parameters are stacked on a leading ``[num_stages * interleave]``
    axis and sharded to ``PartitionSpec('stage')``: each device
    materializes only its own chunks' weights — the memory scaling that is
    the point of PP.
  * ``interleave=1`` (default) is plain GPipe: ``M`` microbatches over
    ``S`` stages in ``M + S - 1`` steps with ``(S-1)/M`` bubble overhead.
  * ``interleave=v > 1`` is the circular (Megatron-interleaved) schedule:
    the layer stack splits into ``C = S*v`` chunks, chunk ``j`` living on
    device ``j mod S``, so each microbatch laps the device ring ``v``
    times. Activations still move ONE hop per step — the per-step
    collective is a single uniform cyclic ``ppermute`` — and each device
    dynamic-indexes which of its ``v`` chunks to apply from the step
    counter: chunk ``a = ((t - d) mod C) // S`` at step ``t`` on device
    ``d``. Device 0 injects microbatch ``q*S + r`` at step ``q*C + r``
    (groups of ``S`` enter back-to-back, then the ring stays busy with
    earlier laps); device ``S-1`` retires outputs on its ``a == v-1``
    steps. Total: ``M*v + S - 1`` chunk-steps, i.e. bubble fraction
    ``(S-1)/(M*v + S - 1)`` — ``v``x smaller than GPipe's, matching the
    interleaved-1F1B bound (S-1)/(v*M), at the cost of ``v``x more
    (v-times-smaller) ppermute hops per microbatch. Reverse-mode AD of
    the scan reverses the same conflict-free schedule, so the backward
    bubble shrinks identically.
  * Bubble steps compute on zero/garbage inputs and are masked by the
    final buffer selection; ``jnp.where`` routes zero cotangents around
    them in the backward pass, so gradients are exact (tested against the
    unpipelined model at v=1 and v=2).
  * Every device runs one traced chunk body, so the per-chunk block-type
    pattern must repeat identically across chunks. Models whose depth does
    not split that way (the 2B preset's 26 blocks: the (R, R, A) cycle
    admits no uniform split) pipeline their largest pattern-aligned PREFIX
    (24 of 26 blocks at 2 or 4 stages, at interleave 1 or 2) and run the
    short tail unpipelined after the pipeline, replicated across devices
    like the final norm. Results are exact — the tail is ordinary
    sequential block application — and the memory story holds to within
    the tail fraction (2/26 ≈ 8% for the 2B preset). PP composes with DP:
    the batch shards over every OTHER mesh axis (each data slice runs its
    own independent pipeline — the collectives name only the stage axis),
    so a ``(stage, data)`` mesh pipelines 1/dp of the batch per slice.

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
    mesh: Device mesh containing ``axis_name``; the batch is sharded over
      every other axis (DP — each data slice runs its own independent
      pipeline over its 1/dp of the batch).
    num_microbatches: GPipe microbatch count ``M`` per data slice; the
      global batch must divide by ``M x dp``. Larger M shrinks the bubble
      (overhead ``(S-1)/M``).
    axis_name: Mesh axis carrying the stages.
    interleave: Chunks per device ``v`` (circular schedule, see module
      docstring). 1 = plain GPipe; larger values cut the bubble fraction
      ``v``x at the cost of ``v``x more (smaller) ppermute hops.
  """

  model: griffin_lib.Griffin
  mesh: jax.sharding.Mesh
  num_microbatches: int
  axis_name: str = STAGE_AXIS
  interleave: int = 1

  @property
  def num_stages(self) -> int:
    return self.mesh.shape[self.axis_name]

  @property
  def num_chunks(self) -> int:
    """Total pipeline chunks ``C = S * v``; chunk j lives on device j % S."""
    return self.num_stages * self.interleave

  @property
  def pipelined_layers(self) -> int:
    """Blocks [0, pipelined_layers) run in the pipeline; the rest is tail."""
    return pipelined_prefix_length(
        self.model.config.block_types, self.num_chunks
    )

  @property
  def layers_per_stage(self) -> int:
    """Blocks resident per DEVICE (v chunks of layers_per_chunk each)."""
    return self.pipelined_layers // self.num_stages

  @property
  def layers_per_chunk(self) -> int:
    return self.pipelined_layers // self.num_chunks

  @property
  def schedule_steps(self) -> int:
    """Scan length in chunk-steps until the last microbatch retires.

    Microbatch ``m = q*S + r`` injects at step ``q*C + r`` and completes
    its ``C`` chunks ``C - 1`` steps later, so the scan runs
    ``q*C + r + C`` steps for ``q, r = divmod(M - 1, S)``. When ``S``
    divides ``M`` this is ``M*v + S - 1`` (and ``M + S - 1`` at v=1,
    plain GPipe, for ANY ``M`` since then ``C = S``).
    """
    q, r = divmod(self.num_microbatches - 1, self.num_stages)
    return q * self.num_chunks + r + self.num_chunks

  @property
  def bubble_fraction(self) -> float:
    """Idle fraction of the schedule: ``1 - M*v / schedule_steps``.

    ``(S-1)/(M*v + S-1)`` when ``S | M`` — ``v``x below GPipe's
    ``(S-1)/(M+S-1)``.
    """
    total = self.schedule_steps * self.num_stages  # device-steps
    useful = self.num_microbatches * self.num_chunks
    return 1.0 - useful / total

  @property
  def tail_layers(self) -> tuple[int, ...]:
    """Indices of the unpipelined tail blocks (often empty)."""
    return tuple(
        range(self.pipelined_layers, self.model.config.num_layers)
    )

  def __post_init__(self):
    if self.interleave < 1:
      raise ValueError(f"interleave must be >= 1, got {self.interleave}.")
    stage_block_types(self.model.config.block_types, self.num_chunks)
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

  def _chunk_of_position(self, p: int) -> int:
    """Chunk index at stacking position ``p``.

    The leading stacked axis is ordered so ``PartitionSpec('stage')``
    places device ``d``'s ``v`` chunks (``d, d+S, ..., d+(v-1)S``) in its
    contiguous shard [d*v, (d+1)*v): position ``p`` holds chunk
    ``(p % v)*S + p // v``. At v=1 this is the identity (GPipe layout).
    """
    return (p % self.interleave) * self.num_stages + p // self.interleave

  def stack_params(self, params: Params) -> tuple[Params, Params]:
    """Splits a checkpoint tree into (chunk-stacked blocks, shared rest).

    The stacked tree is keyed ``layer_{j}`` for in-chunk slot ``j``; each
    leaf gains a leading ``[num_chunks]`` axis (slot ``j`` at stacking
    position ``p`` holds checkpoint
    ``blocks.{_chunk_of_position(p) * layers_per_chunk + j}``). Place it
    with :meth:`stage_sharding` so each device stores only its own
    chunks. Tail blocks (beyond the pattern-aligned prefix) stay in
    ``shared`` under their checkpoint names and run unpipelined.
    """
    lpc = self.layers_per_chunk
    stacked = {
        f"layer_{j}": jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[
                params[f"blocks.{self._chunk_of_position(p) * lpc + j}"]
                for p in range(self.num_chunks)
            ],
        )
        for j in range(lpc)
    }
    pipelined = {
        f"blocks.{i}" for i in range(self.pipelined_layers)
    }
    shared = {k: v for k, v in params.items() if k not in pipelined}
    return stacked, shared

  def unstack_params(self, stacked: Params, shared: Params) -> Params:
    """Inverse of :meth:`stack_params` (e.g. to save a checkpoint)."""
    params = dict(shared)
    lpc = self.layers_per_chunk
    for j in range(lpc):
      for p in range(self.num_chunks):
        block = self._chunk_of_position(p) * lpc + j
        params[f"blocks.{block}"] = jax.tree_util.tree_map(
            lambda leaf, p=p: leaf[p], stacked[f"layer_{j}"]
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

  def _chunk_blocks(self) -> list[modules.ResidualBlock]:
    pattern = stage_block_types(
        self.model.config.block_types, self.num_chunks
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
    v, n_chunks = self.interleave, self.num_chunks
    # DP composition: the batch shards over every mesh axis that is not
    # the stage axis; each data slice runs its own independent pipeline
    # (all collectives below name only the stage axis).
    batch_axes = tuple(
        a for a in self.mesh.axis_names if a != self.axis_name
    )
    dp = 1
    for a in batch_axes:
      dp *= self.mesh.shape[a]
    if batch % (n_mb * dp):
      raise ValueError(
          f"batch {batch} % (num_microbatches {n_mb} x data-parallel "
          f"{dp}) != 0"
      )
    blocks = self._chunk_blocks()

    def chunk_fn(chunk_params, h, pos):
      for j, block in enumerate(blocks):
        h, _ = block.apply(
            {"params": chunk_params[f"layer_{j}"]}, h, pos, None, False
        )
      return h

    def pipelined(stacked_local, x_full, pos_full):
      # shard_map gives [v, ...] leaves on the chunk axis: this device's
      # v chunks in lap order (see _chunk_of_position). x_full/pos_full
      # are this data slice's LOCAL batch (batch / dp rows).
      stage = jax.lax.axis_index(self.axis_name)
      mb = x_full.shape[0] // n_mb
      x_mb = x_full.reshape(n_mb, mb, *x_full.shape[1:])
      pos_mb = pos_full.reshape(n_mb, mb, *pos_full.shape[1:])

      def step(carry, t):
        held, outputs = carry
        # Activations flow one hop around the device ring each step; the
        # wrap (S-1 -> 0) carries mid-flight laps back to device 0, which
        # drops it exactly on the steps where it is a retired output.
        incoming = jax.lax.ppermute(
            held,
            self.axis_name,
            [(i, (i + 1) % n_stages) for i in range(n_stages)],
        )
        # Which of this device's v chunks runs at step t, which microbatch
        # is in it, and whether that chunk is the model's last (module
        # docstring derives these from the round-based injection order).
        lap = ((t - stage) % n_chunks) // n_stages
        t0 = t - (lap * n_stages + stage)  # injection step of this mb
        m = (t0 // n_chunks) * n_stages + t0 % n_chunks
        m_idx = jnp.clip(m, 0, n_mb - 1)
        my_input = jnp.where(
            (stage == 0) & (lap == 0),
            jax.lax.dynamic_index_in_dim(x_mb, m_idx, keepdims=False),
            incoming,
        )
        pos = jax.lax.dynamic_index_in_dim(pos_mb, m_idx, keepdims=False)

        # Select which of this device's v chunks to run via lax.switch
        # over STATICALLY-indexed param slices: a traced dynamic-slice of
        # the [v, ...] leaves would copy a whole chunk's params every scan
        # step (measured 1.3x slower end-to-end than GPipe on the virtual
        # mesh); a switch branch reads leaf[a] in place and only the taken
        # branch executes. v=1 skips the switch entirely (plain GPipe).
        def apply_chunk(a, h_in, pos_in):
          chunk_params = jax.tree_util.tree_map(
              lambda leaf: leaf[a], stacked_local
          )
          return jax.checkpoint(chunk_fn)(chunk_params, h_in, pos_in)

        if v == 1:
          out = apply_chunk(0, my_input, pos)
        else:
          out = jax.lax.switch(
              lap,
              [functools.partial(apply_chunk, a) for a in range(v)],
              my_input, pos,
          )
        # Retire on the last device's last lap. Fill-phase garbage
        # finalizations have m < 0 (clipped to slot 0, overwritten by the
        # real write later — retirements are ordered by m); garbage
        # injections (m >= n_mb) provably never reach their last chunk
        # within the schedule.
        is_final = (stage == n_stages - 1) & (lap == v - 1)
        prev = jax.lax.dynamic_index_in_dim(outputs, m_idx, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(is_final, out, prev), m_idx, axis=0
        )
        return (out, outputs), None

      init = (
          jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype),
          jnp.zeros((n_mb, mb) + x_full.shape[1:], x_full.dtype),
      )
      (_, outputs), _ = jax.lax.scan(
          step, init, jnp.arange(self.schedule_steps)
      )
      # out_spec concatenates every stage's buffer on axis 0; the caller
      # keeps the last stage's slice.
      return outputs

    batch_spec = batch_axes if len(batch_axes) != 1 else batch_axes[0]
    outputs = jax.shard_map(
        pipelined,
        mesh=self.mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(self.axis_name), stacked),
            P(batch_spec) if batch_axes else P(),
            P(batch_spec) if batch_axes else P(),
        ),
        out_specs=(
            P(self.axis_name, batch_spec) if batch_axes
            else P(self.axis_name)
        ),
        check_vma=False,
    )(stacked, x, segment_pos)
    # [S * M, mb, t, d] -> last stage's [M, mb, t, d] -> [b, t, d].
    final = outputs[-n_mb:]
    if batch_axes:
      # Axis 1 concatenates the data slices' local microbatch slots
      # ([M, dp, mb_local] order); the original batch order is
      # [dp, M, mb_local] — swap before flattening.
      mb_local = batch // n_mb // dp
      final = final.reshape(
          n_mb, dp, mb_local, *x.shape[1:]
      ).swapaxes(0, 1)
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
