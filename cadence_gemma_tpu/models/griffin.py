"""The Griffin backbone with an on-device multimodal prefill path.

TPU-native re-implementation of the reference model
(``/root/reference/recurrentgemma/jax/griffin.py:40-267``), with the same
parameter tree (``embedder``, ``blocks.{i}``, ``final_norm``,
``vl_connector``) so reference checkpoints load unchanged.

Differences from the reference (all deliberate, see SURVEY §7):
  * Batched throughout — ``tokens`` is always ``[b, t]``; no squeeze/expand
    shape hacks, no printing inside jitted code.
  * The visual-token count and feature width come from the config rather
    than hard-coded 729/2176/4000.
  * When an image is present, its ``vision_tokens`` projected embeddings are
    spliced in *after* the first (BOS) token — matching the reference JAX
    path (``griffin.py:212``; the reference's torch path instead prepends
    all visual tokens, ``torch/griffin.py:184``, which we do not follow).
    The extended positions are ``[p0, p0+1 .. p0+n, old_pos + n]`` — the
    contiguous generalization of the reference's
    ``[0, 1..728, old+729]`` (``griffin.py:214-219``).
"""


from flax import linen as nn
import jax
import jax.numpy as jnp

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import layers
from cadence_gemma_tpu.models import modules
from cadence_gemma_tpu.ops import scan

Cache = dict[str, modules.ResidualBlockCache]


class Griffin(nn.Module):
  """Griffin model — hybrid RG-LRU / local-attention LM with a VL connector.

  Attributes:
    config: Model hyper-parameters.
    scan_sharding_spec: Optional sharding for the RG-LRU scan.
    gradient_checkpointing: Rematerialize each residual block on backward.
    dtype / param_dtype: Computation / parameter dtypes (bfloat16 default).
  """

  config: common.GriffinConfig
  scan_sharding_spec: scan.ShardingSpec | None = None
  gradient_checkpointing: bool = True
  quantized: bool = False
  # int8 activations too (int8 x int8 MXU matmuls): the compute-bound
  # prefill mode. Requires ``quantized``; adds no parameters, so samplers
  # can run act_quant prefill and weight-only decode on one param tree.
  act_quant: bool = False
  # LoRA adapters on every Dense/Einsum projection (rank 0 = off): frozen
  # base weights (bf16 OR int8-quantized) + trainable low-rank bf16 pairs.
  # See training/lora.py for the fine-tuning utilities.
  lora_rank: int = 0
  # Stack the adapter pairs per batch row (multi-adapter serving: slot i
  # of a decode batch runs adapter row i over the shared base; all-zero
  # rows are the exact base model). See inference/serving.py multi_lora.
  lora_rows: int = 0
  lora_alpha: float | None = None
  use_flash_attention: bool | None = None  # None = auto (t > window on TPU)
  # Fused residual-add + RMSNorm Pallas epilogue in every block (TPU-only;
  # see ops/fused_epilogue.py and ResidualBlock.fused_epilogue).
  fused_epilogue: bool = False
  dtype: at.dtype = jnp.bfloat16
  param_dtype: at.dtype = jnp.bfloat16

  def setup(self):
    self.embedder = modules.Embedder(
        vocab_size=self.config.vocab_size,
        embed_dim=self.config.width,
        scale_by_sqrt_dim=self.config.embeddings_scale_by_sqrt_dim,
        quantized=self.quantized,
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

    block_cls = modules.ResidualBlock
    if self.gradient_checkpointing:
      # return_cache / pending_cache are static args of the block call.
      block_cls = nn.remat(block_cls, static_argnums=(4, 5))
    self.blocks = [
        block_cls(
            name=f"blocks.{i}",
            width=self.config.width,
            mlp_expanded_width=self.config.mlp_expanded_width,
            num_heads=self.config.num_heads,
            lru_width=self.config.lru_width,
            attention_window_size=self.config.attention_window_size,
            temporal_block_type=block_type,
            scan_type=self.config.scan_type,
            final_w_init_variance_scale=2.0 / self.config.num_layers,
            quantized=self.quantized,
            act_quant=self.act_quant,
            lora_rank=self.lora_rank,
            lora_rows=self.lora_rows,
            lora_alpha=self.lora_alpha,
            scan_sharding_spec=self.scan_sharding_spec,
            use_flash_attention=self.use_flash_attention,
            fused_epilogue=self.fused_epilogue,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i, block_type in enumerate(self.config.block_types)
    ]
    self.final_norm = layers.RMSNorm(
        width=self.config.width, dtype=self.dtype, param_dtype=self.param_dtype
    )
    self.vl_connector = modules.VisionLanguageConnector(
        width=self.config.width,
        expanded_width=self.config.vl_expanded_width,
        vision_width=self.config.vision_width,
        final_w_init_variance_scale=1.0,
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="vl_connector",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

  def _splice_image(
      self,
      x: at.Activations,
      segment_pos: at.SegmentPos,
      image: at.Image,
  ) -> tuple[at.Activations, at.SegmentPos]:
    """Projects image features and inserts them after the BOS token."""
    if image.shape[-1] != self.config.vision_width:
      raise ValueError(
          f"image feature width {image.shape[-1]} != config.vision_width "
          f"{self.config.vision_width}; check the vision encoder pairing."
      )
    visual = self.vl_connector(image.astype(x.dtype))
    n = visual.shape[1]
    x = jnp.concatenate([x[:, :1], visual, x[:, 1:]], axis=1)
    p0 = segment_pos[:, :1]
    visual_pos = p0 + jnp.arange(1, n + 1, dtype=segment_pos.dtype)[None]
    segment_pos = jnp.concatenate(
        [p0, visual_pos, segment_pos[:, 1:] + n], axis=-1
    )
    return x, segment_pos

  @at.typed
  def __call__(
      self,
      tokens: at.Tokens,
      segment_pos: at.SegmentPos,
      cache: Cache | None = None,
      return_logits: bool = True,
      return_cache: bool = True,
      image: at.Image | None = None,
      last_logits_only: bool = False,
      return_hidden: bool = False,
      pending_cache: bool = False,
  ) -> tuple[at.TokenLogits | None, Cache | None]:
    """Runs the model over ``tokens`` (optionally with spliced image tokens).

    Args:
      tokens: Input token ids [b, t].
      segment_pos: Per-token positions [b, t]; 0 marks a document start.
      cache: Per-layer decode caches keyed ``blocks.{i}``.
      return_logits: Compute logits (skip for cache-only prefill chunks).
      return_cache: Compute the updated cache (skip on the last chunk of a
        loss-only forward pass).
      image: Optional pre-fused vision features [b, vision_tokens,
        vision_width]; projected by the VL connector and spliced after BOS.
      last_logits_only: Return logits only for the final position — the
        prefill fast path: one forward pass builds the cache AND the
        first-token logits (one weights read instead of the reference's
        bulk-prefill + last-token split), without materializing the
        [b, t, vocab] logits tensor.
      return_hidden: Return the final-normed hidden states [b, t, width]
        instead of logits (the vocabulary projection is skipped). Used by
        the trainer's chunked loss, which decodes time-chunks through
        :meth:`decode_hidden` so the [b, t, vocab] tensor never exists —
        at 8k tokens and 256k vocab that tensor is 4-8 GB and is what
        actually bounds long-context training memory (not attention).
      pending_cache: Return per-layer *pending* cache material instead of
        committed caches — the speculative-decoding verify pass runs the
        draft chunk once, compares the resulting logits with the draft,
        and only then commits the accepted prefix via
        :func:`modules.commit_pending_cache` (RG-LRU per-step fp32 carries,
        conv input tail, the chunk's rotated KVs). Requires ``cache``
        (decode mode) and contiguous positions per row.

    Returns:
      ``(logits | None, cache | None)``; logits include positions for the
      visual tokens when an image is spliced in.
    """
    if not return_logits and not return_cache:
      return None, None

    x = self.embedder.encode(tokens)
    if image is not None:
      x, segment_pos = self._splice_image(x, segment_pos, image)
    elif self.is_initializing():
      # Create the VL-connector parameters even for text-only init so a
      # single parameter tree serves both modalities.
      self.vl_connector(jnp.zeros((1, 1, self.config.vision_width), x.dtype))

    new_cache = {}
    for i, block in enumerate(self.blocks):
      layer_name = f"blocks.{i}"
      x, new_cache[layer_name] = block(
          x,
          segment_pos,
          None if cache is None else cache[layer_name],
          return_cache,
          pending_cache,
      )

    if not return_logits:
      return None, new_cache

    if last_logits_only:
      x = x[:, -1:]
    x = self.final_norm(x)
    if return_hidden:
      return x, (new_cache if return_cache else None)
    logits = self.decode_hidden(x)

    return logits, (new_cache if return_cache else None)

  def decode_hidden(self, hidden: at.Activations) -> at.TokenLogits:
    """Final-normed hidden states → soft-capped vocabulary logits.

    Public so the trainer can decode time-chunks of a ``return_hidden``
    forward (``model.apply(vars, h, method="decode_hidden")``).
    """
    logits = self.embedder.decode(hidden)
    cap = self.config.logits_soft_cap
    if cap:
      logits = jnp.tanh(logits / cap) * cap
    return logits

  def init_cache(self, batch_size: int, dtype: at.dtype) -> Cache:
    """Empty per-layer caches (O(1) memory in sequence length)."""
    return {
        f"blocks.{i}": modules.ResidualBlock.init_cache(
            batch_size=batch_size,
            width=self.config.width,
            num_heads=self.config.num_heads,
            attention_window_size=self.config.attention_window_size,
            temporal_block_type=block_type,
            dtype=dtype,
            lru_width=self.config.lru_width,
        )
        for i, block_type in enumerate(self.config.block_types)
    }
