"""PyTorch Griffin backbone (behavior twin of the JAX model).

Counterpart of reference ``recurrentgemma/torch/griffin.py:35-245``.
Like the reference's torch model (which owns timm encoders,
``torch/griffin.py:60-62``), this model CAN own its vision encoder: pass
``vision_encoder=vit.DinoSigLIPEncoder()`` and give ``image`` as raw
[b, 3, H, W] pixels — the model encodes and projects in its own forward.
Pre-fused [b, n, vision_width] features remain accepted (the JAX-path
convention), keeping the parity-oracle usage unchanged.

One deliberate departure: visual tokens splice in *after* the BOS token,
matching the JAX path (the reference's torch path prepends them,
``torch/griffin.py:184`` — a cross-path inconsistency we do not
replicate).
"""

from __future__ import annotations

from typing import Optional

import torch
from torch import nn

from cadence_gemma_tpu import common
from cadence_gemma_tpu.torch import modules

Cache = dict[str, modules.ResidualBlockCache]


class Griffin(nn.Module):
  """Griffin model in eager PyTorch."""

  def __init__(
      self,
      config: common.GriffinConfig,
      gradient_checkpointing: bool = False,
      device=None,
      dtype=None,
      vision_encoder: Optional[nn.Module] = None,
  ):
    super().__init__()
    self.config = config
    self.gradient_checkpointing = gradient_checkpointing
    # Model-owned pixels -> features encoder (reference
    # torch/griffin.py:60-62 owns VisionEncoder + MLPProjector; here the
    # projector equivalent is the checkpoint-compatible vl_connector).
    # None keeps the model a pure text/pre-fused-features twin.
    self.vision_encoder = vision_encoder
    kw = dict(device=device, dtype=dtype)
    self.embedder = modules.Embedder(
        vocab_size=config.vocab_size,
        embed_dim=config.width,
        scale_by_sqrt_dim=config.embeddings_scale_by_sqrt_dim,
        **kw,
    )
    self.blocks = nn.ModuleList([
        modules.ResidualBlock(
            width=config.width,
            mlp_expanded_width=config.mlp_expanded_width,
            num_heads=config.num_heads,
            attention_window_size=config.attention_window_size,
            temporal_block_type=block_type,
            lru_width=config.lru_width,
            final_w_init_variance_scale=2.0 / config.num_layers,
            **kw,
        )
        for block_type in config.block_types
    ])
    self.final_norm = modules.layers.RMSNorm(config.width, **kw)
    self.vl_connector = modules.VisionLanguageConnector(
        width=config.width,
        expanded_width=config.vl_expanded_width,
        vision_width=config.vision_width,
        **kw,
    )

  def forward(
      self,
      tokens: torch.Tensor,
      segment_pos: torch.Tensor,
      cache: Optional[Cache] = None,
      return_logits: bool = True,
      return_cache: bool = True,
      image: Optional[torch.Tensor] = None,
  ) -> tuple[Optional[torch.Tensor], Optional[Cache]]:
    if not return_logits and not return_cache:
      return None, None

    x = self.embedder.encode(tokens)
    if image is not None:
      if image.ndim == 4:  # raw [b, 3, H, W] pixels — model-owned encode
        image = self.encode_image(image)
      visual = self.vl_connector(image.to(x.dtype))
      n = visual.shape[1]
      x = torch.cat([x[:, :1], visual, x[:, 1:]], dim=1)
      p0 = segment_pos[:, :1]
      visual_pos = p0 + torch.arange(
          1, n + 1, dtype=segment_pos.dtype, device=segment_pos.device
      )[None]
      segment_pos = torch.cat(
          [p0, visual_pos, segment_pos[:, 1:] + n], dim=-1
      )

    new_cache = {}
    for i, block in enumerate(self.blocks):
      name = f"blocks.{i}"
      block_cache = None if cache is None else cache[name]
      if self.gradient_checkpointing and self.training:
        x, new_cache[name] = torch.utils.checkpoint.checkpoint(
            block, x, segment_pos, block_cache, return_cache,
            use_reentrant=False,
        )
      else:
        x, new_cache[name] = block(x, segment_pos, block_cache, return_cache)

    if not return_logits:
      return None, new_cache

    x = self.final_norm(x)
    logits = self.embedder.decode(x)
    cap = self.config.logits_soft_cap
    if cap:
      logits = torch.tanh(logits / cap) * cap
    return logits, (new_cache if return_cache else None)

  def encode_image(self, pixels: torch.Tensor) -> torch.Tensor:
    """Raw [b, 3, H, W] pixels -> [b, n, vision_width] fused features.

    Requires a model-owned ``vision_encoder`` (reference
    ``torch/griffin.py:179-183`` runs its encoders inside forward).
    """
    if self.vision_encoder is None:
      raise ValueError(
          "This model has no vision_encoder; construct Griffin with "
          "vision_encoder=torch.vit.DinoSigLIPEncoder() to pass raw "
          "pixels, or pass pre-fused [b, n, vision_width] features."
      )
    return self.vision_encoder(pixels)

  def init_cache(self, batch_size: int, dtype, device=None) -> Cache:
    return {
        f"blocks.{i}": modules.ResidualBlock.init_cache(
            batch_size=batch_size,
            width=self.config.width,
            num_heads=self.config.num_heads,
            attention_window_size=self.config.attention_window_size,
            temporal_block_type=block_type,
            dtype=dtype,
            lru_width=self.config.lru_width,
            device=device,
        )
        for i, block_type in enumerate(self.config.block_types)
    }
