"""PyTorch twin of the timm ViT towers, with timm-format state dicts.

The reference's vision encoders ARE live timm models
(``/root/reference/recurrentgemma/vit/dino_siglip.py:65-86`` creates
``vit_so400m_patch14_siglip_384`` and ``vit_large_patch14_reg4_dinov2`` and
takes ``get_intermediate_layers(n={22})``). This environment has neither
timm nor the pretrained weights, so this module re-implements the *exact
forward semantics* of those two timm architectures in plain PyTorch, from
the upstream definitions:

  * timm ``VisionTransformer`` forward: strided-conv patch embed (floor
    grid: 384 // 14 = 27, trailing pixels dropped), ``no_embed_class``
    position handling (pos_embed covers patches only; cls/register tokens
    prepended after the add — the layout of timm's dinov2-reg and siglip
    checkpoints), pre-norm blocks, LayerNorm eps 1e-6.
  * DINOv2-L/reg4: cls + 4 register tokens, LayerScale (``ls1``/``ls2``
    gamma), exact GELU (facebookresearch/dinov2 uses ``nn.GELU``). In timm
    checkpoints the original pos_embed's cls row is already folded into
    ``cls_token`` (timm's dinov2 checkpoint filter), which this twin
    mirrors by carrying no cls position row.
  * SigLIP-so400m: no prefix tokens, tanh-approximated GELU (big_vision
    trains with flax's default ``approximate=True``; HF ``SiglipConfig``
    says ``gelu_pytorch_tanh``).
  * ``get_intermediate_layers(n, norm=False)``: run blocks 0..n, return
    un-normed patch tokens with prefix tokens dropped.

Module/parameter names replicate timm's (``patch_embed.proj``,
``blocks.{i}.attn.qkv`` …) so ``state_dict()`` feeds directly into
:func:`cadence_gemma_tpu.checkpoint.timm_import.timm_vit_to_flax`. That
makes this the independent oracle for validating the JAX towers + converter
(``tests/test_vit_torch_parity.py``) in the absence of real weights.
"""

from __future__ import annotations

import math

import torch
from torch import nn

from cadence_gemma_tpu.models import vit as jax_vit


class LayerScale(nn.Module):
  """DINOv2 per-channel residual scaling (timm ``LayerScale``)."""

  def __init__(self, dim: int, init_value: float = 1e-5):
    super().__init__()
    self.gamma = nn.Parameter(init_value * torch.ones(dim))

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    return x * self.gamma


class Attention(nn.Module):
  """timm ViT attention: fused qkv, per-head scaled dot product."""

  def __init__(self, dim: int, num_heads: int):
    super().__init__()
    self.num_heads = num_heads
    self.head_dim = dim // num_heads
    self.qkv = nn.Linear(dim, 3 * dim, bias=True)
    self.proj = nn.Linear(dim, dim, bias=True)

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    b, t, d = x.shape
    qkv = self.qkv(x).reshape(b, t, 3, self.num_heads, self.head_dim)
    q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)  # [b, n, t, h]
    attn = (q @ k.transpose(-2, -1)) * self.head_dim**-0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, t, d)
    return self.proj(out)


class Mlp(nn.Module):
  """timm ViT MLP (``fc1`` → act → ``fc2``)."""

  def __init__(self, dim: int, hidden: int, gelu_approximate: bool):
    super().__init__()
    self.fc1 = nn.Linear(dim, hidden, bias=True)
    self.act = nn.GELU(approximate="tanh" if gelu_approximate else "none")
    self.fc2 = nn.Linear(hidden, dim, bias=True)

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
  """Pre-norm transformer block with optional LayerScale."""

  def __init__(self, dim, num_heads, mlp_hidden, layer_scale, gelu_approx):
    super().__init__()
    self.norm1 = nn.LayerNorm(dim, eps=1e-6)
    self.attn = Attention(dim, num_heads)
    self.ls1 = LayerScale(dim) if layer_scale else nn.Identity()
    self.norm2 = nn.LayerNorm(dim, eps=1e-6)
    self.mlp = Mlp(dim, mlp_hidden, gelu_approx)
    self.ls2 = LayerScale(dim) if layer_scale else nn.Identity()

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    x = x + self.ls1(self.attn(self.norm1(x)))
    x = x + self.ls2(self.mlp(self.norm2(x)))
    return x


class PatchEmbed(nn.Module):
  """timm patch embed: strided conv, floor grid (trailing pixels dropped)."""

  def __init__(self, patch_size: int, embed_dim: int):
    super().__init__()
    self.proj = nn.Conv2d(3, embed_dim, patch_size, stride=patch_size)

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    x = self.proj(x)                       # [b, d, gh, gw]
    return x.flatten(2).transpose(1, 2)    # [b, gh*gw, d]


class VisionTransformer(nn.Module):
  """timm-semantics ViT configured by the shared :class:`ViTConfig`."""

  def __init__(self, config: jax_vit.ViTConfig):
    super().__init__()
    self.config = config
    cfg = config
    self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim)
    # no_embed_class layout: pos_embed covers patch tokens only; prefix
    # tokens (cls first, then registers) are prepended after the add.
    self.pos_embed = nn.Parameter(
        0.02 * torch.randn(1, cfg.num_patches, cfg.embed_dim)
    )
    if cfg.num_prefix_tokens:
      self.cls_token = nn.Parameter(torch.zeros(1, 1, cfg.embed_dim))
      if cfg.num_prefix_tokens > 1:
        self.reg_token = nn.Parameter(
            torch.zeros(1, cfg.num_prefix_tokens - 1, cfg.embed_dim)
        )
    self.blocks = nn.ModuleList([
        Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_hidden_dim,
              cfg.use_layer_scale, cfg.gelu_approximate)
        for _ in range(cfg.depth)
    ])

  def get_intermediate_layers(
      self, pixels: torch.Tensor, n: int | None = None
  ) -> torch.Tensor:
    """[b, 3, H, W] normalized pixels → [b, patches, d] at block ``n``.

    Matches timm's ``get_intermediate_layers(n={n}, norm=False)``: blocks 0
    through ``n`` inclusive, output un-normed, prefix tokens dropped.
    """
    cfg = self.config
    n = cfg.output_layer if n is None else n
    n = cfg.depth - 1 if n is None else n
    x = self.patch_embed(pixels)
    x = x + self.pos_embed
    if cfg.num_prefix_tokens:
      prefix = [self.cls_token.expand(x.shape[0], -1, -1)]
      if cfg.num_prefix_tokens > 1:
        prefix.append(self.reg_token.expand(x.shape[0], -1, -1))
      x = torch.cat(prefix + [x], dim=1)
    for block in self.blocks[: n + 1]:
      x = block(x)
    return x[:, cfg.num_prefix_tokens:]

  forward = get_intermediate_layers


def _normalize(pixels: torch.Tensor, mean, std) -> torch.Tensor:
  mean = torch.tensor(mean, dtype=pixels.dtype)[None, :, None, None]
  std = torch.tensor(std, dtype=pixels.dtype)[None, :, None, None]
  return (pixels - mean) / std


class DinoSigLIPEncoder(nn.Module):
  """Torch twin of the fused encoder: raw [0, 1] pixels → [b, 729, 2176].

  Matches the reference's feature order (DINO first,
  ``dino_siglip.py:153``) and per-tower normalization. Expects pixels
  already resized to the towers' input size (the torchvision resize is
  bit-identical to PIL's, which `models/vit.py:load_image` / the native
  loader reproduce).
  """

  def __init__(
      self,
      dino_config: jax_vit.ViTConfig = jax_vit.DINOV2_LARGE_REG4_384,
      siglip_config: jax_vit.ViTConfig = jax_vit.SIGLIP_SO400M_384,
  ):
    super().__init__()
    self.dino = VisionTransformer(dino_config)
    self.siglip = VisionTransformer(siglip_config)
    self.input_size = dino_config.image_size  # host loaders resize to this

  def forward(self, pixels: torch.Tensor) -> torch.Tensor:
    dino_in = _normalize(pixels, jax_vit.DINO_MEAN, jax_vit.DINO_STD)
    siglip_in = _normalize(pixels, jax_vit.SIGLIP_MEAN, jax_vit.SIGLIP_STD)
    return torch.cat(
        [self.dino(dino_in), self.siglip(siglip_in)], dim=2
    )


def random_init_(model: nn.Module, seed: int = 0) -> nn.Module:
  """Re-initializes all parameters with realistic-scale random values.

  For parity testing: O(1/sqrt(fan_in)) matrix weights, norm scales and
  LayerScale gammas near 1 — every residual branch carries O(1) signal
  through all 23 blocks, so a semantic mismatch anywhere shows up in the
  block-22 comparison instead of being attenuated away.
  """
  gen = torch.Generator().manual_seed(seed)
  with torch.no_grad():
    for name, p in model.named_parameters():
      if p.ndim >= 2 and not name.endswith(
          ("cls_token", "reg_token", "pos_embed")
      ):
        fan_in = p.shape[1] if p.ndim == 2 else math.prod(p.shape[1:])
        p.normal_(0.0, fan_in**-0.5, generator=gen)
      elif "gamma" in name or "norm" in name and name.endswith("weight"):
        p.copy_(1.0 + 0.1 * torch.randn(p.shape, generator=gen))
      else:
        p.normal_(0.0, 0.02, generator=gen)
  return model
