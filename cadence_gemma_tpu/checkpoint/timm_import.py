"""timm ViT checkpoint → JAX VisionTransformer parameter conversion.

Converts the state dicts of ``vit_so400m_patch14_siglip_384`` and
``vit_large_patch14_reg4_dinov2.lvd142m`` (the two towers the reference
loads through timm, ``vit/dino_siglip.py:65-77``) into the parameter tree of
:class:`cadence_gemma_tpu.models.vit.VisionTransformer`.

Works from either a live timm model's ``state_dict()`` or a file of saved
tensors; timm/torch are only needed to *produce* the state dict, not to run
the converted model. Position embeddings are bicubically resized when the
checkpoint's grid differs from the target (e.g. DINOv2's native 518→384),
matching timm's ``resample_abs_pos_embed``.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from cadence_gemma_tpu.models import vit as vit_lib


def _to_np(x) -> np.ndarray:
  if hasattr(x, "detach"):  # torch tensor
    x = x.detach()
    if str(x.dtype) == "torch.bfloat16":
      x = x.float()
    return x.cpu().numpy()
  return np.asarray(x)


def _resize_pos_embed(
    pos: np.ndarray, num_prefix: int, target_patches: int
) -> tuple[np.ndarray, np.ndarray | None]:
  """Splits off prefix rows and bicubically resizes the patch grid."""
  prefix = pos[:, :num_prefix] if num_prefix else None
  grid_part = pos[:, num_prefix:] if num_prefix else pos
  src = int(math.sqrt(grid_part.shape[1]))
  dst = int(math.sqrt(target_patches))
  if src != dst:
    grid = grid_part.reshape(1, src, src, -1)
    grid = jax.image.resize(
        jnp.asarray(grid), (1, dst, dst, grid.shape[-1]), method="bicubic"
    )
    grid_part = np.asarray(grid).reshape(1, dst * dst, -1)
  return grid_part, prefix


def timm_vit_to_flax(
    state_dict: Mapping[str, Any],
    config: vit_lib.ViTConfig,
) -> dict[str, Any]:
  """timm ViT state dict → flax params for ``VisionTransformer``.

  Handles: patch_embed.proj (OIHW conv → HWIO), cls_token/reg_token fusion
  into ``prefix_tokens``, pos_embed resampling (incl. timm checkpoints
  whose pos_embed carries prefix rows), fused qkv, and DINOv2 LayerScale
  gammas.
  """
  sd = {k: _to_np(v) for k, v in state_dict.items()}
  params: dict[str, Any] = {}

  # Patch embedding: torch conv weight [out, in, kh, kw] → flax [kh, kw, in, out].
  params["patch_embed"] = {
      "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
      "bias": sd["patch_embed.proj.bias"],
  }

  # Prefix tokens: cls first, then registers (timm order).
  prefix_parts = []
  if "cls_token" in sd:
    prefix_parts.append(sd["cls_token"])
  if "reg_token" in sd:
    prefix_parts.append(sd["reg_token"])
  if "register_tokens" in sd:
    prefix_parts.append(sd["register_tokens"])
  if prefix_parts:
    prefix = np.concatenate(prefix_parts, axis=1)
    assert prefix.shape[1] == config.num_prefix_tokens, (
        prefix.shape, config.num_prefix_tokens
    )
    params["prefix_tokens"] = prefix

  # Position embedding. timm stores prefix rows inside pos_embed only when
  # pos_embed covers them (DINOv2 includes cls, not registers).
  pos = sd["pos_embed"]
  # How many leading rows of pos_embed are prefix rows: the remaining patch
  # part must be a perfect square (0 for SigLIP, 1 for DINOv2's cls row).
  prefix_rows = 0
  while prefix_rows <= 8:
    n = pos.shape[1] - prefix_rows
    if int(math.isqrt(n)) ** 2 == n:
      break
    prefix_rows += 1
  grid_pos, prefix_pos = _resize_pos_embed(
      pos, prefix_rows, config.num_patches
  )
  params["pos_embed"] = grid_pos
  if prefix_pos is not None and "prefix_tokens" in params:
    # Fold the prefix positional rows into the prefix tokens (they are
    # always used together; DINOv2 adds pos_embed[:, :1] to cls).
    pad = config.num_prefix_tokens - prefix_pos.shape[1]
    if pad >= 0:
      prefix_pos = np.pad(prefix_pos, ((0, 0), (0, pad), (0, 0)))
      params["prefix_tokens"] = params["prefix_tokens"] + prefix_pos

  output_layer = (
      config.output_layer if config.output_layer is not None
      else config.depth - 1
  )
  for i in range(output_layer + 1):
    p = f"blocks.{i}."
    block: dict[str, Any] = {
        "norm1": {
            "scale": sd[p + "norm1.weight"],
            "bias": sd[p + "norm1.bias"],
        },
        "attn_qkv": {
            "kernel": sd[p + "attn.qkv.weight"].T,
            "bias": sd[p + "attn.qkv.bias"],
        },
        "attn_proj": {
            "kernel": sd[p + "attn.proj.weight"].T,
            "bias": sd[p + "attn.proj.bias"],
        },
        "norm2": {
            "scale": sd[p + "norm2.weight"],
            "bias": sd[p + "norm2.bias"],
        },
        "mlp_fc1": {
            "kernel": sd[p + "mlp.fc1.weight"].T,
            "bias": sd[p + "mlp.fc1.bias"],
        },
        "mlp_fc2": {
            "kernel": sd[p + "mlp.fc2.weight"].T,
            "bias": sd[p + "mlp.fc2.bias"],
        },
    }
    if config.use_layer_scale:
      block["ls1"] = sd[p + "ls1.gamma"]
      block["ls2"] = sd[p + "ls2.gamma"]
    params[f"block{i}"] = block

  return jax.tree_util.tree_map(jnp.asarray, params)


def load_dino_siglip_encoder_params(
    dino_state_dict: Mapping[str, Any],
    siglip_state_dict: Mapping[str, Any],
    dino_config: vit_lib.ViTConfig = vit_lib.DINOV2_LARGE_REG4_384,
    siglip_config: vit_lib.ViTConfig = vit_lib.SIGLIP_SO400M_384,
) -> dict[str, Any]:
  """Builds the fused ``DinoSigLIPEncoder`` parameter tree."""
  return {
      "dino": timm_vit_to_flax(dino_state_dict, dino_config),
      "siglip": timm_vit_to_flax(siglip_state_dict, siglip_config),
  }
