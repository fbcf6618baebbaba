"""JAX vision towers vs the independent PyTorch timm-twin, at FULL size.

The strongest vision validation available without network access: the torch
twin (``cadence_gemma_tpu/torch/vit.py``) re-implements the two timm
architectures' forward semantics from the upstream definitions, and these
tests assert the JAX towers — fed through the real checkpoint converter
``timm_vit_to_flax`` on the twin's timm-format ``state_dict()`` — reproduce
its block-22 activations at the actual model sizes (DINOv2-L/reg4 1024x24,
SigLIP-so400m 1152x27). This catches GELU-variant, prefix-token,
pos-embed-layout, LayerScale, eps, and transpose mistakes on either side;
only the literal trained weights remain unvalidated (unobtainable here).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cadence_gemma_tpu.checkpoint import timm_import
from cadence_gemma_tpu.models import vit as jax_vit
from cadence_gemma_tpu.torch import vit as torch_vit

# Full-size tower configs at a reduced 126x126 input (9x9 grid): identical
# widths/depths/heads to the real towers — the semantics under test — while
# keeping CPU runtime in budget (sequence length is semantically inert here;
# pos-embed handling is exercised the same at any grid).
DINO_FULL = dataclasses.replace(jax_vit.DINOV2_LARGE_REG4_384, image_size=126)
SIGLIP_FULL = dataclasses.replace(jax_vit.SIGLIP_SO400M_384, image_size=126)


def _jax_from_torch(tower: torch_vit.VisionTransformer, config):
  params = timm_import.timm_vit_to_flax(tower.state_dict(), config)
  model = jax_vit.VisionTransformer(
      config, dtype=jnp.float32, param_dtype=jnp.float32
  )
  return model, {"params": params}


@pytest.mark.parametrize(
    "config,seed",
    [(DINO_FULL, 0), (SIGLIP_FULL, 1)],
    ids=["dinov2-large-reg4", "siglip-so400m"],
)
def test_tower_matches_torch_twin(config, seed):
  tower = torch_vit.random_init_(
      torch_vit.VisionTransformer(config), seed=seed
  ).eval()
  model, variables = _jax_from_torch(tower, config)

  gen = torch.Generator().manual_seed(100 + seed)
  pixels_t = torch.randn(2, 3, config.image_size, config.image_size,
                         generator=gen)
  with torch.no_grad():
    ref = tower(pixels_t).numpy()
  out = np.asarray(model.apply(variables, jnp.asarray(pixels_t.numpy())))

  assert out.shape == ref.shape == (2, config.num_patches, config.embed_dim)
  scale = np.abs(ref).max()
  np.testing.assert_allclose(out, ref, atol=2e-3 * scale)


def test_fused_encoder_matches_torch_twin():
  """Raw pixels → fused [b, patches, 2176]: normalization constants,
  feature order (DINO first), and the converter's fused tree."""
  enc_t = torch_vit.DinoSigLIPEncoder(DINO_FULL, SIGLIP_FULL)
  torch_vit.random_init_(enc_t.dino, seed=2)
  torch_vit.random_init_(enc_t.siglip, seed=3)
  enc_t.eval()

  params = timm_import.load_dino_siglip_encoder_params(
      enc_t.dino.state_dict(), enc_t.siglip.state_dict(),
      dino_config=DINO_FULL, siglip_config=SIGLIP_FULL,
  )
  enc_j = jax_vit.DinoSigLIPEncoder(
      dino_config=DINO_FULL, siglip_config=SIGLIP_FULL,
      dtype=jnp.float32, param_dtype=jnp.float32,
  )

  gen = torch.Generator().manual_seed(7)
  pixels_t = torch.rand(1, 3, 126, 126, generator=gen)  # raw [0, 1]
  with torch.no_grad():
    ref = enc_t(pixels_t).numpy()
  out = np.asarray(
      enc_j.apply({"params": params}, jnp.asarray(pixels_t.numpy()))
  )
  assert out.shape == (1, DINO_FULL.num_patches, 1024 + 1152)
  scale = np.abs(ref).max()
  np.testing.assert_allclose(out, ref, atol=2e-3 * scale)


def test_gelu_variants_differ_and_match_sides():
  """SigLIP must run tanh-GELU, DINOv2 exact GELU, on both frameworks."""
  x = np.linspace(-4, 4, 101, dtype=np.float32)
  j_exact = np.asarray(jax_vit.nn.gelu(jnp.asarray(x), approximate=False))
  j_tanh = np.asarray(jax_vit.nn.gelu(jnp.asarray(x), approximate=True))
  t_exact = torch.nn.functional.gelu(torch.tensor(x)).numpy()
  t_tanh = torch.nn.functional.gelu(
      torch.tensor(x), approximate="tanh"
  ).numpy()
  np.testing.assert_allclose(j_exact, t_exact, atol=1e-6)
  np.testing.assert_allclose(j_tanh, t_tanh, atol=1e-6)
  assert np.abs(j_exact - j_tanh).max() > 1e-4  # the variants are distinct
  assert jax_vit.SIGLIP_SO400M_384.gelu_approximate
  assert not jax_vit.DINOV2_LARGE_REG4_384.gelu_approximate


def test_pos_embed_resample_against_torch():
  """Converter's 518→384-style grid resample == torch bicubic interpolate."""
  gen = torch.Generator().manual_seed(11)
  pos = torch.randn(1, 37 * 37, 64, generator=gen)  # DINOv2-native grid
  got, _ = timm_import._resize_pos_embed(pos.numpy(), 0, 27 * 27)
  grid = pos.reshape(1, 37, 37, 64).permute(0, 3, 1, 2)
  # timm's resample_abs_pos_embed defaults to antialias=True; so does
  # jax.image.resize when downscaling.
  want = torch.nn.functional.interpolate(
      grid, size=(27, 27), mode="bicubic", align_corners=False,
      antialias=True,
  )
  want = want.permute(0, 2, 3, 1).reshape(1, 27 * 27, 64).numpy()
  np.testing.assert_allclose(got, want, atol=2e-2 * np.abs(want).max())
