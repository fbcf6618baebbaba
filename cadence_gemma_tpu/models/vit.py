"""JAX vision towers: SigLIP-so400m and DINOv2-L(reg4) ViTs, fused encoder.

TPU-native replacement for the reference's host-side PyTorch/timm encoders
(``/root/reference/recurrentgemma/vit/dino_siglip.py:19-156``). The
reference loads ``vit_so400m_patch14_siglip_384`` and
``vit_large_patch14_reg4_dinov2.lvd142m`` (both at 384x384 / patch 14 →
27x27 = 729 patches), takes each tower's block-22 output via
``get_intermediate_layers(n={22})`` (un-normed patch tokens, prefix tokens
dropped), and concatenates features to [b, 729, 1024+1152=2176].

Here both towers are flax modules compiled by XLA on TPU: the patch-embed
convolution lands on the MXU, attention/MLP run in bfloat16, and image
preprocessing (resize + normalize) is jitted into the same program — so
``pixels → fused features`` is one device executable with no host
round-trips (the TTFT-critical path, SURVEY §3.2).

Weights convert from timm checkpoints with
:mod:`cadence_gemma_tpu.checkpoint.timm_import`.
"""

import dataclasses
from typing import Sequence

from flax import linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu.models import layers
from cadence_gemma_tpu.ops import pallas_attention

# Preprocessing constants (timm data configs for the two models).
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
  """Architecture of one tower (timm-compatible)."""

  embed_dim: int
  depth: int
  num_heads: int
  mlp_hidden_dim: int
  patch_size: int = 14
  image_size: int = 384
  num_prefix_tokens: int = 0   # cls + register tokens
  use_layer_scale: bool = False
  output_layer: int | None = None  # block index whose output is returned
  # MLP activation variant: SigLIP was trained with tanh-approximated GELU
  # (big_vision's flax default; HF SiglipConfig hidden_act =
  # "gelu_pytorch_tanh"), DINOv2 with exact GELU (facebookresearch/dinov2
  # uses torch nn.GELU). Mixing them up drifts features through 23 blocks.
  gelu_approximate: bool = False

  @property
  def grid(self) -> int:
    return self.image_size // self.patch_size

  @property
  def num_patches(self) -> int:
    return self.grid * self.grid


# The two towers used by the fused encoder. ``output_layer=22`` matches the
# reference's get_intermediate_layers(n={len(dino.blocks) - 2}) — note the
# reference computes the index from the *DINO* tower for both models
# (dino_siglip.py:85-86), i.e. block 22 of 24 and of 27 respectively.
SIGLIP_SO400M_384 = ViTConfig(
    embed_dim=1152,
    depth=27,
    num_heads=16,
    mlp_hidden_dim=4304,
    num_prefix_tokens=0,
    use_layer_scale=False,
    output_layer=22,
    gelu_approximate=True,
)
DINOV2_LARGE_REG4_384 = ViTConfig(
    embed_dim=1024,
    depth=24,
    num_heads=16,
    mlp_hidden_dim=4096,
    num_prefix_tokens=5,  # 1 cls + 4 registers
    use_layer_scale=True,
    output_layer=22,
)


def _should_use_flash_mha(override: bool | None) -> bool:
  """Auto-dispatch for the bidirectional MHA kernel: OFF by default.

  Measured on the v5e (benchmarks/multimodal_bench.py vision, r3): the
  original tiled online-softmax grid was ~1.5x SLOWER than XLA's einsum
  at 729 tokens / batch 1 — its (b, n, 6, 6) grid of 128-tile matmuls
  (head_dim 64/72 padded to 128 lanes) underutilizes the MXU vs the
  einsum's large batched contractions. The whole-sequence one-pass
  kernel (``pallas_attention._mha_onepass_kernel``, auto-selected for
  t <= 1024) closes that gap to parity (same-run 5-variant sweep:
  flash 14.5 vs einsum 14.3 ms/image bf16; 12.5 vs 11.7 int8+act), but
  never beats einsum at these shapes — the [t, t] fp32 logits it keeps
  out of HBM are only ~34 MB/block, below where bandwidth matters. The
  towers therefore default to einsum; the kernel stays available
  (``use_flash_attention=True``) for shapes where the logits tensor
  actually dominates (t >= ~2k).
  """
  if override is not None:
    return override
  return False


class ViTBlock(nn.Module):
  """Pre-norm transformer block with optional LayerScale (DINOv2).

  ``key_bias`` (``[1, 1, 1, t]`` additive logits bias, 0 for real tokens
  and -inf for padding) supports the lane-aligned token padding of
  :class:`VisionTransformer` — it fuses into the softmax as one
  broadcast add, so masking padded keys costs no extra memory pass.
  """

  config: ViTConfig
  dtype: at.dtype = jnp.bfloat16
  param_dtype: at.dtype = jnp.float32
  quantized: bool = False
  act_quant: bool = False
  use_flash_attention: bool | None = None
  # Store the [b, n, q, k] attention logits in bf16 instead of fp32 (the
  # softmax's max/exp/sum still accumulate in fp32 — only the HBM-resident
  # tensor narrows). The fp32 logits round trip is the towers' largest
  # non-matmul cost (BASELINE.md §Vision-r4); bf16 storage halves that
  # traffic at a bounded accuracy cost: logits round to ~2^-8 relative
  # BEFORE exp, so per-row probabilities drift O(1e-3) — parity-tested
  # against the fp32 path in test_vit.py. OFF by default (the bf16 towers
  # are the numerics oracle vs timm); the int8-serving encoder turns it
  # on, where it is strictly smaller than the int8 quantization error.
  softmax_bf16: bool = False

  @nn.compact
  def __call__(
      self, x: jax.Array, key_bias: jax.Array | None = None
  ) -> jax.Array:
    cfg = self.config
    head_dim = cfg.embed_dim // cfg.num_heads

    def layer_scale(name, value):
      if not cfg.use_layer_scale:
        return value
      gamma = self.param(
          name, nn.initializers.constant(1e-5), (cfg.embed_dim,),
          self.param_dtype,
      )
      return value * gamma.astype(value.dtype)

    dense = lambda feats, name: layers.QuantizableDense(
        features=feats,
        quantized=self.quantized,
        act_quant=self.act_quant,
        dtype=self.dtype,
        param_dtype=self.param_dtype,
        name=name,
    )

    # Attention.
    h = nn.LayerNorm(
        epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
        name="norm1",
    )(x)
    qkv = dense(3 * cfg.embed_dim, "attn_qkv")(h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split_heads = lambda t: t.reshape(
        t.shape[0], t.shape[1], cfg.num_heads, head_dim
    )
    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    if _should_use_flash_mha(self.use_flash_attention) and key_bias is None:
      out = pallas_attention.flash_mha_attention(q, k, v)
    else:
      logits = jnp.einsum(
          "bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32
      ) * (head_dim**-0.5)
      if key_bias is not None:
        logits = logits + key_bias
      if self.softmax_bf16:
        # bf16-resident logits; fp32 max/exp/sum stay in-register inside
        # the fused softmax loop (see the field comment). The -inf key
        # bias survives the bf16 cast exactly.
        logits = logits.astype(jnp.bfloat16)
        m = jax.lax.stop_gradient(
            jnp.max(logits, axis=-1, keepdims=True)
        )
        e = jnp.exp((logits - m).astype(jnp.float32))
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(self.dtype)
      else:
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
      out = jnp.einsum("bnqk,bknh->bqnh", probs, v)
    out = out.reshape(out.shape[0], out.shape[1], cfg.embed_dim)
    out = dense(cfg.embed_dim, "attn_proj")(out)
    x = x + layer_scale("ls1", out)

    # MLP.
    h = nn.LayerNorm(
        epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
        name="norm2",
    )(x)
    h = dense(cfg.mlp_hidden_dim, "mlp_fc1")(h)
    h = nn.gelu(h, approximate=cfg.gelu_approximate)
    h = dense(cfg.embed_dim, "mlp_fc2")(h)
    return x + layer_scale("ls2", h)


class VisionTransformer(nn.Module):
  """timm-compatible ViT returning an intermediate layer's patch tokens.

  ``quantized`` serves int8 weights (``kernel_q``/``kernel_scale`` leaves
  from :func:`cadence_gemma_tpu.ops.quantization.quantize_params`);
  ``act_quant`` additionally runs the block matmuls as int8xint8 on the
  MXU. The patch-embed conv and LayerNorms stay in bf16/f32 (tiny).
  """

  config: ViTConfig
  dtype: at.dtype = jnp.bfloat16
  param_dtype: at.dtype = jnp.float32
  quantized: bool = False
  act_quant: bool = False
  use_flash_attention: bool | None = None
  softmax_bf16: bool = False  # see ViTBlock.softmax_bf16
  # Pad the token count to this multiple through the block stack
  # (729/734 → 768 = 6 x 128 MXU lanes). Isolated bf16 blocks measure up
  # to ~1.4x faster at 768 tokens (XLA picks better layouts when the
  # sublane dim tiles evenly), but at whole-encoder level most of that is
  # already hidden by inter-op overlap: a same-process alternating A/B on
  # the v5e (r4) gives 7.18 vs 7.32 ms/image int8+act and 9.26 vs 9.34
  # bf16 — a consistent ~1-2% win, kept because it is free and exact.
  # Exact for the real tokens — padded keys carry a fused -inf softmax
  # bias, and every other op is per-token. 0 disables. Ignored when flash
  # attention is forced on (the kernel masks internally by its own tile
  # padding).
  pad_tokens_to: int = 128

  @nn.compact
  def __call__(self, pixels: at.ImagePixels) -> at.Image:
    """[b, 3, H, W] normalized pixels → [b, patches, embed_dim] features."""
    cfg = self.config
    batch = pixels.shape[0]

    # Patch embedding: a patch-sized strided conv == one big matmul on MXU.
    x = nn.Conv(
        features=cfg.embed_dim,
        kernel_size=(cfg.patch_size, cfg.patch_size),
        strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
        name="patch_embed",
    )(jnp.transpose(pixels, (0, 2, 3, 1)).astype(self.dtype))
    x = x.reshape(batch, cfg.num_patches, cfg.embed_dim)

    pos_embed = self.param(
        "pos_embed",
        nn.initializers.normal(0.02),
        (1, cfg.num_patches, cfg.embed_dim),
        self.param_dtype,
    )
    x = x + pos_embed.astype(x.dtype)

    if cfg.num_prefix_tokens:
      prefix = self.param(
          "prefix_tokens",
          nn.initializers.zeros_init(),
          (1, cfg.num_prefix_tokens, cfg.embed_dim),
          self.param_dtype,
      )
      prefix = jnp.broadcast_to(
          prefix.astype(x.dtype),
          (batch, cfg.num_prefix_tokens, cfg.embed_dim),
      )
      x = jnp.concatenate([prefix, x], axis=1)

    # Lane-aligned token padding (see the field comment): zero tokens
    # appended after the real ones, masked out of attention by a fused
    # additive bias. Skipped when flash attention is forced on (the
    # kernel masks internally by its own tile padding).
    t_real = x.shape[1]
    key_bias = None
    pad_multiple = (
        0 if _should_use_flash_mha(self.use_flash_attention)
        else self.pad_tokens_to
    )
    if pad_multiple and t_real % pad_multiple:
      t_pad = (t_real + pad_multiple - 1) // pad_multiple * pad_multiple
      x = jnp.pad(x, ((0, 0), (0, t_pad - t_real), (0, 0)))
      key_bias = jnp.where(
          jnp.arange(t_pad) < t_real, 0.0, -jnp.inf
      ).astype(jnp.float32)[None, None, None, :]

    output_layer = (
        cfg.output_layer if cfg.output_layer is not None else cfg.depth - 1
    )
    for i in range(output_layer + 1):
      x = ViTBlock(
          cfg, dtype=self.dtype, param_dtype=self.param_dtype,
          quantized=self.quantized, act_quant=self.act_quant,
          use_flash_attention=self.use_flash_attention,
          softmax_bf16=self.softmax_bf16,
          name=f"block{i}",
      )(x, key_bias)

    # Intermediate-layer output: un-normed, prefix tokens dropped
    # (timm get_intermediate_layers(norm=False) semantics).
    return x[:, cfg.num_prefix_tokens : t_real]


def preprocess(
    images: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    size: int = 384,
) -> jax.Array:
  """[b, 3, h, w] float in [0, 1] → resized + normalized [b, 3, size, size].

  Bicubic resize matching torchvision's default for these models. Runs on
  device under jit.
  """
  b, c, _, _ = images.shape
  resized = jax.image.resize(
      images, (b, c, size, size), method="bicubic"
  )
  mean = jnp.asarray(mean, images.dtype)[None, :, None, None]
  std = jnp.asarray(std, images.dtype)[None, :, None, None]
  return (resized - mean) / std


def load_image(path: str, size: int | None = None) -> np.ndarray:
  """Decodes an image file to [1, 3, h, w] float32 in [0, 1] (host-side).

  When ``size`` is given the image is bicubic-resized on the host so that
  batched pixels share a static shape; the on-device :func:`preprocess`
  resize is then a no-op.
  """
  from PIL import Image  # pytype: disable=import-error

  with open(path, "rb") as f:
    img = Image.open(f).convert("RGB")
  if size is not None:
    img = img.resize((size, size), Image.BICUBIC)
  arr = np.asarray(img, dtype=np.float32) / 255.0
  return np.transpose(arr, (2, 0, 1))[None]


class DinoSigLIPEncoder(nn.Module):
  """The fused DINOv2 ‖ SigLIP encoder: pixels → [b, 729, 2176].

  Feature order matches the reference: DINO features first, SigLIP second
  (``dino_siglip.py:153``). Both towers consume the same raw pixels; each
  applies its own normalization on device.
  """

  dino_config: ViTConfig = DINOV2_LARGE_REG4_384
  siglip_config: ViTConfig = SIGLIP_SO400M_384
  dtype: at.dtype = jnp.bfloat16
  param_dtype: at.dtype = jnp.float32
  quantized: bool = False
  act_quant: bool = False
  use_flash_attention: bool | None = None
  softmax_bf16: bool = False  # see ViTBlock.softmax_bf16
  pad_tokens_to: int = 128  # see VisionTransformer.pad_tokens_to

  @nn.compact
  def __call__(self, pixels: at.ImagePixels) -> at.Image:
    """[b, 3, h, w] raw pixels in [0, 1] → fused features."""
    size = self.dino_config.image_size
    dino_in = preprocess(pixels, DINO_MEAN, DINO_STD, size)
    siglip_in = preprocess(pixels, SIGLIP_MEAN, SIGLIP_STD, size)
    tower = lambda cfg, name: VisionTransformer(
        cfg, dtype=self.dtype, param_dtype=self.param_dtype,
        quantized=self.quantized, act_quant=self.act_quant,
        use_flash_attention=self.use_flash_attention,
        softmax_bf16=self.softmax_bf16,
        pad_tokens_to=self.pad_tokens_to,
        name=name,
    )
    dino_out = tower(self.dino_config, "dino")(dino_in)
    siglip_out = tower(self.siglip_config, "siglip")(siglip_in)
    return jnp.concatenate([dino_out, siglip_out], axis=-1)

  @property
  def feature_width(self) -> int:
    return self.dino_config.embed_dim + self.siglip_config.embed_dim

  def preprocess_path(self, img_path: str) -> jax.Array:
    """Host-side decode only; resize/normalize happen on device."""
    return jnp.asarray(load_image(img_path))
