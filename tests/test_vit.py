"""Vision tower tests: shapes, preprocessing, timm weight conversion parity.

The towers are validated structurally with tiny configs (the real 384px
towers are exercised by bench/examples); conversion parity is checked
against a hand-built torch-style state dict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu.checkpoint import timm_import
from cadence_gemma_tpu.models import vit as vit_lib


def tiny_cfg(**overrides):
  kwargs = dict(
      embed_dim=16,
      depth=3,
      num_heads=2,
      mlp_hidden_dim=32,
      patch_size=4,
      image_size=16,
      num_prefix_tokens=0,
      use_layer_scale=False,
      output_layer=None,
  )
  kwargs.update(overrides)
  return vit_lib.ViTConfig(**kwargs)


class TestVisionTransformer:

  def test_output_shape(self):
    cfg = tiny_cfg()
    model = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32
    )
    pixels = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    params = model.init(jax.random.PRNGKey(1), pixels)
    out = model.apply(params, pixels)
    assert out.shape == (2, cfg.num_patches, cfg.embed_dim)

  def test_prefix_tokens_dropped(self):
    cfg = tiny_cfg(num_prefix_tokens=5, use_layer_scale=True)
    model = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32
    )
    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
    params = model.init(jax.random.PRNGKey(1), pixels)
    out = model.apply(params, pixels)
    assert out.shape == (1, cfg.num_patches, cfg.embed_dim)

  def test_intermediate_layer_extraction(self):
    """output_layer=k must equal running only blocks 0..k."""
    cfg_full = tiny_cfg(output_layer=1)
    model = vit_lib.VisionTransformer(
        cfg_full, dtype=jnp.float32, param_dtype=jnp.float32
    )
    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
    params = model.init(jax.random.PRNGKey(1), pixels)
    # Params exist only for blocks up to output_layer.
    assert "block1" in params["params"] and "block2" not in params["params"]


class TestPreprocess:

  def test_resize_and_normalize(self):
    img = jnp.ones((1, 3, 8, 8)) * 0.5
    out = vit_lib.preprocess(img, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), size=4)
    assert out.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)

  def test_channelwise_stats(self):
    img = jnp.stack(
        [jnp.full((4, 4), 0.485), jnp.full((4, 4), 0.456),
         jnp.full((4, 4), 0.406)]
    )[None]
    out = vit_lib.preprocess(
        img, vit_lib.DINO_MEAN, vit_lib.DINO_STD, size=4
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


class TestDinoSigLIPEncoder:

  def test_fused_output(self):
    enc = vit_lib.DinoSigLIPEncoder(
        dino_config=tiny_cfg(num_prefix_tokens=5, use_layer_scale=True),
        siglip_config=tiny_cfg(embed_dim=24, num_heads=3),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    pixels = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 20, 20))
    params = enc.init(jax.random.PRNGKey(1), pixels)
    out = enc.apply(params, pixels)
    assert out.shape == (1, 16, 16 + 24)

  def test_default_geometry_matches_reference(self):
    enc = vit_lib.DinoSigLIPEncoder()
    assert enc.feature_width == 2176
    assert enc.dino_config.num_patches == 729
    assert enc.siglip_config.num_patches == 729
    # Reference takes block 22 of both towers (dino_siglip.py:85-86).
    assert enc.dino_config.output_layer == 22
    assert enc.siglip_config.output_layer == 22


class TestTimmConversion:

  def _fake_state_dict(self, cfg, with_prefix, with_ls, pos_grid=None):
    rng = np.random.RandomState(0)
    g = pos_grid or cfg.grid
    sd = {
        "patch_embed.proj.weight": rng.randn(
            cfg.embed_dim, 3, cfg.patch_size, cfg.patch_size
        ).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(cfg.embed_dim).astype(np.float32),
        "pos_embed": rng.randn(1, g * g + (1 if with_prefix else 0),
                               cfg.embed_dim).astype(np.float32),
    }
    if with_prefix:
      sd["cls_token"] = rng.randn(1, 1, cfg.embed_dim).astype(np.float32)
      sd["reg_token"] = rng.randn(1, 4, cfg.embed_dim).astype(np.float32)
    out_layer = cfg.output_layer if cfg.output_layer is not None else (
        cfg.depth - 1)
    for i in range(out_layer + 1):
      p = f"blocks.{i}."
      sd[p + "norm1.weight"] = np.ones(cfg.embed_dim, np.float32)
      sd[p + "norm1.bias"] = np.zeros(cfg.embed_dim, np.float32)
      sd[p + "attn.qkv.weight"] = rng.randn(
          3 * cfg.embed_dim, cfg.embed_dim).astype(np.float32)
      sd[p + "attn.qkv.bias"] = rng.randn(3 * cfg.embed_dim).astype(
          np.float32)
      sd[p + "attn.proj.weight"] = rng.randn(
          cfg.embed_dim, cfg.embed_dim).astype(np.float32)
      sd[p + "attn.proj.bias"] = rng.randn(cfg.embed_dim).astype(np.float32)
      sd[p + "norm2.weight"] = np.ones(cfg.embed_dim, np.float32)
      sd[p + "norm2.bias"] = np.zeros(cfg.embed_dim, np.float32)
      sd[p + "mlp.fc1.weight"] = rng.randn(
          cfg.mlp_hidden_dim, cfg.embed_dim).astype(np.float32)
      sd[p + "mlp.fc1.bias"] = rng.randn(cfg.mlp_hidden_dim).astype(
          np.float32)
      sd[p + "mlp.fc2.weight"] = rng.randn(
          cfg.embed_dim, cfg.mlp_hidden_dim).astype(np.float32)
      sd[p + "mlp.fc2.bias"] = rng.randn(cfg.embed_dim).astype(np.float32)
      if with_ls:
        sd[p + "ls1.gamma"] = rng.randn(cfg.embed_dim).astype(np.float32)
        sd[p + "ls2.gamma"] = rng.randn(cfg.embed_dim).astype(np.float32)
    return sd

  def test_converted_params_load_and_run(self):
    cfg = tiny_cfg(num_prefix_tokens=5, use_layer_scale=True)
    sd = self._fake_state_dict(cfg, with_prefix=True, with_ls=True)
    params = timm_import.timm_vit_to_flax(sd, cfg)
    model = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32
    )
    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
    ref_shapes = jax.tree_util.tree_map(
        lambda x: x.shape,
        model.init(jax.random.PRNGKey(1), pixels)["params"],
    )
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes
    out = model.apply({"params": params}, pixels)
    assert np.isfinite(np.asarray(out)).all()

  def test_pos_embed_resampled(self):
    cfg = tiny_cfg()  # grid 4
    sd = self._fake_state_dict(cfg, with_prefix=False, with_ls=False,
                               pos_grid=8)
    params = timm_import.timm_vit_to_flax(sd, cfg)
    assert params["pos_embed"].shape == (1, 16, cfg.embed_dim)

  def test_qkv_math_matches_torch_layout(self):
    """Converted qkv kernel reproduces torch's x @ W.T + b."""
    cfg = tiny_cfg(depth=1, output_layer=0)
    sd = self._fake_state_dict(cfg, with_prefix=False, with_ls=False)
    params = timm_import.timm_vit_to_flax(sd, cfg)
    x = np.random.RandomState(1).randn(4, cfg.embed_dim).astype(np.float32)
    torch_style = x @ sd["blocks.0.attn.qkv.weight"].T + sd[
        "blocks.0.attn.qkv.bias"]
    flax_style = x @ np.asarray(params["block0"]["attn_qkv"]["kernel"]) + (
        np.asarray(params["block0"]["attn_qkv"]["bias"]))
    np.testing.assert_allclose(torch_style, flax_style, atol=1e-5)


class TestQuantizedViT:
  """int8 weight-only + int8-activation tower variants vs the fp tower."""

  def _tower_and_params(self):
    from cadence_gemma_tpu.ops import quantization

    cfg = tiny_cfg(num_prefix_tokens=2, use_layer_scale=True)
    model = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32
    )
    pixels = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    params = model.init(jax.random.PRNGKey(1), pixels)["params"]
    qparams = quantization.quantize_params(params)
    return cfg, pixels, params, qparams

  def test_quantize_params_maps_vit_tree(self):
    cfg, _, params, qparams = self._tower_and_params()
    blk = qparams["block0"]
    for mod in ("attn_qkv", "attn_proj", "mlp_fc1", "mlp_fc2"):
      assert "kernel_q" in blk[mod] and "kernel_scale" in blk[mod]
      assert blk[mod]["kernel_q"].dtype == jnp.int8
      assert "bias" in blk[mod]
    # Norms, LayerScale, pos embed, and the 4-D patch conv stay untouched.
    assert "kernel" in qparams["patch_embed"]
    assert "ls1" in blk and "scale" in blk["norm1"]
    assert "pos_embed" in qparams and "prefix_tokens" in qparams

  @pytest.mark.parametrize("act_quant", [False, True])
  def test_quantized_tower_close_to_fp(self, act_quant):
    cfg, pixels, params, qparams = self._tower_and_params()
    fp = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32
    ).apply({"params": params}, pixels)
    q = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32,
        quantized=True, act_quant=act_quant,
    ).apply({"params": qparams}, pixels)
    assert q.shape == fp.shape
    denom = np.abs(np.asarray(fp)).max()
    err = np.abs(np.asarray(q) - np.asarray(fp)).max() / denom
    assert err < (0.05 if act_quant else 0.02), err


class TestLaneAlignedPadding:
  """pad_tokens_to: zero tokens + fused -inf key bias must be exact.

  Every non-attention op is per-token and padded keys get -inf logits,
  so real-token features match the unpadded tower up to matmul-tiling
  fp reassociation (r4 perf change — ~1-2% faster whole-encoder at
  6x128-aligned token counts, measured A/B on v5e; see
  models/vit.py pad_tokens_to).
  """

  def _tower(self, pad, prefix=3):
    cfg = vit_lib.ViTConfig(
        embed_dim=16, depth=3, num_heads=2, mlp_hidden_dim=32,
        patch_size=4, image_size=20, num_prefix_tokens=prefix,
        use_layer_scale=bool(prefix), output_layer=1,
    )
    return vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32,
        pad_tokens_to=pad,
    )

  @pytest.mark.parametrize("prefix", [0, 3])
  def test_padded_matches_unpadded(self, prefix):
    # 20/4 = 5x5 = 25 patches (+ prefix) -> pads to 32 with pad=8.
    pixels = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 20, 20))
    unpadded = self._tower(0, prefix)
    padded = self._tower(8, prefix)
    params = unpadded.init(jax.random.PRNGKey(1), pixels)["params"]
    a = unpadded.apply({"params": params}, pixels)
    b = padded.apply({"params": params}, pixels)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)

  def test_already_aligned_is_noop(self):
    # 16 patches, pad multiple 8: no padding path taken.
    cfg = vit_lib.ViTConfig(
        embed_dim=16, depth=2, num_heads=2, mlp_hidden_dim=32,
        patch_size=4, image_size=16, output_layer=1,
    )
    pixels = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16))
    m0 = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, pad_tokens_to=0
    )
    m8 = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, pad_tokens_to=8
    )
    params = m0.init(jax.random.PRNGKey(1), pixels)["params"]
    np.testing.assert_array_equal(
        np.asarray(m0.apply({"params": params}, pixels)),
        np.asarray(m8.apply({"params": params}, pixels)),
    )


class TestSoftmaxBf16:
  """softmax_bf16: bf16-resident attention logits, fp32 accumulation.

  The serving-config speed lever for the fp32 [n, t, t] logits round
  trip (the towers' largest non-matmul cost, BASELINE.md §Vision-r4).
  Bound: features drift only by the bf16 rounding of the logits BEFORE
  exp — O(1e-2) relative through a full tower — and the padded-key -inf
  bias must still mask exactly."""

  def _features(self, softmax_bf16, pad=0):
    cfg = tiny_cfg(depth=2, output_layer=1)
    model = vit_lib.VisionTransformer(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32,
        softmax_bf16=softmax_bf16, pad_tokens_to=pad,
    )
    pixels = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 16, 16))
    params = model.init(jax.random.PRNGKey(4), pixels)["params"]
    return model.apply({"params": params}, pixels)

  def test_drift_is_bounded(self):
    a = np.asarray(self._features(False), np.float32)
    b = np.asarray(self._features(True), np.float32)
    scale = np.abs(a).max() or 1.0
    rel = np.abs(a - b).max() / scale
    assert rel < 2e-2, rel  # bf16 logit rounding only, not a wrong path
    assert rel > 0.0  # the flag actually changes the computation

  def test_padded_keys_still_masked_exactly(self):
    """-inf key bias survives the bf16 cast: padding stays invisible."""
    unpadded = np.asarray(self._features(True, pad=0), np.float32)
    padded = np.asarray(self._features(True, pad=32), np.float32)
    np.testing.assert_allclose(unpadded, padded, rtol=0, atol=1e-6)

  def test_probs_rows_normalized(self):
    """fp32-accumulated softmax over bf16 logits sums to one per row."""
    cfg = tiny_cfg(depth=1, output_layer=0)
    # Direct block-level check with an extreme logit spread: bf16
    # storage must not destabilize normalization.
    block = vit_lib.ViTBlock(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, softmax_bf16=True
    )
    x = 30.0 * jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16))
    params = block.init(jax.random.PRNGKey(6), x)["params"]
    out = block.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out)).all()
