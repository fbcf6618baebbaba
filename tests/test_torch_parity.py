"""Cross-framework golden parity: JAX path vs the torch twin.

Mirrors the reference's per-layer + full-model parity suites
(``torch/layers_test.py``, ``torch/modules_test.py``,
``torch/griffin_test.py:41``): flax params convert into the torch twin and
both frameworks must agree on forward outputs and unrolled decode steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cadence_gemma_tpu import common  # noqa: E402
from cadence_gemma_tpu.models import griffin as jx_griffin  # noqa: E402
from cadence_gemma_tpu.models import layers as jx_layers  # noqa: E402
from cadence_gemma_tpu.models import modules as jx_modules  # noqa: E402
from cadence_gemma_tpu.torch import griffin as th_griffin  # noqa: E402
from cadence_gemma_tpu.torch import layers as th_layers  # noqa: E402
from cadence_gemma_tpu.torch import modules as th_modules  # noqa: E402
from cadence_gemma_tpu.torch import sampler as th_sampler  # noqa: E402
from cadence_gemma_tpu.torch import test_utils  # noqa: E402
from cadence_gemma_tpu.inference import sampler as jx_sampler  # noqa: E402
from cadence_gemma_tpu.tokenizers import SimpleVocab  # noqa: E402

W, HEADS, LRU, WINDOW, MLP = 16, 2, 16, 4, 32


def _x(b=1, t=6, d=W, seed=0):
  return jax.random.normal(jax.random.PRNGKey(seed), (b, t, d))


def _pos(b=1, t=6):
  return jnp.tile(jnp.arange(t)[None], (b, 1))


class TestLayerParity:

  def test_rmsnorm(self):
    fl = jx_layers.RMSNorm(width=W, dtype=jnp.float32,
                           param_dtype=jnp.float32)
    x = _x()
    params = fl.init(jax.random.PRNGKey(1), x)["params"]
    params = {"scale": params["scale"] + 0.3}
    th = th_layers.RMSNorm(W)
    test_utils.flax_params_to_torch_module(params, th)
    np.testing.assert_allclose(
        np.asarray(fl.apply({"params": params}, x)),
        th(test_utils.to_torch(x)).detach().numpy(),
        atol=1e-6,
    )

  def test_block_diagonal(self):
    fl = jx_layers.BlockDiagonalLinear(
        width=W, num_blocks=HEADS, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    x = _x()
    params = fl.init(jax.random.PRNGKey(1), x)["params"]
    th = th_layers.BlockDiagonalLinear(W, HEADS)
    test_utils.flax_params_to_torch_module(params, th)
    np.testing.assert_allclose(
        np.asarray(fl.apply({"params": params}, x)),
        th(test_utils.to_torch(x)).detach().numpy(),
        atol=1e-5,
    )

  def test_rnn_scan_matches_jax(self):
    x = _x(2, 8)
    a = jax.nn.sigmoid(_x(2, 8, seed=1))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2, W))
    from cadence_gemma_tpu.ops import scan
    y_jax, h_jax = scan.lru_linear_scan(x, a, h0)
    y_th, h_th = th_layers.rnn_scan(
        test_utils.to_torch(x), test_utils.to_torch(a),
        test_utils.to_torch(h0),
    )
    np.testing.assert_allclose(np.asarray(y_jax), y_th.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_jax), h_th.numpy(), atol=1e-5)

  def test_rglru(self):
    fl = jx_layers.RGLRU(
        width=LRU, num_heads=HEADS, dtype=jnp.float32,
        param_dtype=jnp.float32, scan_type=common.ScanType.LINEAR_NATIVE,
    )
    x, pos = _x(1, 6, LRU), _pos()
    params = fl.init(jax.random.PRNGKey(1), x, pos)["params"]
    th = th_layers.RGLRU(LRU, HEADS)
    test_utils.flax_params_to_torch_module(params, th)
    y_jax, h_jax = fl.apply({"params": params}, x, pos)
    y_th, h_th = th(test_utils.to_torch(x), test_utils.to_torch(pos))
    np.testing.assert_allclose(np.asarray(y_jax), y_th.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_jax), h_th.detach().numpy(),
                               atol=1e-5)

  def test_conv1d_forward_and_decode(self):
    fl = jx_layers.Conv1D(width=W, temporal_width=4, dtype=jnp.float32,
                          param_dtype=jnp.float32)
    x, pos = _x(), _pos()
    params = fl.init(jax.random.PRNGKey(1), x, pos)["params"]
    th = th_layers.Conv1D(W, 4)
    test_utils.flax_params_to_torch_module(params, th)
    y_jax, c_jax = fl.apply({"params": params}, x, pos)
    y_th, c_th = th(test_utils.to_torch(x), test_utils.to_torch(pos))
    np.testing.assert_allclose(np.asarray(y_jax), y_th.detach().numpy(),
                               atol=1e-5)
    # one decode step
    xs, ps = x[:, -1:], pos[:, -1:] + 1
    y_jax2, _ = fl.apply({"params": params}, xs, ps, c_jax)
    y_th2, _ = th(test_utils.to_torch(xs), test_utils.to_torch(ps), c_th)
    np.testing.assert_allclose(np.asarray(y_jax2), y_th2.detach().numpy(),
                               atol=1e-5)

  def test_einsum(self):
    fl = jx_layers.Einsum(
        w_shape=(2, W, MLP), b_shape=(2, 1, 1, MLP), eqn="...td,cdD->c...tD",
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    x = _x()
    params = fl.init(jax.random.PRNGKey(1), x)["params"]
    th = th_layers.Einsum((2, W, MLP), (2, 1, 1, MLP), "...td,cdD->c...tD")
    test_utils.flax_params_to_torch_module(params, th)
    np.testing.assert_allclose(
        np.asarray(fl.apply({"params": params}, x)),
        th(test_utils.to_torch(x)).detach().numpy(),
        atol=1e-5,
    )


class TestModuleParity:

  def test_attention_block(self):
    fl = jx_modules.LocalAttentionBlock(
        width=W, num_heads=HEADS, window_size=WINDOW,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    th = th_modules.LocalAttentionBlock(W, HEADS, WINDOW)
    x, pos = _x(), _pos()
    params = fl.init(jax.random.PRNGKey(1), x, pos)["params"]
    jx_cache = jx_modules.LocalAttentionBlock.init_cache(
        1, WINDOW, W // HEADS, jnp.float32
    )
    th_cache = th_modules.LocalAttentionBlock.init_cache(
        1, WINDOW, W // HEADS, torch.float32
    )
    test_utils.compare_forward_and_decode(
        flax_module=fl, torch_module=th, flax_params=params,
        x=x, segment_pos=pos, flax_cache=jx_cache, torch_cache=th_cache,
        atol=1e-4,
    )

  def test_recurrent_block(self):
    fl = jx_modules.RecurrentBlock(
        width=W, num_heads=HEADS, lru_width=LRU,
        scan_type=common.ScanType.LINEAR_NATIVE,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    th = th_modules.RecurrentBlock(W, HEADS, LRU)
    x, pos = _x(), _pos()
    params = fl.init(jax.random.PRNGKey(1), x, pos)["params"]
    jx_cache = jx_modules.RecurrentBlock.init_cache(1, LRU, jnp.float32)
    th_cache = th_modules.RecurrentBlock.init_cache(1, LRU, torch.float32)
    test_utils.compare_forward_and_decode(
        flax_module=fl, torch_module=th, flax_params=params,
        x=x, segment_pos=pos, flax_cache=jx_cache, torch_cache=th_cache,
        atol=1e-4,
    )

  def test_mlp_block(self):
    fl = jx_modules.MLPBlock(width=W, expanded_width=MLP,
                             dtype=jnp.float32, param_dtype=jnp.float32)
    th = th_modules.MLPBlock(W, MLP)
    x = _x()
    params = fl.init(jax.random.PRNGKey(1), x)["params"]
    test_utils.flax_params_to_torch_module(params, th)
    np.testing.assert_allclose(
        np.asarray(fl.apply({"params": params}, x)),
        th(test_utils.to_torch(x)).detach().numpy(),
        atol=1e-5,
    )

  def test_vl_connector(self):
    fl = jx_modules.VisionLanguageConnector(
        width=W, expanded_width=MLP, vision_width=12,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    th = th_modules.VisionLanguageConnector(W, MLP, vision_width=12)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 12))
    params = fl.init(jax.random.PRNGKey(1), img)["params"]
    test_utils.flax_params_to_torch_module(params, th)
    np.testing.assert_allclose(
        np.asarray(fl.apply({"params": params}, img)),
        th(test_utils.to_torch(img)).detach().numpy(),
        atol=1e-5,
    )

  def test_embedder(self):
    fl = jx_modules.Embedder(
        vocab_size=32, embed_dim=W, scale_by_sqrt_dim=True,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    th = th_modules.Embedder(32, W, scale_by_sqrt_dim=True)
    tokens = jnp.array([[1, 5, 7]])
    params = fl.init(jax.random.PRNGKey(1), tokens, method=fl.encode)[
        "params"]
    test_utils.flax_params_to_torch_module(params, th)
    e_jax = fl.apply({"params": params}, tokens, method=fl.encode)
    e_th = th.encode(test_utils.to_torch(tokens).long())
    np.testing.assert_allclose(np.asarray(e_jax), e_th.detach().numpy(),
                               atol=1e-6)
    d_jax = fl.apply({"params": params}, e_jax, method=fl.decode)
    d_th = th.decode(e_th)
    np.testing.assert_allclose(np.asarray(d_jax), d_th.detach().numpy(),
                               atol=1e-5)


def _config():
  return common.GriffinConfig(
      vocab_size=32, width=W, mlp_expanded_width=MLP, num_heads=HEADS,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=WINDOW,
      logits_soft_cap=30.0, lru_width=LRU,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=3, vision_width=12, vl_expanded_width=20,
  )


class TestFullModelParity:

  @pytest.fixture(scope="class")
  def models(self):
    config = _config()
    fl = jx_griffin.Griffin(config, dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            gradient_checkpointing=False)
    th = th_griffin.Griffin(config)
    tokens = jnp.array([[1, 4, 9, 2, 7]])
    pos = _pos(1, 5)
    params = fl.init(jax.random.PRNGKey(0), tokens, pos)["params"]
    test_utils.flax_params_to_torch_module(params, th)
    return config, fl, th, params

  def test_forward_parity(self, models):
    _, fl, th, params = models
    tokens = jnp.array([[3, 8, 1, 6, 2, 9]])
    pos = _pos(1, 6)
    logits_jax, _ = fl.apply({"params": params}, tokens, pos)
    with torch.no_grad():
      logits_th, _ = th(
          test_utils.to_torch(tokens).long(), test_utils.to_torch(pos)
      )
    np.testing.assert_allclose(
        np.asarray(logits_jax), logits_th.numpy(), atol=2e-4
    )

  def test_multimodal_forward_parity(self, models):
    _, fl, th, params = models
    tokens = jnp.array([[3, 8, 1, 6]])
    pos = _pos(1, 4)
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 12))
    logits_jax, _ = fl.apply({"params": params}, tokens, pos, image=img)
    with torch.no_grad():
      logits_th, _ = th(
          test_utils.to_torch(tokens).long(), test_utils.to_torch(pos),
          image=test_utils.to_torch(img),
      )
    np.testing.assert_allclose(
        np.asarray(logits_jax), logits_th.numpy(), atol=2e-4
    )

  def test_sampler_parity(self, models):
    """Both samplers produce the same greedy tokens."""
    _, fl, th, params = models
    vocab = SimpleVocab([f"w{i}" for i in range(28)])
    s_jax = jx_sampler.Sampler(fl, vocab, params,
                               bucket_prompt_lengths=False)
    s_th = th_sampler.Sampler(th, vocab)
    prompts = ["w1 w2 w3", "w5 w6"]
    out_jax = s_jax(prompts, total_generation_steps=6)
    out_th = s_th(prompts, total_generation_steps=6)
    for a, b in zip(out_jax.tokens, out_th.tokens):
      np.testing.assert_array_equal(np.asarray(a), b.numpy())

  def test_gradient_parity(self, models):
    """Loss gradients agree across frameworks (sqrt-VJP, remat paths)."""
    config, fl, th, params = models
    tokens = jnp.array([[3, 8, 1, 6, 2]])
    pos = _pos(1, 5)

    def loss_jax(p):
      logits, _ = fl.apply({"params": p}, tokens, pos, return_cache=False)
      return jnp.mean(jax.nn.log_softmax(logits)[..., 0])

    g_jax = jax.grad(loss_jax)(params)

    t_tokens = test_utils.to_torch(tokens).long()
    t_pos = test_utils.to_torch(pos)
    logits_th, _ = th(t_tokens, t_pos, return_cache=False)
    loss_th = torch.log_softmax(logits_th, dim=-1)[..., 0].mean()
    loss_th.backward()

    g_embed_jax = np.asarray(g_jax["embedder"]["input_embedding"])
    g_embed_th = th.embedder.input_embedding.grad.numpy()
    np.testing.assert_allclose(g_embed_jax, g_embed_th, atol=1e-4)


class TestTorchModalPath:
  """Torch Griffin with a MODEL-OWNED vision encoder (reference parity).

  The reference's torch model owns its encoders and takes an image path
  (torch/griffin.py:60-62,179-191); here Griffin(vision_encoder=...)
  accepts raw pixels or img_path through the sampler. pixels / img_path
  must reproduce the pre-fused-features path exactly (the encoder runs
  once, before the prefill split).
  """

  @pytest.fixture(scope="class")
  def modal(self):
    import dataclasses

    from cadence_gemma_tpu.models import vit as jax_vit
    from cadence_gemma_tpu.torch import vit as torch_vit

    tiny_dino = jax_vit.ViTConfig(
        embed_dim=8, depth=2, num_heads=2, mlp_hidden_dim=16,
        patch_size=4, image_size=8, num_prefix_tokens=2,
        use_layer_scale=True, output_layer=1,
    )
    tiny_siglip = dataclasses.replace(
        tiny_dino, embed_dim=4, mlp_hidden_dim=8, num_prefix_tokens=0,
        use_layer_scale=False, gelu_approximate=True,
    )
    enc = torch_vit.DinoSigLIPEncoder(tiny_dino, tiny_siglip)
    torch_vit.random_init_(enc.dino, seed=11)
    torch_vit.random_init_(enc.siglip, seed=12)
    th = th_griffin.Griffin(_config(), vision_encoder=enc.eval())
    vocab = SimpleVocab([f"w{i}" for i in range(28)])
    return th, th_sampler.Sampler(th, vocab)

  def test_pixels_match_prefused_features(self, modal):
    th, sampler = modal
    gen = torch.Generator().manual_seed(4)
    pixels = torch.rand(1, 3, 8, 8, generator=gen)
    with torch.no_grad():
      feats = th.encode_image(pixels).to(sampler.dtype)
    prompts = ["w1 w2 w3", "w5 w6"]
    out_px = sampler(prompts, total_generation_steps=5, pixels=pixels)
    out_ft = sampler(
        prompts, total_generation_steps=5,
        img_embed=feats.expand(len(prompts), -1, -1),
    )
    for a, b in zip(out_px.tokens, out_ft.tokens):
      np.testing.assert_array_equal(a.numpy(), b.numpy())

  def test_img_path_matches_pixels(self, modal, tmp_path):
    from PIL import Image

    _, sampler = modal
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
    path = tmp_path / "img.png"  # png: lossless, so pixels match exactly
    Image.fromarray(arr).save(path)
    pixels = torch.from_numpy(
        np.transpose(arr, (2, 0, 1))[None].astype(np.float32) / 255.0
    )
    out_path = sampler(["w1 w2"], total_generation_steps=5,
                       img_path=str(path))
    out_px = sampler(["w1 w2"], total_generation_steps=5, pixels=pixels)
    np.testing.assert_array_equal(
        out_path.tokens[0].numpy(), out_px.tokens[0].numpy()
    )

  def test_multiple_image_args_raise(self, modal):
    _, sampler = modal
    with pytest.raises(ValueError, match="at most one"):
      sampler(["w1"], total_generation_steps=1,
              pixels=torch.rand(1, 3, 8, 8), img_path="x.png")

  def test_pixels_without_encoder_raise(self):
    th = th_griffin.Griffin(_config())
    vocab = SimpleVocab([f"w{i}" for i in range(28)])
    sampler = th_sampler.Sampler(th, vocab)
    with pytest.raises(ValueError, match="vision_encoder"):
      sampler(["w1"], total_generation_steps=1,
              pixels=torch.rand(1, 3, 8, 8))
