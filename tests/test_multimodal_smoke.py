"""End-to-end multimodal smoke tests on real photo fixtures.

The reference ships real images as sampling fixtures
(``/root/reference/recurrentgemma/vit/img_tests/``); ``tests/fixtures/``
holds downscaled re-encodings of three of them. These tests exercise the
full path → decode → preprocess → ViT encode → splice → sample pipeline on
actual JPEG content (synthetic-noise tests can miss decode/layout bugs that
only real photos hit, e.g. chroma subsampling).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.inference import modal_sampler as modal_lib
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.models import vit as vit_lib
from cadence_gemma_tpu.tokenizers import SimpleVocab
from cadence_gemma_tpu.utils import image_cpp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PHOTOS = [os.path.join(FIXTURES, n) for n in ("dog.jpg", "car.jpg", "cart.jpg")]


@pytest.fixture(scope="module")
def tiny_stack():
  vocab = SimpleVocab(["a", "photo", "of", "dog", "car", "cart"])
  tower = vit_lib.ViTConfig(
      embed_dim=8, depth=3, num_heads=2, mlp_hidden_dim=16,
      patch_size=4, image_size=16, output_layer=1,
  )
  enc = vit_lib.DinoSigLIPEncoder(
      dino_config=tower, siglip_config=tower,
      dtype=jnp.float32, param_dtype=jnp.float32,
  )
  vision_tokens = tower.num_patches
  config = common.GriffinConfig(
      vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
      logits_soft_cap=30.0, lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=vision_tokens, vision_width=2 * tower.embed_dim,
      vl_expanded_width=24,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  tokens = jnp.zeros((1, 4), jnp.int32)
  params = model.init(
      jax.random.PRNGKey(0), tokens, jnp.arange(4)[None]
  )["params"]
  pixels = jnp.zeros((1, 3, 16, 16))
  vparams = enc.init(jax.random.PRNGKey(1), pixels)["params"]
  return model, vocab, params, enc, vparams


def test_fixture_photos_decode_to_valid_pixels():
  for path in PHOTOS:
    pixels = vit_lib.load_image(path)
    assert pixels.shape[0] == 1 and pixels.shape[1] == 3
    assert pixels.min() >= 0.0 and pixels.max() <= 1.0
    # Real photos are not constant images.
    assert pixels.std() > 0.05


def test_native_loader_matches_pil_on_real_photos():
  if not image_cpp.available():
    pytest.skip("native library not built")
  for path in PHOTOS:
    native = image_cpp.load_jpeg(path, 384)
    from PIL import Image

    with open(path, "rb") as f:
      img = Image.open(f).convert("RGB").resize((384, 384), Image.BICUBIC)
    pil = np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))
    np.testing.assert_array_equal(native, pil)


def test_img_path_to_tokens_end_to_end(tiny_stack):
  """path → decode → preprocess → towers → splice → greedy decode."""
  model, vocab, params, enc, vparams = tiny_stack
  s = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False,
  )
  out = s(["a photo of"], total_generation_steps=4, img_path=PHOTOS[0])
  assert out.tokens[0].shape == (4,)
  assert all(0 <= t < vocab.GetPieceSize() for t in out.tokens[0].tolist())


def test_different_photos_give_different_logits(tiny_stack):
  """The image content must actually reach the language model."""
  model, vocab, params, enc, vparams = tiny_stack
  s = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False,
  )
  outs = [
      s(["a photo of"], total_generation_steps=1, return_logits=True,
        img_path=p).logits[0]
      for p in PHOTOS[:2]
  ]
  assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-5)


def test_pixels_path_matches_img_path(tiny_stack):
  """Fused pixel prefill == explicit path decode + same pixels."""
  model, vocab, params, enc, vparams = tiny_stack
  s = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False,
  )
  pixels = enc.preprocess_path(PHOTOS[1])
  a = s(["a photo of"], total_generation_steps=3, img_path=PHOTOS[1])
  b = s(["a photo of"], total_generation_steps=3, pixels=pixels)
  np.testing.assert_array_equal(np.asarray(a.tokens[0]),
                                np.asarray(b.tokens[0]))


def test_tp_modal_sampler_matches_single_device(tiny_stack):
  """Fused pixels→tokens over a TP-2 mesh equals the single-device run.

  LM params take the Megatron layouts; vision towers replicate onto the
  same mesh so the fused prefill stays one program (modal_sampler.py)."""
  from cadence_gemma_tpu.parallel import sharding as sh

  model, vocab, params, enc, vparams = tiny_stack
  mesh = sh.make_mesh((1, 2), ("data", "model"), jax.devices()[:2])
  s_tp = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False, mesh=mesh,
  )
  s_one = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False,
  )
  a = s_tp(["a photo of"], total_generation_steps=4, img_path=PHOTOS[0])
  b = s_one(["a photo of"], total_generation_steps=4, img_path=PHOTOS[0])
  np.testing.assert_array_equal(np.asarray(a.tokens[0]),
                                np.asarray(b.tokens[0]))
