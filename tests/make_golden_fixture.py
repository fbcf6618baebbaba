"""Regenerates the golden decode fixture (tests/fixtures/golden_tiny.npz).

A deterministic tiny Griffin (fixed init seed) plus the greedy tokens it
produces for fixed prompts. The fixture pins *weights* (not just the seed)
so end-to-end decode regressions are visible even across jax/flax versions
whose initializer RNG streams differ.

Run from the repo root after any intentional change to model semantics:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/make_golden_fixture.py
and commit the updated .npz together with the change that motivated it.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cadence_gemma_tpu import common  # noqa: E402
from cadence_gemma_tpu.inference import modal_sampler as modal_lib  # noqa: E402
from cadence_gemma_tpu.models import griffin  # noqa: E402
from cadence_gemma_tpu.models import vit as vit_lib  # noqa: E402
from cadence_gemma_tpu.tokenizers import SimpleVocab  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_tiny.npz")

WORDS = ["a", "photo", "of", "dog", "car", "cart", "the", "red"]
PROMPTS = ["a photo of", "the red car"]
MM_PROMPT = "a photo of"
STEPS = 8


def build():
  vocab = SimpleVocab(WORDS)
  tower = vit_lib.ViTConfig(
      embed_dim=8, depth=2, num_heads=2, mlp_hidden_dim=16,
      patch_size=4, image_size=16, output_layer=1,
  )
  enc = vit_lib.DinoSigLIPEncoder(
      dino_config=tower, siglip_config=tower,
      dtype=jnp.float32, param_dtype=jnp.float32,
  )
  config = common.GriffinConfig(
      vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
          common.TemporalBlockType.RECURRENT,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
      logits_soft_cap=30.0, lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=tower.num_patches, vision_width=2 * tower.embed_dim,
      vl_expanded_width=24,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  return vocab, tower, enc, config, model


def main():
  vocab, _, enc, _, model = build()
  params = model.init(
      jax.random.PRNGKey(42), jnp.zeros((1, 4), jnp.int32),
      jnp.arange(4)[None],
  )["params"]
  vparams = enc.init(
      jax.random.PRNGKey(43), jnp.zeros((1, 3, 16, 16))
  )["params"]

  s = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False,
  )
  text_out = s(PROMPTS, total_generation_steps=STEPS,
               end_sampling_at_eos_token=False, return_logits=True)
  photo = os.path.join(os.path.dirname(__file__), "fixtures", "dog.jpg")
  mm_out = s([MM_PROMPT], total_generation_steps=STEPS,
             end_sampling_at_eos_token=False, img_path=photo,
             return_logits=True)

  flat = {}
  for tree, prefix in ((params, "p"), (vparams, "v")):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
      flat[prefix + jax.tree_util.keystr(path)] = np.asarray(leaf)
  flat["expected_text_tokens"] = np.stack(
      [np.asarray(t) for t in text_out.tokens]
  )
  flat["expected_mm_tokens"] = np.asarray(mm_out.tokens[0])
  # Logits pin the numerics tightly: greedy tokens alone can be degenerate
  # (a random tiny model argmax-collapses to one token) and would miss
  # position/cache/splice regressions that shift logits but not the argmax.
  flat["expected_text_logits"] = np.stack(
      [np.asarray(l) for l in text_out.logits]
  )
  flat["expected_mm_logits"] = np.asarray(mm_out.logits[0])
  np.savez_compressed(FIXTURE, **flat)
  print("text tokens:", [t.tolist() for t in text_out.tokens])
  print("mm tokens:", mm_out.tokens[0].tolist())
  print("wrote", FIXTURE, os.path.getsize(FIXTURE), "bytes")


if __name__ == "__main__":
  main()
