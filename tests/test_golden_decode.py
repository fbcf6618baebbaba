"""Golden end-to-end decode regression test.

Pins exact greedy tokens AND per-step logits of a checked-in tiny model
(``tests/fixtures/golden_tiny.npz``, weights included — not just a seed)
for fixed text prompts and one real-photo multimodal prompt. Any change to
embedding, positions, cache, splice, or sampling semantics moves these.

Substitute for the reference's real-checkpoint eval (GSM8K 19.33%,
``/root/reference/colabs/gsm8k_eval.ipynb``), which needs weights this
environment cannot obtain; regenerate deliberately with
``tests/make_golden_fixture.py`` when semantics change on purpose.
"""

import os
import re

import jax.numpy as jnp
import numpy as np
import pytest

from tests import make_golden_fixture as gold

FIXTURE = gold.FIXTURE


def _unflatten(npz, prefix):
  tree = {}
  for key in npz.files:
    if not key.startswith(prefix + "["):
      continue
    parts = re.findall(r"\['([^']+)'\]", key[len(prefix):])
    node = tree
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(npz[key])
  return tree


@pytest.fixture(scope="module")
def golden():
  assert os.path.exists(FIXTURE), (
      "regenerate with tests/make_golden_fixture.py"
  )
  npz = np.load(FIXTURE)
  vocab, _, enc, _, model = gold.build()
  params = _unflatten(npz, "p")
  vparams = _unflatten(npz, "v")
  from cadence_gemma_tpu.inference import modal_sampler as modal_lib

  s = modal_lib.ModalSampler(
      model, vocab, params, vision_encoder=enc, vision_params=vparams,
      bucket_prompt_lengths=False,
  )
  return npz, s


def test_text_decode_matches_golden(golden):
  npz, s = golden
  out = s(gold.PROMPTS, total_generation_steps=gold.STEPS,
          end_sampling_at_eos_token=False, return_logits=True)
  got = np.stack([np.asarray(t) for t in out.tokens])
  np.testing.assert_array_equal(got, npz["expected_text_tokens"])
  np.testing.assert_allclose(
      np.stack([np.asarray(l) for l in out.logits]),
      npz["expected_text_logits"], atol=2e-4,
  )


def test_multimodal_decode_matches_golden(golden):
  npz, s = golden
  photo = os.path.join(os.path.dirname(FIXTURE), "dog.jpg")
  out = s([gold.MM_PROMPT], total_generation_steps=gold.STEPS,
          end_sampling_at_eos_token=False, img_path=photo,
          return_logits=True)
  np.testing.assert_array_equal(
      np.asarray(out.tokens[0]), npz["expected_mm_tokens"]
  )
  np.testing.assert_allclose(
      np.asarray(out.logits[0]), npz["expected_mm_logits"], atol=2e-4
  )
