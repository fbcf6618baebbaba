"""Multimodal (image + text) sampling CLI.

Counterpart of reference examples/cadence_jax.py, but the vision pathway is
fully on-device JAX: image decode is the only host step.

Example:
  python examples/cadence.py \
      --checkpoint_path=/ckpts/cadence-2b --tokenizer_path=/ckpts/tok.model \
      --vision_checkpoint=/ckpts/dino_siglip \
      --img_path photo.jpg --prompt "What is in this image?"
"""

from absl import app
from absl import flags

import cadence_gemma_tpu as cg
from cadence_gemma_tpu.models import vit as vit_lib

_CHECKPOINT = flags.DEFINE_string("checkpoint_path", None, "LM checkpoint.")
_VISION_CKPT = flags.DEFINE_string(
    "vision_checkpoint", None,
    "Orbax checkpoint of DinoSigLIPEncoder params (see "
    "checkpoint/timm_import.py for converting timm weights).",
)
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece model.")
_PROMPT = flags.DEFINE_string("prompt", "Describe this image.", "Prompt.")
_IMG = flags.DEFINE_string("img_path", "", "Image file (empty = text only).")
_STEPS = flags.DEFINE_integer("total_generation_steps", 256, "Decode steps.")
_IT = flags.DEFINE_boolean("is_it_model", True, "Apply the chat template.")
_PRESET = flags.DEFINE_enum_class(
    "preset", cg.Preset.RECURRENT_GEMMA_2B_V1, cg.Preset,
    "Preset supplying hypers not inferable from the checkpoint.",
)


def main(argv):
  del argv
  params = cg.load_parameters(_CHECKPOINT.value, "single_device")
  config = cg.GriffinConfig.from_flax_params_or_variables(
      params, preset=_PRESET.value
  )
  model = cg.Griffin(config)
  vocab = cg.load_sentencepiece(_TOKENIZER.value)

  encoder = vision_params = None
  if _IMG.value:
    encoder = vit_lib.DinoSigLIPEncoder()
    vision_params = cg.load_parameters(_VISION_CKPT.value, "single_device")
    vision_params = vision_params.get("params", vision_params)

  sampler = cg.ModalSampler(
      model,
      vocab,
      params.get("params", params),
      is_it_model=_IT.value,
      vision_encoder=encoder,
      vision_params=vision_params,
  )
  out = sampler(
      [_PROMPT.value],
      total_generation_steps=_STEPS.value,
      img_path=_IMG.value,
  )
  print(out.text[0])


if __name__ == "__main__":
  flags.mark_flags_as_required(["checkpoint_path", "tokenizer_path"])
  app.run(main)
