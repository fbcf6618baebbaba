"""Text sampling CLI (counterpart of reference examples/sampling_jax.py).

Example:
  python examples/sampling.py \
      --checkpoint_path=/ckpts/2b-it --tokenizer_path=/ckpts/tokenizer.model \
      --prompt "Tell me about TPUs." --total_generation_steps 256
"""

from absl import app
from absl import flags

import cadence_gemma_tpu as cg

_CHECKPOINT = flags.DEFINE_string("checkpoint_path", None, "Orbax checkpoint.")
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece model.")
_PROMPT = flags.DEFINE_multi_string(
    "prompt", ["Tell me a fact about the Griffin architecture."],
    "Prompt(s) to sample from.",
)
_STEPS = flags.DEFINE_integer("total_generation_steps", 256, "Decode steps.")
_IT = flags.DEFINE_boolean("is_it_model", True, "Apply the chat template.")
_SHARDING = flags.DEFINE_string(
    "sharding", "single_device", "single_device | replicated."
)
_PRESET = flags.DEFINE_enum_class(
    "preset", cg.Preset.RECURRENT_GEMMA_2B_V1, cg.Preset,
    "Preset supplying hypers not inferable from the checkpoint.",
)


def main(argv):
  del argv
  params = cg.load_parameters(_CHECKPOINT.value, _SHARDING.value)
  config = cg.GriffinConfig.from_flax_params_or_variables(
      params, preset=_PRESET.value
  )
  model = cg.Griffin(config)
  vocab = cg.load_sentencepiece(_TOKENIZER.value)
  sampler = cg.Sampler(
      model, vocab, params.get("params", params), is_it_model=_IT.value
  )
  out = sampler(_PROMPT.value, total_generation_steps=_STEPS.value)
  for prompt, text in zip(_PROMPT.value, out.text):
    print(f">>> {prompt}\n{text}\n")


if __name__ == "__main__":
  flags.mark_flags_as_required(["checkpoint_path", "tokenizer_path"])
  app.run(main)
