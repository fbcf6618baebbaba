"""PyTorch-path sampling CLI (counterpart of reference
examples/sampling_pytorch.py / cadence_sampler.py).

Loads either a torch state dict (torch.load) or an orbax/flax checkpoint
(converted on the fly) and samples with the eager torch twin — for users
without a TPU.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from absl import app
from absl import flags

_CHECKPOINT = flags.DEFINE_string(
    "checkpoint_path", None,
    "torch .pt state dict, or an orbax checkpoint directory.",
)
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece.")
_PROMPT = flags.DEFINE_multi_string("prompt", ["Tell me a fact."], "Prompts.")
_STEPS = flags.DEFINE_integer("total_generation_steps", 128, "Decode steps.")
_IT = flags.DEFINE_boolean("is_it_model", True, "Apply the chat template.")


def main(argv):
  del argv
  import torch

  import cadence_gemma_tpu as cg
  import cadence_gemma_tpu.torch as cgt
  from cadence_gemma_tpu.torch import test_utils

  path = _CHECKPOINT.value
  if path.endswith((".pt", ".pth", ".bin")):
    state = torch.load(path, map_location="cpu", weights_only=True)
    config = cg.GriffinConfig.from_torch_params(
        {k.removeprefix("params."): v for k, v in state.items()},
        preset=cg.Preset.RECURRENT_GEMMA_2B_V1,
    )
    model = cgt.Griffin(config)
    model.load_state_dict(
        {k.removeprefix("params."): v for k, v in state.items()},
        strict=False,
    )
  else:
    params = cg.load_parameters(path, "single_device")
    params = params.get("params", params)
    config = cg.GriffinConfig.from_flax_params_or_variables(
        params, preset=cg.Preset.RECURRENT_GEMMA_2B_V1
    )
    model = cgt.Griffin(config)
    test_utils.flax_params_to_torch_module(params, model)

  vocab = cg.load_sentencepiece(_TOKENIZER.value)
  sampler = cgt.Sampler(model, vocab, is_it_model=_IT.value)
  out = sampler(_PROMPT.value, total_generation_steps=_STEPS.value)
  for prompt, text in zip(_PROMPT.value, out.text):
    print(f">>> {prompt}\n{text}\n")


if __name__ == "__main__":
  flags.mark_flags_as_required(["checkpoint_path", "tokenizer_path"])
  app.run(main)
