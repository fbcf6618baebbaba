"""GSM8K evaluation harness (script counterpart of the reference colab).

The reference ships GSM8K evaluation as a notebook
(``/root/reference/colabs/gsm8k_eval.ipynb``) reporting 19.33% for the 2B
model at 1024-step sampling on TPUv2 — usable as an end-to-end quality
regression once real checkpoints are available.

Runs fully offline from a local JSONL file (``{"question": ..., "answer":
...}`` per line, the standard GSM8K format — the answer's final line is
``#### <number>``).

Example:
  python benchmarks/gsm8k_eval.py \
      --checkpoint_path=/ckpts/2b-it --tokenizer_path=/ckpts/tok.model \
      --dataset=gsm8k_test.jsonl --limit 200
"""

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from absl import app
from absl import flags

import cadence_gemma_tpu as cg

_CHECKPOINT = flags.DEFINE_string("checkpoint_path", None, "LM checkpoint.")
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece.")
_DATASET = flags.DEFINE_string("dataset", None, "GSM8K JSONL file.")
_STEPS = flags.DEFINE_integer("total_generation_steps", 1024, "Decode steps.")
_LIMIT = flags.DEFINE_integer("limit", None, "Max problems to evaluate.")
_BATCH = flags.DEFINE_integer("batch_size", 4, "Prompts per batch.")
_SPECULATIVE = flags.DEFINE_boolean(
    "speculative", False,
    "Decode with prompt-lookup speculation (exact greedy outputs; chain-"
    "of-thought answers quote the problem heavily, so acceptance — and "
    "throughput — is typically high on GSM8K).",
)
_PRESET = flags.DEFINE_enum_class(
    "preset", cg.Preset.RECURRENT_GEMMA_2B_V1, cg.Preset, "Preset.")

# 8-shot chain-of-thought preamble (the standard GSM8K eval prompt shape the
# reference notebook uses).
PREAMBLE = (
    "You are an expert at solving grade school math problems. Think step "
    "by step and finish your answer with 'The answer is X' where X is the "
    "final number.\n\n"
)

_NUMBER = re.compile(r"-?[\d,]*\.?\d+")


def extract_answer(text: str) -> str | None:
  """Last number in the completion (standard GSM8K scoring)."""
  matches = _NUMBER.findall(text.replace(",", ""))
  return matches[-1] if matches else None


def gold_answer(answer_field: str) -> str:
  tail = answer_field.split("####")[-1].strip().replace(",", "")
  m = _NUMBER.search(tail)
  return m.group() if m else tail


def evaluate(sampler, problems, steps, batch_size):
  correct = 0
  for lo in range(0, len(problems), batch_size):
    chunk = problems[lo : lo + batch_size]
    prompts = [PREAMBLE + p["question"] for p in chunk]
    out = sampler(prompts, total_generation_steps=steps)
    for p, text in zip(chunk, out.text):
      pred = extract_answer(text)
      gold = gold_answer(p["answer"])
      correct += pred == gold
    done = min(lo + batch_size, len(problems))
    print(f"{done}/{len(problems)}: accuracy {correct / done:.4f}")
  return correct / len(problems)


def main(argv):
  del argv
  with open(_DATASET.value) as f:
    problems = [json.loads(line) for line in f if line.strip()]
  if _LIMIT.value:
    problems = problems[: _LIMIT.value]

  params = cg.load_parameters(_CHECKPOINT.value, "single_device")
  params = params.get("params", params)
  config = cg.GriffinConfig.from_flax_params_or_variables(
      params, preset=_PRESET.value
  )
  model = cg.Griffin(config)
  vocab = cg.load_sentencepiece(_TOKENIZER.value)
  sampler = cg.Sampler(model, vocab, params, is_it_model=True)
  if _SPECULATIVE.value:
    sampler = cg.SpeculativeSampler(sampler)

  accuracy = evaluate(sampler, problems, _STEPS.value, _BATCH.value)
  print(json.dumps({"metric": "gsm8k_accuracy", "value": accuracy,
                    "n": len(problems)}))


if __name__ == "__main__":
  flags.mark_flags_as_required(["checkpoint_path", "tokenizer_path",
                                "dataset"])
  app.run(main)
