"""Minimal no-checkpoint demo: random 2B-shaped model, greedy sampling.

Counterpart of the reference's examples/simple_run_jax.py — runs without
any downloaded weights (random init, toy vocabulary) so the full pipeline
can be smoke-tested on any backend.

  python examples/simple_run.py --width 256 --layers 6 --steps 16
"""

import jax
import jax.numpy as jnp
from absl import app
from absl import flags

import cadence_gemma_tpu as cg
from cadence_gemma_tpu.utils import profiling

_WIDTH = flags.DEFINE_integer("width", 256, "Model width.")
_LAYERS = flags.DEFINE_integer("layers", 6, "Residual blocks.")
_STEPS = flags.DEFINE_integer("steps", 16, "Decode steps.")
_PROMPT = flags.DEFINE_string("prompt", "the quick brown fox", "Prompt.")


def main(argv):
  del argv
  words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
  vocab = cg.SimpleVocab(words)

  pattern = [cg.TemporalBlockType.RECURRENT, cg.TemporalBlockType.RECURRENT,
             cg.TemporalBlockType.ATTENTION]
  config = cg.GriffinConfig(
      vocab_size=vocab.GetPieceSize(),
      width=_WIDTH.value,
      mlp_expanded_width=3 * _WIDTH.value,
      num_heads=max(2, _WIDTH.value // 128),
      block_types=tuple(
          pattern[i % 3] for i in range(_LAYERS.value)
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=512,
      logits_soft_cap=30.0,
      lru_width=_WIDTH.value,
  )
  model = cg.Griffin(config)
  tokens = jnp.zeros((1, 8), jnp.int32)
  pos = jnp.arange(8)[None]
  params = model.init(jax.random.PRNGKey(0), tokens, pos)["params"]

  sampler = cg.Sampler(model, vocab, params)
  timer = profiling.PhaseTimer()
  out = timer.time_fn(
      "sample", sampler, [_PROMPT.value],
      total_generation_steps=_STEPS.value,
  )
  print(f"prompt: {_PROMPT.value!r}")
  print(f"output: {out.text[0]!r}")
  print(timer.report())


if __name__ == "__main__":
  app.run(main)
