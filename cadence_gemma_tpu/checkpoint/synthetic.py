"""Synthetic checkpoints with trained-like per-tensor statistics.

The quantization accuracy story must not rest on uniform 0.02-scale
random leaves (they understate logit magnitudes and overstate *relative*
error — BENCH_r03 note). Real trained checkpoints are environment-blocked
here, so this module produces the closest no-download stand-in: the
model's OWN initializers — which encode the per-tensor structure a
trained Gemma checkpoint has (ring-init RG-LRU ``a_param``
(reference ``recurrentgemma/jax/layers.py`` rnn_param init), fan-in
variance-scaled projections, ``w_init_variance_scale``-downscaled output
projections) — plus the two places training moves weights far from init:

  * RMSNorm ``scale`` leaves are zero at init (the (scale+1) gain starts
    at identity); trained norms deviate per-channel. Drawn N(0, 0.35).
  * The embedder table is also the tied LM head; with
    ``embeddings_scale_by_sqrt_dim`` the logits of a trained model land
    at O(1-10). Drawn N(0, 0.01 * sqrt(width))-ish via a fixed 0.3
    stddev on top of the variance-scaled init so first-token logits on
    the 2B land in the trained-model range (|logits| ~ 5-30 with the
    30.0 soft cap active) rather than the ~0.1 the 0.02-random tree
    produces.

The point is not to match any particular checkpoint; it is that
per-channel int8 scales, activation ranges, and argmax margins are
exercised at realistic magnitudes, so the measured greedy-token
agreement and logit errors transfer. Validated against the real thing by
``tools/validate_real_weights.py`` when weights are available.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def realistic_params(
    model: Any,
    rng: jax.Array,
    *,
    example_tokens: jax.Array | None = None,
    norm_scale_std: float = 0.35,
    embed_extra_std: float = 0.3,
) -> Any:
  """Initializes ``model`` and perturbs it toward trained-like statistics.

  Args:
    model: A Griffin (or compatible flax) module.
    rng: PRNG key for init and perturbations.
    example_tokens: [b, t] int tokens for shape inference (default
      ``[1, 8]`` ones).
    norm_scale_std: Stddev of the N(0, std) draw for RMSNorm ``scale``
      leaves (the (scale+1) gain's deviation from identity).
    embed_extra_std: Extra stddev added to the embedder table on top of
      its initializer draw.

  Returns:
    The ``params`` sub-tree, dtypes exactly as the model declares them.
  """
  if example_tokens is None:
    example_tokens = jnp.ones((1, 8), jnp.int32)
  positions = jnp.tile(
      jnp.arange(example_tokens.shape[1])[None],
      (example_tokens.shape[0], 1),
  )
  init_rng, perturb_rng = jax.random.split(rng)

  @jax.jit
  def build():
    params = model.init(init_rng, example_tokens, positions)["params"]

    def perturb(path, leaf):
      names = tuple(
          p.key for p in path if hasattr(p, "key")
      )
      name = names[-1] if names else ""
      # Stable per-leaf key (Python's str hash is process-randomized).
      import zlib

      key = jax.random.fold_in(
          perturb_rng, zlib.crc32("/".join(names).encode()) % (2**31)
      )
      if name == "scale":  # RMSNorm gains: trained deviation from 1.
        return (
            norm_scale_std
            * jax.random.normal(key, leaf.shape, jnp.float32)
        ).astype(leaf.dtype)
      if name == "input_embedding":
        return leaf + (
            embed_extra_std
            * jax.random.normal(key, leaf.shape, jnp.float32)
        ).astype(leaf.dtype)
      return leaf

    return jax.tree_util.tree_map_with_path(perturb, params)

  return build()


def greedy_token_agreement(
    tokens_a, tokens_b
) -> dict[str, float]:
  """Agreement metrics between two greedy token streams.

  Returns ``match_fraction`` (per-position equality over the full
  buffer) and ``prefix_match`` (fraction of the stream before the first
  divergence — the metric that matters for exact serving: after one
  divergent token the streams are different generations, so positional
  equality beyond it is noise).
  """
  import numpy as np

  a = np.asarray(tokens_a).reshape(-1)
  b = np.asarray(tokens_b).reshape(-1)
  n = min(a.size, b.size)
  a, b = a[:n], b[:n]
  eq = a == b
  match_fraction = float(eq.mean()) if n else 1.0
  first_div = int(np.argmax(~eq)) if not eq.all() else n
  return {
      "match_fraction": round(match_fraction, 4),
      "prefix_match": round(first_div / n, 4) if n else 1.0,
      "first_divergence": first_div if first_div < n else -1,
      "length": n,
  }
