"""AOT serving export: serialized StableHLO serving programs (jax.export).

The reference has no deployment artifact — serving means importing the
Python library and re-tracing/compiling the sampler in every process
(reference ``jax/sampler.py:442,453``). On TPU the natural artifact is the
*program*: this module exports the two serving computations (single-pass
prefill and one decode step) as versioned, serialized StableHLO via
``jax.export``, so a serving host can run the model with

  * **zero model code** — only ``jax`` and the artifact directory;
  * **zero retracing** — trace/lowering happened at export time; the host
    pays XLA backend compilation once per process, nothing else;
  * **pinned semantics** — the artifact is replay-stable across framework
    refactors (StableHLO carries jax.export's compatibility guarantees),
    so a model qualified at export time serves those exact numerics.

Weights stay *outside* the artifact: both programs take the parameter tree
as an ordinary argument (an artifact is a few MB of IR, not a copy of the
checkpoint), and an optional mesh attaches TP shardings from
``parallel/partitioning.py`` to the exported calling convention.

Typical flow::

  exp = export_serving(model, params, batch_size=8, prompt_len=128)
  save_serving_export(exp, "/artifacts/2b-it")          # offline
  srv = load_serving_export("/artifacts/2b-it")          # serving host
  logits, cache = srv.prefill(params, tokens, positions)
  logits, cache = srv.decode_step(params, cache, tok, pos)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Callable

import jax
from jax import export as jax_export
import jax.numpy as jnp

_META_NAME = "meta.json"
_PREFILL_NAME = "prefill.jaxexport"
_DECODE_NAME = "decode_step.jaxexport"


def _register_cache_pytrees() -> None:
  """Registers the cache NamedTuples with jax.export's serializer.

  Registration is idempotent-guarded; it names the types stably so
  artifacts deserialize across refactors of the module layout.
  """
  from cadence_gemma_tpu.models import modules

  for cls, name in [
      (modules.RecurrentBlockCache, "cadence_gemma_tpu.RecurrentBlockCache"),
      (modules.AttentionBlockCache, "cadence_gemma_tpu.AttentionBlockCache"),
  ]:
    try:
      jax_export.register_namedtuple_serialization(cls, serialized_name=name)
    except ValueError:
      pass  # already registered


_register_cache_pytrees()


def make_serving_functions(
    model,
) -> tuple[Callable[..., Any], Callable[..., Any]]:
  """Pure (prefill, decode_step) functions over an explicit param tree.

  ``prefill(params, tokens, positions) -> (last_logits, cache)`` runs the
  single-pass prefill (one weights read, ``last_logits_only``);
  ``decode_step(params, cache, token, position) -> (logits, cache)``
  advances one token. Both are jit/export-friendly: no captured weights
  (CLAUDE.md rule: closed-over params lower as multi-GB constants).
  """

  def prefill(params, tokens, positions):
    return model.apply(
        params, tokens, positions, return_cache=True, last_logits_only=True
    )

  def decode_step(params, cache, token, position):
    return model.apply(params, token, position, cache=cache)

  return prefill, decode_step


@dataclasses.dataclass
class ServingExport:
  """Serialized serving programs + host-facing metadata."""

  prefill: bytearray
  decode_step: bytearray
  meta: dict


def _as_avals(tree):
  return jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
  )


def export_serving(
    model,
    params,
    batch_size: int,
    prompt_len: int,
    *,
    cache_dtype=jnp.bfloat16,
    mesh: jax.sharding.Mesh | None = None,
    model_axis: str = "model",
) -> ServingExport:
  """Exports prefill + decode-step programs for fixed serving shapes.

  Args:
    model: A ``Griffin`` flax module.
    params: The parameter tree or a matching tree of ShapeDtypeStructs
      (only shapes/dtypes are read — exporting needs no real weights).
    batch_size / prompt_len: The serving bucket to compile for (the
      sampler's prompt-length bucketing maps arbitrary prompts onto a
      small set of buckets; export one artifact per bucket).
    cache_dtype: KV/conv cache dtype (the RG-LRU state stays fp32
      internally regardless).
    mesh: Optional device mesh. When given, parameters get the Megatron
      TP layouts from ``parallel/partitioning.py`` and data arguments are
      replicated — the artifact then encodes the distributed calling
      convention and must be loaded under an equal-shaped mesh.
    model_axis: Mesh axis name for the TP layouts.

  Returns:
    A :class:`ServingExport`; persist with :func:`save_serving_export`.
  """
  prefill, decode_step = make_serving_functions(model)

  params_avals = _as_avals(params)
  tokens = jax.ShapeDtypeStruct((batch_size, prompt_len), jnp.int32)
  positions = jax.ShapeDtypeStruct((batch_size, prompt_len), jnp.int32)
  token1 = jax.ShapeDtypeStruct((batch_size, 1), jnp.int32)
  pos1 = jax.ShapeDtypeStruct((batch_size, 1), jnp.int32)
  cache_avals = _as_avals(model.init_cache(batch_size, cache_dtype))

  if mesh is not None:
    from cadence_gemma_tpu.parallel import partitioning

    param_sh = partitioning.griffin_param_shardings(
        mesh, params, model_axis=model_axis
    )
    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()
    )
    with_sh = lambda aval, sh: jax.ShapeDtypeStruct(  # noqa: E731
        aval.shape, aval.dtype, sharding=sh
    )
    params_avals = jax.tree_util.tree_map(with_sh, params_avals, param_sh)
    tokens = with_sh(tokens, replicated)
    positions = with_sh(positions, replicated)
    token1 = with_sh(token1, replicated)
    pos1 = with_sh(pos1, replicated)
    cache_avals = jax.tree_util.tree_map(
        lambda a: with_sh(a, replicated), cache_avals
    )

  exp_prefill = jax_export.export(jax.jit(prefill))(
      params_avals, tokens, positions
  )
  exp_decode = jax_export.export(jax.jit(decode_step))(
      params_avals, cache_avals, token1, pos1
  )

  config = model.config
  meta = {
      "format": "cadence_gemma_tpu.serving_export.v1",
      "batch_size": batch_size,
      "prompt_len": prompt_len,
      "cache_dtype": jnp.dtype(cache_dtype).name,
      "num_devices": 1 if mesh is None else mesh.devices.size,
      "mesh_axes": None if mesh is None else dict(mesh.shape),
      "config": {
          "vocab_size": config.vocab_size,
          "width": config.width,
          "num_layers": len(config.block_types),
          "attention_window_size": config.attention_window_size,
          "block_types": [bt.name for bt in config.block_types],
      },
      "jax_version": jax.__version__,
  }
  return ServingExport(
      prefill=exp_prefill.serialize(),
      decode_step=exp_decode.serialize(),
      meta=meta,
  )


def save_serving_export(exp: ServingExport, path: str) -> None:
  """Writes the artifact directory (two programs + meta.json)."""
  out = pathlib.Path(path)
  out.mkdir(parents=True, exist_ok=True)
  (out / _PREFILL_NAME).write_bytes(bytes(exp.prefill))
  (out / _DECODE_NAME).write_bytes(bytes(exp.decode_step))
  (out / _META_NAME).write_text(json.dumps(exp.meta, indent=2))


class LoadedServing:
  """Deserialized serving programs; call without any model code."""

  def __init__(self, prefill_bytes: bytes, decode_bytes: bytes, meta: dict):
    self.meta = meta
    self._prefill = jax_export.deserialize(bytearray(prefill_bytes))
    self._decode = jax_export.deserialize(bytearray(decode_bytes))
    # jit the deserialized calls so repeated invocations hit the
    # executable cache instead of re-lowering the StableHLO each time.
    self.prefill = jax.jit(self._prefill.call)
    self.decode_step = jax.jit(self._decode.call)


def load_serving_export(path: str) -> LoadedServing:
  """Loads an artifact directory written by :func:`save_serving_export`."""
  src = pathlib.Path(path)
  meta = json.loads((src / _META_NAME).read_text())
  if meta.get("format") != "cadence_gemma_tpu.serving_export.v1":
    raise ValueError(f"not a serving export: {path} ({meta.get('format')})")
  return LoadedServing(
      (src / _PREFILL_NAME).read_bytes(),
      (src / _DECODE_NAME).read_bytes(),
      meta,
  )
