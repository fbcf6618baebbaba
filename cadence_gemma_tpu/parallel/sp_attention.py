"""Sequence-parallel windowed attention: halo exchange under shard_map.

Under sequence parallelism the time axis is sharded over a mesh axis. XLA's
auto-spmd handles the *einsum* attention by all-gathering the full K/V per
layer (measured: 2 x [b, t, h] gathers per layer per pass — ~8 MB/layer at
8k tokens for the 2B config), and it cannot partition a Pallas kernel at
all, which would force full replication of the flash-attention compute.

Windowed attention only ever needs the previous ``window`` positions, so
the TPU-native sharding is a *halo exchange*: each shard ``ppermute``s its
last ``window`` keys/values to the next shard (one neighbor hop on the ICI
ring, [b, window, 1, h] ≈ 1 MB — 8x less than the gather, independent of
sequence length) and runs the flash kernel locally with ``kv_prefix``
(``ops/pallas_attention.py``): queries at local positions, keys covering
[halo ‖ local]. Document masking needs no halo — the kernel's per-query
lower bound is computed from the local ``segment_pos`` alone, and the first
shard's zero-filled halo is masked automatically because its documents
start at or after the halo boundary.

Gradients: the whole region is plain differentiable JAX — the ppermute's
transpose routes the halo's dk/dv back to the owning shard.

The reference has no sequence-parallel attention at all (its SP covers only
the scan, ``jax/pallas.py:71-193``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cadence_gemma_tpu.ops import pallas_attention
from cadence_gemma_tpu.parallel import sharding

P = jax.sharding.PartitionSpec

_TILE = 128  # kv_prefix granularity required by the kernel.


def can_sequence_shard(
    spec: sharding.ShardingSpec | None, seq_len: int, window: int
) -> bool:
  """Static dispatch test for the halo-exchange path."""
  if spec is None or spec.mesh is None:
    return False
  ax = spec.sequence_axis_name
  if not isinstance(ax, str) or ax not in spec.mesh.axis_names:
    return False
  if spec.sequence_axis_index_groups is not None:
    return False
  n = spec.mesh.shape[ax]
  if n <= 1 or seq_len % n:
    return False
  local = seq_len // n
  # One-neighbor halo covers the window only if a shard is at least a
  # window long; the kernel also needs a tile-aligned prefix.
  return local >= window and window % _TILE == 0 and local % _TILE == 0


def sequence_sharded_attention(
    queries: jax.Array,      # [b, t, n, h]
    keys: jax.Array,         # [b, t, 1, h]
    values: jax.Array,       # [b, t, 1, h]
    segment_pos: jax.Array,  # [b, t]
    window: int,
    spec: sharding.ShardingSpec,
) -> jax.Array:
  """Flash window attention over a sequence-sharded batch (prefill path)."""
  ax = spec.sequence_axis_name
  n_shards = spec.mesh.shape[ax]
  act_spec = P(spec.batch_axis_name, ax, spec.activations_axis_name, None)
  kv_spec = P(spec.batch_axis_name, ax, None, None)
  pos_spec = P(spec.batch_axis_name, ax)

  @functools.partial(
      jax.shard_map,
      mesh=spec.mesh,
      in_specs=(act_spec, kv_spec, kv_spec, pos_spec),
      out_specs=act_spec,
      check_vma=False,
  )
  def run(q, k, v, seg):
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    halo_k = jax.lax.ppermute(k[:, -window:], ax, perm)
    halo_v = jax.lax.ppermute(v[:, -window:], ax, perm)
    k_ext = jnp.concatenate([halo_k, k], axis=1)
    v_ext = jnp.concatenate([halo_v, v], axis=1)
    return pallas_attention.flash_window_attention(
        q, k_ext, v_ext, seg, window, kv_prefix=window
    )

  return run(queries, keys, values, segment_pos)
