"""Device-mesh sharding primitives for the RG-LRU scan and the model.

This module provides:

  * :class:`ShardingSpec` — names the mesh axes over which scan inputs are
    sharded (batch / sequence / activations). API-compatible with the
    reference's ``ShardingSpec`` (reference ``jax/pallas.py:196-232``).
  * :func:`multi_shard_correction` — the sequence-parallel fix-up that turns
    independent per-shard linear scans into one global scan using a single
    ``all_gather`` of ``(h_last, a_prod_last)`` pairs over the ICI
    (reference algorithm at ``jax/pallas.py:71-193``, re-derived below).
  * Mesh construction helpers used by inference/training entry points.

Sequence parallelism for a linear recurrence
--------------------------------------------
For ``h_t = a_t * h_{t-1} + x_t`` split the time axis into shards
``j = 0..J-1``. Each shard computes, locally and in parallel,

    S_j(t)  = scan of its chunk with zero initial state
    P_j(t)  = cumulative product of its ``a`` values

The true values satisfy ``h_j(t) = S_j(t) + P_j(t) * H_{j-1}`` where
``H_{j-1}`` is the true final state of the previous shard, and the incoming
states follow the (tiny, J-step) recurrence

    H_j = P_j(last) * H_{j-1} + S_j(last),   H_{-1} = h0.

So: all-gather the J ``(S_j(last), P_j(last))`` pairs — one [b, d] vector per
shard — unroll the J-step recurrence identically on every device, and apply
each shard's own correction term. Communication volume is independent of
sequence length; on TPU the all-gather rides the ICI.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cadence_gemma_tpu import complex_lib

RealOrComplex = complex_lib.RealOrComplex

# Canonical mesh axis names used across the framework.
BATCH_AXIS = "data"
SEQUENCE_AXIS = "sequence"
MODEL_AXIS = "model"


class ShardingSpec(NamedTuple):
  """Names of the mesh axes along which scan operands are sharded.

  Attributes:
    mesh: The device mesh when running under ``pjit``/``shard_map``; ``None``
      when running under ``pmap`` (axis names only) or unsharded.
    batch_axis_name: Mesh axis sharding the batch dimension (DP).
    sequence_axis_name: Mesh axis sharding the time dimension (SP).
    activations_axis_name: Mesh axis sharding the channel dimension (TP).
    sequence_axis_index_groups: Optional sub-groupings of the sequence axis,
      each group forming an independent scan domain.
  """

  mesh: jax.sharding.Mesh | None = None
  batch_axis_name: str | tuple[str, ...] | None = None
  sequence_axis_name: str | tuple[str, ...] | None = None
  activations_axis_name: str | tuple[str, ...] | None = None
  sequence_axis_index_groups: list[list[int]] | None = None

  @property
  def activations_sharding_spec(self) -> jax.sharding.PartitionSpec:
    """PartitionSpec for [batch, time, channels] activations."""
    return jax.sharding.PartitionSpec(
        self.batch_axis_name,
        self.sequence_axis_name,
        self.activations_axis_name,
    )

  @property
  def activations_sharding(self) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(
        mesh=self.mesh, spec=self.activations_sharding_spec
    )

  @property
  def rnn_state_sharding_spec(self) -> jax.sharding.PartitionSpec:
    """PartitionSpec for [batch, channels] recurrent state."""
    return jax.sharding.PartitionSpec(
        self.batch_axis_name, self.activations_axis_name
    )

  @property
  def rnn_state_sharding(self) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(
        mesh=self.mesh, spec=self.rnn_state_sharding_spec
    )


def make_mesh(
    axis_shapes: Sequence[int],
    axis_names: Sequence[str],
    devices: Sequence[jax.Device] | None = None,
) -> jax.sharding.Mesh:
  """Creates a mesh over the given (or all local) devices."""
  devices = np.asarray(devices if devices is not None else jax.devices())
  return jax.sharding.Mesh(
      devices.reshape(tuple(axis_shapes)), tuple(axis_names)
  )


def num_sequence_shards(
    seq_axis: str | tuple[str, ...] | None,
    seq_axis_index_groups: list[list[int]] | None = None,
) -> int:
  """Number of shards of the running scan's sequence domain (>= 1)."""
  if seq_axis is None:
    return 1
  return jax.lax.psum(1, seq_axis, axis_index_groups=seq_axis_index_groups)


def sequence_shard_index(
    seq_axis: str | tuple[str, ...] | None,
    seq_axis_index_groups: list[list[int]] | None = None,
) -> jax.Array:
  """This device's position within its scan domain along the sequence axis."""
  if seq_axis is None:
    return jnp.zeros([], dtype=jnp.int32)
  axis_index = jax.lax.axis_index(seq_axis)
  if seq_axis_index_groups is None:
    return axis_index
  # Map the raw axis index to its rank within its group.
  flat_members = np.asarray(seq_axis_index_groups).flatten()
  flat_ranks = np.concatenate(
      [np.arange(len(g)) for g in seq_axis_index_groups]
  )
  return jnp.sum(
      jnp.asarray(flat_ranks) * (jnp.asarray(flat_members) == axis_index)
  )


def get_acc_dtype(
    x: RealOrComplex,
    h0: RealOrComplex | None,
    acc_float_dtype: jnp.dtype = jnp.float32,
) -> jnp.dtype:
  """Accumulation dtype for the scan: fp32 (or the complex equivalent)."""
  if h0 is not None:
    if h0.dtype != acc_float_dtype:
      raise ValueError(
          f"h0 dtype {h0.dtype} must match accumulator {acc_float_dtype}."
      )
    return acc_float_dtype
  if isinstance(x, complex_lib.Complex) or not jnp.iscomplexobj(x):
    return acc_float_dtype
  return jnp.result_type(acc_float_dtype, jnp.complex64)


def multi_shard_correction(
    *,
    y: RealOrComplex,
    a_prod: RealOrComplex,
    h0: RealOrComplex | None,
    reverse: bool = False,
    h_last: RealOrComplex | None = None,
    a_prod_last: RealOrComplex | None = None,
    acc_float_dtype: jnp.dtype = jnp.float32,
    seq_axis: str | tuple[str, ...] | None = None,
    seq_axis_index_groups: list[list[int]] | None = None,
    shift_a_prod: bool = False,
    sync_h_last: bool = True,
) -> tuple[RealOrComplex, RealOrComplex, RealOrComplex]:
  """Corrects per-shard local scan results into the global scan.

  Args:
    y: This shard's local scan output (computed with zero initial state),
      shape [b, t_local, d].
    a_prod: This shard's cumulative product of ``a``, same shape as ``y``.
    h0: Global initial state (used by the first shard in scan order); None
      means zeros.
    reverse: Whether the scan ran right-to-left (shard order flips).
    h_last: This shard's local final state [b, d]; read off ``y`` if None.
    a_prod_last: This shard's total ``a`` product [b, d]; read off
      ``a_prod`` if None.
    acc_float_dtype: Accumulator dtype for the fix-up math.
    seq_axis: Sequence mesh-axis name; None means single shard (no-op).
    seq_axis_index_groups: Optional independent scan domains.
    shift_a_prod: Shift ``a_prod`` one step toward the scan start (with a
      leading 1) before applying the correction — required by the backward
      pass, whose correction multiplier for step t is the product of
      ``a_{t+1}..`` rather than ``a_t..``.
    sync_h_last: If True every shard returns the *global* final state; if
      False only the last shard in scan order does (others return zeros),
      which lets the caller ``psum`` it cheaply.

  Returns:
    ``(y_corrected, h_last_corrected, h0_corrected)`` where ``h0_corrected``
    is this shard's true incoming state.
  """
  num_shards = num_sequence_shards(seq_axis, seq_axis_index_groups)
  acc_dtype = get_acc_dtype(y, h0, acc_float_dtype)

  last_t = 0 if reverse else y.shape[1] - 1
  if h_last is None:
    h_last = y[:, last_t].astype(acc_dtype)
  if a_prod_last is None:
    a_prod_last = a_prod[:, last_t].astype(acc_dtype)

  if h0 is None:
    h0 = complex_lib.zeros_like(h_last)
  else:
    h0 = h0.astype(h_last.dtype)

  if num_shards == 1:
    return y, h_last, h0

  shard_index = sequence_shard_index(seq_axis, seq_axis_index_groups)

  # One [b, d] pair per shard; rides the ICI.
  h_last_all, a_last_all = jax.lax.all_gather(
      (h_last, a_prod_last),
      seq_axis,
      axis_index_groups=seq_axis_index_groups,
  )

  # Scan order over shard indices (reversed scans consume shards backwards).
  order = list(range(num_shards))
  if reverse:
    order = order[::-1]

  # Unroll the J-step recurrence H_j = P_j * H_{j-1} + S_j identically on all
  # devices; pick out this shard's incoming state with a masked select.
  carry = h0
  h0_corrected = complex_lib.zeros_like(h_last)
  for j in order:
    is_mine = (shard_index == j).astype(carry.dtype)
    h0_corrected = h0_corrected + is_mine * carry
    carry = a_last_all[j] * carry + h_last_all[j]
  h_last_corrected = carry  # The global final state.

  if shift_a_prod:
    one = complex_lib.ones_like(a_prod[:, :1])
    if reverse:
      a_prod = complex_lib.concatenate([a_prod[:, 1:], one], axis=1)
    else:
      a_prod = complex_lib.concatenate([one, a_prod[:, :-1]], axis=1)

  y_corrected = y + h0_corrected[:, None].astype(a_prod.dtype) * a_prod

  if not sync_h_last:
    last_shard = order[-1]
    is_last = (shard_index == last_shard).astype(h_last_corrected.dtype)
    h_last_corrected = is_last * h_last_corrected

  return y_corrected, h_last_corrected, h0_corrected
