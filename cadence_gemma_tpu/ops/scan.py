"""RG-LRU scan dispatch: Pallas kernel, native fallbacks, sharded regimes.

TPU-native counterpart of reference ``recurrentgemma/jax/scan.py`` with the
same decision tree (reference ``scan.py:350-465``):

  * ``seq_len == 1``  → closed-form decode step ``y = a * h0 + x`` (no
    kernel launch; this keeps the whole sampling loop a single fused XLA
    program).
  * no sharding spec  → single-shard scan in the selected implementation.
  * spec without mesh → running under ``pmap``; axis names are live, the
    scan corrects across sequence shards with collectives.
  * spec with mesh    → wraps the single-shard scan in ``shard_map`` with
    batch/sequence/channel partitioning.

``ScanType.AUTO`` resolves to the Pallas kernel on TPU, and to the
``jax.lax.scan``-based native path elsewhere (reference ``scan.py:33-42``).
Complex-valued inputs run the same dispatch — the Pallas kernel has a
complex body (``ops/pallas_lru.py``), matching the reference kernel's
complex support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cadence_gemma_tpu import common
from cadence_gemma_tpu import complex_lib
from cadence_gemma_tpu.ops import pallas_lru
from cadence_gemma_tpu.parallel import sharding

ShardingSpec = sharding.ShardingSpec
RealOrComplex = complex_lib.RealOrComplex

lru_pallas_scan = pallas_lru.lru_pallas_scan


def resolve_scan_type(scan_type: common.ScanType) -> common.ScanType:
  """AUTO → Pallas on TPU, native linear scan elsewhere."""
  if scan_type is not common.ScanType.AUTO:
    return scan_type
  if jax.local_devices()[0].platform == "tpu":
    return common.ScanType.LINEAR_PALLAS
  return common.ScanType.LINEAR_NATIVE


def lru_linear_scan(
    x: RealOrComplex,
    a: RealOrComplex,
    h0: RealOrComplex | None = None,
    reverse: bool = False,
    return_a_prod: bool = False,
    acc_float_dtype: jnp.dtype = jnp.float32,
    unroll: int = 1,
    y_in_acc_dtype: bool = False,
):
  """Sequential scan via ``jax.lax.scan`` with an fp32 carry.

  Returns ``(y, h_last)``, or ``((y, h_last), (a_prod, a_prod_last))`` when
  ``return_a_prod`` — the cumulative products needed by the sequence-parallel
  fix-up. ``y_in_acc_dtype`` keeps the per-step outputs in the accumulation
  dtype: they then ARE the exact intermediate carries, which the
  speculative-decoding commit needs to restore mid-chunk state losslessly.
  """
  acc_dtype = sharding.get_acc_dtype(x, h0, acc_float_dtype)
  y_dtype = acc_dtype if y_in_acc_dtype else x.dtype

  if h0 is None:
    h0 = complex_lib.zeros_like(x[:, 0], acc_dtype)
  p0 = complex_lib.ones_like(h0) if return_a_prod else None

  def body(carry, inputs):
    h_prev, p_prev = carry
    x_t, a_t = inputs
    h_t = a_t.astype(acc_dtype) * h_prev + x_t.astype(acc_dtype)
    if return_a_prod:
      p_t = a_t.astype(acc_dtype) * p_prev
      return (h_t, p_t), (h_t.astype(y_dtype), p_t.astype(x.dtype))
    return (h_t, None), (h_t.astype(y_dtype), None)

  # vmap over batch so scan's leading axis is time.
  scanned = jax.vmap(
      lambda init, xs: jax.lax.scan(
          body, init=init, xs=xs, reverse=reverse, unroll=unroll
      )
  )
  (h_last, p_last), (y, a_prod) = scanned((h0, p0), (x, a))

  if return_a_prod:
    return (y, h_last), (a_prod, p_last)
  return y, h_last


def lru_associative_scan(
    x: RealOrComplex,
    a: RealOrComplex,
    h0: RealOrComplex | None = None,
    reverse: bool = False,
    acc_float_dtype: jnp.dtype = jnp.float32,
    return_a_prod: bool = False,
):
  """Log-depth scan via ``jax.lax.associative_scan``.

  The recurrence composes as the monoid
  ``(a2, x2) ∘ (a1, x1) = (a2*a1, a2*x1 + x2)``; an optional initial state is
  injected as an extra leading (or trailing, when reversed) element.
  """
  acc_dtype = sharding.get_acc_dtype(x, h0, acc_float_dtype)
  orig_dtype = x.dtype
  x = x.astype(acc_dtype)
  a = a.astype(acc_dtype)

  def combine(left, right):
    a_l, x_l = left
    a_r, x_r = right
    return a_r * a_l, a_r * x_l + x_r

  if h0 is not None:
    one = complex_lib.ones_like(a[:, :1])
    h0_col = h0[:, None]
    if reverse:
      a = complex_lib.concatenate([a, one], axis=1)
      x = complex_lib.concatenate([x, h0_col], axis=1)
    else:
      a = complex_lib.concatenate([one, a], axis=1)
      x = complex_lib.concatenate([h0_col, x], axis=1)

  a_prod, y = jax.lax.associative_scan(
      combine, (a, x), axis=x.ndim - 2, reverse=reverse
  )

  if h0 is not None:
    if reverse:
      y, a_prod = y[:, :-1], a_prod[:, :-1]
    else:
      y, a_prod = y[:, 1:], a_prod[:, 1:]

  last = 0 if reverse else -1
  h_last = y[:, last]
  p_last = a_prod[:, last]
  y = y.astype(orig_dtype)

  if return_a_prod:
    return (y, h_last), (a_prod.astype(orig_dtype), p_last)
  return y, h_last


def _native_scan_with_correction(
    scan_fn,
    x,
    a,
    h0,
    reverse,
    acc_float_dtype,
    seq_axis,
    seq_axis_index_groups,
):
  """Runs a native per-shard scan and stitches shards together."""
  (y, h_last), (a_prod, a_prod_last) = scan_fn(
      x=x,
      a=a,
      h0=None,
      reverse=reverse,
      return_a_prod=True,
      acc_float_dtype=acc_float_dtype,
  )
  y, h_last, _ = sharding.multi_shard_correction(
      y=y,
      a_prod=a_prod,
      h0=h0,
      reverse=reverse,
      h_last=h_last,
      a_prod_last=a_prod_last,
      acc_float_dtype=acc_float_dtype,
      seq_axis=seq_axis,
      seq_axis_index_groups=seq_axis_index_groups,
  )
  return y, h_last


def single_shard_rnn_scan(
    x: RealOrComplex,
    a: RealOrComplex,
    h0: RealOrComplex | None = None,
    reverse: bool = False,
    scan_type: common.ScanType = common.ScanType.AUTO,
    acc_float_dtype: jnp.dtype = jnp.float32,
    seq_axis: str | tuple[str, ...] | None = None,
    seq_axis_index_groups: list[list[int]] | None = None,
    unroll: int = 1,
) -> tuple[RealOrComplex, RealOrComplex]:
  """Scan of this device's local chunk, correcting across sequence shards."""
  assert x.ndim == 3
  assert a.shape == x.shape[-a.ndim:]
  assert a.dtype == x.dtype

  scan_type = resolve_scan_type(scan_type)

  num_shards = sharding.num_sequence_shards(seq_axis, seq_axis_index_groups)

  if scan_type is common.ScanType.LINEAR_PALLAS:
    if acc_float_dtype != jnp.float32:
      raise ValueError(f"Unsupported accumulation dtype: {acc_float_dtype}.")
    # Shard correction happens inside the kernel wrapper's custom VJP.
    return lru_pallas_scan(
        x=x,
        a=a,
        h0=h0,
        reverse=reverse,
        seq_axis=seq_axis,
        seq_axis_index_groups=seq_axis_index_groups,
    )

  if scan_type is common.ScanType.LINEAR_NATIVE:
    scan_fn = functools.partial(lru_linear_scan, unroll=unroll)
  elif scan_type is common.ScanType.ASSOCIATIVE_NATIVE:
    scan_fn = lru_associative_scan
  else:
    raise ValueError(f"Unsupported scan type: {scan_type}.")

  if num_shards == 1:
    return scan_fn(
        x=x, a=a, h0=h0, reverse=reverse, acc_float_dtype=acc_float_dtype
    )
  return _native_scan_with_correction(
      scan_fn,
      x,
      a,
      h0,
      reverse,
      acc_float_dtype,
      seq_axis,
      seq_axis_index_groups,
  )


def linear_scan(
    x: RealOrComplex,
    a: RealOrComplex,
    h0: RealOrComplex | None = None,
    reverse: bool = False,
    scan_type: common.ScanType = common.ScanType.AUTO,
    acc_float_dtype: jnp.dtype = jnp.float32,
    sharding_spec: ShardingSpec | None = None,
    unroll: int = 1,
) -> tuple[RealOrComplex, RealOrComplex]:
  """Top-level RG-LRU scan entry point (reference ``scan.py:350-465``).

  Returns the per-step outputs (in ``x.dtype``) and the final hidden state
  (in the accumulation dtype).
  """
  acc_dtype = sharding.get_acc_dtype(x, h0, acc_float_dtype)

  if x.shape[1] == 1:
    # Decode fast path: one step in closed form.
    assert a.shape[1] == 1
    if h0 is None:
      return x, x[:, 0].astype(acc_dtype)
    y = a.astype(acc_dtype) * h0[:, None] + x.astype(acc_dtype)
    last = 0 if reverse else -1
    return y.astype(x.dtype), y[:, last]

  if sharding_spec is None:
    return single_shard_rnn_scan(
        x=x,
        a=a,
        h0=h0,
        reverse=reverse,
        scan_type=scan_type,
        acc_float_dtype=acc_float_dtype,
        unroll=unroll,
    )

  if sharding_spec.mesh is None:
    # pmap regime: axis names are already live.
    return single_shard_rnn_scan(
        x=x,
        a=a,
        h0=h0,
        reverse=reverse,
        scan_type=scan_type,
        acc_float_dtype=acc_float_dtype,
        seq_axis=sharding_spec.sequence_axis_name,
        seq_axis_index_groups=sharding_spec.sequence_axis_index_groups,
        unroll=unroll,
    )

  # pjit regime: partition explicitly with shard_map.
  shard_fn = jax.shard_map(
      functools.partial(
          single_shard_rnn_scan,
          reverse=reverse,
          scan_type=scan_type,
          acc_float_dtype=acc_float_dtype,
          seq_axis=sharding_spec.sequence_axis_name,
          seq_axis_index_groups=sharding_spec.sequence_axis_index_groups,
          unroll=unroll,
      ),
      mesh=sharding_spec.mesh,
      in_specs=(
          sharding_spec.activations_sharding_spec,
          sharding_spec.activations_sharding_spec,
          sharding_spec.rnn_state_sharding_spec,
      ),
      out_specs=(
          sharding_spec.activations_sharding_spec,
          sharding_spec.rnn_state_sharding_spec,
      ),
      check_vma=False,
  )
  if h0 is None:
    h0 = complex_lib.zeros_like(x[:, 0], acc_dtype)
  return shard_fn(x, a, h0)
