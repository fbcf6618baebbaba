"""Pallas TPU kernel for the RG-LRU diagonal linear recurrence.

Computes ``h_t = a_t * h_{t-1} + x_t`` over the time axis of ``[b, t, d]``
inputs, entirely on-chip:

  * the grid is ``(batch_tiles, dim_tiles, seq_tiles)`` with the sequence
    dimension innermost, so the fp32 hidden-state carry lives in a VMEM
    scratch buffer that persists across sequence tiles while Mosaic
    double-buffers the HBM block DMAs;
  * inputs may be bfloat16 — the carry is always float32 (bf16 recurrences
    drift), outputs are cast back to the input dtype;
  * a single kernel body serves the forward scan, the reversed scan, and the
    backward (cotangent) scan, selected by two static flags (see below);
  * an optional cumulative-product output ``a_prod`` supports
    sequence-parallel execution: shards scan locally and a tiny
    ``all_gather``-based fix-up stitches them together
    (:func:`cadence_gemma_tpu.parallel.sharding.multi_shard_correction`).

Functional contract matches the reference kernel at
``/root/reference/recurrentgemma/jax/pallas.py:475-842`` (verified by tests
against the native ``jax.lax.scan`` path), but the implementation is
original: one uniform inner loop with the boundary ``a``-multiplier folded
into the carry, instead of special-casing the first step of every block.

Backward-scan math
------------------
For the VJP, with output cotangents ``g_t`` (for ``y_t``) and ``g_h`` (for
``h_last``), the input cotangents follow the *reverse* recurrence

    dh_{T-1} = g_{T-1} + g_h
    dh_t     = a_{t+1} * dh_{t+1} + g_t
    dx_t     = dh_t
    da_t     = dh_t * h_{t-1}          (h_{-1} = h0)
    dh0      = a_0 * dh_0

Because ``a_{t+1}`` crosses tile boundaries, the kernel in ``premultiply``
mode applies each step's ``a_t`` *after* emitting ``dh_t``: the carry leaving
a tile is already multiplied by the connecting ``a``, so every tile (and
every shard) only ever touches its own ``a`` values. The final carry is then
exactly ``a_0 * dh_0 = dh0``.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

from cadence_gemma_tpu.parallel import sharding


def _round_up(value: int, multiple: int) -> int:
  return ((value + multiple - 1) // multiple) * multiple


_LANES = 128

# Rough VMEM working-set budget per pipelined buffer set, in elements.
# Four [b, t, dsub, 128] streams (x, a, y, a_prod) are live at once and
# Mosaic double-buffers each, so the total footprint is ~16x this in bytes
# for bfloat16 inputs — comfortably inside the ~16 MB of VMEM.
_VMEM_BUDGET_ELEMENTS = 512 * 1024


def _choose_tiles(
    batch: int, seq_len: int, dim_sublanes: int
) -> tuple[int, int, int]:
  """Picks (batch_tile, seq_tile, dim_sublane_tile).

  The channel axis is pre-reshaped into (dim_sublanes, 128) so that each
  time step addresses whole (sublane, lane) tiles; the time index then lands
  on an untiled leading dimension, which Mosaic supports for dynamic
  indexing. We keep the full channel extent in one tile when it fits (the
  common case: 2B has 20 sublanes, 9B has 44) and shrink the sequence/batch
  tiles to fit the VMEM budget.
  """
  dim_tile = dim_sublanes
  batch_tile = min(batch, 8)
  seq_tile = min(_round_up(seq_len, 8), 256)
  while (
      batch_tile * seq_tile * dim_tile * _LANES > _VMEM_BUDGET_ELEMENTS
      and seq_tile > 8
  ):
    seq_tile //= 2
  while (
      batch_tile * seq_tile * dim_tile * _LANES > _VMEM_BUDGET_ELEMENTS
      and batch_tile > 1
  ):
    batch_tile //= 2
  # Very wide channel counts: split into 8-sublane tiles as a last resort.
  if batch_tile * seq_tile * dim_tile * _LANES > 2 * _VMEM_BUDGET_ELEMENTS:
    dim_tile = 8
  seq_tile = max(_round_up(seq_tile, 8), 8)
  return batch_tile, seq_tile, dim_tile


def _lru_kernel(
    x_ref,
    a_ref,
    h0_ref,
    y_ref,
    h_last_ref,
    a_prod_ref,
    a_prod_last_ref,
    h_scratch,
    p_scratch,
    *,
    seq_tile: int,
    descending: bool,
    premultiply: bool,
    out_dtype,
):
  """One (batch, dim, seq)-tile step of the scan.

  Static flags:
    descending: Process time indices high-to-low inside the tile (tiles are
      also fed high-to-low via the index map). True for reversed forward
      scans and for backward scans of forward recurrences.
    premultiply: Backward mode — emit ``h + x_t`` first, then fold ``a_t``
      into the carry (see module docstring).
  """
  seq_index = pl.program_id(2)

  @pl.when(seq_index == 0)
  def _init():
    if h0_ref is None:
      h_scratch[...] = jnp.zeros_like(h_scratch)
    else:
      h_scratch[...] = h0_ref[...].astype(h_scratch.dtype)
    if p_scratch is not None:
      p_scratch[...] = jnp.ones_like(p_scratch)

  def step(i, _):
    t = (seq_tile - 1 - i) if descending else i
    m = a_ref[:, t].astype(jnp.float32)
    x_t = x_ref[:, t].astype(jnp.float32)
    if premultiply:
      h = h_scratch[...] + x_t
      y_ref[:, t] = h.astype(out_dtype)
      h_scratch[...] = h * m
    else:
      h = m * h_scratch[...] + x_t
      y_ref[:, t] = h.astype(out_dtype)
      h_scratch[...] = h
    if p_scratch is not None:
      p = p_scratch[...] * m
      a_prod_ref[:, t] = p.astype(out_dtype)
      p_scratch[...] = p
    return 0

  jax.lax.fori_loop(0, seq_tile, step, 0)

  # Revisited output blocks: the write from the final sequence tile wins.
  h_last_ref[...] = h_scratch[...]
  if p_scratch is not None:
    a_prod_last_ref[...] = p_scratch[...]


def _lru_pallas_call(
    x: jax.Array,
    a: jax.Array,
    h0: jax.Array | None,
    *,
    reverse: bool,
    backprop: bool,
    compute_a_prod: bool,
):
  """Runs the tiled kernel; returns (y, h_last[, a_prod, a_prod_last]).

  Operands are reshaped ``[b, t, d] -> [b, t, d/128, 128]`` (with neutral
  padding: ``a=1, x=0`` steps leave the carry and the cumulative product
  unchanged in either scan direction) so the per-step dynamic time index
  falls on an untiled dimension.
  """
  orig_batch, orig_seq, orig_dim = x.shape
  out_dtype = x.dtype

  dim_sublanes = _round_up(orig_dim, _LANES) // _LANES
  batch_tile, seq_tile, dim_tile = _choose_tiles(
      orig_batch, orig_seq, dim_sublanes
  )
  dim_sublanes = _round_up(dim_sublanes, dim_tile)
  padded_dim = dim_sublanes * _LANES
  padded_seq = _round_up(orig_seq, seq_tile)

  pad = ((0, 0), (0, padded_seq - orig_seq), (0, padded_dim - orig_dim))
  x = jnp.pad(x, pad).reshape(orig_batch, padded_seq, dim_sublanes, _LANES)
  a = jnp.pad(a, pad, constant_values=1).reshape(x.shape)

  batch = orig_batch
  if batch % batch_tile:
    batch_tile = 1

  grid = (batch // batch_tile, dim_sublanes // dim_tile, padded_seq // seq_tile)
  num_seq_tiles = grid[2]
  descending = reverse != backprop

  def seq_major_index(b, d, s):
    s_eff = (num_seq_tiles - 1 - s) if descending else s
    return (b, s_eff, d, 0)

  def state_index(b, d, s):
    del s
    return (b, d, 0)

  seq_spec = pl.BlockSpec(
      (batch_tile, seq_tile, dim_tile, _LANES),
      seq_major_index,
      memory_space=pltpu.VMEM,
  )
  state_spec = pl.BlockSpec(
      (batch_tile, dim_tile, _LANES), state_index, memory_space=pltpu.VMEM
  )

  in_specs = [seq_spec, seq_spec, None if h0 is None else state_spec]
  out_specs = [seq_spec, state_spec]
  seq_shape = (batch, padded_seq, dim_sublanes, _LANES)
  state_shape = (batch, dim_sublanes, _LANES)
  out_shapes = [
      jax.ShapeDtypeStruct(seq_shape, out_dtype),
      jax.ShapeDtypeStruct(state_shape, jnp.float32),
  ]
  scratch_shapes = [pltpu.VMEM((batch_tile, dim_tile, _LANES), jnp.float32)]
  if compute_a_prod:
    out_specs += [seq_spec, state_spec]
    out_shapes += [
        jax.ShapeDtypeStruct(seq_shape, out_dtype),
        jax.ShapeDtypeStruct(state_shape, jnp.float32),
    ]
    scratch_shapes.append(
        pltpu.VMEM((batch_tile, dim_tile, _LANES), jnp.float32)
    )
  else:
    scratch_shapes.append(None)

  if h0 is not None:
    h0 = jnp.pad(h0, ((0, 0), (0, padded_dim - orig_dim)))
    h0 = h0.reshape(state_shape)
    args = (x, a, h0)
  else:
    args = (x, a)
    in_specs = in_specs[:2]

  def kernel(*refs):
    if h0 is None:
      x_ref, a_ref = refs[:2]
      h0_ref = None
      rest = refs[2:]
    else:
      x_ref, a_ref, h0_ref = refs[:3]
      rest = refs[3:]
    if compute_a_prod:
      y_ref, h_last_ref, a_prod_ref, a_prod_last_ref, h_scr, p_scr = rest
    else:
      y_ref, h_last_ref, h_scr = rest[0], rest[1], rest[2]
      a_prod_ref = a_prod_last_ref = p_scr = None
    _lru_kernel(
        x_ref,
        a_ref,
        h0_ref,
        y_ref,
        h_last_ref,
        a_prod_ref,
        a_prod_last_ref,
        h_scr,
        p_scr,
        seq_tile=seq_tile,
        descending=descending,
        premultiply=backprop,
        out_dtype=out_dtype,
    )

  outputs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shapes,
      scratch_shapes=[s for s in scratch_shapes if s is not None],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary"),
      ),
  )(*args)

  def crop_seq(v):
    v = v.reshape(batch, padded_seq, padded_dim)
    return v[:, :orig_seq, :orig_dim]

  def crop_state(v):
    return v.reshape(batch, padded_dim)[:, :orig_dim]

  y, h_last = crop_seq(outputs[0]), crop_state(outputs[1])
  if compute_a_prod:
    return y, h_last, crop_seq(outputs[2]), crop_state(outputs[3])
  return y, h_last


def _sharded_scan(
    x,
    a,
    h0,
    *,
    reverse: bool,
    backprop: bool,
    seq_axis,
    seq_axis_index_groups,
):
  """Local kernel + cross-shard correction (no-op on one shard)."""
  num_shards = sharding.num_sequence_shards(seq_axis, seq_axis_index_groups)
  if num_shards == 1:
    y, h_last = _lru_pallas_call(
        x, a, h0, reverse=reverse, backprop=backprop, compute_a_prod=False
    )
    return y, h_last, h0

  y, h_last, a_prod, a_prod_last = _lru_pallas_call(
      x, a, None, reverse=reverse, backprop=backprop, compute_a_prod=True
  )
  return sharding.multi_shard_correction(
      y=y,
      a_prod=a_prod,
      h0=h0,
      # The backward scan consumes shards in the opposite order.
      reverse=(not reverse) if backprop else reverse,
      h_last=h_last,
      a_prod_last=a_prod_last,
      seq_axis=seq_axis,
      seq_axis_index_groups=seq_axis_index_groups,
      shift_a_prod=backprop,
      sync_h_last=not backprop,
  )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _lru(x, a, h0, reverse, seq_axis, seq_axis_index_groups):
  y, h_last, _ = _sharded_scan(
      x,
      a,
      h0,
      reverse=reverse,
      backprop=False,
      seq_axis=seq_axis,
      seq_axis_index_groups=seq_axis_index_groups,
  )
  return y, h_last


def _lru_fwd(x, a, h0, reverse, seq_axis, seq_axis_index_groups):
  y, h_last, h0_corrected = _sharded_scan(
      x,
      a,
      h0,
      reverse=reverse,
      backprop=False,
      seq_axis=seq_axis,
      seq_axis_index_groups=seq_axis_index_groups,
  )
  return (y, h_last), (y, a, h0_corrected, h0 is not None)


def _lru_bwd(reverse, seq_axis, seq_axis_index_groups, residuals, cotangents):
  dy, dh_last = cotangents
  y, a, h0, has_h0 = residuals

  num_shards = sharding.num_sequence_shards(seq_axis, seq_axis_index_groups)
  if num_shards > 1:
    # h_last is returned replicated along the sequence axis, so shard_map
    # autodiff hands each shard a partial cotangent: sum them once here.
    dh_last = jax.lax.psum(
        dh_last, seq_axis, axis_index_groups=seq_axis_index_groups
    )

  dx, dh0, _ = _sharded_scan(
      dy,
      a,
      dh_last,
      reverse=reverse,
      backprop=True,
      seq_axis=seq_axis,
      seq_axis_index_groups=seq_axis_index_groups,
  )

  # da_t = dh_t * h_{t-1}, with the corrected h0 standing in at the boundary.
  if h0 is None:
    h0 = jnp.zeros_like(y[:, 0])
  h0 = h0[:, None].astype(y.dtype)
  h_prev = (
      jnp.concatenate([y[:, 1:], h0], axis=1)
      if reverse
      else jnp.concatenate([h0, y[:, :-1]], axis=1)
  )
  da = dx * h_prev

  return dx, da, (dh0 if has_h0 else None)


_lru.defvjp(_lru_fwd, _lru_bwd)


def lru_pallas_scan(
    x: jax.Array,
    a: jax.Array,
    h0: jax.Array | None = None,
    reverse: bool = False,
    seq_axis: str | tuple[str, ...] | None = None,
    seq_axis_index_groups: list[list[int]] | None = None,
    **_unused_tuning_kwargs,
) -> tuple[jax.Array, jax.Array]:
  """Differentiable RG-LRU linear scan on TPU.

  Args:
    x: Inputs [batch, seq, dim] (bfloat16 or float32).
    a: Per-step decay, same shape/dtype as ``x``.
    h0: Optional initial state [batch, dim] in float32.
    reverse: Scan right-to-left.
    seq_axis: Mesh axis name when the time dimension is sharded (the caller
      must already be inside ``shard_map``/``pmap`` over that axis).
    seq_axis_index_groups: Optional independent scan sub-domains.

  Returns:
    ``(y, h_last)`` — outputs in ``x.dtype`` and final state in float32.
  """
  if x.ndim != 3:
    raise ValueError(f"Expected [b, t, d] inputs, got shape {x.shape}.")
  if a.shape != x.shape or a.dtype != x.dtype:
    raise ValueError("`a` must match `x` in shape and dtype.")
  return _lru(x, a, h0, reverse, seq_axis, seq_axis_index_groups)


# Reference-compat alias (the reference exports both names,
# jax/pallas.py:845,915).
pallas_lru = lru_pallas_scan
