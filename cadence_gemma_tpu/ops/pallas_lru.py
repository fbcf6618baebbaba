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
  * ``complex_lib.Complex`` operands are supported: each stream is split
    into (real, imag) component blocks and a complex kernel body runs the
    pair-of-reals product; the backward scan is the same premultiply scan
    run with ``conj(a)`` (matching the reference's complex kernel,
    ``jax/pallas.py:475-623``);
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

from cadence_gemma_tpu import complex_lib
from cadence_gemma_tpu.parallel import sharding

RealOrComplex = complex_lib.RealOrComplex


def _round_up(value: int, multiple: int) -> int:
  return ((value + multiple - 1) // multiple) * multiple


_LANES = 128

# Rough VMEM working-set budget per pipelined buffer set, in elements.
# Four [b, t, dsub, 128] streams (x, a, y, a_prod) are live at once and
# Mosaic double-buffers each, so the total footprint is ~16x this in bytes
# for bfloat16 inputs — comfortably inside the ~16 MB of VMEM.
_VMEM_BUDGET_ELEMENTS = 512 * 1024


def _choose_tiles(
    batch: int, seq_len: int, dim_sublanes: int, num_components: int = 1
) -> tuple[int, int, int]:
  """Picks (batch_tile, seq_tile, dim_sublane_tile).

  The channel axis is pre-reshaped into (dim_sublanes, 128) so that each
  time step addresses whole (sublane, lane) tiles; the time index then lands
  on an untiled leading dimension, which Mosaic supports for dynamic
  indexing. We keep the full channel extent in one tile when it fits (the
  common case: 2B has 20 sublanes, 9B has 44) and shrink the sequence/batch
  tiles to fit the VMEM budget.
  """
  budget = _VMEM_BUDGET_ELEMENTS // num_components
  dim_tile = dim_sublanes
  batch_tile = min(batch, 8)
  seq_tile = min(_round_up(seq_len, 8), 256)
  while (
      batch_tile * seq_tile * dim_tile * _LANES > budget
      and seq_tile > 8
  ):
    seq_tile //= 2
  while (
      batch_tile * seq_tile * dim_tile * _LANES > budget
      and batch_tile > 1
  ):
    batch_tile //= 2
  # Very wide channel counts: split into 8-sublane tiles as a last resort.
  if batch_tile * seq_tile * dim_tile * _LANES > 2 * budget:
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


def _lru_complex_kernel(
    x_re_ref,
    x_im_ref,
    a_re_ref,
    a_im_ref,
    h0_re_ref,
    h0_im_ref,
    y_re_ref,
    y_im_ref,
    h_last_re_ref,
    h_last_im_ref,
    ap_re_ref,
    ap_im_ref,
    ap_last_re_ref,
    ap_last_im_ref,
    h_re_scr,
    h_im_scr,
    p_re_scr,
    p_im_scr,
    *,
    seq_tile: int,
    descending: bool,
    premultiply: bool,
    out_dtype,
):
  """Complex-valued tile step: ``h_t = a_t * h_{t-1} + x_t`` over C = R^2.

  Mirrors :func:`_lru_kernel` with every operand split into (real, imag)
  lane blocks and the scalar multiply replaced by the 4-multiply complex
  product. Matches the reference's complex kernel capability
  (``/root/reference/recurrentgemma/jax/pallas.py:475-623``), which threads
  ``complex_lib.Complex`` operands through its Pallas body; here the pair
  arithmetic is written out so each component stays a plain fp32 VMEM tile.

  The backward scan of a complex recurrence is the ``premultiply`` scan with
  ``conj(a)`` (the R^2 transpose of multiply-by-``a``); the *caller* negates
  ``a_im``, so this body is direction-agnostic like the real one.
  """
  seq_index = pl.program_id(2)

  @pl.when(seq_index == 0)
  def _init():
    if h0_re_ref is None:
      h_re_scr[...] = jnp.zeros_like(h_re_scr)
      h_im_scr[...] = jnp.zeros_like(h_im_scr)
    else:
      h_re_scr[...] = h0_re_ref[...].astype(h_re_scr.dtype)
      h_im_scr[...] = h0_im_ref[...].astype(h_im_scr.dtype)
    if p_re_scr is not None:
      p_re_scr[...] = jnp.ones_like(p_re_scr)
      p_im_scr[...] = jnp.zeros_like(p_im_scr)

  def step(i, _):
    t = (seq_tile - 1 - i) if descending else i
    mr = a_re_ref[:, t].astype(jnp.float32)
    mi = a_im_ref[:, t].astype(jnp.float32)
    xr = x_re_ref[:, t].astype(jnp.float32)
    xi = x_im_ref[:, t].astype(jnp.float32)
    if premultiply:
      hr = h_re_scr[...] + xr
      hi = h_im_scr[...] + xi
      y_re_ref[:, t] = hr.astype(out_dtype)
      y_im_ref[:, t] = hi.astype(out_dtype)
      h_re_scr[...] = hr * mr - hi * mi
      h_im_scr[...] = hr * mi + hi * mr
    else:
      pr = h_re_scr[...]
      pi = h_im_scr[...]
      hr = mr * pr - mi * pi + xr
      hi = mr * pi + mi * pr + xi
      y_re_ref[:, t] = hr.astype(out_dtype)
      y_im_ref[:, t] = hi.astype(out_dtype)
      h_re_scr[...] = hr
      h_im_scr[...] = hi
    if p_re_scr is not None:
      pr = p_re_scr[...]
      pi = p_im_scr[...]
      new_pr = pr * mr - pi * mi
      new_pi = pr * mi + pi * mr
      ap_re_ref[:, t] = new_pr.astype(out_dtype)
      ap_im_ref[:, t] = new_pi.astype(out_dtype)
      p_re_scr[...] = new_pr
      p_im_scr[...] = new_pi
    return 0

  jax.lax.fori_loop(0, seq_tile, step, 0)

  h_last_re_ref[...] = h_re_scr[...]
  h_last_im_ref[...] = h_im_scr[...]
  if p_re_scr is not None:
    ap_last_re_ref[...] = p_re_scr[...]
    ap_last_im_ref[...] = p_im_scr[...]


def _lru_pallas_call(
    x: RealOrComplex,
    a: RealOrComplex,
    h0: RealOrComplex | None,
    *,
    reverse: bool,
    backprop: bool,
    compute_a_prod: bool,
):
  """Runs the tiled kernel; returns (y, h_last[, a_prod, a_prod_last]).

  Operands are reshaped ``[b, t, d] -> [b, t, d/128, 128]`` (with neutral
  padding: ``a=1, x=0`` steps — ``a=1+0i`` when complex — leave the carry
  and the cumulative product unchanged in either scan direction) so the
  per-step dynamic time index falls on an untiled dimension.

  ``Complex`` operands run the same tiling with every stream split into
  (real, imag) component blocks and the complex kernel body; outputs come
  back re-wrapped as ``Complex``.
  """
  is_complex = isinstance(x, complex_lib.Complex)
  num_components = 2 if is_complex else 1
  orig_batch, orig_seq, orig_dim = x.shape
  out_dtype = x.dtype

  dim_sublanes = _round_up(orig_dim, _LANES) // _LANES
  batch_tile, seq_tile, dim_tile = _choose_tiles(
      orig_batch, orig_seq, dim_sublanes, num_components
  )
  dim_sublanes = _round_up(dim_sublanes, dim_tile)
  padded_dim = dim_sublanes * _LANES
  padded_seq = _round_up(orig_seq, seq_tile)

  pad = ((0, 0), (0, padded_seq - orig_seq), (0, padded_dim - orig_dim))
  seq_shape4 = (orig_batch, padded_seq, dim_sublanes, _LANES)

  def prep_seq(v, pad_value):
    return jnp.pad(v, pad, constant_values=pad_value).reshape(seq_shape4)

  if is_complex:
    x_comps = [prep_seq(x.real, 0), prep_seq(x.imag, 0)]
    a_comps = [prep_seq(a.real, 1), prep_seq(a.imag, 0)]
  else:
    x_comps = [prep_seq(x, 0)]
    a_comps = [prep_seq(a, 1)]

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
  state_shape = (batch, dim_sublanes, _LANES)
  seq_struct = jax.ShapeDtypeStruct(seq_shape4, out_dtype)
  state_struct = jax.ShapeDtypeStruct(state_shape, jnp.float32)
  state_scratch = pltpu.VMEM((batch_tile, dim_tile, _LANES), jnp.float32)
  n = num_components

  in_specs = [seq_spec] * (2 * n)
  args = x_comps + a_comps
  if h0 is not None:

    def prep_state(v):
      v = jnp.pad(v, ((0, 0), (0, padded_dim - orig_dim)))
      return v.reshape(state_shape)

    h0_comps = (
        [prep_state(h0.real), prep_state(h0.imag)]
        if is_complex
        else [prep_state(h0)]
    )
    in_specs += [state_spec] * n
    args += h0_comps

  out_specs = [seq_spec] * n + [state_spec] * n
  out_shapes = [seq_struct] * n + [state_struct] * n
  scratch_shapes = [state_scratch] * n
  if compute_a_prod:
    out_specs += [seq_spec] * n + [state_spec] * n
    out_shapes += [seq_struct] * n + [state_struct] * n
    scratch_shapes += [state_scratch] * n

  def kernel(*refs):
    pos = 0

    def take(count):
      nonlocal pos
      got = refs[pos : pos + count]
      pos += count
      return got

    x_refs = take(n)
    a_refs = take(n)
    h0_refs = take(n) if h0 is not None else (None,) * n
    y_refs = take(n)
    h_last_refs = take(n)
    if compute_a_prod:
      ap_refs = take(n)
      ap_last_refs = take(n)
    else:
      ap_refs = ap_last_refs = (None,) * n
    h_scr = take(n)
    p_scr = take(n) if compute_a_prod else (None,) * n
    kwargs = dict(
        seq_tile=seq_tile,
        descending=descending,
        premultiply=backprop,
        out_dtype=out_dtype,
    )
    if is_complex:
      _lru_complex_kernel(
          *x_refs,
          *a_refs,
          *h0_refs,
          *y_refs,
          *h_last_refs,
          *ap_refs,
          *ap_last_refs,
          *h_scr,
          *p_scr,
          **kwargs,
      )
    else:
      _lru_kernel(
          x_refs[0],
          a_refs[0],
          h0_refs[0],
          y_refs[0],
          h_last_refs[0],
          ap_refs[0],
          ap_last_refs[0],
          h_scr[0],
          p_scr[0],
          **kwargs,
      )

  outputs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shapes,
      scratch_shapes=scratch_shapes,
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary"),
      ),
  )(*args)

  def crop_seq(v):
    v = v.reshape(batch, padded_seq, padded_dim)
    return v[:, :orig_seq, :orig_dim]

  def crop_state(v):
    return v.reshape(batch, padded_dim)[:, :orig_dim]

  pos = 0

  def take_out(crop):
    nonlocal pos
    comps = [crop(outputs[pos + i]) for i in range(n)]
    pos += n
    return complex_lib.Complex(*comps) if is_complex else comps[0]

  y = take_out(crop_seq)
  h_last = take_out(crop_state)
  if compute_a_prod:
    return y, h_last, take_out(crop_seq), take_out(crop_state)
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

  # The cotangent recurrence multiplies by the R^2 transpose of
  # multiply-by-``a`` — i.e. by ``conj(a)`` when complex (identity for real).
  dx, dh0, _ = _sharded_scan(
      dy,
      complex_lib.conjugate(a) if isinstance(a, complex_lib.Complex) else a,
      dh_last,
      reverse=reverse,
      backprop=True,
      seq_axis=seq_axis,
      seq_axis_index_groups=seq_axis_index_groups,
  )

  # da_t = dh_t * h_{t-1} (times conj for the pair-of-reals complex product),
  # with the corrected h0 standing in at the boundary.
  if h0 is None:
    h0 = complex_lib.zeros_like(y[:, 0])
  h0 = h0[:, None].astype(y.dtype)
  h_prev = (
      complex_lib.concatenate([y[:, 1:], h0], axis=1)
      if reverse
      else complex_lib.concatenate([h0, y[:, :-1]], axis=1)
  )
  if isinstance(h_prev, complex_lib.Complex):
    h_prev = complex_lib.conjugate(h_prev)
  da = dx * h_prev

  return dx, da, (dh0 if has_h0 else None)


_lru.defvjp(_lru_fwd, _lru_bwd)


def lru_pallas_scan(
    x: RealOrComplex,
    a: RealOrComplex,
    h0: RealOrComplex | None = None,
    reverse: bool = False,
    seq_axis: str | tuple[str, ...] | None = None,
    seq_axis_index_groups: list[list[int]] | None = None,
    **_unused_tuning_kwargs,
) -> tuple[RealOrComplex, RealOrComplex]:
  """Differentiable RG-LRU linear scan on TPU.

  Args:
    x: Inputs [batch, seq, dim] (bfloat16 or float32), real or
      ``complex_lib.Complex`` (matching the reference kernel's complex
      support, ``jax/pallas.py:475-623``).
    a: Per-step decay, same shape/dtype (and real/complex kind) as ``x``.
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
  for name, v in (("a", a), ("h0", h0)):
    if v is not None and complex_lib.is_complex(v) != complex_lib.is_complex(x):
      raise ValueError(
          f"`{name}` and `x` must both be real or both be Complex."
      )
  return _lru(x, a, h0, reverse, seq_axis, seq_axis_index_groups)


# Reference-compat alias (the reference exports both names,
# jax/pallas.py:845,915).
pallas_lru = lru_pallas_scan
