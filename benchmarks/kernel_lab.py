"""Scratch lab for tuning the RG-LRU pallas kernel on the real TPU.

Not part of the library; keeps experiments reproducible.
Run: python benchmarks/kernel_lab.py
"""
import functools
import time

import jax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np

LANES = 128


def timeit(f, *args, iters=20):
  out = jax.block_until_ready(f(*args))
  t0 = time.time()
  for _ in range(iters):
    out = f(*args)
  jax.block_until_ready(out)
  return (time.time() - t0) / iters


def make_inputs(b, t, d, dtype=jnp.bfloat16):
  x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d), dtype=dtype)
  a = jax.nn.sigmoid(
      jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
  ).astype(dtype)
  h0 = jax.random.normal(jax.random.PRNGKey(2), (b, d), dtype=jnp.float32)
  return x, a, h0


def reference(x, a, h0):
  def body(h, xs):
    x_t, a_t = xs
    h = a_t.astype(jnp.float32) * h + x_t.astype(jnp.float32)
    return h, h.astype(x.dtype)
  h_last, y = jax.vmap(lambda h0, xs: jax.lax.scan(body, h0, xs))(
      h0, (x, a)
  )
  return y, h_last


# --- Variant A: sequential loop, python-unrolled -----------------------------


def kernel_unrolled(x_ref, a_ref, h0_ref, y_ref, hl_ref, h_scr, *, st):
  @pl.when(pl.program_id(2) == 0)
  def _():
    h_scr[...] = h0_ref[...].astype(jnp.float32)

  h = h_scr[...]
  for t in range(st):
    h = a_ref[:, t].astype(jnp.float32) * h + x_ref[:, t].astype(jnp.float32)
    y_ref[:, t] = h.astype(y_ref.dtype)
  h_scr[...] = h
  hl_ref[...] = h


def run_unrolled(x, a, h0, st=128, bt=1):
  b, t, d = x.shape
  dsub = d // LANES
  x4 = x.reshape(b, t, dsub, LANES)
  a4 = a.reshape(b, t, dsub, LANES)
  h04 = h0.reshape(b, dsub, LANES)
  grid = (b // bt, 1, t // st)
  seq_spec = pl.BlockSpec((bt, st, dsub, LANES), lambda i, j, s: (i, s, j, 0),
                          memory_space=pltpu.VMEM)
  st_spec = pl.BlockSpec((bt, dsub, LANES), lambda i, j, s: (i, j, 0),
                         memory_space=pltpu.VMEM)
  y, hl = pl.pallas_call(
      functools.partial(kernel_unrolled, st=st),
      grid=grid,
      in_specs=[seq_spec, seq_spec, st_spec],
      out_specs=[seq_spec, st_spec],
      out_shape=[
          jax.ShapeDtypeStruct(x4.shape, x.dtype),
          jax.ShapeDtypeStruct(h04.shape, jnp.float32),
      ],
      scratch_shapes=[pltpu.VMEM((bt, dsub, LANES), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary")),
  )(x4, a4, h04)
  return y.reshape(b, t, d), hl.reshape(b, d)


# --- Variant B: Hillis-Steele log-scan over the sublane (time) axis ---------


def kernel_logscan(x_ref, a_ref, h0_ref, y_ref, hl_ref, h_scr, *, st):
  """Block layout (st, d): time on sublanes; log2(st) full-tile rounds."""
  @pl.when(pl.program_id(2) == 0)
  def _():
    h_scr[...] = h0_ref[...].astype(jnp.float32)

  bcast = h_scr[...]  # (1, d)
  h = x_ref[...].astype(jnp.float32)  # (st, d)
  p = a_ref[...].astype(jnp.float32)
  row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
  k = 1
  while k < st:
    h_sh = pltpu.roll(h, k, 0)
    p_sh = pltpu.roll(p, k, 0)
    valid = row >= k
    h = jnp.where(valid, h + p * h_sh, h)
    p = jnp.where(valid, p * p_sh, p)
    k *= 2
  h = h + p * bcast
  y_ref[...] = h.astype(y_ref.dtype)
  h_scr[...] = h[-1:, :]
  hl_ref[...] = h[-1:, :]


def run_logscan(x, a, h0, st=256, dl=512):
  b, t, d = x.shape
  assert b == 1, "fold batch outside"
  x2 = x[0]
  a2 = a[0]
  h02 = h0  # (1, d)
  grid = (1, d // dl, t // st)
  seq_spec = pl.BlockSpec((st, dl), lambda i, j, s: (s, j),
                          memory_space=pltpu.VMEM)
  st_spec = pl.BlockSpec((1, dl), lambda i, j, s: (0, j),
                         memory_space=pltpu.VMEM)
  y, hl = pl.pallas_call(
      functools.partial(kernel_logscan, st=st),
      grid=grid,
      in_specs=[seq_spec, seq_spec, st_spec],
      out_specs=[seq_spec, st_spec],
      out_shape=[
          jax.ShapeDtypeStruct(x2.shape, x.dtype),
          jax.ShapeDtypeStruct(h02.shape, jnp.float32),
      ],
      scratch_shapes=[pltpu.VMEM((1, dl), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary")),
  )(x2, a2, h02)
  return y[None], hl


if __name__ == "__main__":
  b, t, d = 1, 2048, 2560
  x, a, h0 = make_inputs(b, t, d)
  y_ref, h_ref = jax.jit(reference)(x, a, h0)
  gb = 3 * b * t * d * 2 / 1e9

  for st in (64, 128, 256):
    try:
      f = jax.jit(functools.partial(run_unrolled, st=st))
      y, hl = f(x, a, h0)
      err = np.abs(y.astype(np.float32) - y_ref.astype(np.float32)).max()
      dt = timeit(f, x, a, h0)
      print(f"unrolled st={st}: {dt*1e6:.0f}us ({gb/dt:.0f} GB/s) err={err}")
    except Exception as e:
      print(f"unrolled st={st}: FAIL {type(e).__name__} {str(e)[:120]}")

  for st, dl in ((256, 512), (256, 1280), (512, 640), (128, 2560), (256, 2560)):
    try:
      f = jax.jit(functools.partial(run_logscan, st=st, dl=dl))
      y, hl = f(x, a, h0)
      err = np.abs(y.astype(np.float32) - y_ref.astype(np.float32)).max()
      herr = np.abs(hl - h_ref).max()
      dt = timeit(f, x, a, h0)
      print(f"logscan st={st} dl={dl}: {dt*1e6:.0f}us ({gb/dt:.0f} GB/s) "
            f"err={err} herr={herr}")
    except Exception as e:
      print(f"logscan st={st} dl={dl}: FAIL {type(e).__name__} {str(e)[:120]}")
