"""On-hardware numerics check for the Pallas kernels.

Interpret-mode tests (tests/) validate kernel *logic* on CPU; this script
validates the *compiled Mosaic kernels on the real TPU* against the native
XLA paths — tiling, layout, and dtype bugs only show up here. Run directly
(``python verify_kernels.py``) or via bench.py, which merges the result
into its JSON line as ``kernel_numerics_ok``.

Checks (shapes chosen to exercise real tiling: multiple 128-tiles, fp32
carries, bf16 matmul inputs):
  * RG-LRU Pallas scan fwd vs ``jax.lax.scan`` (native), fp32 and bf16.
  * RG-LRU backward (custom VJP kernels) vs autodiff of the native scan.
  * Flash window attention fwd vs the einsum reference.
  * Flash attention backward (dq/dkv kernels) vs autodiff of the einsum.

All comparisons fetch results to the host (``block_until_ready`` is a no-op
on the relay backend) and report per-check max abs error.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def _get(x):
  return np.asarray(jax.device_get(x))


def check_lru(dtype, t=512, d=2560, tol=None):
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.ops import scan as scan_lib

  key = jax.random.PRNGKey(0)
  x = (0.5 * jax.random.normal(key, (1, t, d))).astype(dtype)
  log_a = -0.1 - 0.4 * jax.random.uniform(jax.random.fold_in(key, 1),
                                          (1, t, d))
  a = jnp.exp(log_a).astype(dtype)
  h0 = jax.random.normal(jax.random.fold_in(key, 2), (1, d), jnp.float32)

  def run(scan_type):
    def f(x, a, h0):
      y, h = scan_lib.linear_scan(x=x, a=a, h0=h0, scan_type=scan_type)
      return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(h ** 2)

    val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(x, a, h0)
    y, _ = jax.jit(
        lambda x, a, h0: scan_lib.linear_scan(
            x=x, a=a, h0=h0, scan_type=scan_type
        )
    )(x, a, h0)
    return _get(y), _get(val), [_get(g) for g in grads]

  y_k, val_k, g_k = run(common.ScanType.LINEAR_PALLAS)
  y_n, val_n, g_n = run(common.ScanType.LINEAR_NATIVE)

  tol = tol or (2e-5 if dtype == jnp.float32 else 2e-2)
  errs = [np.abs(y_k.astype(np.float32) - y_n.astype(np.float32)).max()]
  errs += [
      np.abs(a.astype(np.float32) - b.astype(np.float32)).max()
      / max(np.abs(b.astype(np.float32)).max(), 1e-6)
      for a, b in zip(g_k, g_n)
  ]
  ok = all(e < tol for e in errs) and np.isfinite(val_k)
  return ok, max(errs)


def check_lru_complex(t=512, d=1280, tol=2e-5):
  """Complex Pallas LRU fwd+bwd vs the native complex scan, on hardware."""
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu import complex_lib
  from cadence_gemma_tpu.ops import scan as scan_lib

  key = jax.random.PRNGKey(0)

  def nrm(i, shape):
    return jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)

  x = complex_lib.Complex(0.5 * nrm(0, (1, t, d)), 0.5 * nrm(1, (1, t, d)))
  # |a| < 1 keeps the recurrence stable: magnitude from a sigmoid, small
  # imaginary rotation.
  mag = jax.nn.sigmoid(nrm(2, (1, t, d))) * 0.95
  ang = 0.2 * nrm(3, (1, t, d))
  a = complex_lib.Complex(mag * jnp.cos(ang), mag * jnp.sin(ang))
  h0 = complex_lib.Complex(nrm(4, (1, d)), nrm(5, (1, d)))

  def run(scan_type):
    def f(x, a, h0):
      y, h = scan_lib.linear_scan(x=x, a=a, h0=h0, scan_type=scan_type)
      return (jnp.sum(y.real**2 + y.imag**2)
              + jnp.sum(h.real**2 + h.imag**2))

    val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(x, a, h0)
    leaves = jax.tree_util.tree_leaves(grads)
    return _get(val), [_get(g) for g in leaves]

  val_k, g_k = run(common.ScanType.LINEAR_PALLAS)
  val_n, g_n = run(common.ScanType.LINEAR_NATIVE)

  errs = [np.abs(val_k - val_n) / max(abs(val_n), 1e-6)]
  errs += [
      np.abs(u - v).max() / max(np.abs(v).max(), 1e-6)
      for u, v in zip(g_k, g_n)
  ]
  ok = all(e < tol for e in errs) and np.isfinite(val_k)
  return ok, max(errs)


def check_flash_attention(t=1024, window=256, heads=2, head_dim=128):
  """Flash fwd + bwd vs einsum autodiff, at float32 matmul precision.

  Pinned precision isolates *kernel* correctness: at the TPU's default
  precision, fp32 matmuls run as bf16 MXU passes and the two formulations
  round differently (~7e-3 rel on gradients, measured) even when both are
  individually correct; at float32 precision they agree to ~1e-4.
  """
  from cadence_gemma_tpu.ops import pallas_attention as fa

  key = jax.random.PRNGKey(3)
  q = jax.random.normal(key, (1, t, heads, head_dim), jnp.float32)
  k = jax.random.normal(jax.random.fold_in(key, 1), (1, t, 1, head_dim),
                        jnp.float32)
  v = jax.random.normal(jax.random.fold_in(key, 2), (1, t, 1, head_dim),
                        jnp.float32)
  seg = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (1, 1))

  def loss(fn):
    def f(q, k, v):
      return jnp.sum(fn(q, k, v, seg, window).astype(jnp.float32) ** 2)
    return f

  with jax.default_matmul_precision("float32"):
    out_k = _get(jax.jit(
        lambda q, k, v: fa.flash_window_attention(q, k, v, seg, window)
    )(q, k, v))
    out_n = _get(jax.jit(
        lambda q, k, v: fa._reference_attention(q, k, v, seg, window)
    )(q, k, v))
    g_k = jax.jit(jax.grad(loss(fa.flash_window_attention),
                           argnums=(0, 1, 2)))(q, k, v)
    g_n = jax.jit(jax.grad(loss(fa._reference_attention),
                           argnums=(0, 1, 2)))(q, k, v)

  errs = [np.abs(out_k - out_n).max()]
  for a, b in zip(g_k, g_n):
    a, b = _get(a), _get(b)
    errs.append(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))
  ok = all(e < 5e-4 for e in errs)
  return ok, max(errs)


def check_flash_mha(t=729, heads=16, head_dim=72):
  """Bidirectional MHA kernel (ViT towers) vs the einsum reference.

  729 tokens / head_dim 72 are the real SigLIP shapes — non-multiples of
  the 128 tiles, so internal padding + key masking are exercised.
  """
  from cadence_gemma_tpu.ops import pallas_attention as fa

  key = jax.random.PRNGKey(5)
  shape = (1, t, heads, head_dim)
  q = jax.random.normal(key, shape, jnp.float32)
  k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
  v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.float32)

  with jax.default_matmul_precision("float32"):
    out_k = _get(jax.jit(fa.flash_mha_attention)(q, k, v))
    out_n = _get(jax.jit(fa._reference_mha)(q, k, v))
  err = np.abs(out_k - out_n).max()
  return err < 5e-4, err


def run() -> dict:
  """Runs all checks; returns {'kernel_numerics_ok': bool, ...details}."""
  results = {}
  checks = [
      ("lru_fp32", lambda: check_lru(jnp.float32)),
      ("lru_bf16", lambda: check_lru(jnp.bfloat16)),
      ("lru_complex", check_lru_complex),
      ("flash_attention", check_flash_attention),
      ("flash_mha", check_flash_mha),
  ]
  all_ok = True
  for name, fn in checks:
    try:
      ok, err = fn()
      results[f"{name}_max_err"] = float(f"{err:.3e}")
    except Exception as e:  # compile/runtime failure = hard fail
      ok, results[f"{name}_error"] = False, repr(e)[:200]
    print(f"[verify_kernels] {name}: {'OK' if ok else 'FAIL'} "
          f"({results.get(f'{name}_max_err', 'exception')})",
          file=sys.stderr)
    all_ok &= ok
  results["kernel_numerics_ok"] = bool(all_ok)
  return results


if __name__ == "__main__":
  import json

  print(json.dumps(run()))
