"""Table-driven tests for the bf16-complex container.

Mirrors the reference's op coverage (``jax/complex_lib_test.py:44-291``):
forward ops vs native complex64, dtype behavior, einsum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import complex_lib


def _pair(seed=0, shape=(3, 4)):
  k = jax.random.PRNGKey(seed)
  re = jax.random.normal(k, shape)
  im = jax.random.normal(jax.random.fold_in(k, 1), shape)
  return complex_lib.Complex(re, im), re + 1j * im


class TestArithmetic:

  @pytest.mark.parametrize(
      "op",
      [
          lambda a, b: a + b,
          lambda a, b: a - b,
          lambda a, b: a * b,
          lambda a, b: a / b,
      ],
      ids=["add", "sub", "mul", "div"],
  )
  def test_binary_matches_native(self, op):
    x, xc = _pair(0)
    y, yc = _pair(1)
    got = op(x, y)
    want = op(xc, yc)
    np.testing.assert_allclose(got.real, want.real, atol=1e-5)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-5)

  def test_scalar_ops(self):
    x, xc = _pair()
    for got, want in [
        (x + 2.0, xc + 2.0),
        (2.0 - x, 2.0 - xc),
        (x * 3.0, xc * 3.0),
        (-x, -xc),
        (x / 2.0, xc / 2.0),
    ]:
      np.testing.assert_allclose(got.real, want.real, atol=1e-5)
      np.testing.assert_allclose(got.imag, want.imag, atol=1e-5)

  def test_matmul(self):
    x, xc = _pair(0, (3, 4))
    y, yc = _pair(1, (4, 5))
    got = x @ y
    want = xc @ yc
    np.testing.assert_allclose(got.real, want.real, atol=1e-4)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-4)


class TestFunctions:

  def test_exp_log_conjugate_abs(self):
    x, xc = _pair()
    e = complex_lib.exp(x)
    np.testing.assert_allclose(e.real, jnp.exp(xc).real, atol=1e-4)
    np.testing.assert_allclose(e.imag, jnp.exp(xc).imag, atol=1e-4)
    l = complex_lib.log(x)
    np.testing.assert_allclose(l.real, jnp.log(xc).real, atol=1e-5)
    np.testing.assert_allclose(l.imag, jnp.log(xc).imag, atol=1e-5)
    c = complex_lib.conjugate(x)
    np.testing.assert_allclose(c.imag, -x.imag)
    np.testing.assert_allclose(
        complex_lib.abs_squared(x), jnp.abs(xc) ** 2, atol=1e-5
    )

  def test_real_passthrough(self):
    r = jnp.array([1.0, 4.0])
    np.testing.assert_allclose(complex_lib.exp(r), jnp.exp(r))
    np.testing.assert_allclose(complex_lib.abs_squared(-r), r**2)
    assert complex_lib.ones_like(r).dtype == r.dtype

  def test_einsum(self):
    x, xc = _pair(0, (2, 3))
    y, yc = _pair(1, (3, 4))
    got = complex_lib.einsum("ij,jk->ik", x, y)
    want = jnp.einsum("ij,jk->ik", xc, yc)
    np.testing.assert_allclose(got.real, want.real, atol=1e-4)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-4)

  def test_einsum_mixed_real(self):
    x, xc = _pair(0, (2, 3))
    r = jax.random.normal(jax.random.PRNGKey(5), (3, 4))
    got = complex_lib.einsum("ij,jk->ik", x, r)
    want = jnp.einsum("ij,jk->ik", xc, r.astype(jnp.complex64))
    np.testing.assert_allclose(got.real, want.real, atol=1e-4)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-4)


class TestContainer:

  def test_bf16_components(self):
    x = complex_lib.Complex(
        jnp.ones((2, 2), jnp.bfloat16), jnp.zeros((2, 2), jnp.bfloat16)
    )
    assert x.dtype == jnp.bfloat16
    y = x * x
    assert y.dtype == jnp.bfloat16

  def test_pytree_round_trip(self):
    x, _ = _pair()
    leaves, treedef = jax.tree_util.tree_flatten(x)
    assert len(leaves) == 2
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(back.real, x.real)

  def test_shape_ops(self):
    x, _ = _pair(0, (2, 6))
    assert x.reshape(3, 4).shape == (3, 4)
    assert x[0].shape == (6,)
    assert x.astype(jnp.bfloat16).dtype == jnp.bfloat16
    assert x.ndim == 2 and x.size == 12

  def test_to_numpy(self):
    x, xc = _pair()
    np.testing.assert_allclose(x.to_numpy(), xc, atol=1e-6)

  def test_jit_through(self):
    x, xc = _pair()
    f = jax.jit(lambda v: v * v + 1.0)
    got = f(x)
    want = xc * xc + 1.0
    np.testing.assert_allclose(got.real, want.real, atol=1e-5)
