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


class TestLiftedStructuralOps:
  """The componentwise function table (reference ``complex_lib.py:217-288``).

  Every lifted op must match the same jnp op on a native complex64 array,
  and pass straight through on real inputs.
  """

  @pytest.mark.parametrize(
      "ours, native",
      [
          (lambda x: complex_lib.reshape(x, (4, 3)),
           lambda x: jnp.reshape(x, (4, 3))),
          (lambda x: complex_lib.transpose(x),
           lambda x: jnp.transpose(x)),
          (lambda x: complex_lib.flip(x, axis=1),
           lambda x: jnp.flip(x, axis=1)),
          (lambda x: complex_lib.expand_dims(x, 0),
           lambda x: jnp.expand_dims(x, 0)),
          (lambda x: complex_lib.tile(x, (2, 1)),
           lambda x: jnp.tile(x, (2, 1))),
          (lambda x: complex_lib.broadcast_to(x, (5, 3, 4)),
           lambda x: jnp.broadcast_to(x, (5, 3, 4))),
          (lambda x: complex_lib.squeeze(
              complex_lib.expand_dims(x, 0), axis=0),
           lambda x: x),
          (lambda x: complex_lib.slice_in_dim(x, 1, 3, axis=1),
           lambda x: jax.lax.slice_in_dim(x, 1, 3, axis=1)),
          (lambda x: complex_lib.rearrange(x, "a b -> b a"),
           lambda x: jnp.transpose(x)),
          (lambda x: complex_lib.repeat(x, "a b -> a b r", r=2),
           lambda x: jnp.tile(x[..., None], (1, 1, 2))),
      ],
      ids=["reshape", "transpose", "flip", "expand_dims", "tile",
           "broadcast_to", "squeeze", "slice_in_dim", "rearrange",
           "repeat"],
  )
  def test_unary_matches_native(self, ours, native):
    x, xc = _pair()
    got, want = ours(x), native(xc)
    np.testing.assert_allclose(got.real, want.real, atol=1e-6)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-6)

  def test_stack_and_split(self):
    x, xc = _pair(0)
    y, yc = _pair(1)
    s = complex_lib.stack([x, y], axis=0)
    want = jnp.stack([xc, yc], axis=0)
    np.testing.assert_allclose(s.real, want.real, atol=1e-6)
    np.testing.assert_allclose(s.imag, want.imag, atol=1e-6)
    parts = complex_lib.split(s, 2, axis=0)
    assert len(parts) == 2
    for p, w in zip(parts, jnp.split(want, 2, axis=0)):
      assert isinstance(p, complex_lib.Complex)
      np.testing.assert_allclose(p.real, w.real, atol=1e-6)
      np.testing.assert_allclose(p.imag, w.imag, atol=1e-6)

  def test_split_with_index_list(self):
    # Integer index lists must not be mistaken for component sequences.
    x, xc = _pair(0, (3, 8))
    parts = complex_lib.split(x, [2, 5], axis=1)
    for p, w in zip(parts, jnp.split(xc, [2, 5], axis=1)):
      np.testing.assert_allclose(p.real, w.real, atol=1e-6)
      np.testing.assert_allclose(p.imag, w.imag, atol=1e-6)

  def test_pad_and_add(self):
    x, xc = _pair()
    got = complex_lib.pad(x, jnp.float32(0), [(1, 1, 0), (0, 0, 0)])
    want = jnp.pad(xc, [(1, 1), (0, 0)])
    np.testing.assert_allclose(got.real, want.real, atol=1e-6)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-6)
    y, yc = _pair(1)
    s = complex_lib.add(x, y)
    np.testing.assert_allclose(s.real, (xc + yc).real, atol=1e-6)

  def test_stack_mixed_real_entries(self):
    x, xc = _pair(0)
    r = jax.random.normal(jax.random.PRNGKey(9), x.shape)
    s = complex_lib.stack([x, r], axis=0)
    want = jnp.stack([xc, r.astype(jnp.complex64)], axis=0)
    np.testing.assert_allclose(s.real, want.real, atol=1e-6)
    np.testing.assert_allclose(s.imag, want.imag, atol=1e-6)

  def test_real_passthrough(self):
    r = jnp.arange(12.0).reshape(3, 4)
    out = complex_lib.reshape(r, (4, 3))
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(out, r.reshape(4, 3))
    parts = complex_lib.split(r, 2, axis=1)
    assert all(isinstance(p, jax.Array) for p in parts)

  def test_lift_custom_function(self):
    x, xc = _pair()
    roll2 = complex_lib.lift(lambda v: jnp.roll(v, 2, axis=1))
    got, want = roll2(x), jnp.roll(xc, 2, axis=1)
    np.testing.assert_allclose(got.real, want.real, atol=1e-6)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-6)

  def test_einsum_one_complex_three_operands(self):
    x, xc = _pair(0, (2, 3))
    a = jax.random.normal(jax.random.PRNGKey(3), (3, 4))
    b = jax.random.normal(jax.random.PRNGKey(4), (4, 5))
    got = complex_lib.einsum("ij,jk,kl->il", x, a, b)
    want = jnp.einsum(
        "ij,jk,kl->il", xc, a.astype(jnp.complex64), b.astype(jnp.complex64)
    )
    np.testing.assert_allclose(got.real, want.real, atol=1e-4)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-4)


class TestLiftMixedOperands:
  """Bare real operands promote with a ZERO imaginary part."""

  def test_add_complex_plus_real(self):
    cx = complex_lib.Complex(jnp.ones((2, 3)), 2 * jnp.ones((2, 3)))
    x = 5 * jnp.ones((2, 3))
    out = complex_lib.add(cx, x)
    np.testing.assert_allclose(np.asarray(out.real), 6.0)
    np.testing.assert_allclose(np.asarray(out.imag), 2.0)  # NOT 7

  def test_pad_value_pads_imag_with_zero(self):
    cx = complex_lib.Complex(jnp.ones((2,)), 3 * jnp.ones((2,)))
    out = complex_lib.pad(cx, 1.0, [(1, 1, 0)])
    np.testing.assert_allclose(np.asarray(out.real), [1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(out.imag), [0, 3, 3, 0])

  def test_structural_ints_untouched(self):
    cx = complex_lib.Complex(jnp.arange(6.0).reshape(2, 3), jnp.ones((2, 3)))
    parts = complex_lib.split(cx, 3, 1)
    assert len(parts) == 3
    out = complex_lib.expand_dims(cx, 1)
    assert out.real.shape == (2, 1, 3)
