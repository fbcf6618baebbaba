"""A low-precision complex number container for JAX.

JAX's smallest complex dtype is ``complex64`` (2x float32). Complex-valued
LRU variants (e.g. the LRU of arXiv:2303.06349) only need bfloat16 precision
per component, so this module provides a pytree-compatible ``Complex``
dataclass holding separate real/imaginary arrays, together with the small set
of operations the scan stack needs.

Functional counterpart of reference ``recurrentgemma/jax/complex_lib.py``
(reference ``complex_lib.py:71-346``), reimplemented from its observable
semantics. All helpers (``zeros_like``, ``ones_like``, ``exp``, ``log``,
``conjugate``, ``abs_squared``, ``einsum``, ``concatenate``, ``where``)
transparently accept plain real ``jax.Array`` inputs as well, so callers can
be written once for both the real and complex paths.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence, TypeVar, Union

import einops
from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

RealOrComplex = TypeVar("RealOrComplex", jax.Array, "Complex")
Numeric = Union[int, float, jax.Array]


def _is_placeholder(*components: Any) -> bool:
  """True when pytree leaves are non-array placeholders (tracing machinery).

  ``shard_map`` / ``jax.eval_shape`` / pallas block-spec mapping flatten
  pytrees and temporarily rebuild them with ``object()`` sentinels or specs.
  Methods must not touch component values in that case.
  """
  return not all(
      isinstance(c, (jax.Array, jnp.ndarray)) or hasattr(c, "dtype")
      for c in components
  )


@struct.dataclass
class Complex:
  """A complex number as a pair of equally-shaped real arrays."""

  real: jax.Array
  imag: jax.Array

  # -- array protocol -------------------------------------------------------

  @property
  def dtype(self) -> jnp.dtype:
    return self.real.dtype

  @property
  def shape(self) -> tuple[int, ...]:
    return self.real.shape

  @property
  def ndim(self) -> int:
    return self.real.ndim

  @property
  def size(self) -> int:
    return self.real.size

  def astype(self, dtype: jnp.dtype | None) -> "Complex":
    if dtype is None:
      return self
    return Complex(self.real.astype(dtype), self.imag.astype(dtype))

  def reshape(self, *shape) -> "Complex":
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
      shape = tuple(shape[0])
    return Complex(self.real.reshape(shape), self.imag.reshape(shape))

  def to_numpy(self) -> jax.Array:
    """Converts to a native JAX complex array (promoting to >=float32)."""
    real = self.real.astype(jnp.float32)
    imag = self.imag.astype(jnp.float32)
    return real + 1j * imag

  # -- arithmetic -----------------------------------------------------------

  def __add__(self, other: "Complex" | Numeric) -> "Complex":
    if isinstance(other, Complex):
      return Complex(self.real + other.real, self.imag + other.imag)
    return Complex(self.real + other, self.imag)

  __radd__ = __add__

  def __neg__(self) -> "Complex":
    return Complex(-self.real, -self.imag)

  def __sub__(self, other: "Complex" | Numeric) -> "Complex":
    return self + (-other if isinstance(other, Complex) else -1 * other)

  def __rsub__(self, other: Numeric) -> "Complex":
    return (-self) + other

  def __mul__(self, other: "Complex" | Numeric) -> "Complex":
    if isinstance(other, Complex):
      return Complex(
          self.real * other.real - self.imag * other.imag,
          self.real * other.imag + self.imag * other.real,
      )
    return Complex(self.real * other, self.imag * other)

  __rmul__ = __mul__

  def __truediv__(self, other: "Complex" | Numeric) -> "Complex":
    if isinstance(other, Complex):
      denom = other.real * other.real + other.imag * other.imag
      return Complex(
          (self.real * other.real + self.imag * other.imag) / denom,
          (self.imag * other.real - self.real * other.imag) / denom,
      )
    return Complex(self.real / other, self.imag / other)

  def __matmul__(self, other: "Complex" | jax.Array) -> "Complex":
    if isinstance(other, Complex):
      return Complex(
          self.real @ other.real - self.imag @ other.imag,
          self.real @ other.imag + self.imag @ other.real,
      )
    return Complex(self.real @ other, self.imag @ other)

  def __getitem__(self, key: Any) -> "Complex":
    if _is_placeholder(self.real, self.imag):
      # During pytree-spec manipulation components may be placeholders
      # (e.g. BlockSpecs); index them without validation.
      return Complex(self.real[key], self.imag[key])
    return Complex(self.real[key], self.imag[key])

  def __eq__(self, other: Any) -> jax.Array:  # type: ignore[override]
    if isinstance(other, Complex):
      return jnp.logical_and(self.real == other.real, self.imag == other.imag)
    return jnp.logical_and(self.real == other, self.imag == 0)

  def __hash__(self):
    return id(self)


# ---------------------------------------------------------------------------
# Generic helpers over real-or-complex values.
# ---------------------------------------------------------------------------


def is_complex(x: Any) -> bool:
  return isinstance(x, Complex)


def to_custom_complex(x: jax.Array | Complex) -> Complex:
  """Wraps a real or native-complex array into a ``Complex``."""
  if isinstance(x, Complex):
    return x
  if jnp.iscomplexobj(x):
    return Complex(jnp.real(x), jnp.imag(x))
  return Complex(x, jnp.zeros_like(x))


def zeros_like(x: RealOrComplex, dtype: jnp.dtype | None = None):
  if isinstance(x, Complex):
    return Complex(
        jnp.zeros_like(x.real, dtype=dtype), jnp.zeros_like(x.imag, dtype=dtype)
    )
  return jnp.zeros_like(x, dtype=dtype)


def ones_like(x: RealOrComplex, dtype: jnp.dtype | None = None):
  if isinstance(x, Complex):
    return Complex(
        jnp.ones_like(x.real, dtype=dtype), jnp.zeros_like(x.imag, dtype=dtype)
    )
  return jnp.ones_like(x, dtype=dtype)


def exp(x: RealOrComplex) -> RealOrComplex:
  """exp for real arrays; exp(a+bi) = e^a (cos b + i sin b) for Complex."""
  if isinstance(x, Complex):
    mag = jnp.exp(x.real)
    return Complex(mag * jnp.cos(x.imag), mag * jnp.sin(x.imag))
  return jnp.exp(x)


def log(x: RealOrComplex) -> RealOrComplex:
  """log for real arrays; principal branch for Complex."""
  if isinstance(x, Complex):
    return Complex(
        0.5 * jnp.log(x.real**2 + x.imag**2), jnp.arctan2(x.imag, x.real)
    )
  return jnp.log(x)


def conjugate(x: RealOrComplex) -> RealOrComplex:
  if isinstance(x, Complex):
    return Complex(x.real, -x.imag)
  return jnp.conjugate(x)


def abs_squared(x: RealOrComplex) -> jax.Array:
  if isinstance(x, Complex):
    return x.real**2 + x.imag**2
  return jnp.square(jnp.abs(x))


def real_part(x: RealOrComplex) -> jax.Array:
  return x.real if isinstance(x, Complex) else x


def concatenate(xs: Sequence[RealOrComplex], axis: int = 0):
  if any(isinstance(x, Complex) for x in xs):
    xs = [to_custom_complex(x) for x in xs]
    return Complex(
        jnp.concatenate([x.real for x in xs], axis=axis),
        jnp.concatenate([x.imag for x in xs], axis=axis),
    )
  return jnp.concatenate(xs, axis=axis)


def where(cond: jax.Array, x: RealOrComplex, y: RealOrComplex):
  if isinstance(x, Complex) or isinstance(y, Complex):
    x, y = to_custom_complex(x), to_custom_complex(y)
    return Complex(
        jnp.where(cond, x.real, y.real), jnp.where(cond, x.imag, y.imag)
    )
  return jnp.where(cond, x, y)


def einsum(eqn: str, *args: jax.Array | Complex) -> jax.Array | Complex:
  """einsum over real-or-complex operands.

  Supported (matching reference ``complex_lib.py:319-346`` capability):
    * no ``Complex`` operand: plain ``jnp.einsum`` (any arity);
    * exactly one ``Complex`` operand among any number of real ones:
      contraction is linear, so it distributes componentwise;
    * exactly two operands where at least one is ``Complex``: full
      complex product (rr - ii, ri + ir).
  """
  n_complex = sum(isinstance(a, Complex) for a in args)
  if n_complex == 0:
    return jnp.einsum(eqn, *args)
  if n_complex == 1 and len(args) != 2:
    reals = [a.real if isinstance(a, Complex) else a for a in args]
    imags = [a.imag if isinstance(a, Complex) else a for a in args]
    return Complex(jnp.einsum(eqn, *reals), jnp.einsum(eqn, *imags))
  if len(args) != 2:
    raise NotImplementedError(
        "Complex einsum supports two operands, or one Complex among reals."
    )
  a, b = (to_custom_complex(x) for x in args)
  return Complex(
      jnp.einsum(eqn, a.real, b.real) - jnp.einsum(eqn, a.imag, b.imag),
      jnp.einsum(eqn, a.real, b.imag) + jnp.einsum(eqn, a.imag, b.real),
  )


# ---------------------------------------------------------------------------
# Componentwise lifting of structural functions.
# ---------------------------------------------------------------------------
#
# Shape-manipulation functions (reshape, transpose, pad, ...) and other maps
# that are *linear over the real/imag decomposition* extend to ``Complex`` by
# applying them to each component. The reference exposes this via a
# string-dispatch helper (``_treat_method``, reference ``complex_lib.py:
# 217-288``); here the same capability is a generic combinator so any such
# function can be lifted, not only a hard-coded name table.


def _has_complex(x: Any) -> bool:
  return isinstance(x, Complex) or (
      isinstance(x, (list, tuple)) and any(isinstance(e, Complex) for e in x)
  )


def _component(x: Any, part: str) -> Any:
  """Extracts one component from Complex values / sequences thereof.

  Sequences with no ``Complex`` entry (e.g. split indices, pad configs)
  pass through untouched.
  """
  if isinstance(x, Complex):
    return getattr(x, part)
  if _has_complex(x):
    return type(x)(getattr(to_custom_complex(e), part) for e in x)
  return x


def _rebuild(real_out: Any, imag_out: Any) -> Any:
  """Zips componentwise outputs back into Complex (lists stay lists)."""
  if isinstance(real_out, (list, tuple)):
    return type(real_out)(
        _rebuild(r, i) for r, i in zip(real_out, imag_out)
    )
  return Complex(real_out, imag_out)


def lift(fn: Callable[..., Any]) -> Callable[..., Any]:
  """Lifts a structural function to accept ``Complex`` operands.

  The lifted function applies ``fn`` separately to the real and imaginary
  components of every ``Complex`` argument (or sequence containing one);
  non-complex arguments (axes, shapes, real arrays in mixed sequences are
  promoted with a zero imaginary part) are forwarded unchanged. Valid only
  for functions satisfying ``fn(a + bi) == fn(a) + fn(b) i`` — i.e. shape
  manipulation and other real-linear maps, NOT multiplicative ops.

  With no ``Complex`` anywhere, the call passes straight through, so lifted
  functions can be used unconditionally on real arrays too.
  """

  @functools.wraps(fn)
  def wrapped(*args: Any, **kwargs: Any) -> Any:
    if not any(_has_complex(a) for a in args) and not any(
        _has_complex(v) for v in kwargs.values()
    ):
      return fn(*args, **kwargs)

    def operand(x, part):
      if isinstance(x, Complex) or _has_complex(x):
        return _component(x, part)
      if part == "imag":
        # A bare real operand promotes with a ZERO imaginary part —
        # reusing it in the imaginary call would corrupt that component
        # (add(cx, x) must be Complex(r + x, i), pad(cx, 1.0, ...) must
        # pad the imaginary part with 0). Ints/shapes/axes pass through:
        # integer args are treated as STRUCTURAL parameters (axes, split
        # counts) — pass data operands as floats or arrays.
        if isinstance(x, (jax.Array, np.ndarray)):
          return jnp.zeros_like(x)
        if isinstance(x, float):
          return 0.0
      return x

    real_out = fn(
        *(operand(a, "real") for a in args),
        **{k: operand(v, "real") for k, v in kwargs.items()},
    )
    imag_out = fn(
        *(operand(a, "imag") for a in args),
        **{k: operand(v, "imag") for k, v in kwargs.items()},
    )
    return _rebuild(real_out, imag_out)

  return wrapped


# The same function table the reference exposes (``complex_lib.py:260-280``).
broadcast_to = lift(jnp.broadcast_to)
expand_dims = lift(jnp.expand_dims)
flip = lift(jnp.flip)
reshape = lift(jnp.reshape)
split = lift(jnp.split)
squeeze = lift(jnp.squeeze)
stack = lift(jnp.stack)
tile = lift(jnp.tile)
transpose = lift(jnp.transpose)
add = lift(jax.lax.add)  # addition is componentwise, so lift() is exact
pad = lift(jax.lax.pad)
slice_in_dim = lift(jax.lax.slice_in_dim)
rearrange = lift(einops.rearrange)
repeat = lift(einops.repeat)
