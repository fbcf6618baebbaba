"""Scan stack tests: native scans, Pallas kernel (interpret), SP correction.

Covers the reference's scan coverage (``jax/layers_test.py`` scan cases) and
closes its biggest gap: the sequence-sharded paths were untested upstream
(SURVEY §4.6); here they are checked for forward and gradient equality
against the single-shard scan on an 8-device virtual mesh.
"""

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.ops import pallas_lru
from cadence_gemma_tpu.ops import scan
from cadence_gemma_tpu.parallel import sharding


def _inputs(b=2, t=64, d=16, dtype=jnp.float32, seed=0):
  k = jax.random.PRNGKey(seed)
  x = jax.random.normal(k, (b, t, d), dtype=dtype)
  a = jax.nn.sigmoid(
      jax.random.normal(jax.random.fold_in(k, 1), (b, t, d))
  ).astype(dtype)
  h0 = jax.random.normal(jax.random.fold_in(k, 2), (b, d), dtype=jnp.float32)
  return x, a, h0


class TestNativeScans:

  @pytest.mark.parametrize("reverse", [False, True])
  @pytest.mark.parametrize("with_h0", [False, True])
  def test_linear_matches_associative(self, reverse, with_h0):
    x, a, h0 = _inputs()
    h0 = h0 if with_h0 else None
    y1, hl1 = scan.lru_linear_scan(x, a, h0, reverse=reverse)
    y2, hl2 = scan.lru_associative_scan(x, a, h0, reverse=reverse)
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    np.testing.assert_allclose(hl1, hl2, atol=1e-5)

  def test_matches_explicit_recurrence(self):
    x, a, h0 = _inputs(b=1, t=8, d=4)
    y, h_last = scan.lru_linear_scan(x, a, h0)
    h = h0[0]
    for t in range(8):
      h = a[0, t] * h + x[0, t]
      np.testing.assert_allclose(y[0, t], h, atol=1e-6)
    np.testing.assert_allclose(h_last[0], h, atol=1e-6)

  def test_a_prod(self):
    x, a, _ = _inputs(b=1, t=8, d=4)
    (_, _), (a_prod, a_prod_last) = scan.lru_linear_scan(
        x, a, None, return_a_prod=True
    )
    np.testing.assert_allclose(
        a_prod[0], jnp.cumprod(a[0], axis=0), atol=1e-6
    )
    np.testing.assert_allclose(a_prod_last[0], a_prod[0, -1], atol=1e-6)

  def test_decode_fast_path(self):
    x, a, h0 = _inputs(t=1)
    y, h_last = scan.linear_scan(x, a, h0)
    np.testing.assert_allclose(
        y[:, 0], a[:, 0] * h0 + x[:, 0], atol=1e-6
    )
    np.testing.assert_allclose(h_last, a[:, 0] * h0 + x[:, 0], atol=1e-6)

  def test_bf16_inputs_fp32_carry(self):
    x, a, h0 = _inputs(dtype=jnp.bfloat16)
    y, h_last = scan.lru_linear_scan(x, a, h0)
    assert y.dtype == jnp.bfloat16
    assert h_last.dtype == jnp.float32


class TestPallasInterpret:
  """The Pallas kernel vs the native scan, on CPU via interpret mode."""

  @pytest.mark.parametrize("reverse", [False, True])
  @pytest.mark.parametrize("shape", [(2, 64, 16), (1, 40, 200), (3, 17, 128)])
  def test_forward(self, reverse, shape):
    x, a, h0 = _inputs(*shape)
    y_ref, h_ref = scan.lru_linear_scan(x, a, h0, reverse=reverse)
    with pltpu.force_tpu_interpret_mode():
      y, h_last = pallas_lru.lru_pallas_scan(x, a, h0, reverse=reverse)
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    np.testing.assert_allclose(h_last, h_ref, atol=1e-5)

  @pytest.mark.parametrize("with_h0", [False, True])
  def test_gradients(self, with_h0):
    x, a, h0 = _inputs(b=1, t=32, d=16)
    h0 = h0 if with_h0 else None

    def loss(fn, x, a, h0):
      y, h = fn(x, a, h0)
      return jnp.sum(y**2) + jnp.sum(h**2)

    with pltpu.force_tpu_interpret_mode():
      argnums = (0, 1, 2) if with_h0 else (0, 1)
      gp = jax.grad(lambda *args: loss(pallas_lru.lru_pallas_scan, *args, *(
          () if with_h0 else (None,))), argnums=argnums)(
              *((x, a, h0) if with_h0 else (x, a)))
      gn = jax.grad(lambda *args: loss(scan.lru_linear_scan, *args, *(
          () if with_h0 else (None,))), argnums=argnums)(
              *((x, a, h0) if with_h0 else (x, a)))
    for u, v in zip(gp, gn):
      np.testing.assert_allclose(u, v, atol=1e-4)


class TestShardedScan:
  """Sequence-parallel scan == single-shard scan, values and gradients."""

  @pytest.fixture
  def spec(self):
    mesh = sharding.make_mesh((4,), ("sequence",), jax.devices()[:4])
    return sharding.ShardingSpec(mesh=mesh, sequence_axis_name="sequence")

  @pytest.mark.parametrize(
      "scan_type",
      [common.ScanType.LINEAR_NATIVE, common.ScanType.ASSOCIATIVE_NATIVE],
  )
  def test_forward(self, spec, scan_type):
    x, a, h0 = _inputs()
    y_ref, h_ref = scan.lru_linear_scan(x, a, h0)
    y, h_last = scan.linear_scan(
        x, a, h0, scan_type=scan_type, sharding_spec=spec
    )
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    np.testing.assert_allclose(h_last, h_ref, atol=1e-5)

  def test_gradients(self, spec):
    x, a, h0 = _inputs()

    def loss_sharded(x, a, h0):
      y, h = scan.linear_scan(
          x, a, h0,
          scan_type=common.ScanType.LINEAR_NATIVE,
          sharding_spec=spec,
      )
      return jnp.sum(y**2) + jnp.sum(h**2)

    def loss_single(x, a, h0):
      y, h = scan.lru_linear_scan(x, a, h0)
      return jnp.sum(y**2) + jnp.sum(h**2)

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(x, a, h0)
    gu = jax.grad(loss_single, argnums=(0, 1, 2))(x, a, h0)
    for u, v in zip(gs, gu):
      np.testing.assert_allclose(u, v, atol=1e-4)

  def test_pallas_sharded_interpret(self, spec):
    x, a, h0 = _inputs(t=64)
    y_ref, h_ref = scan.lru_linear_scan(x, a, h0)
    with pltpu.force_tpu_interpret_mode():
      y, h_last = scan.linear_scan(
          x, a, h0,
          scan_type=common.ScanType.LINEAR_PALLAS,
          sharding_spec=spec,
      )
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    np.testing.assert_allclose(h_last, h_ref, atol=1e-5)


class TestPmapRegime:
  """ShardingSpec without a mesh: axis names live under pmap."""

  def test_pmap_sharded_scan_matches(self):
    n_dev = min(4, len(jax.devices()))
    b, t, d = 2, 16 * n_dev, 8
    x, a, h0 = _inputs(b, t, d)
    y_ref, h_ref = scan.lru_linear_scan(x, a, h0)

    spec = sharding.ShardingSpec(mesh=None, sequence_axis_name="seq")

    def shard_fn(x_s, a_s, h0_s):
      return scan.linear_scan(
          x_s, a_s, h0_s,
          scan_type=common.ScanType.LINEAR_NATIVE,
          sharding_spec=spec,
      )

    # Split time across devices: [n_dev, b, t/n_dev, d].
    xs = jnp.stack(jnp.split(x, n_dev, axis=1))
    was = jnp.stack(jnp.split(a, n_dev, axis=1))
    h0s = jnp.broadcast_to(h0, (n_dev, *h0.shape))
    y_sh, h_sh = jax.pmap(shard_fn, axis_name="seq")(xs, was, h0s)
    y_cat = jnp.concatenate(list(y_sh), axis=1)
    np.testing.assert_allclose(y_cat, y_ref, atol=1e-5)
    np.testing.assert_allclose(h_sh[-1], h_ref, atol=1e-5)


class TestComplexScan:

  def test_complex_linear_scan(self):
    from cadence_gemma_tpu import complex_lib
    k = jax.random.PRNGKey(0)
    b, t, d = 1, 16, 4
    xr = jax.random.normal(k, (b, t, d))
    xi = jax.random.normal(jax.random.fold_in(k, 1), (b, t, d))
    ar = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 2), (b, t, d)))
    ai = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (b, t, d))
    x = complex_lib.Complex(xr, xi)
    a = complex_lib.Complex(ar, ai)
    y, h_last = scan.lru_linear_scan(x, a)
    # Compare against native complex64 arithmetic.
    xc = xr + 1j * xi
    ac = ar + 1j * ai
    h = jnp.zeros((b, d), jnp.complex64)
    for i in range(t):
      h = ac[:, i] * h + xc[:, i]
      np.testing.assert_allclose(y.real[:, i], h.real, atol=1e-5)
      np.testing.assert_allclose(y.imag[:, i], h.imag, atol=1e-5)

  def _complex_inputs(self, b=2, t=16, d=4):
    from cadence_gemma_tpu import complex_lib
    k = jax.random.PRNGKey(0)
    xr = jax.random.normal(k, (b, t, d))
    xi = jax.random.normal(jax.random.fold_in(k, 1), (b, t, d))
    ar = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 2), (b, t, d)))
    ai = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (b, t, d))
    return complex_lib.Complex(xr, xi), complex_lib.Complex(ar, ai)

  @pytest.mark.parametrize("reverse", [False, True])
  @pytest.mark.parametrize("with_h0", [False, True])
  def test_pallas_complex_forward(self, reverse, with_h0):
    """Complex operands run the Pallas kernel itself (interpret mode) and
    match the native complex scan — the reference's complex-kernel
    capability (``jax/pallas.py:475-623``)."""
    from cadence_gemma_tpu import complex_lib

    x, a = self._complex_inputs(b=2, t=40, d=200)
    k = jax.random.PRNGKey(7)
    h0 = None
    if with_h0:
      h0 = complex_lib.Complex(
          jax.random.normal(k, (2, 200)),
          jax.random.normal(jax.random.fold_in(k, 1), (2, 200)),
      )
    y_ref, h_ref = scan.lru_linear_scan(x, a, h0, reverse=reverse)
    with pltpu.force_tpu_interpret_mode():
      y, h_last = pallas_lru.lru_pallas_scan(x, a, h0, reverse=reverse)
    np.testing.assert_allclose(y.real, y_ref.real, atol=1e-5)
    np.testing.assert_allclose(y.imag, y_ref.imag, atol=1e-5)
    np.testing.assert_allclose(h_last.real, h_ref.real, atol=1e-5)
    np.testing.assert_allclose(h_last.imag, h_ref.imag, atol=1e-5)

  @pytest.mark.parametrize("with_h0", [False, True])
  def test_pallas_complex_gradients(self, with_h0):
    """Complex Pallas VJP (premultiply scan with conj(a), da = dx*conj(h))
    == autodiff through the native complex scan."""
    from cadence_gemma_tpu import complex_lib

    x, a = self._complex_inputs(b=1, t=32, d=16)
    k = jax.random.PRNGKey(9)
    h0 = None
    if with_h0:
      h0 = complex_lib.Complex(
          jax.random.normal(k, (1, 16)),
          jax.random.normal(jax.random.fold_in(k, 1), (1, 16)),
      )

    def loss(fn, x, a, h0):
      y, h = fn(x, a, h0)
      return (
          jnp.sum(y.real**2 + y.imag**2) + jnp.sum(h.real**2 + h.imag**2)
      )

    argnums = (0, 1, 2) if with_h0 else (0, 1)
    with pltpu.force_tpu_interpret_mode():
      gp = jax.grad(
          lambda *args: loss(pallas_lru.lru_pallas_scan, *args,
                             *(() if with_h0 else (None,))),
          argnums=argnums,
      )(*((x, a, h0) if with_h0 else (x, a)))
    gn = jax.grad(
        lambda *args: loss(scan.lru_linear_scan, *args,
                           *(() if with_h0 else (None,))),
        argnums=argnums,
    )(*((x, a, h0) if with_h0 else (x, a)))
    for u, v in zip(gp, gn):
      np.testing.assert_allclose(u.real, v.real, atol=1e-4)
      np.testing.assert_allclose(u.imag, v.imag, atol=1e-4)

  def test_complex_sequence_sharded_matches_single_shard(self):
    """Complex scan under shard_map (8-way sequence sharding + the
    cross-shard correction) == the unsharded complex scan."""
    from cadence_gemma_tpu.parallel import sharding as sharding_lib

    x, a = self._complex_inputs(b=1, t=32, d=4)
    want_y, want_h = scan.single_shard_rnn_scan(
        x, a, scan_type=common.ScanType.LINEAR_NATIVE
    )
    mesh = sharding_lib.make_mesh((8,), ("sequence",), jax.devices()[:8])
    spec = sharding_lib.ShardingSpec(
        mesh=mesh, sequence_axis_name="sequence"
    )
    got_y, got_h = jax.jit(
        lambda x, a: scan.linear_scan(
            x=x, a=a, scan_type=common.ScanType.LINEAR_NATIVE,
            sharding_spec=spec,
        )
    )(x, a)
    np.testing.assert_allclose(got_y.real, want_y.real, atol=1e-5)
    np.testing.assert_allclose(got_y.imag, want_y.imag, atol=1e-5)
    np.testing.assert_allclose(got_h.real, want_h.real, atol=1e-5)
    np.testing.assert_allclose(got_h.imag, want_h.imag, atol=1e-5)

  def test_complex_pallas_sharded_interpret(self):
    """Complex Pallas kernel under 4-way sequence sharding (complex a_prod
    through the cross-shard correction) == the unsharded native scan."""
    from cadence_gemma_tpu.parallel import sharding as sharding_lib

    x, a = self._complex_inputs(b=1, t=32, d=4)
    want_y, want_h = scan.single_shard_rnn_scan(
        x, a, scan_type=common.ScanType.LINEAR_NATIVE
    )
    mesh = sharding_lib.make_mesh((4,), ("sequence",), jax.devices()[:4])
    spec = sharding_lib.ShardingSpec(mesh=mesh, sequence_axis_name="sequence")
    with pltpu.force_tpu_interpret_mode():
      got_y, got_h = scan.linear_scan(
          x=x, a=a, scan_type=common.ScanType.LINEAR_PALLAS,
          sharding_spec=spec,
      )
    np.testing.assert_allclose(got_y.real, want_y.real, atol=1e-5)
    np.testing.assert_allclose(got_y.imag, want_y.imag, atol=1e-5)
    np.testing.assert_allclose(got_h.real, want_h.real, atol=1e-5)
    np.testing.assert_allclose(got_h.imag, want_h.imag, atol=1e-5)
