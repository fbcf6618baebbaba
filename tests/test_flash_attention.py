"""Windowed flash-attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
import numpy as np
import pytest

from cadence_gemma_tpu.models import modules
from cadence_gemma_tpu.ops import pallas_attention as fa


def _inputs(b, t, n, h, seed=0, dtype=jnp.float32, docs=False):
  k = jax.random.PRNGKey(seed)
  q = jax.random.normal(k, (b, t, n, h), dtype)
  kk = jax.random.normal(jax.random.fold_in(k, 1), (b, t, 1, h), dtype)
  v = jax.random.normal(jax.random.fold_in(k, 2), (b, t, 1, h), dtype)
  if docs:
    starts = jax.random.bernoulli(jax.random.fold_in(k, 3), 0.05, (b, t))
    starts = starts.at[:, 0].set(True)
    idx = jnp.arange(t)[None]
    doc_start = jax.lax.cummax(jnp.where(starts, idx, 0), axis=1)
    seg = (idx - doc_start).astype(jnp.int32)  # within-doc positions
  else:
    seg = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1))
  return q, kk, v, seg


class TestFlashWindowAttention:

  @pytest.mark.parametrize(
      "t,window,docs",
      [(256, 64, False), (300, 128, True), (128, 512, False)],
  )
  def test_matches_einsum(self, t, window, docs):
    q, k, v, seg = _inputs(1, t, 2, 128, docs=docs)
    ref = fa._reference_attention(q, k, v, seg, window)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_window_attention(q, k, v, seg, window)
    np.testing.assert_allclose(out, ref, atol=2e-5)

  def test_bf16(self):
    q, k, v, seg = _inputs(1, 256, 2, 128, dtype=jnp.bfloat16)
    ref = fa._reference_attention(q, k, v, seg, 64)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_window_attention(q, k, v, seg, 64)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.04
    )

  @pytest.mark.parametrize(
      "t,window,docs",
      [(128, 64, False), (256, 64, True), (300, 128, True)],
  )
  def test_gradients_match_reference(self, t, window, docs):
    """The Pallas backward (dq + dkv kernels) vs autodiff of the einsum."""
    q, k, v, seg = _inputs(1, t, 2, 128, docs=docs)

    def loss_flash(q, k, v):
      out = fa.flash_window_attention(q, k, v, seg, window)
      return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
      out = fa._reference_attention(q, k, v, seg, window)
      return jnp.sum(out.astype(jnp.float32) ** 2)

    # The context must cover grad tracing too: the custom-vjp backward (its
    # own pallas_calls) is traced outside the forward call.
    with pltpu.force_tpu_interpret_mode():
      gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
      np.testing.assert_allclose(a, b, atol=3e-5)

  def test_gradients_bf16(self):
    q, k, v, seg = _inputs(1, 256, 2, 128, dtype=jnp.bfloat16)

    def loss_flash(q, k, v):
      out = fa.flash_window_attention(q, k, v, seg, 64)
      return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
      # fp32 reference on the same bf16 inputs: the oracle for what the
      # bf16 kernel should approximate.
      out = fa._reference_attention(
          q.astype(jnp.float32), k.astype(jnp.float32),
          v.astype(jnp.float32), seg, 64,
      )
      return jnp.sum(out ** 2)

    with pltpu.force_tpu_interpret_mode():
      gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
      a32 = np.asarray(a, np.float32)
      b32 = np.asarray(b, np.float32)
      np.testing.assert_allclose(
          a32, b32, atol=0.15 * np.abs(b32).max()
      )

  def test_gradients_with_left_padding(self):
    """Pad rows (segment_pos == -1) get zero grads; real rows match."""
    b, t, window = 2, 256, 64
    q, k, v, _ = _inputs(b, t, 2, 128)
    pad = jnp.array([[0], [37]])  # row 1 left-padded by 37
    idx = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1))
    seg = jnp.maximum(idx - pad, -1)
    real = (seg >= 0)[..., None, None]

    def loss_flash(q, k, v):
      out = fa.flash_window_attention(q, k, v, seg, window)
      return jnp.sum(jnp.where(real, out.astype(jnp.float32), 0.0) ** 2)

    def loss_ref(q, k, v):
      out = fa._reference_attention(q, k, v, seg, window)
      return jnp.sum(jnp.where(real, out.astype(jnp.float32), 0.0) ** 2)

    with pltpu.force_tpu_interpret_mode():
      gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
      np.testing.assert_allclose(a, b, atol=3e-5)
    # Pad-position q grads are exactly zero.
    np.testing.assert_array_equal(
        np.asarray(gf[0][1, :37]), np.zeros_like(gf[0][1, :37])
    )

  @pytest.mark.parametrize("docs", [False, True])
  def test_kv_prefix_matches_full_sequence(self, docs):
    """Halo mode: queries over [prefix:], keys over the whole sequence.

    Oracle: the full-sequence reference attention's rows [prefix:] — a
    shard with its previous-window halo must reproduce them exactly, and
    gradients must flow into the halo keys/values.
    """
    prefix, t, window = 128, 256, 128
    q_full, k_full, v_full, seg_full = _inputs(
        1, prefix + t, 2, 128, docs=docs
    )
    q = q_full[:, prefix:]
    seg = seg_full[:, prefix:]

    ref = fa._reference_attention(q_full, k_full, v_full, seg_full, window)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_window_attention(q, k_full, v_full, seg, window,
                                      kv_prefix=prefix)
    np.testing.assert_allclose(out, ref[:, prefix:], atol=2e-5)

    def loss_flash(q, k, v):
      o = fa.flash_window_attention(q, k, v, seg, window, kv_prefix=prefix)
      return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(qf, k, v):
      o = fa._reference_attention(qf, k, v, seg_full, window)
      return jnp.sum(o[:, prefix:].astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
      gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k_full, v_full)
    gqf, gkr, gvr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q_full, k_full, v_full
    )
    np.testing.assert_allclose(gq, gqf[:, prefix:], atol=3e-5)
    np.testing.assert_allclose(gk, gkr, atol=3e-5)  # incl. halo keys
    np.testing.assert_allclose(gv, gvr, atol=3e-5)
    # Gradients actually reach the halo region.
    assert np.abs(np.asarray(gk[:, :prefix])).max() > 0

  @pytest.mark.parametrize("docs", [False, True])
  def test_sequence_sharded_matches_single_device(self, docs):
    """Halo-exchange SP attention on a 4-way sequence mesh == unsharded."""
    from cadence_gemma_tpu.parallel import sharding as sh
    from cadence_gemma_tpu.parallel import sp_attention

    mesh = sh.make_mesh((1, 4), ("data", "sequence"), jax.devices()[:4])
    spec = sh.ShardingSpec(
        mesh=mesh, batch_axis_name="data", sequence_axis_name="sequence"
    )
    t, window = 1024, 128
    q, k, v, seg = _inputs(1, t, 2, 128, docs=docs)
    assert sp_attention.can_sequence_shard(spec, t, window)

    ref = fa._reference_attention(q, k, v, seg, window)
    with pltpu.force_tpu_interpret_mode():
      out = sp_attention.sequence_sharded_attention(
          q, k, v, seg, window, spec
      )
    np.testing.assert_allclose(out, ref, atol=2e-5)

    def loss_sp(q, k, v):
      o = sp_attention.sequence_sharded_attention(q, k, v, seg, window, spec)
      return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
      o = fa._reference_attention(q, k, v, seg, window)
      return jnp.sum(o.astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
      gs = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
      np.testing.assert_allclose(a, b, atol=5e-5)

  def test_can_sequence_shard_gates(self):
    from cadence_gemma_tpu.parallel import sharding as sh
    from cadence_gemma_tpu.parallel import sp_attention

    mesh = sh.make_mesh((1, 4), ("data", "sequence"), jax.devices()[:4])
    spec = sh.ShardingSpec(
        mesh=mesh, batch_axis_name="data", sequence_axis_name="sequence"
    )
    assert sp_attention.can_sequence_shard(spec, 1024, 128)
    assert not sp_attention.can_sequence_shard(None, 1024, 128)
    assert not sp_attention.can_sequence_shard(spec, 1000, 128)  # indivisible
    assert not sp_attention.can_sequence_shard(spec, 1024, 512)  # local < w
    assert not sp_attention.can_sequence_shard(spec, 1024, 96)   # untiled w

  def test_attention_block_flash_path_matches_einsum(self):
    """The module's flash path == its einsum path on the same params."""
    b, t, width, window = 1, 256, 8, 64
    block_einsum = modules.LocalAttentionBlock(
        width=width, num_heads=2, window_size=window,
        use_flash_attention=False, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    block_flash = modules.LocalAttentionBlock(
        width=width, num_heads=2, window_size=window,
        use_flash_attention=True, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, width))
    pos = jnp.tile(jnp.arange(t)[None], (b, 1))
    params = block_einsum.init(jax.random.PRNGKey(1), x, pos)
    y_e, cache_e = block_einsum.apply(params, x, pos)
    with pltpu.force_tpu_interpret_mode():
      y_f, cache_f = block_flash.apply(params, x, pos)
    np.testing.assert_allclose(y_f, y_e, atol=1e-4)
    np.testing.assert_allclose(cache_f.keys, cache_e.keys, atol=1e-6)

  def test_auto_dispatch_off_when_window_covers(self):
    assert not modules._should_use_flash_attention(128, 2048, None)
    assert modules._should_use_flash_attention(4096, 2048, True)
    assert not modules._should_use_flash_attention(4096, 2048, False)


class TestFlashMHA:
  """Bidirectional full-MHA kernel (the ViT towers' attention)."""

  @pytest.mark.parametrize("t,h", [(128, 128), (200, 64), (256, 72)])
  def test_matches_einsum(self, t, h):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, t, 3, h))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, t, 3, h))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, t, 3, h))
    ref = fa._reference_mha(q, k, v)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_mha_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5)

  def test_bf16(self):
    key = jax.random.PRNGKey(3)
    shape = (1, 200, 2, 64)
    q = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)
    ref = fa._reference_mha(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_mha_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.04
    )

  def test_tiled_path_matches_einsum(self, monkeypatch):
    """Long sequences (> _ONEPASS_MAX_T) use the tiled online-softmax grid;
    force that path at a small t so it keeps interpret-mode coverage."""
    monkeypatch.setattr(fa, "_ONEPASS_MAX_T", 0)
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (2, 200, 3, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 200, 3, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 200, 3, 64))
    ref = fa._reference_mha(q, k, v)
    with pltpu.force_tpu_interpret_mode():
      out = fa.flash_mha_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5)

  def test_gradients_flow(self):
    """custom_vjp wiring: grads equal autodiff of the einsum reference."""
    key = jax.random.PRNGKey(4)
    shape = (1, 136, 2, 64)
    q = jax.random.normal(key, shape)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape)

    def loss(fn):
      return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
      gf = jax.grad(loss(fa.flash_mha_attention), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(fa._reference_mha), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
      np.testing.assert_allclose(a, b, atol=3e-5)
