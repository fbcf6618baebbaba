"""Tests for the AOT serving export (checkpoint/export.py).

The exported prefill/decode programs must reproduce the live model's
outputs exactly after a serialize -> disk -> deserialize round trip, both
single-device and with TP shardings attached on a mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.checkpoint import export as export_lib
from cadence_gemma_tpu.models import griffin as griffin_lib
from cadence_gemma_tpu.parallel import sharding as sharding_lib


def _tiny_model(vocab_size=32, width=16):
  config = common.GriffinConfig(
      vocab_size=vocab_size,
      width=width,
      mlp_expanded_width=2 * width,
      num_heads=2,
      lru_width=width,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=8,
      logits_soft_cap=30.0,
      scan_type=common.ScanType.LINEAR_NATIVE,
  )
  model = griffin_lib.Griffin(config, gradient_checkpointing=False)
  tokens = jnp.ones((1, 4), jnp.int32)
  positions = jnp.tile(jnp.arange(4)[None], (1, 1))
  params = model.init(jax.random.PRNGKey(0), tokens, positions)
  return model, params


class TestServingExport:

  @pytest.fixture(scope="class")
  def setup(self, tmp_path_factory):
    model, params = _tiny_model()
    exp = export_lib.export_serving(
        model, params, batch_size=2, prompt_len=6
    )
    path = tmp_path_factory.mktemp("artifact") / "2b-test"
    export_lib.save_serving_export(exp, str(path))
    loaded = export_lib.load_serving_export(str(path))
    return model, params, loaded, path

  def test_meta(self, setup):
    _, _, loaded, path = setup
    assert loaded.meta["batch_size"] == 2
    assert loaded.meta["prompt_len"] == 6
    assert loaded.meta["config"]["vocab_size"] == 32
    assert loaded.meta["config"]["block_types"] == [
        "RECURRENT", "ATTENTION",
    ]
    # The artifact is programs + metadata, not weights: it stays small.
    total = sum(f.stat().st_size for f in path.iterdir())
    assert total < 5_000_000

  def test_prefill_matches_live_model(self, setup):
    # Oracle = the SAME function jitted live: the artifact was exported
    # from jax.jit(prefill), so the compiled programs match; an eager
    # model.apply differs at bf16 rounding (different fusion).
    model, params, loaded, _ = setup
    live_prefill, _ = export_lib.make_serving_functions(model)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 32, (2, 6)), jnp.int32
    )
    positions = jnp.tile(jnp.arange(6)[None], (2, 1))
    got_logits, got_cache = loaded.prefill(params, tokens, positions)
    want_logits, want_cache = jax.jit(live_prefill)(params, tokens, positions)
    np.testing.assert_array_equal(np.asarray(got_logits),
                                  np.asarray(want_logits))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        got_cache,
        want_cache,
    )

  def test_decode_chain_matches_live_model(self, setup):
    model, params, loaded, _ = setup
    live_prefill, live_decode = export_lib.make_serving_functions(model)
    live_prefill = jax.jit(live_prefill)
    live_decode = jax.jit(live_decode)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 32, (2, 6)), jnp.int32
    )
    positions = jnp.tile(jnp.arange(6)[None], (2, 1))
    logits, cache = loaded.prefill(params, tokens, positions)
    logits_live, cache_live = live_prefill(params, tokens, positions)
    tok = jnp.argmax(logits[:, -1], -1, keepdims=True).astype(jnp.int32)
    tok_live = jnp.argmax(
        logits_live[:, -1], -1, keepdims=True
    ).astype(jnp.int32)
    for step in range(3):
      pos = jnp.full((2, 1), 6 + step, jnp.int32)
      logits, cache = loaded.decode_step(params, cache, tok, pos)
      logits_live, cache_live = live_decode(params, cache_live, tok_live, pos)
      np.testing.assert_array_equal(np.asarray(logits),
                                    np.asarray(logits_live))
      tok = jnp.argmax(logits[:, -1], -1, keepdims=True).astype(jnp.int32)
      tok_live = jnp.argmax(
          logits_live[:, -1], -1, keepdims=True
      ).astype(jnp.int32)

  def test_export_from_shapes_only(self):
    # Exporting must not require real weights.
    model, params = _tiny_model()
    shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    exp = export_lib.export_serving(
        model, shapes, batch_size=1, prompt_len=4
    )
    assert len(bytes(exp.prefill)) > 0

  def test_rejects_non_artifact(self, tmp_path):
    (tmp_path / "meta.json").write_text('{"format": "something-else"}')
    with pytest.raises(ValueError, match="not a serving export"):
      export_lib.load_serving_export(str(tmp_path))


class TestShardedServingExport:

  def test_tp_export_round_trip(self, tmp_path):
    devices = jax.devices()
    if len(devices) < 2:
      pytest.skip("needs 2 devices")
    mesh = sharding_lib.make_mesh((2,), ("model",), devices=devices[:2])
    model, params = _tiny_model()
    exp = export_lib.export_serving(
        model, params, batch_size=1, prompt_len=4, mesh=mesh
    )
    assert exp.meta["num_devices"] == 2
    export_lib.save_serving_export(exp, str(tmp_path / "tp"))
    loaded = export_lib.load_serving_export(str(tmp_path / "tp"))

    tokens = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    positions = jnp.arange(4, dtype=jnp.int32)[None]
    with jax.sharding.set_mesh(mesh):
      got_logits, got_cache = loaded.prefill(params, tokens, positions)
      tok = jnp.argmax(got_logits[:, -1], -1, keepdims=True).astype(
          jnp.int32
      )
      pos = jnp.full((1, 1), 4, jnp.int32)
      step_logits, _ = loaded.decode_step(params, got_cache, tok, pos)
    live_prefill, live_decode = export_lib.make_serving_functions(model)
    want_logits, want_cache = jax.jit(live_prefill)(params, tokens, positions)
    # TP changes the reduction order of the sharded contractions, so the
    # comparison is at bf16 resolution; the greedy token must still agree.
    np.testing.assert_allclose(
        np.asarray(got_logits, np.float32),
        np.asarray(want_logits, np.float32),
        atol=0.05,
    )
    tok_live = jnp.argmax(
        want_logits[:, -1], -1, keepdims=True
    ).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_live))
    want_step, _ = jax.jit(live_decode)(params, want_cache, tok_live, pos)
    np.testing.assert_allclose(
        np.asarray(step_logits, np.float32),
        np.asarray(want_step, np.float32),
        atol=0.05,
    )
