"""int8 weight-only quantization tests: tree compat, accuracy, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.inference import sampler as sampler_lib
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.ops import quantization
from cadence_gemma_tpu.tokenizers import SimpleVocab


def _config():
  return common.GriffinConfig(
      vocab_size=64, width=32, mlp_expanded_width=96, num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
      logits_soft_cap=30.0, lru_width=32,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=4, vision_width=12, vl_expanded_width=20,
  )


@pytest.fixture(scope="module")
def setup():
  config = _config()
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  qmodel = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False, quantized=True,
  )
  tokens = jnp.zeros((2, 6), jnp.int32)
  pos = jnp.tile(jnp.arange(6)[None], (2, 1))
  params = model.init(jax.random.PRNGKey(1), tokens, pos)["params"]
  qparams = quantization.quantize_params(params)
  return config, model, qmodel, params, qparams


class TestQuantizeTensor:

  def test_round_trip_error_bounded(self):
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    q, scale = quantization.quantize_tensor(w, (0,))
    assert q.dtype == jnp.int8 and scale.shape == (32,)
    back = quantization.dequantize_tensor(q, scale, (0,), jnp.float32)
    max_err = np.abs(np.asarray(w - back)).max()
    # Per-channel symmetric int8: error <= scale/2 per channel.
    assert max_err <= float(scale.max()) * 0.51

  def test_scale_commutes_with_matmul(self):
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    q, scale = quantization.quantize_tensor(w, (0,))
    pre = x @ quantization.dequantize_tensor(q, scale, (0,), jnp.float32)
    post = (x @ q.astype(jnp.float32)) * scale
    np.testing.assert_allclose(pre, post, rtol=1e-5)


class TestQuantizedModel:

  def test_param_tree_matches_quantized_model(self, setup):
    _, _, qmodel, _, qparams = setup
    tokens = jnp.zeros((1, 4), jnp.int32)
    expected = qmodel.init(
        jax.random.PRNGKey(0), tokens, jnp.arange(4)[None]
    )["params"]
    expected_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(expected)
    }
    got_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(qparams)
    }
    assert expected_paths == got_paths

  def test_logits_close_to_full_precision(self, setup):
    _, model, qmodel, params, qparams = setup
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, 64)
    pos = jnp.tile(jnp.arange(6)[None], (2, 1))
    logits, _ = model.apply({"params": params}, tokens, pos)
    qlogits, _ = qmodel.apply({"params": qparams}, tokens, pos)
    rel = np.abs(np.asarray(logits - qlogits)).max() / (
        np.abs(np.asarray(logits)).max() + 1e-9
    )
    assert rel < 0.05, rel

  def test_greedy_decode_matches(self, setup):
    _, model, qmodel, params, qparams = setup
    vocab = SimpleVocab([f"w{i}" for i in range(60)])
    s = sampler_lib.Sampler(model, vocab, params,
                            bucket_prompt_lengths=False)
    sq = sampler_lib.Sampler(qmodel, vocab, qparams,
                             bucket_prompt_lengths=False)
    a = s(["w1 w2 w3"], total_generation_steps=8).text[0]
    b = sq(["w1 w2 w3"], total_generation_steps=8).text[0]
    assert a == b

  def test_multimodal_quantized(self, setup):
    config, _, qmodel, _, qparams = setup
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4)[None]
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 12))
    logits, _ = qmodel.apply({"params": qparams}, tokens, pos, image=img)
    assert logits.shape == (1, 4 + 4, 64)
    assert np.isfinite(np.asarray(logits)).all()

  def test_bytes_halved_vs_bf16(self, setup):
    _, _, _, params, qparams = setup
    bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params
    )
    bf16_bytes = quantization.quantized_bytes(bf16)
    q_bytes = quantization.quantized_bytes(qparams)
    assert q_bytes < 0.7 * bf16_bytes


class TestActQuantModel:
  """int8-activation (MXU int8 x int8) prefill mode."""

  def test_act_quant_logits_close_to_weight_only(self, setup):
    config, model, _, params, qparams = setup
    aqmodel = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False, quantized=True, act_quant=True,
    )
    tokens = jnp.arange(12).reshape(2, 6) % config.vocab_size
    pos = jnp.tile(jnp.arange(6)[None], (2, 1))
    ref, _ = model.apply(
        {"params": params}, tokens, pos, return_cache=False
    )
    aq, _ = aqmodel.apply(
        {"params": qparams}, tokens, pos, return_cache=False
    )
    assert aq.shape == ref.shape
    # Logits are tanh-capped to (-30, 30); per-row int8 activations add a
    # little error on top of the weight-only path but stay close.
    err = np.abs(np.asarray(aq) - np.asarray(ref)).max()
    assert err < 1.5, err

  def test_act_quant_adds_no_params(self, setup):
    config, _, qmodel, _, qparams = setup
    aqmodel = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False, quantized=True, act_quant=True,
    )
    tokens = jnp.zeros((1, 4), jnp.int32)
    a = jax.eval_shape(
        lambda: aqmodel.init(jax.random.PRNGKey(0), tokens,
                             jnp.arange(4)[None])
    )
    b = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), tokens,
                            jnp.arange(4)[None])
    )
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    # Same param tree: the quantized checkpoint serves both modes; the
    # act_quant forward runs on the exact qparams fixture.
    aqmodel.apply({"params": qparams}, tokens, jnp.arange(4)[None],
                  return_cache=False)


class TestPrefillActQuantSampler:

  def test_sampler_runs_and_close_to_weight_only(self, setup):
    config, _, qmodel, _, qparams = setup
    vocab = SimpleVocab(["hello", "world", "test"])
    base = sampler_lib.Sampler(
        qmodel, vocab, qparams, jit_compile=False,
        bucket_prompt_lengths=False,
    )
    aq = sampler_lib.Sampler(
        qmodel, vocab, qparams, jit_compile=False,
        bucket_prompt_lengths=False, prefill_act_quant=True,
    )
    out_base = base(["hello world test"], total_generation_steps=4,
                    return_logits=True)
    out_aq = aq(["hello world test"], total_generation_steps=4,
                return_logits=True)
    assert len(out_aq.tokens[0]) == len(out_base.tokens[0])
    # The act_quant prefill perturbs the first-token logits only slightly.
    a = np.asarray(out_aq.logits[0][0], np.float32)
    b = np.asarray(out_base.logits[0][0], np.float32)
    assert np.abs(a - b).max() < 1.5

  def test_requires_quantized_model(self, setup):
    config, model, _, params, _ = setup
    with pytest.raises(ValueError, match="prefill_act_quant"):
      sampler_lib.Sampler(
          model, SimpleVocab(["a"]), params, prefill_act_quant=True,
      )


class TestSyntheticRealistic:
  """checkpoint/synthetic.py: the no-download realistic-statistics tree."""

  def test_realistic_params_shapes_and_stats(self):
    from cadence_gemma_tpu.checkpoint import synthetic

    config = _config()
    model = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False,
    )
    params = synthetic.realistic_params(model, jax.random.PRNGKey(0))
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.arange(8)[None],
    )["params"]
    # Same tree, same shapes/dtypes as a real init.
    a = jax.tree_util.tree_leaves_with_path(params)
    b = dict(jax.tree_util.tree_leaves_with_path(ref))
    assert len(a) == len(b)
    for path, leaf in a:
      assert leaf.shape == b[path].shape and leaf.dtype == b[path].dtype
    # Norm scales are perturbed away from the zero init...
    flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in a
    }
    norm_scales = [v for k, v in flat.items() if k.endswith("['scale']")]
    assert norm_scales and all(np.abs(v).max() > 0 for v in norm_scales)
    # ...with the documented stddev (loose 3-sigma-ish bound).
    pooled = np.concatenate([v.ravel() for v in norm_scales])
    assert 0.2 < pooled.std() < 0.5, pooled.std()
    # Deterministic across calls (stable per-leaf keys).
    params2 = synthetic.realistic_params(model, jax.random.PRNGKey(0))
    for (p1, v1), (p2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
      np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # The model still runs and quantizes on the perturbed tree.
    qparams = quantization.quantize_params(params)
    qmodel = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False, quantized=True,
    )
    toks = jnp.zeros((1, 6), jnp.int32)
    pos = jnp.arange(6)[None]
    l_full, _ = model.apply({"params": params}, toks, pos,
                            return_cache=False)
    l_q, _ = qmodel.apply({"params": qparams}, toks, pos,
                          return_cache=False)
    assert np.isfinite(np.asarray(l_full)).all()
    assert np.isfinite(np.asarray(l_q)).all()

  def test_greedy_token_agreement_metrics(self):
    from cadence_gemma_tpu.checkpoint import synthetic

    r = synthetic.greedy_token_agreement([1, 2, 3, 4], [1, 2, 9, 4])
    assert r["match_fraction"] == 0.75
    assert r["prefix_match"] == 0.5
    assert r["first_divergence"] == 2
    r2 = synthetic.greedy_token_agreement([5, 6], [5, 6])
    assert r2["match_fraction"] == 1.0 and r2["first_divergence"] == -1
