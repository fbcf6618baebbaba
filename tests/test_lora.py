"""LoRA adapter tests: no-op init, adapter-only training, merge parity.

The reference has no LoRA (its SFT always trains the full tree,
``training/train_jax.py:566``); the invariants here are self-imposed:
enabling adapters is an exact no-op until trained, training touches only
adapter leaves, and folding adapters back reproduces the LoRA model on a
plain model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.ops import quantization
from cadence_gemma_tpu.training import lora
from cadence_gemma_tpu.training import trainer


def tiny_config(**overrides):
  kwargs = dict(
      vocab_size=48,
      width=16,
      mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=8,
      logits_soft_cap=30.0,
      lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=4,
      vision_width=12,
      vl_expanded_width=20,
  )
  kwargs.update(overrides)
  return common.GriffinConfig(**kwargs)


def make_models(rank=4, **model_kwargs):
  cfg = tiny_config()
  base = griffin.Griffin(
      cfg, gradient_checkpointing=False,
      dtype=jnp.float32, param_dtype=jnp.float32, **model_kwargs,
  )
  lora_model = griffin.Griffin(
      cfg, gradient_checkpointing=False, lora_rank=rank,
      dtype=jnp.float32, param_dtype=jnp.float32, **model_kwargs,
  )
  return cfg, base, lora_model


def init_params(model, seed=0):
  tok = jnp.ones((1, 6), jnp.int32)
  pos = jnp.arange(6)[None]
  return model.init(
      jax.random.PRNGKey(seed), tok, pos, return_cache=False
  )["params"]


class TestLoraStructure:

  def test_zero_init_is_exact_noop(self):
    _, base_model, lora_model = make_models()
    params = init_params(lora_model)
    adapters, base = lora.split_lora(params)
    assert lora.lora_parameter_count(adapters) > 0
    tok = jnp.array([[1, 5, 9, 2, 4, 7]], jnp.int32)
    pos = jnp.arange(6)[None]
    y_lora, _ = lora_model.apply(
        {"params": params}, tok, pos, return_cache=False
    )
    y_base, _ = base_model.apply(
        {"params": base}, tok, pos, return_cache=False
    )
    np.testing.assert_array_equal(np.asarray(y_lora), np.asarray(y_base))

  def test_lora_alpha_zero_nulls_adapters(self):
    """alpha=0.0 must scale the adapter hop to exactly zero (regression:
    the falsy `alpha or rank` default silently turned 0.0 into
    full-strength alpha=rank)."""
    cfg, base_model, _ = make_models()
    zero_alpha = griffin.Griffin(
        cfg, gradient_checkpointing=False, lora_rank=4, lora_alpha=0.0,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = init_params(zero_alpha)
    adapters, base = lora.split_lora(params)
    # Non-zero adapters so a wrong scaling would visibly perturb logits.
    keys = jax.random.split(
        jax.random.PRNGKey(3), len(jax.tree_util.tree_leaves(adapters))
    )
    adapters = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(adapters),
        [0.3 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(
            keys, jax.tree_util.tree_leaves(adapters))],
    )
    tok = jnp.array([[1, 5, 9, 2, 4, 7]], jnp.int32)
    pos = jnp.arange(6)[None]
    y_zero, _ = zero_alpha.apply(
        {"params": lora.merge_params(base, adapters)}, tok, pos,
        return_cache=False,
    )
    y_base, _ = base_model.apply(
        {"params": base}, tok, pos, return_cache=False
    )
    np.testing.assert_array_equal(np.asarray(y_zero), np.asarray(y_base))
    # merge_lora(alpha=0.0) folds a zero delta: the tree equals the base.
    merged = lora.merge_lora(
        lora.merge_params(base, adapters), lora_alpha=0.0
    )
    for (p, u), (_, v) in zip(
        jax.tree_util.tree_flatten_with_path(merged)[0],
        jax.tree_util.tree_flatten_with_path(base)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(u), np.asarray(v), atol=1e-6, err_msg=str(p)
      )

  def test_split_merge_round_trip(self):
    _, _, lora_model = make_models()
    params = init_params(lora_model)
    adapters, base = lora.split_lora(params)
    rebuilt = lora.merge_params(base, adapters)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(rebuilt)
    assert len(flat_a) == len(flat_b)
    for u, v in zip(flat_a, flat_b):
      np.testing.assert_array_equal(np.asarray(u), np.asarray(v))

  def test_mask_marks_only_adapters(self):
    _, _, lora_model = make_models()
    params = init_params(lora_model)
    mask = lora.lora_mask(params)
    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, val in leaves:
      name = str(path[-1])
      assert val == ("lora_a" in name or "lora_b" in name), path

  def test_adapters_cover_every_projection(self):
    """All Dense kernels and the fused Einsum w get an adapter pair."""
    _, _, lora_model = make_models()
    params = init_params(lora_model)
    missing = []

    def visit(tree, path=()):
      if not isinstance(tree, dict):
        return
      if ("kernel" in tree or "w" in tree) and "lora_a" not in tree:
        # BlockDiagonalLinear gates and conv/norm params are the
        # documented non-targets; everything else must carry adapters.
        if path[-1] not in ("input_gate", "a_gate", "conv_1d",
                            "embedder", "rg_lru"):
          missing.append(path)
      for k, v in tree.items():
        visit(v, path + (k,))

    visit(params)
    assert not missing, missing


class TestLoraTraining:

  def _batch(self, key):
    tok = jax.random.randint(key, (2, 10), 1, 40).astype(jnp.int32)
    mask = jnp.ones_like(tok, dtype=bool)
    return tok, mask

  def test_adapter_only_training_reduces_loss(self):
    _, _, lora_model = make_models()
    params = init_params(lora_model)
    adapters, base = lora.split_lora(params)
    tx = lora.make_optimizer(learning_rate=5e-2)
    opt_state = tx.init(adapters)
    tok, mask = self._batch(jax.random.PRNGKey(1))
    losses = []
    for _ in range(8):
      loss, adapters, opt_state = lora.lora_train_step(
          lora_model, adapters, base, tx, opt_state, 0, tok, mask
      )
      losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # Optimizer state is adapter-sized: no moment leaf is larger than the
    # largest adapter, i.e. nothing base-sized snuck into Adam's state.
    max_adapter = max(
        l.size for l in jax.tree_util.tree_leaves(adapters)
    )
    for leaf in jax.tree_util.tree_leaves(opt_state):
      assert leaf.size <= max_adapter, leaf.shape

  def test_trained_adapters_match_merged_model(self):
    _, base_model, lora_model = make_models()
    params = init_params(lora_model)
    adapters, base = lora.split_lora(params)
    # Give the adapters real (non-zero) values via a couple of steps.
    tx = lora.make_optimizer(learning_rate=5e-2)
    opt_state = tx.init(adapters)
    tok, mask = self._batch(jax.random.PRNGKey(2))
    for _ in range(3):
      _, adapters, opt_state = lora.lora_train_step(
          lora_model, adapters, base, tx, opt_state, 0, tok, mask
      )
    combined = lora.merge_params(base, adapters)
    merged = lora.merge_lora(combined)
    probe = jnp.array([[1, 7, 3, 2, 9, 5]], jnp.int32)
    pos = jnp.arange(6)[None]
    y_lora, _ = lora_model.apply(
        {"params": combined}, probe, pos, return_cache=False
    )
    y_merged, _ = base_model.apply(
        {"params": merged}, probe, pos, return_cache=False
    )
    np.testing.assert_allclose(
        np.asarray(y_lora), np.asarray(y_merged), atol=2e-5
    )

  def test_quantized_base_with_adapters(self):
    """QLoRA configuration: int8 frozen base + bf16 adapters trains."""
    cfg = tiny_config()
    lora_q = griffin.Griffin(
        cfg, gradient_checkpointing=False, quantized=True, lora_rank=4,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    lora_f = griffin.Griffin(
        cfg, gradient_checkpointing=False, lora_rank=4,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = init_params(lora_f, seed=3)
    adapters, base = lora.split_lora(params)
    qbase = quantization.quantize_params(base)
    tx = lora.make_optimizer(learning_rate=5e-2)
    opt_state = tx.init(adapters)
    tok = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 1, 40)
    tok = tok.astype(jnp.int32)
    mask = jnp.ones_like(tok, dtype=bool)
    losses = []
    for _ in range(6):
      loss, adapters, opt_state = lora.lora_train_step(
          lora_q, adapters, qbase, tx, opt_state, 0, tok, mask
      )
      losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

  def test_merge_refuses_quantized_tree(self):
    cfg = tiny_config()
    lora_f = griffin.Griffin(
        cfg, gradient_checkpointing=False, lora_rank=2,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = init_params(lora_f, seed=5)
    adapters, base = lora.split_lora(params)
    qtree = lora.merge_params(quantization.quantize_params(base), adapters)
    with pytest.raises(ValueError, match="kernel_q"):
      lora.merge_lora(qtree)


class TestLoraTrainLoop:

  def test_init_adapters_matches_model_init(self):
    _, _, lora_model = make_models()
    via_init = lora.split_lora(init_params(lora_model, seed=7))[0]
    via_shapes = lora.init_adapters(lora_model, jax.random.PRNGKey(7))
    ja, jb = jax.tree_util.tree_flatten_with_path(via_init)[0], (
        jax.tree_util.tree_flatten_with_path(via_shapes)[0]
    )
    assert [p for p, _ in ja] == [p for p, _ in jb]
    for (path, u), (_, v) in zip(ja, jb):
      assert u.shape == v.shape and u.dtype == v.dtype, path
      if "lora_b" in str(path[-1]):
        assert not np.asarray(v).any()

  def test_train_loop_lora_mode(self):
    from cadence_gemma_tpu.training import data as data_lib
    from cadence_gemma_tpu.training import train_loop

    _, _, lora_model = make_models()
    params = init_params(lora_model, seed=8)
    tok = jax.random.randint(jax.random.PRNGKey(9), (2, 10), 1, 40)
    batch = data_lib.TrainingInput(
        input_tokens=np.asarray(tok, np.int32),
        target_mask=np.ones((2, 10), bool),
    )
    cfg = train_loop.TrainingConfig(
        learning_rate=5e-2, num_epochs=2, max_steps=6, lora=True,
        checkpoint_every_n=None, eval_every_n=1000,
    )
    before = lora.split_lora(params)[1]
    out = train_loop.train_loop(lora_model, params, [batch] * 4, cfg)
    adapters, base = lora.split_lora(out)
    # Base tree untouched; adapters moved.
    for (p, u), (_, v) in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree_util.tree_flatten_with_path(base)[0],
    ):
      np.testing.assert_array_equal(np.asarray(u), np.asarray(v), err_msg=str(p))
    moved = any(
        np.abs(np.asarray(l)).sum() > 0
        for p, l in jax.tree_util.tree_flatten_with_path(adapters)[0]
        if "lora_b" in str(p[-1])
    )
    assert moved

  def test_train_loop_lora_requires_adapters(self):
    from cadence_gemma_tpu.training import train_loop

    _, base_model, _ = make_models()
    params = init_params(base_model, seed=10)
    cfg = train_loop.TrainingConfig(lora=True)
    with pytest.raises(ValueError, match="lora_rank"):
      train_loop.train_loop(base_model, params, [], cfg)


class TestLoraSharded:

  def test_partition_specs_mirror_parent_layout(self):
    from jax.sharding import PartitionSpec as P

    from cadence_gemma_tpu.parallel import partitioning

    _, _, lora_model = make_models()
    params = init_params(lora_model, seed=12)
    specs = partitioning.griffin_param_specs(params)
    rb = specs["blocks.0"]["recurrent_block"]
    assert rb["linear_x"]["lora_b"] == P(None, "model")   # column out
    assert rb["linear_x"]["lora_a"] == P(None, None)
    assert rb["linear_out"]["lora_a"] == P("model", None)  # row in
    assert rb["linear_out"]["lora_b"] == P(None, None)
    mlp = specs["blocks.0"]["mlp_block"]
    assert mlp["ffw_up"]["lora_b"] == P(None, None, "model")
    assert mlp["ffw_down"]["lora_a"] == P("model", None)
    # The rank axis must NEVER shard (regression: the generic ffw_up rule
    # used to intercept lora_a and shard its rank dim, crashing any
    # rank % tp_size != 0 config).
    assert mlp["ffw_up"]["lora_a"] == P(None, None, None)
    assert mlp["ffw_down"]["lora_b"] == P(None, None)
    vl = specs["vl_connector"]
    assert vl["ffw_up"]["lora_a"] == P(None, None, None)
    assert vl["ffw_up"]["lora_b"] == P(None, None, "model")

  def test_indivisible_rank_shards_cleanly(self):
    """rank=3 over a 2-way model axis: adapters place without error
    because no LoRA rank axis is ever sharded."""
    from cadence_gemma_tpu.parallel import sharding as sh

    _, _, lora_model = make_models(rank=3)
    params = init_params(lora_model, seed=21)
    adapters, base = lora.split_lora(params)
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    tx = lora.make_optimizer(learning_rate=5e-2)
    _, shard_fn = lora.make_sharded_lora_step(
        lora_model, tx, mesh, 0, adapters, base
    )
    sh_adapters, _ = shard_fn(adapters, base)  # regression: used to raise
    # No placed adapter may shard its (size-3) rank axis.
    for path, leaf in jax.tree_util.tree_flatten_with_path(sh_adapters)[0]:
      spec = leaf.sharding.spec
      for dim, axis in enumerate(tuple(spec) + (None,) * leaf.ndim):
        if dim < leaf.ndim and axis is not None:
          assert leaf.shape[dim] % 2 == 0, (path, spec)

  def test_quantized_base_specs_mirror_bf16_layout(self):
    """int8 twins (`*_q`/`*_scale`) shard exactly like the bf16 leaves
    they replace, so a QLoRA frozen base gets real TP weight relief."""
    from jax.sharding import PartitionSpec as P

    from cadence_gemma_tpu.parallel import partitioning

    _, base_model, _ = make_models()
    qparams = quantization.quantize_params(init_params(base_model, seed=22))
    specs = partitioning.griffin_param_specs(qparams)
    rb = specs["blocks.0"]["recurrent_block"]
    assert rb["linear_x"]["kernel_q"] == P(None, "model")
    assert rb["linear_x"]["kernel_scale"] == P("model")
    assert rb["linear_out"]["kernel_q"] == P("model", None)
    assert rb["linear_out"]["kernel_scale"] == P(None)
    mlp = specs["blocks.0"]["mlp_block"]
    assert mlp["ffw_up"]["w_q"] == P(None, None, "model")
    assert mlp["ffw_up"]["w_scale"] == P(None, "model")
    assert mlp["ffw_down"]["kernel_q"] == P("model", None)
    gate = rb["rg_lru"]["input_gate"]
    assert gate["w_q"] == P("model", None, None)
    assert gate["w_scale"] == P("model", None)
    emb = specs["embedder"]
    assert emb["input_embedding_q"] == P("model", None)
    assert emb["input_embedding_scale"] == P("model")
    att = specs["blocks.1"]["attention_block"]
    assert att["proj_q"]["kernel_q"] == P(None, "model")
    assert att["proj_k"]["kernel_q"] == P(None, None)

  def test_sharded_qlora_step_int8_base_sharded(self):
    """QLoRA on a mesh: the int8 frozen base actually shards over TP and
    the step matches the single-device QLoRA step."""
    from cadence_gemma_tpu.parallel import sharding as sh

    cfg = tiny_config()
    lora_q = griffin.Griffin(
        cfg, gradient_checkpointing=False, quantized=True, lora_rank=4,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    lora_f = griffin.Griffin(
        cfg, gradient_checkpointing=False, lora_rank=4,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = init_params(lora_f, seed=23)
    adapters, base = lora.split_lora(params)
    qbase = quantization.quantize_params(base)
    tx = lora.make_optimizer(learning_rate=5e-2)
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    step_fn, shard_fn = lora.make_sharded_lora_step(
        lora_q, tx, mesh, 0, adapters, qbase
    )
    sh_adapters, sh_qbase = shard_fn(adapters, qbase)
    # The heavy int8 leaves must be model-sharded, not replicated.
    lx = sh_qbase["blocks.0"]["recurrent_block"]["linear_x"]
    assert not lx["kernel_q"].sharding.is_fully_replicated
    assert lx["kernel_q"].dtype == jnp.int8
    opt_state = tx.init(sh_adapters)
    tok = jax.random.randint(jax.random.PRNGKey(24), (2, 10), 1, 40)
    tok = tok.astype(jnp.int32)
    mask = jnp.ones_like(tok, dtype=bool)
    adapters_copy = jax.tree_util.tree_map(jnp.copy, adapters)
    opt_ref = tx.init(adapters_copy)
    loss_ref, adapters_ref, _ = lora.lora_train_step(
        lora_q, adapters_copy, qbase, tx, opt_ref, 0, tok, mask
    )
    loss_sh, sh_adapters, opt_state = step_fn(
        sh_adapters, sh_qbase, opt_state, tok, mask, None
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for (p, u), (_, v) in zip(
        jax.tree_util.tree_flatten_with_path(adapters_ref)[0],
        jax.tree_util.tree_flatten_with_path(sh_adapters)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(u), np.asarray(v), atol=1e-5, err_msg=str(p)
      )

  def test_opt_state_layout_pinned_no_recompile(self):
    """Feeding the step's own outputs back in must hit the same
    executable: opt-state in/out shardings are pinned, so GSPMD cannot
    emit a drifted moment layout that keys a second compilation."""
    from cadence_gemma_tpu.parallel import sharding as sh

    _, _, lora_model = make_models()
    params = init_params(lora_model, seed=31)
    adapters, base = lora.split_lora(params)
    tx = lora.make_optimizer(learning_rate=5e-2)
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    step_fn, shard_fn = lora.make_sharded_lora_step(
        lora_model, tx, mesh, 0, adapters, base
    )
    sh_adapters, sh_base = shard_fn(adapters, base)
    opt_state = tx.init(sh_adapters)
    tok = jax.random.randint(
        jax.random.PRNGKey(32), (2, 10), 1, 40
    ).astype(jnp.int32)
    mask = jnp.ones_like(tok, dtype=bool)
    for _ in range(3):
      _, sh_adapters, opt_state = step_fn(
          sh_adapters, sh_base, opt_state, tok, mask, None
      )
    assert step_fn._cache_size() == 1
    # Adam moments carry their adapter leaf's TP layout, not replicated.
    mu = opt_state[-1].mu if hasattr(opt_state[-1], "mu") else None
    if mu is None:  # chain: find the ScaleByAdamState
      for part in jax.tree_util.tree_leaves(
          opt_state, is_leaf=lambda x: hasattr(x, "mu")
      ):
        if hasattr(part, "mu"):
          mu = part.mu
          break
    lb = mu["blocks.0"]["recurrent_block"]["linear_x"]["lora_b"]
    ad = sh_adapters["blocks.0"]["recurrent_block"]["linear_x"]["lora_b"]
    assert lb.sharding == ad.sharding
    assert not lb.sharding.is_fully_replicated

  def test_tp_serving_with_adapters_matches_single_device(self):
    from cadence_gemma_tpu.inference import sampler as sampler_lib
    from cadence_gemma_tpu.parallel import sharding as sh
    from cadence_gemma_tpu import tokenizers

    _, _, lora_model = make_models()
    params = init_params(lora_model, seed=13)
    # Non-zero adapters so the LoRA term actually contributes under TP.
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01 if "lora_b" in str(p[-1]) else v, params
    )
    vocab = tokenizers.SimpleVocab(["tok%d" % i for i in range(40)])
    mesh = sh.make_mesh((1, 2), ("data", "model"), jax.devices()[:2])
    s_tp = sampler_lib.Sampler(lora_model, vocab, params, mesh=mesh)
    s_one = sampler_lib.Sampler(lora_model, vocab, params)
    a = s_tp(["tok1 tok2"], total_generation_steps=5, return_logits=True)
    b = s_one(["tok1 tok2"], total_generation_steps=5, return_logits=True)
    np.testing.assert_array_equal(
        np.asarray(a.tokens[0]), np.asarray(b.tokens[0])
    )
    np.testing.assert_allclose(
        np.asarray(a.logits[0]), np.asarray(b.logits[0]), atol=1e-4
    )


  def test_sharded_lora_step_matches_single_device(self):
    from cadence_gemma_tpu.parallel import sharding as sh

    _, _, lora_model = make_models()
    params = init_params(lora_model, seed=14)
    adapters, base = lora.split_lora(params)
    tx = lora.make_optimizer(learning_rate=5e-2)
    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    step_fn, shard_fn = lora.make_sharded_lora_step(
        lora_model, tx, mesh, 0, adapters, base
    )
    sh_adapters, sh_base = shard_fn(adapters, base)
    opt_state = tx.init(sh_adapters)
    tok = jax.random.randint(jax.random.PRNGKey(15), (2, 10), 1, 40)
    tok = tok.astype(jnp.int32)
    mask = jnp.ones_like(tok, dtype=bool)
    # Reference: unsharded adapter-only step on the same inputs. Copies,
    # because lora_train_step donates its adapter tree and device_put may
    # have aliased these buffers into sh_adapters' shards.
    adapters_copy = jax.tree_util.tree_map(jnp.copy, adapters)
    opt_ref = tx.init(adapters_copy)
    loss_ref, adapters_ref, _ = lora.lora_train_step(
        lora_model, adapters_copy, base, tx, opt_ref, 0, tok, mask
    )
    loss_sh, sh_adapters, opt_state = step_fn(
        sh_adapters, sh_base, opt_state, tok, mask, None
    )
    np.testing.assert_allclose(
        float(loss_sh), float(loss_ref), rtol=1e-5
    )
    for (p, u), (_, v) in zip(
        jax.tree_util.tree_flatten_with_path(adapters_ref)[0],
        jax.tree_util.tree_flatten_with_path(sh_adapters)[0],
    ):
      np.testing.assert_allclose(
          np.asarray(u), np.asarray(v), atol=1e-5, err_msg=str(p)
      )
    # TP actually distributes something.
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(sh_base)
    )


class TestLoraSampling:

  def test_sampler_runs_with_adapters(self):
    from cadence_gemma_tpu.inference import sampler as sampler_lib
    from cadence_gemma_tpu import tokenizers

    cfg, _, lora_model = make_models()
    params = init_params(lora_model, seed=6)
    vocab = tokenizers.SimpleVocab(
        ["tok%d" % i for i in range(40)]
    )
    s = sampler_lib.Sampler(lora_model, vocab, params)
    out = s(["tok1 tok2"], total_generation_steps=4)
    assert len(out.text) == 1


class TestLoraRows:
  """Stacked per-row adapters (``lora_rows`` — the decode-side half of
  multi-adapter serving, see inference/serving.py ``multi_lora``)."""

  def test_stacked_rows_match_per_row_merged(self):
    rows = 3
    _, base_model, lora_model = make_models(rank=2)
    params = init_params(lora_model, seed=5)
    adapters0, base = lora.split_lora(params)

    def rand_like(seed):
      leaves, treedef = jax.tree_util.tree_flatten(adapters0)
      keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
      return jax.tree_util.tree_unflatten(
          treedef,
          [0.2 * jax.random.normal(k, l.shape, l.dtype)
           for k, l in zip(keys, leaves)],
      )

    per_row = [
        rand_like(10),
        jax.tree_util.tree_map(jnp.zeros_like, adapters0),
        rand_like(11),
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_row)
    ml_model = lora_model.clone(lora_rows=rows)
    tok = jax.random.randint(
        jax.random.PRNGKey(1), (rows, 6), 1, 40
    ).astype(jnp.int32)
    pos = jnp.tile(jnp.arange(6)[None], (rows, 1))
    y_ml, _ = ml_model.apply(
        {"params": lora.merge_params(base, stacked)}, tok, pos,
        return_cache=False,
    )
    for i, row_tree in enumerate(per_row):
      y_i, _ = lora_model.apply(
          {"params": lora.merge_params(base, row_tree)},
          tok[i : i + 1], pos[i : i + 1], return_cache=False,
      )
      np.testing.assert_allclose(
          np.asarray(y_ml[i]), np.asarray(y_i[0]), atol=1e-5
      )
    # The all-zero row is EXACTLY the base model (empty serving slots
    # need no masking).
    y_b, _ = base_model.apply(
        {"params": base}, tok[1:2], pos[1:2], return_cache=False
    )
    np.testing.assert_array_equal(np.asarray(y_ml[1]), np.asarray(y_b[0]))
