"""Partitioning rule tests: TP layouts are well-formed and divisible."""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.parallel import partitioning


@pytest.fixture(scope="module")
def params():
  config = common.GriffinConfig(
      vocab_size=32,
      width=16,
      mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=4,
      logits_soft_cap=30.0,
      lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
      vision_tokens=2,
      vision_width=8,
      vl_expanded_width=12,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32
  )
  tokens = jnp.zeros((1, 4), jnp.int32)
  return model.init(
      jax.random.PRNGKey(0), tokens, jnp.arange(4)[None]
  )["params"]


class TestSpecs:

  def test_tree_structure_matches(self, params):
    specs = partitioning.griffin_param_specs(params)
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, params)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, specs,
                               is_leaf=lambda x: isinstance(x, P))
    )

  def test_spec_ranks_match_param_ranks(self, params):
    specs = partitioning.griffin_param_specs(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    for p, s in zip(flat_p, flat_s):
      assert len(s) <= p.ndim, (p.shape, s)

  def test_sharded_dims_divisible_by_two(self, params):
    """Every model-sharded dim must divide by a 2-way model axis."""
    specs = partitioning.griffin_param_specs(params)

    def check(path, p):
      s = specs
      for k in path:
        s = s[k.key]
      for dim, axis in zip(p.shape, tuple(s) + (None,) * p.ndim):
        if axis == partitioning.MODEL_AXIS:
          assert dim % 2 == 0, (path, p.shape, s)

    jax.tree_util.tree_map_with_path(check, params)

  def test_megatron_pairing(self, params):
    specs = partitioning.griffin_param_specs(params)
    mlp = specs["blocks.0"]["mlp_block"]
    assert mlp["ffw_up"]["w"] == P(None, None, "model")   # column
    assert mlp["ffw_down"]["kernel"] == P("model", None)  # row
    rb = specs["blocks.0"]["recurrent_block"]
    assert rb["linear_x"]["kernel"] == P(None, "model")
    assert rb["linear_out"]["kernel"] == P("model", None)
    attn = specs["blocks.1"]["attention_block"]
    assert attn["proj_q"]["kernel"] == P(None, "model")
    assert attn["proj_final"]["kernel"] == P("model", None)
    assert attn["proj_k"]["kernel"] == P(None, None)


class TestOptStateShardings:
  """Opt-state layouts derive from the param layouts by path (Adam
  moments mirror the param tree; counters replicate)."""

  def test_moments_mirror_param_layouts(self, params):
    import optax

    from cadence_gemma_tpu.parallel import sharding as sh

    mesh = sh.make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    tx = optax.adam(1e-3)
    shardings = partitioning.opt_state_shardings(mesh, tx, params)
    # ScaleByAdamState: (count, mu, nu) inside the chain.
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    param_specs = partitioning.griffin_param_specs(params)

    def spec_at(names):
      node = param_specs
      for n in names:
        node = node[n]
      return node

    def norm(spec):
      # Trailing Nones are semantic no-ops; the spec tables write them
      # explicitly while _drop_indivisible strips them.
      entries = list(spec)
      while entries and entries[-1] is None:
        entries.pop()
      return P(*entries)

    count_seen = moment_seen = 0
    for path, sharding in flat:
      names = tuple(
          k.key for k in path
          if isinstance(k, jax.tree_util.DictKey)
      )
      if not names:
        count_seen += 1
        assert sharding.spec == P(), (path, sharding)
      else:
        moment_seen += 1
        assert norm(sharding.spec) == norm(spec_at(names)), (
            path, sharding
        )
    assert count_seen >= 1 and moment_seen > 10

  def test_replicates_without_model_axis(self, params):
    import optax

    from cadence_gemma_tpu.parallel import sharding as sh

    mesh = sh.make_mesh((4,), ("data",), jax.devices()[:4])
    tx = optax.adam(1e-3)
    shardings = partitioning.opt_state_shardings(mesh, tx, params)
    for _, s in jax.tree_util.tree_flatten_with_path(shardings)[0]:
      assert s.spec == P(), s
