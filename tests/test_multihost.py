"""Multi-host scaffolding: DCN x ICI mesh construction with mocked
topologies (SURVEY §2.6 "ICI/DCN" comm-backend row; the reference has no
multi-process JAX story at all)."""

import dataclasses

import jax
import numpy as np
import pytest

from cadence_gemma_tpu.parallel import multihost


@dataclasses.dataclass(frozen=True)
class FakeDevice:
  """Just enough device surface for mesh_utils' hybrid-mesh builder."""

  id: int
  process_index: int
  platform: str = "cpu"
  device_kind: str = "fake"

  @property
  def coords(self):
    return (self.id % 4, self.id // 4, 0)


def fake_topology(n_proc, per_proc):
  return [
      FakeDevice(id=p * per_proc + i, process_index=p)
      for p in range(n_proc)
      for i in range(per_proc)
  ]


class TestHybridMesh:

  def test_single_process_collapses_to_local_mesh(self):
    mesh = multihost.make_hybrid_mesh(
        (2, 4), ("data", "model"), devices=jax.devices()
    )
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape == {"dcn": 1, "data": 2, "model": 4}

  def test_mocked_two_hosts(self):
    devices = fake_topology(n_proc=2, per_proc=4)
    mesh = multihost.make_hybrid_mesh(
        (2, 2), ("data", "model"), devices=devices
    )
    assert mesh.shape == {"dcn": 2, "data": 2, "model": 2}
    arr = np.asarray(mesh.devices)
    # Every ICI (trailing-axes) slice must stay within one process, so
    # per-layer collectives never cross DCN.
    for d in range(2):
      procs = {dev.process_index for dev in arr[d].flatten()}
      assert len(procs) == 1, procs

  def test_mocked_four_hosts_dp_preset(self):
    devices = fake_topology(n_proc=4, per_proc=8)
    mesh = multihost.dp_over_dcn_mesh(
        data=2, sequence=2, model=2, devices=devices
    )
    assert mesh.axis_names == ("dcn", "data", "sequence", "model")
    assert mesh.shape["dcn"] == 4
    arr = np.asarray(mesh.devices)
    for d in range(4):
      procs = {dev.process_index for dev in arr[d].flatten()}
      assert len(procs) == 1, procs

  def test_wrong_process_count_raises(self):
    devices = fake_topology(n_proc=2, per_proc=4)
    with pytest.raises(ValueError, match="process count"):
      multihost.make_hybrid_mesh(
          (2, 2), ("data", "model"), dcn_axis_shapes=(3,), devices=devices
      )

  def test_wrong_device_count_raises(self):
    with pytest.raises(ValueError, match="devices"):
      multihost.make_hybrid_mesh(
          (2, 8), ("data", "model"), devices=jax.devices()
      )

  def test_initialize_is_noop_single_host(self, monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert multihost.initialize() == jax.process_count() == 1


class TestHybridMeshSharding:

  def test_dcn_composed_batch_sharding_compiles(self):
    """P(('dcn','data'), ...) inputs shard and execute on the 8 local
    devices when dcn collapses to 1 — the single-host degenerate case of
    the pod layout."""
    mesh = multihost.make_hybrid_mesh(
        (2, 2, 2), ("data", "sequence", "model"), devices=jax.devices()
    )
    P = jax.sharding.PartitionSpec
    x = jax.device_put(
        np.ones((4, 16), np.float32),
        jax.sharding.NamedSharding(mesh, P(("dcn", "data"), None)),
    )
    y = jax.jit(lambda v: (v * 2).sum())(x)
    assert float(y) == 4 * 16 * 2
