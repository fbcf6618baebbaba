"""Multi-host (multi-process) scaffolding: DCN x ICI meshes.

The reference is strictly single-process on the JAX path (its only
multi-device story is torch DDP over NCCL, ``training/train.py:63-71``);
SURVEY §2.6 calls for the XLA-collective equivalent over "ICI/DCN". This
module supplies the missing pieces for pods larger than one host:

  * :func:`initialize` — a guarded ``jax.distributed.initialize`` wrapper
    (env autodetection on TPU pods, idempotent, no-op for single process).
  * :func:`make_hybrid_mesh` — a mesh whose leading axes span the
    data-center network (DCN, between hosts) and whose trailing axes span
    the ICI (within a host's chips), built with
    ``mesh_utils.create_hybrid_device_mesh`` so that collectives over the
    trailing axes never cross DCN. Shard model/sequence axes on ICI;
    keep only data parallelism (per-step gradient all-reduce) on DCN.
  * :func:`dp_over_dcn_mesh` — the standard pod preset:
    ``(dcn=processes) x (data, sequence, model)`` within each host.

Single-process runs (tests, the one-chip bench) get ordinary local
meshes from the same entry points, so calling code does not branch.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np

_INITIALIZED = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
  """Initializes ``jax.distributed`` when running multi-process.

  Safe to call unconditionally at program start:
    * If the process group is already initialized (or this helper already
      ran), it is a no-op.
    * With no arguments and no multi-process environment (no
      ``JAX_COORDINATOR_ADDRESS``/cloud-TPU metadata), it is a no-op —
    single-host runs need no process group.
    * Otherwise it calls ``jax.distributed.initialize`` (which
      autodetects TPU-pod topology when arguments are None).

  Returns the process count after initialization (1 for single-host).
  """
  global _INITIALIZED
  if _INITIALIZED:
    return jax.process_count()
  # A launcher may have initialized the process group before us; don't
  # call jax.distributed.initialize a second time (it raises).
  try:
    from jax._src import distributed as _dist  # pytype: disable=import-error

    if getattr(_dist.global_state, "client", None) is not None:
      _INITIALIZED = True
      return jax.process_count()
  except (ImportError, AttributeError):
    # jax._src.distributed is private API with no stability guarantee; a
    # missing module OR a renamed global_state just means we can't detect
    # a pre-initialized group — proceed with normal initialization.
    pass
  explicit = coordinator_address is not None
  env = (
      os.environ.get("JAX_COORDINATOR_ADDRESS")
      or os.environ.get("COORDINATOR_ADDRESS")
      or os.environ.get("TPU_WORKER_HOSTNAMES")
  )
  if not explicit and not env:
    return jax.process_count()
  jax.distributed.initialize(
      coordinator_address=coordinator_address,
      num_processes=num_processes,
      process_id=process_id,
  )
  _INITIALIZED = True
  return jax.process_count()


def make_hybrid_mesh(
    ici_axis_shapes: Sequence[int],
    ici_axis_names: Sequence[str],
    dcn_axis_shapes: Sequence[int] | None = None,
    dcn_axis_names: Sequence[str] = ("dcn",),
    devices: Sequence[jax.Device] | None = None,
) -> jax.sharding.Mesh:
  """A mesh with DCN-spanning leading axes and ICI-spanning trailing axes.

  Args:
    ici_axis_shapes / ici_axis_names: The per-host (per-"granule") mesh —
      every collective over these axes stays on ICI.
    dcn_axis_shapes: Sizes of the cross-host axes (product must equal the
      process count). None = ``(process_count,)``. Keep these to data
      parallelism: DCN bandwidth is orders of magnitude below ICI, so a
      per-step gradient all-reduce is fine but per-layer TP/SP collectives
      are not.
    dcn_axis_names: Names for the cross-host axes.
    devices: Override the device list (tests use mocked topologies).

  Returns:
    A Mesh with axes ``(*dcn_axis_names, *ici_axis_names)``. Single-
    process topologies collapse the DCN axes to size 1 so the same mesh
    shape works everywhere.
  """
  devices = list(devices if devices is not None else jax.devices())
  n_proc = len({d.process_index for d in devices})
  if dcn_axis_shapes is None:
    dcn_axis_shapes = (n_proc,)
  if len(dcn_axis_shapes) != len(dcn_axis_names):
    raise ValueError(
        f"dcn shapes {dcn_axis_shapes} / names {dcn_axis_names} mismatch."
    )
  dcn_total = int(np.prod(dcn_axis_shapes))
  ici_total = int(np.prod(ici_axis_shapes))
  if dcn_total != n_proc:
    raise ValueError(
        f"DCN axes {tuple(dcn_axis_shapes)} must multiply to the process "
        f"count {n_proc}."
    )
  if dcn_total * ici_total != len(devices):
    raise ValueError(
        f"Mesh {tuple(dcn_axis_shapes)} x {tuple(ici_axis_shapes)} needs "
        f"{dcn_total * ici_total} devices, have {len(devices)}."
    )
  names = tuple(dcn_axis_names) + tuple(ici_axis_names)
  if n_proc == 1:
    # Single granule: a plain local mesh (no hybrid machinery needed).
    arr = np.asarray(devices).reshape(
        tuple(dcn_axis_shapes) + tuple(ici_axis_shapes)
    )
    return jax.sharding.Mesh(arr, names)
  from jax.experimental import mesh_utils

  # create_hybrid_device_mesh takes same-rank shapes whose elementwise
  # product is the final mesh shape: the DCN axes replicate-1 on the ICI
  # positions and vice versa.
  arr = mesh_utils.create_hybrid_device_mesh(
      mesh_shape=(1,) * len(dcn_axis_shapes) + tuple(ici_axis_shapes),
      dcn_mesh_shape=tuple(dcn_axis_shapes) + (1,) * len(ici_axis_shapes),
      devices=devices,
      # Granule = process (host): ICI axes never cross hosts. (The
      # default granule, slice_index, is GKE/multi-slice-specific.)
      process_is_granule=True,
  )
  return jax.sharding.Mesh(arr, names)


def dp_over_dcn_mesh(
    data: int = 1,
    sequence: int = 1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> jax.sharding.Mesh:
  """The standard pod preset: DP across hosts, (data, seq, model) within.

  ``data * sequence * model`` must equal the per-host device count; the
  cross-host axis is named ``dcn`` and should carry only batch sharding
  (compose its PartitionSpec with the in-host ``data`` axis, e.g.
  ``P(("dcn", "data"), ...)`` for batched inputs).
  """
  return make_hybrid_mesh(
      (data, sequence, model), ("data", "sequence", "model"),
      devices=devices,
  )
