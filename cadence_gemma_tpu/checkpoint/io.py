"""Orbax checkpoint I/O with pluggable restore-time sharding.

API-compatible with the reference utilities
(``/root/reference/recurrentgemma/jax/utils.py:25-78``):
``save_parameters(path, params)`` and
``load_parameters(path, sharding)`` where ``sharding`` is
``"single_device"``, ``"replicated"``, or a pytree of
``jax.sharding.Sharding`` matching the checkpoint structure.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import orbax.checkpoint as ocp

from cadence_gemma_tpu import array_typing as at


def save_parameters(checkpoint_path: str, params: at.Params) -> None:
  """Saves ``{"params": params}`` as an orbax PyTree checkpoint."""
  checkpointer = ocp.PyTreeCheckpointer()
  checkpointer.save(checkpoint_path, {"params": params})


def _replicated_sharding() -> jax.sharding.Sharding:
  mesh = jax.sharding.Mesh(jax.devices(), ("all",))
  return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def load_parameters(
    checkpoint_path: str,
    sharding: str | Mapping[str, Any] = "single_device",
) -> at.Params:
  """Restores a checkpoint with the requested placement.

  Args:
    checkpoint_path: Orbax checkpoint directory.
    sharding: ``"single_device"`` (first local device), ``"replicated"``
      (copied to every device), or a pytree of shardings matching the
      checkpoint tree for arbitrary placements (e.g. TP parameter layouts
      from :mod:`cadence_gemma_tpu.parallel.partitioning`).

  Returns:
    The restored parameter tree, placed as requested.
  """
  checkpointer = ocp.PyTreeCheckpointer()
  structure = checkpointer.metadata(checkpoint_path)
  # Newer orbax wraps the tree in StepMetadata/TreeMetadata containers.
  if hasattr(structure, "item_metadata"):
    structure = structure.item_metadata
  if hasattr(structure, "tree"):
    structure = structure.tree

  if isinstance(sharding, str):
    if sharding == "single_device":
      shard = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    elif sharding == "replicated":
      shard = _replicated_sharding()
    else:
      raise ValueError(f"Unknown sharding mode {sharding!r}.")
    sharding_tree = jax.tree_util.tree_map(lambda _: shard, structure)
  else:
    sharding_tree = sharding

  restore_args = jax.tree_util.tree_map(
      lambda _, s: ocp.ArrayRestoreArgs(restore_type=jax.Array, sharding=s),
      structure,
      sharding_tree,
  )
  return checkpointer.restore(checkpoint_path, restore_args=restore_args)


class AsyncTrainStateSaver:
  """Background training-state saves: the device keeps training while
  orbax serializes the previous state to disk.

  A synchronous checkpoint pauses training for the full write (seconds to
  minutes at multi-GB states); the async checkpointer snapshots device
  arrays and commits on a background thread. ``save`` waits for the
  previous in-flight write only (back-to-back saves never corrupt), so
  the common cadence — save every N steps — fully overlaps. Call
  :meth:`wait` (or use as a context manager) before relying on the last
  checkpoint being durable.
  """

  def __init__(self):
    self._checkpointer = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

  def save(
      self, checkpoint_path: str, params: at.Params, opt_state: Any,
      step: int,
  ) -> None:
    save_train_state(
        checkpoint_path, params, opt_state, step,
        checkpointer=self._checkpointer,
    )

  def wait(self) -> None:
    self._checkpointer.wait_until_finished()

  def __enter__(self):
    return self

  def __exit__(self, *exc_info):
    self.wait()
    self._checkpointer.close()
    return False


def save_train_state(
    checkpoint_path: str,
    params: at.Params,
    opt_state: Any,
    step: int,
    checkpointer: Any | None = None,
) -> None:
  """Saves a resumable training state (params + optimizer state + step).

  The reference only checkpoints final parameters (train_jax.py:784 /
  torch.save of state_dict every 100 steps) — interrupted runs restart
  from scratch there; here they resume exactly.

  ``checkpointer`` accepts an :class:`AsyncTrainStateSaver`'s underlying
  checkpointer (or any orbax checkpointer) for non-blocking saves.
  """
  checkpointer = checkpointer or ocp.PyTreeCheckpointer()
  checkpointer.save(
      checkpoint_path,
      {
          "params": params,
          "opt_state": opt_state,
          "step": jax.numpy.asarray(step),
      },
  )


def load_train_state(
    checkpoint_path: str,
    target: tuple[at.Params, Any] | None = None,
) -> tuple[at.Params, Any, int]:
  """Restores (params, opt_state, step) saved by :func:`save_train_state`.

  Args:
    checkpoint_path: Directory written by :func:`save_train_state`.
    target: Optional ``(params_like, opt_state_like)`` template. Without
      it, orbax reconstructs optimizer state as raw nested dicts — optax
      NamedTuple states (``.mu``/``.nu``) are lost and the next
      ``optimizer.update`` fails; pass the freshly-initialized state (as
      the train loop does) to restore into the true structure.
  """
  checkpointer = ocp.PyTreeCheckpointer()
  if target is not None:
    params_like, opt_state_like = target
    state = checkpointer.restore(
        checkpoint_path,
        item={
            "params": params_like,
            "opt_state": opt_state_like,
            "step": jax.numpy.asarray(0),
        },
    )
  else:
    state = checkpointer.restore(checkpoint_path)
  return state["params"], state["opt_state"], int(state["step"])
