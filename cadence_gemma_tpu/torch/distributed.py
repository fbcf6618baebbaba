"""Distributed data-parallel training for the torch twin (gloo backend).

Counterpart of the reference's DDP path
(``/root/reference/training/train.py:66-71`` setup, ``:597-624`` per-rank
train with ``DDP(..., find_unused_parameters=True)``, ``:708-709``
``mp.spawn`` over devices). Deliberate TPU-native deviations:

  * backend is **gloo** (torch's CPU collective transport), not NCCL — the
    production multi-device path of this framework is the JAX sharded step
    (:func:`cadence_gemma_tpu.training.trainer.make_sharded_train_step`);
    this module exists so the torch twin reaches full reference parity and
    runs anywhere torch does, GPUs or not.
  * loss normalization is **global-batch exact**: the reference's per-rank
    masked NLL divides by the *local* mask count, so DDP's gradient
    averaging silently re-weights ranks whenever their mask counts differ
    (ragged answers). :func:`ddp_forward_and_loss_fn` all-reduces the mask
    count and scales so the DDP-averaged gradient equals the single-process
    gradient on the concatenated global batch bit-for-bit (up to fp32
    summation order) — the same semantics the JAX sharded step gets from
    GSPMD computing ``sum(target_mask)`` over the whole sharded batch
    (``training/trainer.py:117``).
  * gradient accumulation uses ``model.no_sync()`` on non-final
    microbatches, so the inter-rank all-reduce fires once per optimizer
    step instead of once per microbatch.

Process bootstrap mirrors the reference's ``setup``/``cleanup`` shape but
accepts a ``file://`` init method so tests (and single-host CPU runs) need
no free TCP port coordination.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence

import torch
import torch.distributed as dist
from torch.nn.parallel import DistributedDataParallel as DDP

from cadence_gemma_tpu.torch import trainer as _trainer


def setup(
    rank: int,
    world_size: int,
    init_method: Optional[str] = None,
    backend: str = "gloo",
) -> None:
  """Initialize the process group (reference ``train.py:66-71``, gloo).

  With ``init_method=None`` this uses the reference's env:// scheme
  (``MASTER_ADDR``/``MASTER_PORT``, defaulted to localhost:12355). Pass a
  ``file://`` URL for hermetic multi-process tests.
  """
  if init_method is None:
    os.environ.setdefault("MASTER_ADDR", "localhost")
    os.environ.setdefault("MASTER_PORT", "12355")
    dist.init_process_group(backend, rank=rank, world_size=world_size)
  else:
    dist.init_process_group(
        backend, init_method=init_method, rank=rank, world_size=world_size
    )


def cleanup() -> None:
  """Destroy the process group (reference ``train.py:73-74``)."""
  dist.destroy_process_group()


def wrap_ddp(
    model: torch.nn.Module, find_unused_parameters: bool = True
) -> DDP:
  """Wrap the torch Griffin in DDP (reference ``train.py:624``).

  ``find_unused_parameters=True`` matches the reference call and is load-
  bearing for the same reason there: text-only batches never run the
  ``vl_connector``, and the stage-1 frozen step marks most parameters
  ``requires_grad=False`` — either leaves parameters out of the autograd
  graph. No ``device_ids`` because gloo DDP drives whatever device the
  module already lives on (CPU here).
  """
  return DDP(model, find_unused_parameters=find_unused_parameters)


def shard_batch(
    rows: torch.Tensor, rank: int, world_size: int
) -> torch.Tensor:
  """This rank's contiguous slice of a global batch's leading dim.

  Equivalent of ``torch.utils.data.DistributedSampler``'s partitioning for
  pre-batched tensors (the reference shards inside its dataset builder).
  Requires the global batch to divide evenly — mirrors the JAX sharded
  step, where the mesh's data axis must divide the batch.
  """
  n = rows.shape[0]
  if n % world_size:
    raise ValueError(
        f"global batch {n} not divisible by world_size {world_size}"
    )
  per = n // world_size
  return rows[rank * per:(rank + 1) * per]


def all_reduce_sum(value: torch.Tensor) -> torch.Tensor:
  """All-reduced detached copy (SUM); identity without a process group."""
  out = value.detach().clone()
  if dist.is_available() and dist.is_initialized():
    dist.all_reduce(out, op=dist.ReduceOp.SUM)
  return out


def global_mask_count(target_mask: torch.Tensor) -> torch.Tensor:
  """All-reduced total mask count (fp32, detached constant)."""
  return all_reduce_sum(target_mask.sum().float())


def ddp_forward_and_loss_fn(
    model,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    pad_id: int,
    image: Optional[torch.Tensor] = None,
) -> torch.Tensor:
  """Masked NLL scaled so DDP's gradient mean is the global-batch gradient.

  Let ``s_r`` be this rank's masked log-prob sum and ``C`` the global mask
  count. The returned loss is ``-s_r * W / C`` (W = world size); DDP
  averages gradients over ranks, giving ``-(1/W)·Σ_r ∂(s_r W / C)
  = -∂(Σ_r s_r)/C`` — exactly the single-process loss gradient on the
  concatenated batch (``trainer.forward_and_loss_fn`` semantics with its
  global count). The scalar itself is rank-local; use
  :func:`reduce_mean_loss` for the (exact global) logging value.
  """
  total, local_count = _trainer.masked_logprob_sum(
      model, input_tokens, input_mask, pad_id, image=image
  )
  world = dist.get_world_size() if dist.is_initialized() else 1
  return -total * world / (all_reduce_sum(local_count) + 1e-8)


def reduce_mean_loss(loss: torch.Tensor) -> torch.Tensor:
  """Average the per-rank scaled losses → the exact global-batch loss."""
  out = loss.detach().clone()
  if dist.is_available() and dist.is_initialized():
    dist.all_reduce(out, op=dist.ReduceOp.SUM)
    out /= dist.get_world_size()
  return out


def ddp_train_step(
    model: DDP,
    optimizer: torch.optim.Optimizer,
    pad_id: int,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    img_embed: Optional[torch.Tensor] = None,
    grad_clip_norm: Optional[float] = 1.0,
    accumulation_steps: int = 1,
    accumulation_index: int = 0,
) -> torch.Tensor:
  """One DDP (micro)step; mirrors ``trainer.train_step``.

  Non-final microbatches run under ``model.no_sync()`` so gradients
  accumulate locally and the all-reduce fires once, on the final
  microbatch's backward. Gradient clipping happens after the sync, so
  every rank clips the same (already-averaged) gradients and parameters
  stay bit-identical across ranks without a broadcast.
  """
  if accumulation_index == 0:
    optimizer.zero_grad(set_to_none=True)
  final = accumulation_index == accumulation_steps - 1
  if final:
    loss = ddp_forward_and_loss_fn(
        model, input_tokens, input_mask, pad_id, image=img_embed
    )
    (loss / accumulation_steps).backward()
  else:
    # The FORWARD must also run under no_sync: DDP latches
    # require_backward_grad_sync at forward time (prepare_for_backward),
    # so wrapping only the backward still all-reduces every microbatch.
    with model.no_sync():
      loss = ddp_forward_and_loss_fn(
          model, input_tokens, input_mask, pad_id, image=img_embed
      )
      (loss / accumulation_steps).backward()
  if final:
    if grad_clip_norm is not None:
      torch.nn.utils.clip_grad_norm_(
          (p for p in model.parameters() if p.requires_grad),
          grad_clip_norm,
      )
    optimizer.step()
  return loss.detach()


def _flush_tail_group(
    model: DDP,
    optimizer: torch.optim.Optimizer,
    grad_clip_norm: Optional[float],
) -> None:
  """Step on a partial accumulation tail whose grads were never synced.

  Tail microbatches ran under ``no_sync`` (their group's final microbatch
  never arrived), so DDP's reducer has not averaged them — do it manually
  with one all-reduce per gradient, then clip + step, matching
  ``trainer.train_epoch``'s tail semantics (the tail underweights
  slightly via the full-group divisor; dropping it entirely is worse).
  Every rank reaches this code with the same tail size, so the
  collectives match.
  """
  world = dist.get_world_size() if dist.is_initialized() else 1
  params = [p for p in model.parameters()
            if p.requires_grad and p.grad is not None]
  if not params:
    return
  for p in params:
    if world > 1:
      dist.all_reduce(p.grad, op=dist.ReduceOp.SUM)
      p.grad /= world
  if grad_clip_norm is not None:
    torch.nn.utils.clip_grad_norm_(params, grad_clip_norm)
  optimizer.step()
  optimizer.zero_grad(set_to_none=True)


def ddp_train_epoch(
    model: DDP,
    optimizer: torch.optim.Optimizer,
    pad_id: int,
    batches: Iterable,
    img_embeds: Optional[Iterable] = None,
    accumulation_steps: int = 1,
    grad_clip_norm: Optional[float] = 1.0,
    save_every: Optional[int] = None,
    save_path: Optional[str] = None,
) -> list[float]:
  """Drive :func:`ddp_train_step` over (tokens, mask) batches.

  Every rank must iterate the same number of batches (collectives are
  blocking); shard each global batch with :func:`shard_batch` beforehand.
  Returned losses are the all-reduced global values per microbatch. A
  tail group shorter than ``accumulation_steps`` still steps the
  optimizer (see :func:`_flush_tail_group`). With ``save_every``/
  ``save_path``, rank 0 writes an atomic checkpoint every N microbatches
  (``trainer.save_checkpoint``).
  """
  losses = []
  img_iter = iter(img_embeds) if img_embeds is not None else None
  last_index = -1
  for i, (tokens, mask) in enumerate(batches):
    img = next(img_iter) if img_iter is not None else None
    last_index = i % accumulation_steps
    loss = ddp_train_step(
        model,
        optimizer,
        pad_id,
        tokens,
        mask,
        img_embed=img,
        grad_clip_norm=grad_clip_norm,
        accumulation_steps=accumulation_steps,
        accumulation_index=last_index,
    )
    losses.append(float(reduce_mean_loss(loss)))
    if (save_every and save_path and (i + 1) % save_every == 0
        and (not dist.is_initialized() or dist.get_rank() == 0)):
      _trainer.save_checkpoint(save_path, model.module)
  if 0 <= last_index < accumulation_steps - 1:
    _flush_tail_group(model, optimizer, grad_clip_norm)
  return losses


def run_workers(worker, world_size: int, args: Sequence = ()) -> None:
  """``mp.spawn`` convenience mirroring reference ``train.py:708-709``."""
  import torch.multiprocessing as mp

  mp.spawn(worker, args=(world_size, *args), nprocs=world_size, join=True)
