"""Eager PyTorch SFT training for the torch twin.

Counterpart of the reference torch training loop
(``/root/reference/training/train.py:159-298``) with the exact loss
semantics of this framework's JAX trainer
(:mod:`cadence_gemma_tpu.training.trainer`):

  * masked next-token NLL in fp32; when pre-fused image features are
    spliced, the shifted targets are left-padded with ``vision_tokens``
    zero-mask rows so visual-position logits receive no loss;
  * AdamW with the Griffin weight-decay mask (no decay on RG-LRU
    parameters, the embedder, biases, or norm scales) and global-norm
    gradient clipping;
  * a full fine-tune step with optional gradient accumulation (the
    reference accumulates 4 microbatches via HF Accelerate,
    ``train.py:37``) and a stage-1 frozen step that updates only the
    vision-language connector (``train_jax.py:480-529`` semantics).

Deliberate deviations (documented in docs/PARITY.md §2.5): no
DDP/NCCL/Accelerate — multi-device training is the JAX sharded step
(``training.trainer.make_sharded_train_step``); this module exists so the
torch twin is trainable standalone and so cross-framework gradient parity
can be asserted (tests/test_torch_training.py).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import torch
import torch.nn.functional as F

_NO_DECAY_LEAVES = ("b", "bias", "scale", "a_param")


def get_positions(tokens: torch.Tensor, pad_id: int) -> torch.Tensor:
  """0-indexed positions over non-pad tokens (JAX trainer semantics)."""
  positions = torch.cumsum(tokens != pad_id, dim=-1)
  return positions - (positions >= 1).to(positions.dtype)


def masked_logprob_sum(
    model,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    pad_id: int,
    image: Optional[torch.Tensor] = None,
) -> tuple[torch.Tensor, torch.Tensor]:
  """(masked target log-prob sum, mask count) — the loss pre-division.

  Shared by :func:`forward_and_loss_fn` (local normalization) and the DDP
  loss (global normalization, ``distributed.ddp_forward_and_loss_fn``) so
  the forward/shift/splice-pad logic exists exactly once.
  """
  positions = get_positions(input_tokens, pad_id)
  logits, _ = model(
      input_tokens,
      positions,
      None,
      return_logits=True,
      return_cache=False,
      image=image,
  )
  logits = logits[:, :-1].float()
  targets = input_tokens[:, 1:]
  target_mask = input_mask[:, 1:]

  if image is not None:
    n_img = logits.shape[1] - targets.shape[1]
    targets = F.pad(targets, (n_img, 0))
    target_mask = F.pad(target_mask, (n_img, 0))

  logp = F.log_softmax(logits, dim=-1)
  picked = torch.gather(logp, -1, targets.long().unsqueeze(-1)).squeeze(-1)
  return (picked * target_mask.float()).sum(), target_mask.sum().float()


def forward_and_loss_fn(
    model,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    pad_id: int,
    image: Optional[torch.Tensor] = None,
) -> torch.Tensor:
  """Masked next-token NLL; zero loss on spliced visual positions.

  Mirrors ``training.trainer.forward_and_loss_fn`` (which itself mirrors
  reference ``train_jax.py:351-409``) so the two frameworks' losses and
  gradients agree bit-for-bit up to dtype rounding.
  """
  total, count = masked_logprob_sum(
      model, input_tokens, input_mask, pad_id, image=image
  )
  return -total / (count + 1e-8)


def decay_exempt(name: str) -> bool:
  """The Griffin weight-decay mask predicate for one parameter name.

  Same predicate as ``training.trainer.griffin_weight_decay_mask``: no
  decay anywhere under ``rg_lru`` or ``embedder``, nor on leaves named
  ``b``/``bias``/``scale`` (``a_param`` sits under ``rg_lru`` in the JAX
  tree; the torch twin names it explicitly). The single source of truth
  for both :func:`weight_decay_param_groups` and :class:`FusedAdamW`.
  """
  parts = name.split(".")
  return (
      "rg_lru" in parts
      or "embedder" in parts
      or parts[-1] in _NO_DECAY_LEAVES
  )


def weight_decay_param_groups(
    model: torch.nn.Module, weight_decay: float
) -> list[dict]:
  """AdamW param groups realizing the Griffin decay mask."""
  decay, no_decay = [], []
  for name, param in model.named_parameters():
    if not param.requires_grad:
      continue
    (no_decay if decay_exempt(name) else decay).append(param)
  return [
      {"params": decay, "weight_decay": weight_decay},
      {"params": no_decay, "weight_decay": 0.0},
  ]


def make_optimizer(
    model: torch.nn.Module,
    learning_rate: float,
    weight_decay: float = 0.1,
    b2: float = 0.96,
) -> torch.optim.Optimizer:
  """AdamW matching ``training.trainer.make_optimizer`` hyperparameters."""
  return torch.optim.AdamW(
      weight_decay_param_groups(model, weight_decay),
      lr=learning_rate,
      betas=(0.9, b2),
  )


class FusedAdamW:
  """Per-parameter AdamW stepped inside backward (reference
  ``train.py:144-157`` ``_AdamW``).

  Each trainable parameter gets its own single-param AdamW and a
  ``register_post_accumulate_grad_hook`` that steps + zeroes it the moment
  its gradient finishes accumulating — peak memory never holds the full
  gradient tree (the reference's trick for fitting the 2B fine-tune on one
  device). Two deliberate deviations from the reference:

    * the Griffin weight-decay mask applies per parameter (the reference's
      fused path decays everything, silently dropping the mask its JAX
      loop uses, ``train_jax.py:551-563``);
    * documented single-process only: global-norm clipping is impossible
      (gradients are consumed before the norm could be computed) and DDP's
      own backward hooks race the update, so the DDP path keeps the
      standard :func:`make_optimizer`.
  """

  def __init__(
      self,
      model: torch.nn.Module,
      learning_rate: float,
      weight_decay: float = 0.1,
      b2: float = 0.96,
      eps: float = 1e-8,
  ):
    self._optim = {}
    self._handles = []
    for name, p in model.named_parameters():
      if not p.requires_grad:
        continue
      self._optim[p] = torch.optim.AdamW(
          [p], foreach=False, lr=learning_rate, betas=(0.9, b2), eps=eps,
          weight_decay=0.0 if decay_exempt(name) else weight_decay,
      )
      self._handles.append(
          p.register_post_accumulate_grad_hook(self._hook)
      )

  def _hook(self, parameter: torch.Tensor) -> None:
    self._optim[parameter].step()
    self._optim[parameter].zero_grad(set_to_none=True)

  def state_dict(self) -> list[dict]:
    """Per-parameter optimizer states, in registration order."""
    return [opt.state_dict() for opt in self._optim.values()]

  def load_state_dict(self, states: list[dict]) -> None:
    for opt, state in zip(self._optim.values(), states, strict=True):
      opt.load_state_dict(state)

  def remove(self) -> None:
    """Deregister the hooks (e.g. before wrapping the model in DDP)."""
    for h in self._handles:
      h.remove()
    self._handles.clear()


def fused_train_step(
    model: torch.nn.Module,
    fused: FusedAdamW,
    pad_id: int,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    img_embed: Optional[torch.Tensor] = None,
) -> torch.Tensor:
  """One step under :class:`FusedAdamW`: backward IS the update."""
  del fused  # updates fire from the hooks; taken as an arg for lifetime
  loss = forward_and_loss_fn(
      model, input_tokens, input_mask, pad_id, image=img_embed
  )
  loss.backward()
  return loss.detach()


def save_checkpoint(path: str, model: torch.nn.Module) -> None:
  """Atomic ``{"params": state_dict}`` write (same-directory rename).

  The reference saves non-atomically to ``./temp.pt`` every 100 steps
  (``train.py:295-298``) — a kill mid-write corrupts the file there.
  """
  tmp = f"{path}.tmp"
  torch.save({"params": model.state_dict()}, tmp)
  os.replace(tmp, path)


def set_trainable(model: torch.nn.Module, frozen_llm: bool) -> None:
  """Stage-1 freeze: only ``vl_connector`` trains when ``frozen_llm``."""
  for name, param in model.named_parameters():
    param.requires_grad = (not frozen_llm) or name.startswith("vl_connector")


def train_step(
    model: torch.nn.Module,
    optimizer: torch.optim.Optimizer,
    pad_id: int,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    img_embed: Optional[torch.Tensor] = None,
    grad_clip_norm: Optional[float] = 1.0,
    accumulation_steps: int = 1,
    accumulation_index: int = 0,
) -> torch.Tensor:
  """One (micro)step; steps the optimizer on the last microbatch.

  With ``accumulation_steps == 1`` this is a plain full step. For
  accumulation, call with ``accumulation_index = 0..steps-1``; gradients
  average across microbatches and the update fires once.
  """
  if accumulation_index == 0:
    optimizer.zero_grad(set_to_none=True)
  loss = forward_and_loss_fn(
      model, input_tokens, input_mask, pad_id, image=img_embed
  )
  (loss / accumulation_steps).backward()
  if accumulation_index == accumulation_steps - 1:
    if grad_clip_norm is not None:
      torch.nn.utils.clip_grad_norm_(
          (p for p in model.parameters() if p.requires_grad),
          grad_clip_norm,
      )
    optimizer.step()
  return loss.detach()


def frozen_train_step(
    model: torch.nn.Module,
    optimizer: torch.optim.Optimizer,
    pad_id: int,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    img_embed: torch.Tensor,
    grad_clip_norm: Optional[float] = 1.0,
) -> torch.Tensor:
  """Stage-1 step: the optimizer must hold only ``vl_connector`` params.

  Convenience wrapper over :func:`train_step`; callers should have run
  ``set_trainable(model, frozen_llm=True)`` and built the optimizer after,
  so frozen parameters carry no optimizer state.
  """
  return train_step(
      model,
      optimizer,
      pad_id,
      input_tokens,
      input_mask,
      img_embed=img_embed,
      grad_clip_norm=grad_clip_norm,
  )


@torch.no_grad()
def validation_step(
    model: torch.nn.Module,
    pad_id: int,
    input_tokens: torch.Tensor,
    input_mask: torch.Tensor,
    img_embed: Optional[torch.Tensor] = None,
) -> torch.Tensor:
  """Loss only (reference ``train_jax.py:531-547`` semantics)."""
  return forward_and_loss_fn(
      model, input_tokens, input_mask, pad_id, image=img_embed
  )


def train_epoch(
    model: torch.nn.Module,
    optimizer: torch.optim.Optimizer,
    pad_id: int,
    batches: Iterable,
    img_embeds: Optional[Iterable] = None,
    accumulation_steps: int = 1,
    grad_clip_norm: Optional[float] = 1.0,
    save_every: Optional[int] = None,
    save_path: Optional[str] = None,
) -> list[float]:
  """Drives :func:`train_step` over an iterable of (tokens, mask) batches.

  A tail group shorter than ``accumulation_steps`` still steps the
  optimizer (flushed after the loop) — no batch's gradients are dropped.
  With ``save_every``/``save_path``, a ``{"params": state_dict}``
  checkpoint is written every N microbatches (reference
  ``train.py:295-298`` saves ``./temp.pt`` every 100 steps; here the path
  is explicit and the write is atomic via a same-directory rename).
  """
  losses = []
  img_iter = iter(img_embeds) if img_embeds is not None else None
  last_index = -1
  for i, (tokens, mask) in enumerate(batches):
    img = next(img_iter) if img_iter is not None else None
    last_index = i % accumulation_steps
    loss = train_step(
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
    losses.append(float(loss))
    if save_every and save_path and (i + 1) % save_every == 0:
      save_checkpoint(save_path, model)
  if 0 <= last_index < accumulation_steps - 1:
    # Flush the partial tail group: its microbatches averaged with the
    # full-group divisor, which slightly underweights them — acceptable
    # for a tail shorter than one group; dropping them entirely is not.
    if grad_clip_norm is not None:
      torch.nn.utils.clip_grad_norm_(
          (p for p in model.parameters() if p.requires_grad), grad_clip_norm
      )
    optimizer.step()
    optimizer.zero_grad(set_to_none=True)
  return losses
