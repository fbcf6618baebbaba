"""Eager PyTorch sampler (behavior twin of the JAX sampler).

Counterpart of reference ``recurrentgemma/torch/sampler.py:70-449``: the
same prefill-split + per-step decode state machine, run eagerly. Images
enter as pre-fused features (``img_embed``), raw pixels (``pixels``), or
a file path (``img_path`` — the reference threads an ``img_path`` down
to its torch model's embedded encoders); the latter two require a model
constructed with a ``vision_encoder`` and are encoded ONCE before the
prefill split.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import torch

from cadence_gemma_tpu import common


@dataclasses.dataclass
class SamplerOutput:
  text: list[str]
  tokens: list[torch.Tensor]
  logits: list[torch.Tensor]


@dataclasses.dataclass
class SamplingState:
  tokens_buffer: torch.Tensor
  step: int
  total_steps: int
  positions: torch.Tensor
  cache: dict[str, Any]
  done: torch.Tensor
  logits_buffer: Optional[torch.Tensor] = None


class Sampler:
  """Greedy / categorical sampler over the torch Griffin."""

  def __init__(
      self,
      model,
      vocab: Any,
      is_it_model: bool = False,
      device=None,
      greedy_sampling: bool = True,
  ):
    self.model = model
    self.vocab = vocab
    self._is_it_model = is_it_model
    self.device = device or next(model.parameters()).device
    self.greedy_sampling = greedy_sampling

  @property
  def vocab_size(self) -> int:
    return self.model.config.vocab_size

  @property
  def dtype(self) -> torch.dtype:
    return next(self.model.parameters()).dtype

  def tokenize(self, input_string: str) -> torch.Tensor:
    if self._is_it_model:
      input_string = common.apply_it_formatter(input_string)
    ids = self.vocab.EncodeAsIds(input_string)
    return torch.tensor(
        [self.vocab.bos_id()] + ids, dtype=torch.int32, device=self.device
    )

  def _sample_from_logits(self, logits: torch.Tensor) -> torch.Tensor:
    if self.greedy_sampling:
      return torch.argmax(logits, dim=-1)
    probs = torch.softmax(logits.float(), dim=-1)
    return torch.multinomial(probs, num_samples=1)[:, 0]

  @torch.no_grad()
  def __call__(
      self,
      input_strings: Sequence[str],
      total_generation_steps: int,
      echo: bool = False,
      return_logits: bool = False,
      end_sampling_at_eos_token: bool = True,
      img_embed: Optional[torch.Tensor] = None,
      pixels: Optional[torch.Tensor] = None,
      img_path: str = "",
  ) -> SamplerOutput:
    """Generates completions; mirrors the JAX sampler's output contract.

    At most one of ``img_embed`` / ``pixels`` / ``img_path`` may be
    given (the ModalSampler contract). ``pixels``/``img_path`` run the
    model-owned vision encoder once and share the features across the
    batch, like the reference's single-image torch path.
    """
    if total_generation_steps < 0:
      raise ValueError("total_generation_steps must be at least 0.")
    given = [img_embed is not None, pixels is not None, img_path != ""]
    if sum(given) > 1:
      raise ValueError("Pass at most one of img_embed, pixels, img_path.")
    if img_path:
      from cadence_gemma_tpu.models import vit as vit_lib

      # Host-side PIL decode + bicubic resize to the towers' input size
      # (the torch encoder twin takes already-sized pixels).
      size = getattr(
          getattr(self.model, "vision_encoder", None), "input_size", 384
      )
      pixels = torch.from_numpy(
          vit_lib.load_image(img_path, size=size)
      ).to(self.device)
    if pixels is not None:
      if pixels.ndim == 3:
        pixels = pixels[None]
      img_embed = self.model.encode_image(pixels).to(self.dtype)
      if img_embed.shape[0] == 1 and len(input_strings) > 1:
        img_embed = img_embed.expand(len(input_strings), -1, -1)

    all_ids = [self.tokenize(s) for s in input_strings]
    lengths = torch.tensor(
        [len(i) for i in all_ids], device=self.device
    )
    max_len = int(lengths.max())
    batch = len(all_ids)
    tokens = torch.full(
        (batch, max_len), self.vocab.pad_id(),
        dtype=torch.int32, device=self.device,
    )
    for i, ids in enumerate(all_ids):
      tokens[i, max_len - len(ids):] = ids
    pad_lengths = max_len - lengths

    positions = torch.arange(max_len, device=self.device).expand(batch, -1)
    positions = positions - max_len + lengths[:, None]
    positions = torch.clamp(positions, min=-1)

    n_img = img_embed.shape[1] if img_embed is not None else 0

    # Prefill.
    if total_generation_steps == 0 or max_len == 1:
      logits, cache = self.model(
          tokens, positions, None,
          return_logits=True,
          return_cache=total_generation_steps > 0,
          image=img_embed,
      )
      if n_img:
        # Keep only text-position logits (BOS + rest) so echoed logits
        # align with the text tokens.
        logits = torch.cat([logits[:, :1], logits[:, 1 + n_img:]], dim=1)
      prev_logits = (
          logits if total_generation_steps == 0 else logits[:, :0]
      )
      last_logits = logits[:, -1]
    else:
      prev_logits, cache = self.model(
          tokens[:, :-1], positions[:, :-1], None,
          return_logits=return_logits and echo,
          return_cache=True,
          image=img_embed,
      )
      step_logits, cache = self.model(
          tokens[:, -1:], positions[:, -1:] + n_img, cache,
          return_logits=True,
          return_cache=total_generation_steps > 1,
      )
      last_logits = step_logits[:, 0]
      if prev_logits is not None and n_img:
        # Drop visual-token logits so echoed logits align with text tokens.
        prev_logits = torch.cat(
            [prev_logits[:, :1], prev_logits[:, 1 + n_img:]], dim=1
        )

    tokens_buffer = torch.full(
        (batch, total_generation_steps), self.vocab.pad_id(),
        dtype=torch.int32, device=self.device,
    )
    logits_buffer = None
    if return_logits:
      logits_buffer = torch.zeros(
          batch, total_generation_steps, self.vocab_size,
          dtype=self.dtype, device=self.device,
      )

    done = torch.zeros(batch, dtype=torch.bool, device=self.device)
    if total_generation_steps > 0:
      next_token = self._sample_from_logits(last_logits)
      tokens_buffer[:, 0] = next_token
      if logits_buffer is not None:
        logits_buffer[:, 0] = last_logits
      if end_sampling_at_eos_token:
        done |= next_token == self.vocab.eos_id()

      step_positions = positions[:, -1:] + 1 + n_img
      for step in range(total_generation_steps - 1):
        if bool(done.all()):
          break
        logits, cache = self.model(
            tokens_buffer[:, step:step + 1], step_positions, cache,
            return_logits=True, return_cache=True,
        )
        next_token = self._sample_from_logits(logits[:, 0])
        # Reference keeps writing pad-free tokens after done; we freeze
        # finished rows to pad for cleanliness.
        next_token = torch.where(
            done, torch.full_like(next_token, self.vocab.pad_id()),
            next_token,
        )
        tokens_buffer[:, step + 1] = next_token
        if logits_buffer is not None:
          logits_buffer[:, step + 1] = logits[:, 0]
        if end_sampling_at_eos_token:
          done |= next_token == self.vocab.eos_id()
        step_positions = step_positions + 1

    if echo:
      tokens_buffer = torch.cat([tokens, tokens_buffer], dim=1)
      if return_logits:
        if total_generation_steps == 0:
          logits_buffer = prev_logits
        else:
          # Matches the JAX/reference echo layout (sampler.py:366-367):
          # prompt logits, the last-token logits, then the decode buffer
          # (whose slot 0 repeats the last-token logits).
          logits_buffer = torch.cat(
              [prev_logits, last_logits[:, None], logits_buffer], dim=1
          )

    out_tokens = [
        seq[int(l):] if echo else seq
        for seq, l in zip(tokens_buffer, pad_lengths)
    ]
    out_logits = []
    if return_logits:
      out_logits = [
          seq[int(l):] if echo else seq
          for seq, l in zip(logits_buffer, pad_lengths)
      ]
    return SamplerOutput(
        text=[self.vocab.DecodeIds(t.tolist()) for t in out_tokens],
        tokens=out_tokens,
        logits=out_logits,
    )
