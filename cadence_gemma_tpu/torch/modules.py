"""PyTorch Griffin building blocks, numerically matched to the JAX path.

Counterpart of reference ``recurrentgemma/torch/modules.py`` (same cache
semantics and parameter names); see the JAX twin
(``cadence_gemma_tpu/models/modules.py``) for the algorithmic commentary.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Union

import torch
from torch import nn

from cadence_gemma_tpu.torch import layers

_MIN_LOGITS_VALUE = -2.3819763e38
_MAX_WAVELENGTH = 10_000


class RecurrentBlockCache(NamedTuple):
  rg_lru_state: torch.Tensor
  conv1d_state: torch.Tensor


class AttentionBlockCache(NamedTuple):
  keys: torch.Tensor
  values: torch.Tensor
  num_tokens: torch.Tensor


ResidualBlockCache = Union[RecurrentBlockCache, AttentionBlockCache]


def apply_rope(
    inputs: torch.Tensor,
    positions: torch.Tensor,
    max_wavelength: int = _MAX_WAVELENGTH,
) -> torch.Tensor:
  """Partial RoPE on the first half of head dims (see JAX twin)."""
  rotated, passthrough = torch.chunk(inputs, 2, dim=-1)
  half = rotated.shape[-1] // 2

  exponents = 2.0 * torch.arange(half, device=inputs.device) / rotated.shape[-1]
  inv_timescale = max_wavelength ** (-exponents)
  angles = positions[..., None, None].float() * inv_timescale
  sin = torch.sin(angles).to(inputs.dtype)
  cos = torch.cos(angles).to(inputs.dtype)

  first, second = torch.chunk(rotated, 2, dim=-1)
  return torch.cat(
      [first * cos - second * sin, second * cos + first * sin, passthrough],
      dim=-1,
  )


def _causal_window_mask(
    q_positions, k_positions, window_size, q_segment_ids=None,
    k_segment_ids=None,
):
  if q_segment_ids is not None or k_segment_ids is not None:
    same_segment = q_segment_ids[..., None] == k_segment_ids[..., None, :]
  else:
    same_segment = (k_positions >= 0)[..., None, :]
  causal = q_positions[..., None] >= k_positions[..., None, :]
  in_window = q_positions[..., None] <= k_positions[..., None, :] + window_size
  return same_segment & causal & in_window


def compute_forward_pass_mask(segment_pos, window_size):
  segment_ids = torch.cumsum(segment_pos == 0, dim=-1)
  positions = torch.arange(
      segment_pos.shape[-1], device=segment_pos.device
  ).expand(segment_pos.shape[0], -1)
  return _causal_window_mask(
      positions, positions, window_size, segment_ids, segment_ids
  )


def compute_cache_mask(seq_len, cache_num_tokens, window_size):
  device = cache_num_tokens.device
  q_positions = (
      torch.arange(seq_len, device=device)[None] + cache_num_tokens[:, None]
  )
  wraps = torch.div(
      cache_num_tokens[:, None], window_size, rounding_mode="floor"
  )
  slots = torch.arange(window_size, device=device)[None]
  pos_current = slots + wraps * window_size
  pos_previous = slots + (wraps - 1) * window_size
  written = pos_current < cache_num_tokens[:, None]
  k_positions = torch.where(written, pos_current, pos_previous)
  k_positions = torch.cat([k_positions, q_positions], dim=-1)
  return _causal_window_mask(q_positions, k_positions, window_size)


def _right_align_in_window(keys, values, segment_pos, window_size):
  w = min(window_size, keys.shape[1])
  num_tokens = segment_pos[:, -1] + 1
  rolled_k, rolled_v = [], []
  for i in range(keys.shape[0]):
    shift = int(num_tokens[i]) % max(w, 1)
    rolled_k.append(torch.roll(keys[i, -w:], shift, dims=0))
    rolled_v.append(torch.roll(values[i, -w:], shift, dims=0))
  keys = torch.stack(rolled_k)
  values = torch.stack(rolled_v)
  pad = (0, 0, 0, 0, 0, window_size - w)
  return AttentionBlockCache(
      keys=nn.functional.pad(keys, pad),
      values=nn.functional.pad(values, pad),
      num_tokens=num_tokens,
  )


def update_attention_cache(keys, values, segment_pos, cache):
  seq_len = keys.shape[1]
  window_size = cache.keys.shape[1]

  if seq_len == 1:
    batch_idx = torch.arange(keys.shape[0], device=keys.device)
    slot = cache.num_tokens % window_size
    new_keys = cache.keys.clone()
    new_values = cache.values.clone()
    new_keys[batch_idx, slot] = keys[:, 0]
    new_values[batch_idx, slot] = values[:, 0]
    return AttentionBlockCache(new_keys, new_values, cache.num_tokens + 1)

  if seq_len >= window_size:
    return _right_align_in_window(keys, values, segment_pos, window_size)

  # Chunked prefill: unroll ring, append, re-roll (generalizes the reference).
  new_k, new_v = [], []
  for i in range(keys.shape[0]):
    n = int(cache.num_tokens[i])
    k_lin = torch.roll(cache.keys[i], -(n % window_size), dims=0)
    v_lin = torch.roll(cache.values[i], -(n % window_size), dims=0)
    k_all = torch.cat([k_lin, keys[i]], dim=0)[-window_size:]
    v_all = torch.cat([v_lin, values[i]], dim=0)[-window_size:]
    new_n = n + seq_len
    new_k.append(torch.roll(k_all, new_n % window_size, dims=0))
    new_v.append(torch.roll(v_all, new_n % window_size, dims=0))
  return AttentionBlockCache(
      torch.stack(new_k), torch.stack(new_v), cache.num_tokens + seq_len
  )


class LocalAttentionBlock(nn.Module):
  """Sliding-window MQA (single shared KV head)."""

  def __init__(
      self,
      width: int,
      num_heads: int,
      window_size: int,
      final_w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.width = width
    self.num_heads = num_heads
    self.window_size = window_size
    head_dim = width // num_heads
    kw = dict(device=device, dtype=dtype)
    self.proj_q = nn.Linear(width, width, bias=False, **kw)
    self.proj_k = nn.Linear(width, head_dim, bias=False, **kw)
    self.proj_v = nn.Linear(width, head_dim, bias=False, **kw)
    self.proj_final = nn.Linear(width, width, bias=True, **kw)
    for lin, scale in [
        (self.proj_q, 1.0), (self.proj_k, 1.0), (self.proj_v, 1.0),
        (self.proj_final, final_w_init_variance_scale),
    ]:
      with torch.no_grad():
        lin.weight.normal_(0.0, math.sqrt(scale / width))
    with torch.no_grad():
      self.proj_final.bias.zero_()

  @property
  def head_dim(self):
    return self.width // self.num_heads

  def forward(
      self,
      x: torch.Tensor,
      segment_pos: torch.Tensor,
      cache: Optional[AttentionBlockCache] = None,
      return_cache: bool = True,
  ):
    b, t, _ = x.shape
    queries = self.proj_q(x).reshape(b, t, self.num_heads, self.head_dim)
    keys = self.proj_k(x)[:, :, None, :]
    values = self.proj_v(x)[:, :, None, :]

    queries = apply_rope(queries, segment_pos)
    keys = apply_rope(keys, segment_pos)

    if cache is not None:
      new_cache = (
          update_attention_cache(keys, values, segment_pos, cache)
          if return_cache else None
      )
      keys = torch.cat([cache.keys, keys], dim=1)
      values = torch.cat([cache.values, values], dim=1)
      attn_mask = compute_cache_mask(t, cache.num_tokens, self.window_size)
    else:
      new_cache = (
          _right_align_in_window(keys, values, segment_pos, self.window_size)
          if return_cache else None
      )
      attn_mask = compute_forward_pass_mask(segment_pos, self.window_size)

    logits = torch.einsum("btnh,bsnh->bnts", queries, keys)
    logits = logits * (self.head_dim**-0.5)
    masked = torch.where(
        attn_mask[:, None], logits.float(),
        torch.tensor(_MIN_LOGITS_VALUE, device=x.device),
    )
    probs = torch.softmax(masked, dim=-1).to(x.dtype)
    encoded = torch.einsum("bnts,bsnh->btnh", probs, values)
    encoded = encoded.reshape(b, t, self.width)
    return self.proj_final(encoded), new_cache

  @classmethod
  def init_cache(cls, batch_size, window_size, heads_dim, dtype, device=None):
    return AttentionBlockCache(
        keys=torch.zeros(
            batch_size, window_size, 1, heads_dim, dtype=dtype, device=device
        ),
        values=torch.zeros(
            batch_size, window_size, 1, heads_dim, dtype=dtype, device=device
        ),
        num_tokens=torch.zeros(batch_size, dtype=torch.int32, device=device),
    )


class RecurrentBlock(nn.Module):
  """gelu(linear_y) ⊙ (linear_x → Conv1D → RG-LRU) → linear_out."""

  def __init__(
      self,
      width: int,
      num_heads: int,
      lru_width: Optional[int] = None,
      conv1d_temporal_width: int = 4,
      final_w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    lru_width = lru_width or width
    kw = dict(device=device, dtype=dtype)
    self.linear_y = nn.Linear(width, lru_width, **kw)
    self.linear_x = nn.Linear(width, lru_width, **kw)
    self.linear_out = nn.Linear(lru_width, width, **kw)
    for lin, fan_in, scale in [
        (self.linear_y, width, 1.0), (self.linear_x, width, 1.0),
        (self.linear_out, lru_width, final_w_init_variance_scale),
    ]:
      with torch.no_grad():
        lin.weight.normal_(0.0, math.sqrt(scale / fan_in))
        lin.bias.zero_()
    self.conv_1d = layers.Conv1D(
        lru_width, conv1d_temporal_width, **kw
    )
    self.rg_lru = layers.RGLRU(lru_width, num_heads, **kw)

  def forward(self, x, segment_pos, cache=None, return_cache=True):
    y = layers.gelu(self.linear_y(x))
    x = self.linear_x(x)
    x, conv1d_state = self.conv_1d(
        x, segment_pos,
        None if cache is None else cache.conv1d_state, return_cache,
    )
    x, rg_lru_state = self.rg_lru(
        x, segment_pos,
        None if cache is None else cache.rg_lru_state, return_cache,
    )
    x = self.linear_out(x * y)
    if not return_cache:
      return x, None
    return x, RecurrentBlockCache(rg_lru_state, conv1d_state)

  @classmethod
  def init_cache(
      cls, batch_size, lru_width, dtype, conv1d_temporal_width=4, device=None
  ):
    return RecurrentBlockCache(
        rg_lru_state=layers.RGLRU.init_cache(batch_size, lru_width, device),
        conv1d_state=layers.Conv1D.init_cache(
            batch_size, lru_width, dtype, conv1d_temporal_width, device
        ),
    )


class MLPBlock(nn.Module):
  """Gated-GeLU MLP with fused up-projection."""

  def __init__(
      self,
      width: int,
      expanded_width: int,
      final_w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.ffw_up = layers.Einsum(
        w_shape=(2, width, expanded_width),
        b_shape=(2, 1, 1, expanded_width),
        eqn="...td,cdD->c...tD",
        device=device,
        dtype=dtype,
    )
    self.ffw_down = nn.Linear(expanded_width, width, device=device,
                              dtype=dtype)
    with torch.no_grad():
      self.ffw_down.weight.normal_(
          0.0, math.sqrt(final_w_init_variance_scale / expanded_width)
      )
      self.ffw_down.bias.zero_()

  def forward(self, x):
    gate_and_up = self.ffw_up(x)
    return self.ffw_down(layers.gelu(gate_and_up[0]) * gate_and_up[1])


class VisionLanguageConnector(nn.Module):
  """Vision→LM projector MLP (torch twin of the JAX vl_connector)."""

  def __init__(
      self,
      width: int,
      expanded_width: int,
      vision_width: int = 2176,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.ffw_up = layers.Einsum(
        w_shape=(1, vision_width, expanded_width),
        b_shape=(1, 1, 1, expanded_width),
        eqn="...td,rdD->r...tD",
        device=device,
        dtype=dtype,
    )
    self.ffw_down = nn.Linear(expanded_width, width, device=device,
                              dtype=dtype)

  def forward(self, x):
    return self.ffw_down(layers.gelu(self.ffw_up(x)[0]))


class ResidualBlock(nn.Module):
  """Pre-norm residual block (temporal mixer + MLP)."""

  def __init__(
      self,
      width: int,
      mlp_expanded_width: int,
      num_heads: int,
      attention_window_size: int,
      temporal_block_type,
      lru_width: Optional[int] = None,
      conv1d_temporal_width: int = 4,
      final_w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    from cadence_gemma_tpu import common  # noqa: PLC0415

    self.temporal_block_type = temporal_block_type
    kw = dict(device=device, dtype=dtype)
    self.temporal_pre_norm = layers.RMSNorm(width, **kw)
    if temporal_block_type is common.TemporalBlockType.RECURRENT:
      self.recurrent_block = RecurrentBlock(
          width, num_heads, lru_width, conv1d_temporal_width,
          final_w_init_variance_scale, **kw,
      )
    else:
      self.attention_block = LocalAttentionBlock(
          width, num_heads, attention_window_size,
          final_w_init_variance_scale, **kw,
      )
    self.channel_pre_norm = layers.RMSNorm(width, **kw)
    self.mlp_block = MLPBlock(
        width, mlp_expanded_width, final_w_init_variance_scale, **kw
    )

  @property
  def temporal_block(self):
    from cadence_gemma_tpu import common  # noqa: PLC0415

    if self.temporal_block_type is common.TemporalBlockType.RECURRENT:
      return self.recurrent_block
    return self.attention_block

  def forward(self, x, segment_pos, cache=None, return_cache=True):
    residual = x
    x = self.temporal_pre_norm(x)
    x, cache = self.temporal_block(x, segment_pos, cache, return_cache)
    x = x + residual

    residual = x
    x = self.channel_pre_norm(x)
    x = self.mlp_block(x)
    return x + residual, cache

  @classmethod
  def init_cache(
      cls,
      batch_size,
      width,
      num_heads,
      attention_window_size,
      temporal_block_type,
      dtype,
      lru_width=None,
      conv1d_temporal_width=4,
      device=None,
  ):
    from cadence_gemma_tpu import common  # noqa: PLC0415

    if temporal_block_type is common.TemporalBlockType.RECURRENT:
      return RecurrentBlock.init_cache(
          batch_size, lru_width or width, dtype, conv1d_temporal_width,
          device,
      )
    return LocalAttentionBlock.init_cache(
        batch_size, attention_window_size, width // num_heads, dtype, device
    )


class Embedder(nn.Module):
  """Tied input/output embedding."""

  def __init__(
      self,
      vocab_size: int,
      embed_dim: int,
      scale_by_sqrt_dim: bool,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.vocab_size = vocab_size
    self.embed_dim = embed_dim
    self.scale_by_sqrt_dim = scale_by_sqrt_dim
    self.input_embedding = nn.Parameter(
        torch.empty(vocab_size, embed_dim, device=device, dtype=dtype)
    )
    with torch.no_grad():
      self.input_embedding.normal_(0.0, math.sqrt(1.0 / embed_dim))

  def encode(self, x: torch.Tensor) -> torch.Tensor:
    emb = self.input_embedding[x]
    if self.scale_by_sqrt_dim:
      # Match the JAX path's bfloat16-rounded sqrt(width) factor.
      scale = torch.tensor(
          math.sqrt(self.embed_dim), dtype=torch.bfloat16
      ).to(emb.dtype)
      emb = emb * scale
    return emb

  def decode(self, x: torch.Tensor) -> torch.Tensor:
    return x @ self.input_embedding.T
