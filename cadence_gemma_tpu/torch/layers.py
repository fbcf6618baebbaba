"""PyTorch primitive layers, numerically matched to the JAX path.

Counterpart of reference ``recurrentgemma/torch/layers.py`` with the same
parameter names (so ``checkpoint/conversion.py`` maps state dicts across
frameworks) but a vectorized log-depth ``rnn_scan`` instead of the
reference's per-step Python loop (``torch/layers.py:146-199``).
"""

from __future__ import annotations

import math
from typing import Optional

import torch
from torch import nn


def gelu(x: torch.Tensor) -> torch.Tensor:
  """tanh-approximated GeLU, matching ``jax.nn.gelu``'s default."""
  return nn.functional.gelu(x, approximate="tanh")


def rnn_scan(
    x: torch.Tensor,
    a: torch.Tensor,
    h0: Optional[torch.Tensor] = None,
) -> tuple[torch.Tensor, torch.Tensor]:
  """``h_t = a_t h_{t-1} + x_t`` over dim 1, fp32 accumulation.

  Hillis-Steele inclusive scan: log2(T) rounds of whole-tensor multiply-adds
  instead of T sequential steps. Returns (outputs in ``x.dtype``, final
  state in float32).
  """
  assert x.shape == a.shape
  seq_len = x.shape[1]
  h = x.float()
  p = a.float()
  k = 1
  while k < seq_len:
    h = h + p * nn.functional.pad(h, (0, 0, k, 0))[:, :seq_len]
    p = p * nn.functional.pad(p, (0, 0, k, 0), value=1.0)[:, :seq_len]
    k *= 2
  if h0 is not None:
    h = h + p * h0.float()[:, None]
  return h.to(x.dtype), h[:, -1].float()


class RMSNorm(nn.Module):
  """RMS normalization with a (scale + 1) gain; scale zero-initialized."""

  def __init__(self, width: int, eps: float = 1e-6, device=None, dtype=None):
    super().__init__()
    self.width = width
    self.eps = eps
    self.scale = nn.Parameter(
        torch.zeros(width, device=device, dtype=dtype)
    )

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    var = x.square().mean(dim=-1, keepdim=True)
    return x * torch.rsqrt(var + self.eps) * (self.scale + 1)


class BlockDiagonalLinear(nn.Module):
  """Per-head block-diagonal projection (RG-LRU gates)."""

  def __init__(
      self,
      width: int,
      num_blocks: int,
      w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    assert width % num_blocks == 0
    self.num_blocks = num_blocks
    block = width // num_blocks
    self.w = nn.Parameter(
        torch.empty(num_blocks, block, block, device=device, dtype=dtype)
    )
    self.b = nn.Parameter(
        torch.zeros(num_blocks, block, device=device, dtype=dtype)
    )
    std = math.sqrt(w_init_variance_scale / block)
    with torch.no_grad():
      self.w.normal_(0.0, std)

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    b, t, _ = x.shape
    x = x.reshape(b, t, self.num_blocks, -1)
    y = torch.einsum("bthi,hij->bthj", x, self.w) + self.b
    return y.reshape(b, t, -1)


def rnn_param_init(
    param: torch.Tensor, min_rad: float, max_rad: float, eps: float = 1e-8
) -> torch.Tensor:
  """In-place ring-uniform initialization of the RG-LRU Λ parameter."""
  with torch.no_grad():
    u = torch.rand_like(param, dtype=torch.float32)
    a_real = 0.5 * torch.log(
        u * (max_rad**2 - min_rad**2) + min_rad**2 + eps
    )
    param.copy_(torch.log(torch.exp(-a_real) - 1.0).to(param.dtype))
  return param


class _SqrtBoundDerivative(torch.autograd.Function):
  """sqrt with gradient clamped at ``max_gradient`` (matches the JAX VJP)."""

  @staticmethod
  def forward(ctx, x: torch.Tensor, max_gradient: float) -> torch.Tensor:
    ctx.save_for_backward(x)
    ctx.max_gradient = max_gradient
    return torch.sqrt(x)

  @staticmethod
  def backward(ctx, grad_output):
    (x,) = ctx.saved_tensors
    clipped = torch.clamp(x, min=1.0 / (4.0 * ctx.max_gradient**2))
    return grad_output * 0.5 * torch.rsqrt(clipped), None


def sqrt_bound_derivative(x: torch.Tensor, max_gradient: float):
  return _SqrtBoundDerivative.apply(x, max_gradient)


class RGLRU(nn.Module):
  """Real-Gated LRU (see the JAX twin for the math)."""

  def __init__(
      self,
      width: int,
      num_heads: int,
      w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.width = width
    self.a_param = nn.Parameter(
        torch.empty(width, device=device, dtype=dtype)
    )
    rnn_param_init(self.a_param, min_rad=0.9, max_rad=0.999)
    self.input_gate = BlockDiagonalLinear(
        width, num_heads, w_init_variance_scale, device=device, dtype=dtype
    )
    self.a_gate = BlockDiagonalLinear(
        width, num_heads, w_init_variance_scale, device=device, dtype=dtype
    )

  def forward(
      self,
      x: torch.Tensor,
      segment_pos: torch.Tensor,
      cache: Optional[torch.Tensor] = None,
      return_cache: bool = True,
  ) -> tuple[torch.Tensor, Optional[torch.Tensor]]:
    reset = (segment_pos == 0).to(x.dtype)[..., None]

    gate_x = torch.sigmoid(self.input_gate(x))
    gate_a = torch.sigmoid(self.a_gate(x))
    log_a = -8.0 * gate_a * nn.functional.softplus(self.a_param)
    a = torch.exp(log_a)
    a_squared = torch.exp(2.0 * log_a)

    gated_x = x * gate_x
    multiplier = sqrt_bound_derivative(1 - a_squared, 1000)
    multiplier = reset + (1 - reset) * multiplier
    normed_x = gated_x * multiplier.to(x.dtype)

    a = a * (1 - reset)
    if x.shape[1] == 1 and cache is not None:
      # Decode fast path.
      h = a.float() * cache[:, None] + normed_x.float()
      return h.to(x.dtype), (h[:, -1] if return_cache else None)
    y, h_last = rnn_scan(normed_x, a, cache)
    return y, (h_last if return_cache else None)

  @classmethod
  def init_cache(cls, batch_size: int, width: int, device=None):
    return torch.zeros(batch_size, width, dtype=torch.float32, device=device)


class Conv1D(nn.Module):
  """Causal depthwise temporal conv with document masking + decode cache."""

  def __init__(
      self,
      width: int,
      temporal_width: int,
      w_init_variance_scale: float = 0.01,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.width = width
    self.temporal_width = temporal_width
    self.w = nn.Parameter(
        torch.empty(temporal_width, width, device=device, dtype=dtype)
    )
    self.b = nn.Parameter(torch.zeros(width, device=device, dtype=dtype))
    std = math.sqrt(w_init_variance_scale / temporal_width)
    with torch.no_grad():
      self.w.normal_(0.0, std)

  def forward(
      self,
      x: torch.Tensor,
      segment_pos: torch.Tensor,
      cache: Optional[torch.Tensor] = None,
      return_cache: bool = True,
  ) -> tuple[torch.Tensor, Optional[torch.Tensor]]:
    output_len = x.shape[1]
    if cache is not None:
      state_dtype = cache.dtype
      prompt_len = self.temporal_width - 1
      x = torch.cat([cache.to(x.dtype), x], dim=1)
    else:
      state_dtype = x.dtype
      prompt_len = 0

    out = self.b.expand(x.shape[0], output_len, -1).clone()
    effective = min(self.temporal_width, prompt_len + output_len)
    for shift in range(effective):
      start = max(prompt_len - shift, 0)
      end = prompt_len + output_len - shift
      window = x[:, start:end]
      if cache is None and shift > 0:
        not_boundary = (segment_pos != 0).to(x.dtype)
        mask = torch.ones_like(window[..., 0])
        for look in range(1, shift + 1):
          mask = mask * not_boundary[:, start + look : end + look]
        window = window * mask[..., None]
      if window.shape[1] < output_len:
        pad = output_len - window.shape[1]
        window = nn.functional.pad(window, (0, 0, pad, 0))
      out = out + window * self.w[self.temporal_width - shift - 1]

    if not return_cache:
      return out, None
    new_cache = x[:, 1 - self.temporal_width :].to(state_dtype)
    missing = self.temporal_width - 1 - new_cache.shape[1]
    if missing > 0:
      new_cache = nn.functional.pad(new_cache, (0, 0, missing, 0))
    return out, new_cache

  @classmethod
  def init_cache(
      cls, batch_size, width, dtype, conv1d_temporal_width=4, device=None
  ):
    return torch.zeros(
        batch_size, conv1d_temporal_width - 1, width,
        dtype=dtype, device=device,
    )


class Einsum(nn.Module):
  """Parameterized einsum with bias (fused MLP up-projections)."""

  def __init__(
      self,
      w_shape,
      b_shape,
      eqn: str,
      w_init_variance_scale: float = 1.0,
      device=None,
      dtype=None,
  ):
    super().__init__()
    self.eqn = eqn
    self.w = nn.Parameter(
        torch.empty(*w_shape, device=device, dtype=dtype)
    )
    self.b = nn.Parameter(torch.zeros(*b_shape, device=device, dtype=dtype))
    std = math.sqrt(w_init_variance_scale / w_shape[1])
    with torch.no_grad():
      self.w.normal_(0.0, std)

  def forward(self, x: torch.Tensor) -> torch.Tensor:
    return torch.einsum(self.eqn, x, self.w) + self.b
