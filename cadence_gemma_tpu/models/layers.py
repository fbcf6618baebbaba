"""Primitive layers: RMSNorm, block-diagonal linear, RG-LRU, Conv1D, Einsum.

TPU-native re-implementation of the reference layer zoo
(``/root/reference/recurrentgemma/jax/layers.py:31-635``). Parameter names
and trees are kept identical (``scale``, ``w``/``b``, ``a_param``,
``input_gate``/``a_gate``) so checkpoints and
``GriffinConfig.from_flax_params_or_variables`` are interchangeable with the
reference.

Numerics pinned to the reference (bit-parity targets, SURVEY §7 hard part 3):
  * RMSNorm uses ``rsqrt(mean(x^2) + eps)`` and a ``(scale + 1)`` gain with a
    zero-initialized scale.
  * RG-LRU: ``log_a = -8 * sigmoid(W_a x) * softplus(Λ)``; the input is
    scaled by ``sqrt(1 - a^2)`` whose gradient is clipped at 1000 via a
    custom VJP; recurrence state is always float32; ``a`` is zeroed at
    document starts (``segment_pos == 0``).
  * Conv1D is a width-``temporal_width`` causal depthwise convolution with
    document-boundary masking and a (temporal_width - 1)-step decode cache.
"""


import functools
from typing import Sequence

import einops
from flax import linen as nn
import jax
import jax.numpy as jnp

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu import common
from cadence_gemma_tpu.ops import quantization
from cadence_gemma_tpu.ops import scan


class QuantizableDense(nn.Module):
  """``nn.Dense`` that can serve int8 weight-only quantized kernels.

  With ``quantized=False`` this is parameter-compatible with ``nn.Dense``
  (a ``kernel`` [in, out] and optional ``bias``). With ``quantized=True``
  it declares ``kernel_q`` (int8) + ``kernel_scale`` (f32 per-output) as
  produced by :func:`cadence_gemma_tpu.ops.quantization.quantize_params`;
  the dequantizing multiply fuses into the matmul so int8 is what streams
  from HBM — the point of the exercise for bandwidth-bound decode.

  ``act_quant=True`` (requires ``quantized``) additionally quantizes the
  *activations* per row at runtime so the contraction runs as a native
  int8xint8→int32 MXU matmul — double the MXU throughput of bf16 on v5e,
  which is what compute-bound prefill wants (weight-only int8 still
  multiplies in bf16). Costs one absmax+round pass over the activations;
  adds no parameters, so the same quantized checkpoint serves both modes.

  ``lora_rank > 0`` declares a LoRA adapter pair ``lora_a`` [in, r] /
  ``lora_b`` [r, out] (b zero-initialized, so enabling LoRA is an exact
  no-op until training moves it) and adds ``(x @ a) @ b * (alpha / r)``
  to the output. The adapter term always computes in the compute dtype —
  including over a ``quantized`` base, which is the int8-frozen-base +
  bf16-adapters fine-tuning configuration (the only way a 2B/9B model
  fine-tunes in one 16 GB chip's HBM; see ``training/lora.py``).

  ``lora_rows > 0`` stacks that pair per batch row — ``lora_a``
  [rows, in, r] / ``lora_b`` [rows, r, out], row i applying to batch
  element i — which is what multi-adapter serving needs: one decode
  program over a slot batch where every slot runs its own fine-tune
  against the shared base weights (the base matmul stays one
  [rows*t, in] x [in, out] MXU contraction; only the rank-r hop becomes
  batched). An all-zero row is the exact base model, so empty serving
  slots need no masking. See ``inference/serving.py`` ``multi_lora``.
  """

  features: int
  use_bias: bool = True
  kernel_init: nn.initializers.Initializer = (
      nn.initializers.lecun_normal()
  )
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_alpha: float | None = None
  lora_rows: int = 0
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    in_features = x.shape[-1]
    x_in = x
    if self.quantized:
      q = self.param(
          "kernel_q",
          nn.initializers.zeros_init(),
          (in_features, self.features),
          jnp.int8,
      )
      scale = self.param(
          "kernel_scale",
          nn.initializers.ones_init(),
          (self.features,),
          jnp.float32,
      )
      kernel = None
    else:
      kernel = self.param(
          "kernel",
          self.kernel_init,
          (in_features, self.features),
          self.param_dtype,
      )
    bias = (
        self.param(
            "bias",
            nn.initializers.zeros_init(),
            (self.features,),
            self.param_dtype,
        )
        if self.use_bias
        else None
    )

    def lora_term(compute_dtype):
      if not self.lora_rank:
        return None
      rows = (self.lora_rows,) if self.lora_rows else ()
      a = self.param(
          "lora_a",
          nn.initializers.normal(in_features**-0.5),
          rows + (in_features, self.lora_rank),
          self.param_dtype,
      )
      b = self.param(
          "lora_b",
          nn.initializers.zeros_init(),
          rows + (self.lora_rank, self.features),
          self.param_dtype,
      )
      scaling = (
          self.lora_alpha if self.lora_alpha is not None
          else float(self.lora_rank)
      ) / self.lora_rank

      def term(x_, a_, b_):
        return ((x_ @ a_) @ b_) * scaling

      xc = x_in.astype(compute_dtype)
      a = a.astype(compute_dtype)
      b = b.astype(compute_dtype)
      if self.lora_rows:
        # Per-row adapters: batch element i contracts against adapter
        # row i (x must be [rows, ..., in]).
        return jax.vmap(term)(xc, a, b)
      return term(xc, a, b)

    if self.quantized:
      compute_dtype = self.dtype or x.dtype
      if self.act_quant:
        # int8 x int8 → int32 on the MXU (2x bf16 throughput on v5e).
        # Per-row activation scales and per-column weight scales commute
        # with the contraction, so they apply to the int32 result.
        xq, x_scale = quantization.quantize_activations(x)
        y = jax.lax.dot_general(
            xq, q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * x_scale * scale
        y = y.astype(compute_dtype)
      else:
        # Contract against int8 weights (the int8->compute-dtype convert
        # fuses into the dot's operand read) and apply the per-output-
        # channel scale AFTER the contraction — it commutes, and this way
        # only int8 weight bytes ever cross HBM.
        x = x.astype(compute_dtype)
        y = x @ q.astype(compute_dtype)
        y = y * scale.astype(compute_dtype)
      lora = lora_term(compute_dtype)
      if lora is not None:
        y = y + lora.astype(y.dtype)
      if bias is not None:
        y = y + bias.astype(y.dtype)
      return y
    args = (x, kernel) if bias is None else (x, kernel, bias)
    promoted = nn.dtypes.promote_dtype(*args, dtype=self.dtype)
    x, kernel = promoted[0], promoted[1]
    y = x @ kernel
    lora = lora_term(y.dtype)
    if lora is not None:
      y = y + lora.astype(y.dtype)
    if bias is not None:
      y = y + promoted[2]
    return y


class RMSNorm(nn.Module):
  """Root-mean-square normalization with a (scale + 1) learned gain.

  With ``residual`` given, the preceding residual add is fused into the
  norm via one Pallas kernel (``ops/fused_epilogue.py``; VERDICT r4 #8
  decode-epilogue experiment) and the call returns ``(normed, y)`` where
  ``y = x + residual`` is the new residual stream. That path accumulates
  the mean-of-squares in float32 (documented deviation; the plain path
  reduces in the promoted activation dtype, matching the reference).
  TPU-only — callers gate it (``ResidualBlock.fused_epilogue``).
  """

  width: int
  eps: float = 1e-6
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  @nn.compact
  @at.typed
  def __call__(
      self,
      x: at.ExpandedActivations,
      residual: at.ExpandedActivations | None = None,
  ) -> (
      at.ExpandedActivations
      | tuple[at.ExpandedActivations, at.ExpandedActivations]
  ):
    scale = self.param(
        "scale", nn.initializers.zeros_init(), (self.width,), self.param_dtype
    )
    if residual is not None:
      from cadence_gemma_tpu.ops import fused_epilogue

      x, residual = nn.dtypes.promote_dtype(x, residual, dtype=self.dtype)
      y, normed = fused_epilogue.fused_add_rmsnorm(
          x, residual, scale, self.eps
      )
      return normed, y
    x, scale = nn.dtypes.promote_dtype(x, scale, dtype=self.dtype)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(var + self.eps)
    scale = jnp.expand_dims(scale, axis=tuple(range(x.ndim - 1)))
    return normed * (scale + 1)


class BlockDiagonalLinear(nn.Module):
  """Per-head block-diagonal projection used by the RG-LRU gates."""

  width: int
  num_blocks: int
  w_init_variance_scale: float = 1.0
  quantized: bool = False
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  @nn.compact
  @at.typed
  def __call__(self, x: at.ExpandedActivations) -> at.ExpandedActivations:
    assert self.width % self.num_blocks == 0
    block_width = self.width // self.num_blocks
    if self.quantized:
      q = self.param(
          "w_q",
          nn.initializers.zeros_init(),
          (self.num_blocks, block_width, block_width),
          jnp.int8,
      )
      scale = self.param(
          "w_scale",
          nn.initializers.ones_init(),
          (self.num_blocks, block_width),
          jnp.float32,
      )
      w = None
    else:
      w = self.param(
          "w",
          nn.initializers.variance_scaling(
              scale=self.w_init_variance_scale,
              mode="fan_in",
              distribution="normal",
          ),
          (self.num_blocks, block_width, block_width),
          self.param_dtype,
      )
    b = self.param(
        "b",
        nn.initializers.zeros_init(),
        (self.num_blocks, block_width),
        self.param_dtype,
    )
    if self.quantized:
      compute_dtype = self.dtype or x.dtype
      x = einops.rearrange(
          x.astype(compute_dtype), "... (h i) -> ... h i", h=self.num_blocks
      )
      y = jnp.einsum("... h i, h i j -> ... h j", x, q.astype(compute_dtype))
      y = y * scale.astype(compute_dtype) + b.astype(compute_dtype)
      return einops.rearrange(y, "... h j -> ... (h j)", h=self.num_blocks)
    x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)
    x = einops.rearrange(x, "... (h i) -> ... h i", h=self.num_blocks)
    y = jnp.einsum("... h i, h i j -> ... h j", x, w) + b
    return einops.rearrange(y, "... h j -> ... (h j)", h=self.num_blocks)


def rnn_param_init(
    min_rad: float,
    max_rad: float,
    transform: str = "softplus",
    eps: float = 1e-8,
) -> nn.initializers.Initializer:
  """Initializes the RG-LRU ``Λ`` so that ``|a|`` is uniform on a ring.

  Samples radii with density proportional to ring area in
  ``[min_rad, max_rad]`` and returns the softplus-preimage of ``-log a``
  (reference ``jax/layers.py:132-155``).
  """
  if transform != "softplus":
    raise NotImplementedError(f"Unknown transform {transform!r}.")

  def init(key, shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    u = jax.random.uniform(key, shape=shape)
    a_real = 0.5 * jnp.log(u * (max_rad**2 - min_rad**2) + min_rad**2 + eps)
    # Solve softplus(Λ) = -a_real for Λ.
    return jnp.log(jnp.exp(-a_real) - 1.0).astype(dtype)

  return init


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def sqrt_bound_derivative(x: jax.Array, max_gradient: float) -> jax.Array:
  """``sqrt(x)`` whose gradient is clamped to ``max_gradient``.

  Near x=0 the true derivative 1/(2 sqrt x) explodes and produces NaNs in
  bfloat16 training; the backward pass evaluates it at
  ``max(x, 1 / (4 max_gradient^2))`` instead.
  """
  del max_gradient
  return jnp.sqrt(x)


def _sqrt_bound_fwd(x, _):
  return jnp.sqrt(x), x


def _sqrt_bound_bwd(max_gradient, x, g):
  x_clamped = jnp.maximum(x, 1.0 / (4.0 * max_gradient**2))
  return (g * 0.5 * jax.lax.rsqrt(x_clamped),)


sqrt_bound_derivative.defvjp(_sqrt_bound_fwd, _sqrt_bound_bwd)


class RGLRU(nn.Module):
  """Real-Gated Linear Recurrent Unit (arXiv:2402.19427, §2.4).

  ``h_t = a_t h_{t-1} + sqrt(1 - a_t^2) (x_t ⊙ sigmoid(W_x x_t))`` with
  ``a_t = exp(-8 sigmoid(W_a x_t) softplus(Λ))``; the state resets at
  ``segment_pos == 0``. The scan itself is dispatched through
  :func:`cadence_gemma_tpu.ops.scan.linear_scan` (Pallas kernel on TPU).
  """

  width: int
  num_heads: int
  scan_type: common.ScanType = common.ScanType.AUTO
  w_init_variance_scale: float = 1.0
  quantized: bool = False
  scan_sharding_spec: scan.ShardingSpec | None = None
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  def setup(self):
    self.a_param = self.param(
        "a_param",
        rnn_param_init(min_rad=0.9, max_rad=0.999),
        (self.width,),
        self.param_dtype,
    )
    self.input_gate = BlockDiagonalLinear(
        width=self.width,
        num_blocks=self.num_heads,
        w_init_variance_scale=self.w_init_variance_scale,
        quantized=self.quantized,
        name="input_gate",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.a_gate = BlockDiagonalLinear(
        width=self.width,
        num_blocks=self.num_heads,
        w_init_variance_scale=self.w_init_variance_scale,
        quantized=self.quantized,
        name="a_gate",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

  @at.typed
  def __call__(
      self,
      x: at.ExpandedActivations,
      segment_pos: at.SegmentPos,
      cache: at.RNNState | None = None,
      return_cache: bool = True,
      pending_cache: bool = False,
  ) -> tuple[
      at.ExpandedActivations, at.RNNState | at.RNNStatePending | None
  ]:
    """Runs the RG-LRU over ``x``; returns outputs and the final fp32 state.

    ``pending_cache`` returns the *per-step* fp32 states [b, t, d] instead
    of the final one: the speculative-decoding verify pass picks the state
    at the accepted draft index after comparing logits (see
    ``modules.commit_pending_cache``). The scan then runs on the sequential
    native path so the intermediates equal the carries plain decode would
    have produced; ``t`` is the draft length, so the Pallas kernel is not
    missed.
    """
    x, a_param = nn.dtypes.promote_dtype(x, self.a_param, dtype=self.dtype)
    batch, seq_len, _ = x.shape
    assert segment_pos.shape == (batch, seq_len)
    reset = segment_pos == 0

    gate_x = jax.nn.sigmoid(self.input_gate(x))
    gate_a = jax.nn.sigmoid(self.a_gate(x))

    log_a = -8.0 * gate_a * jax.nn.softplus(a_param)
    a = jnp.exp(log_a)
    a_squared = jnp.exp(2.0 * log_a)

    gated_x = x * gate_x
    # Gamma normalization; at document starts the multiplier is 1.
    multiplier = sqrt_bound_derivative(1 - a_squared, 1000)
    multiplier = reset[..., None] + (1 - reset[..., None]) * multiplier
    normed_x = gated_x * multiplier.astype(x.dtype)

    if pending_cache:
      y_acc, _ = scan.lru_linear_scan(
          x=normed_x,
          a=a * (1 - reset[..., None]),
          h0=cache,
          y_in_acc_dtype=True,
      )
      return y_acc.astype(x.dtype), (y_acc if return_cache else None)

    y, h_last = scan.linear_scan(
        x=normed_x,
        a=a * (1 - reset[..., None]),
        h0=cache,
        scan_type=self.scan_type,
        sharding_spec=self.scan_sharding_spec,
        unroll=128,
    )
    return y, (h_last if return_cache else None)

  @classmethod
  def init_cache(cls, batch_size: int, width: int) -> at.RNNState:
    """Empty recurrent state — always float32."""
    return jnp.zeros((batch_size, width), dtype=jnp.float32)


class Conv1D(nn.Module):
  """Causal depthwise temporal convolution with document masking.

  Expressed as ``temporal_width`` shift-and-scale accumulations so that (a)
  decode mode reduces to a tiny stencil over the cached tail and (b) the
  per-shift document mask (no mixing across ``segment_pos == 0`` boundaries)
  stays a cheap elementwise multiply. XLA fuses the whole stencil into a
  couple of vector ops — no im2col materialization.
  """

  width: int
  temporal_width: int
  w_init_variance_scale: float = 0.01
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  @nn.compact
  @at.typed
  def __call__(
      self,
      x: at.ExpandedActivations,
      segment_pos: at.SegmentPos,
      cache: at.Conv1DState | None = None,
      return_cache: bool = True,
      pending_cache: bool = False,
  ) -> tuple[
      at.ExpandedActivations, at.Conv1DState | at.Conv1DPending | None
  ]:
    w = self.param(
        "w",
        nn.initializers.variance_scaling(
            scale=self.w_init_variance_scale,
            mode="fan_in",
            distribution="normal",
        ),
        (self.temporal_width, self.width),
        self.param_dtype,
    )
    b = self.param(
        "b", nn.initializers.zeros_init(), (self.width,), self.param_dtype
    )
    x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)

    output_len = x.shape[1]
    if cache is not None:
      # Decode: previous temporal_width - 1 inputs are cached.
      state_dtype = cache.dtype
      prompt_len = self.temporal_width - 1
      x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    else:
      state_dtype = x.dtype
      prompt_len = 0

    out = jnp.zeros_like(x[:, :output_len]) + b[None, None]
    effective_width = min(self.temporal_width, prompt_len + output_len)
    for shift in range(effective_width):
      start = max(prompt_len - shift, 0)
      end = prompt_len + output_len - shift
      window = x[:, start:end]
      if cache is None and shift > 0:
        # Zero contributions that would cross a document boundary: a source
        # token `shift` steps back must have no boundary in between.
        not_boundary = (segment_pos != 0).astype(x.dtype)
        mask = jnp.ones_like(window[..., 0])
        for look_ahead in range(1, shift + 1):
          mask = mask * not_boundary[:, start + look_ahead : end + look_ahead]
        window = window * mask[..., None]
      elif cache is not None and output_len > 1 and shift > 0:
        # Chunked prefill continues a single document per row (boundaries
        # only at position 0), so "no boundary between source and query"
        # reduces to "the source is at a non-negative position". This keeps
        # cached pad garbage out when a left-padded row's document starts
        # mid-chunk (the forward-path cumsum mask above cannot see into the
        # cache). Single-token decode is left untouched: its cached tail is
        # always same-document (or zero-initialized, contributing zero).
        valid = (segment_pos - shift >= 0).astype(x.dtype)
        window = window * valid[..., None]
      if window.shape[1] < output_len:
        pad = output_len - window.shape[1]
        window = jnp.pad(window, ((0, 0), (pad, 0), (0, 0)))
      out = out + window * w[self.temporal_width - shift - 1][None, None, :]

    if not return_cache:
      return out, None

    if pending_cache:
      # Speculative decoding: return the whole concatenated [old tail |
      # chunk] of raw inputs; ``modules.commit_pending_cache`` slices the
      # temporal_width-1 inputs ending at the accepted index (which may
      # reach back into the previous tail). Requires cache mode.
      assert cache is not None
      return out, x.astype(state_dtype)

    new_cache = x[:, 1 - self.temporal_width :].astype(state_dtype)
    missing = self.temporal_width - 1 - new_cache.shape[1]
    if missing > 0:
      new_cache = jnp.pad(new_cache, ((0, 0), (missing, 0), (0, 0)))
    return out, new_cache

  @classmethod
  def init_cache(
      cls,
      batch_size: int,
      width: int,
      dtype: at.dtype,
      conv1d_temporal_width: int = 4,
  ) -> at.Conv1DState:
    return jnp.zeros(
        (batch_size, conv1d_temporal_width - 1, width), dtype=dtype
    )


class Einsum(nn.Module):
  """A parameterized einsum with bias (used for fused MLP up-projections).

  ``lora_rank > 0`` adds a per-leading-index LoRA pair ``lora_a``
  [c, d, r] / ``lora_b`` [c, r, D] for the fused 3-D ``(c, d, D)``
  up-projection layout (contraction on axis 1) — the low-rank hop reuses
  the module's own ``eqn`` with ``D -> r``, so each of the ``c`` fused
  projections gets its own adapter. Zero-initialized ``lora_b`` makes
  enabling it an exact no-op. See :class:`QuantizableDense`.

  ``lora_rows > 0`` stacks the pair per batch row ([rows, c, d, r] /
  [rows, c, r, D], row i applying to batch element i) for multi-adapter
  serving — same contract as :class:`Dense`.
  """

  w_shape: Sequence[int]
  b_shape: Sequence[int]
  eqn: str
  w_init_variance_scale: float = 1.0
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_alpha: float | None = None
  lora_rows: int = 0
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  @nn.compact
  @at.typed
  def __call__(self, x: jax.Array) -> jax.Array:
    def lora_term(compute_dtype):
      if not self.lora_rank:
        return None
      assert len(self.w_shape) == 3, (
          "Einsum LoRA supports the fused (c, d, D) layout only; got "
          f"{self.w_shape}"
      )
      c, d, out = self.w_shape
      rows = (self.lora_rows,) if self.lora_rows else ()
      a = self.param(
          "lora_a",
          nn.initializers.normal(d**-0.5),
          rows + (c, d, self.lora_rank),
          self.param_dtype,
      )
      bb = self.param(
          "lora_b",
          nn.initializers.zeros_init(),
          rows + (c, self.lora_rank, out),
          self.param_dtype,
      )
      scaling = (
          self.lora_alpha if self.lora_alpha is not None
          else float(self.lora_rank)
      ) / self.lora_rank

      def term(x_, a_, b_):
        # The low-rank hop reuses the module eqn with D -> r, then
        # expands per leading index: [c, ..., r] x [c, r, D] ->
        # [c, ..., D].
        xa = jnp.einsum(self.eqn, x_, a_)
        return jnp.einsum("g...r,grD->g...D", xa, b_) * scaling

      xc = x.astype(compute_dtype)
      ac = a.astype(compute_dtype)
      bc = bb.astype(compute_dtype)
      if self.lora_rows:
        # Per-row adapters; the module output layout is [c, b, ...], so
        # the mapped batch axis goes back at position 1.
        return jax.vmap(term, in_axes=0, out_axes=1)(xc, ac, bc)
      return term(xc, ac, bc)

    if self.quantized:
      # 3-D (c, d, D) weights contracting axis 1 (ffw_up layout).
      assert len(self.w_shape) == 3, self.w_shape
      q = self.param(
          "w_q", nn.initializers.zeros_init(), tuple(self.w_shape), jnp.int8
      )
      scale_shape = (self.w_shape[0], self.w_shape[2])
      scale = self.param(
          "w_scale", nn.initializers.ones_init(), scale_shape, jnp.float32
      )
      b = self.param(
          "b", nn.initializers.zeros_init(), tuple(self.b_shape),
          self.param_dtype,
      )
      compute_dtype = self.dtype or x.dtype
      if self.act_quant:
        # int8 x int8 → int32 MXU contraction; the per-row activation
        # scale [..., t, 1] broadcasts against the c...tD output from the
        # right, the per-(c, D) weight scale from both ends.
        xq, x_scale = quantization.quantize_activations(x)
        y = jnp.einsum(self.eqn, xq, q, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * x_scale * scale[:, None, None, :]
        lora = lora_term(compute_dtype)
        if lora is not None:
          y = y + lora.astype(jnp.float32)
        return (y + b.astype(jnp.float32)).astype(compute_dtype)
      y = jnp.einsum(self.eqn, x.astype(compute_dtype), q.astype(compute_dtype))
      # Output layout is c...tD; scale broadcasts as (c, 1, 1, D).
      scale = scale[:, None, None, :].astype(compute_dtype)
      y = y * scale
      lora = lora_term(compute_dtype)
      if lora is not None:
        y = y + lora
      return y + b.astype(compute_dtype)
    w = self.param(
        "w",
        nn.initializers.variance_scaling(
            scale=self.w_init_variance_scale,
            mode="fan_in",
            distribution="normal",
            in_axis=[1],
        ),
        tuple(self.w_shape),
        self.param_dtype,
    )
    b = self.param(
        "b", nn.initializers.zeros_init(), tuple(self.b_shape), self.param_dtype
    )
    x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)
    y = jnp.einsum(self.eqn, x, w)
    lora = lora_term(y.dtype)
    if lora is not None:
      y = y + lora.astype(y.dtype)
    return y + b
