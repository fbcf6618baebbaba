"""Griffin building blocks: local attention, recurrent block, MLP, embedder.

TPU-native re-implementation of the reference module zoo
(``/root/reference/recurrentgemma/jax/modules.py:35-982``) with identical
parameter trees and cache semantics:

  * Local sliding-window MQA (one shared KV head), partial RoPE on the first
    half of the head dimensions, fp32 softmax with a large negative mask
    fill, and a ring KV cache of exactly ``window_size`` slots driven by a
    ``num_tokens`` counter.
  * RecurrentBlock: gelu(y-branch) ⊙ (Conv1D → RG-LRU)(x-branch), then an
    output projection. Cache = (fp32 RG-LRU state, conv tail).
  * Gated-GeLU MLP with a fused ``(2, d, D)`` up-projection einsum.
  * Tied-embedding encoder/decoder with optional ``sqrt(width)`` scaling
    (cast through bfloat16 to match Gemma training).
  * VisionLanguageConnector: the in-model vision→LM projector MLP.

Unlike the reference, the prompt→cache path generalizes to any chunk length
(the reference raises NotImplementedError for 1 < chunk < window,
``modules.py:220``): chunked prefill works for arbitrary chunk sizes.
"""


from typing import NamedTuple, Union

import einops
from flax import linen as nn
import jax
import jax.numpy as jnp

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu import common
from cadence_gemma_tpu.models import layers
from cadence_gemma_tpu.ops import pallas_attention
from cadence_gemma_tpu.ops import scan
from cadence_gemma_tpu.parallel import sp_attention

# Large negative fill for masked logits; fits comfortably in float32 while
# being far below any real logit (matches the reference constant,
# modules.py:29).
_MIN_LOGITS_VALUE = -2.3819763e38
_MAX_WAVELENGTH = 10_000


class RecurrentBlockCache(NamedTuple):
  """State of a recurrent block: RG-LRU hidden state + conv tail.

  In a ``pending_cache=True`` forward the same container carries the
  *per-step* material instead (fp32 carries [b, t, d] / concatenated conv
  inputs) until :func:`commit_pending_cache` resolves it.
  """

  rg_lru_state: at.RNNState | at.RNNStatePending
  conv1d_state: at.Conv1DState | at.Conv1DPending


class AttentionBlockCache(NamedTuple):
  """Ring KV cache of ``window_size`` slots plus a monotone token counter.

  In a ``pending_cache=True`` forward, ``keys``/``values`` instead hold the
  verify chunk's rotated KVs [b, t, 1, h] (``num_tokens`` unchanged) until
  :func:`commit_pending_cache` mask-writes the accepted prefix.
  """

  keys: at.CachedKeys | at.Keys
  values: at.CachedValues | at.Values
  num_tokens: at.NumTokens


ResidualBlockCache = Union[RecurrentBlockCache, AttentionBlockCache]


@at.typed
def apply_rope(
    inputs: at.Queries | at.Keys,
    positions: at.SegmentPos,
    max_wavelength: int = _MAX_WAVELENGTH,
) -> at.Queries | at.Keys:
  """Rotates the first half of the head dims; passes the rest through.

  Gemma-style partial RoPE (reference ``modules.py:54-87``): of a head of
  size ``h``, dims ``[0, h/2)`` are rotated pairwise (split at ``h/4``) by
  position-dependent angles, dims ``[h/2, h)`` are untouched.
  """
  rotated, passthrough = jnp.split(inputs, 2, axis=-1)
  half = rotated.shape[-1] // 2

  exponents = 2.0 * jnp.arange(half) / rotated.shape[-1]
  inv_timescale = max_wavelength ** (-exponents)
  # positions: [b, t] -> [b, t, 1, 1] to broadcast over heads and dims.
  angles = (
      positions[..., None, None].astype(jnp.float32) * inv_timescale
  )
  sin = jnp.sin(angles).astype(inputs.dtype)
  cos = jnp.cos(angles).astype(inputs.dtype)

  first, second = jnp.split(rotated, 2, axis=-1)
  return jnp.concatenate(
      [first * cos - second * sin, second * cos + first * sin, passthrough],
      axis=-1,
  )


def _causal_window_mask(
    q_positions: jax.Array,
    k_positions: jax.Array,
    window_size: int,
    q_segment_ids: jax.Array | None = None,
    k_segment_ids: jax.Array | None = None,
) -> at.AttentionMask:
  """mask[b, q, k] = same segment ∧ k ≤ q ∧ q ≤ k + window."""
  if q_segment_ids is not None or k_segment_ids is not None:
    assert q_segment_ids is not None and k_segment_ids is not None
    same_segment = q_segment_ids[..., None] == k_segment_ids[..., None, :]
  else:
    same_segment = (k_positions >= 0)[..., None, :]
  causal = q_positions[..., None] >= k_positions[..., None, :]
  in_window = q_positions[..., None] <= k_positions[..., None, :] + window_size
  return same_segment & causal & in_window


def compute_forward_pass_mask(
    segment_pos: at.SegmentPos, window_size: int
) -> at.AttentionMask:
  """Mask for full-sequence (prompt) processing; documents split at pos 0."""
  segment_ids = jnp.cumsum(segment_pos == 0, axis=-1)
  positions = jnp.arange(segment_pos.shape[-1])[None]
  positions = jnp.repeat(positions, segment_pos.shape[0], axis=0)
  return _causal_window_mask(
      positions, positions, window_size, segment_ids, segment_ids
  )


def compute_cache_mask(
    seq_len: int,
    cache_num_tokens: at.NumTokens,
    window_size: int,
    q_segment_pos: at.SegmentPos | None = None,
) -> at.AttentionMask:
  """Mask for decode steps against the ring cache.

  Reconstructs each ring slot's absolute position from the write counter:
  slot ``i`` holds position ``i + k*window`` if that has been written
  (``< num_tokens``), else ``i + (k-1)*window``, where
  ``k = num_tokens // window`` (reference ``modules.py:153-180``). The new
  queries' positions are appended at the end.

  ``q_segment_pos`` supplies the queries' true positions for multi-token
  chunks of a ragged (left-padded) batch, where padded rows lag the
  counter-derived ``arange + num_tokens`` guess; pad queries carry -1 and
  attend nothing (the reference's chunked path supports neither padding
  nor general chunk sizes, ``modules.py:201-220``).
  """
  if q_segment_pos is not None:
    q_positions = q_segment_pos
  else:
    q_positions = jnp.arange(seq_len)[None] + cache_num_tokens[:, None]
  wraps = cache_num_tokens[:, None] // window_size
  slots = jnp.arange(window_size)[None]
  pos_current = slots + wraps * window_size
  pos_previous = slots + (wraps - 1) * window_size
  written = pos_current < cache_num_tokens[:, None]
  k_positions = jnp.where(written, pos_current, pos_previous)
  k_positions = jnp.concatenate([k_positions, q_positions], axis=-1)
  return _causal_window_mask(q_positions, k_positions, window_size)


def _right_align_in_window(
    keys: at.Keys,
    values: at.Values,
    segment_pos: at.SegmentPos,
    window_size: int,
) -> AttentionBlockCache:
  """Builds a fresh ring cache from a processed prompt.

  The last ``min(window, t)`` KVs are rolled so that, combined with the
  ``num_tokens`` counter, subsequent ring writes land in the correct slots
  (reference ``modules.py:223-253``).
  """
  w = min(window_size, keys.shape[1])
  num_tokens = segment_pos[:, -1] + 1
  roll = jax.vmap(lambda v, n: jnp.roll(v, n, axis=0))
  keys = roll(keys[:, -w:], num_tokens)
  values = roll(values[:, -w:], num_tokens)
  pad = ((0, 0), (0, window_size - w), (0, 0), (0, 0))
  return AttentionBlockCache(
      keys=jnp.pad(keys, pad),
      values=jnp.pad(values, pad),
      num_tokens=num_tokens,
  )


def update_attention_cache(
    keys: at.Keys,
    values: at.Values,
    segment_pos: at.SegmentPos,
    cache: AttentionBlockCache,
) -> AttentionBlockCache:
  """Writes new KVs into the ring cache.

  Single-token decode writes in place at ``num_tokens % window``. Multi-token
  chunks fold the existing cache and the new KVs into a rebuilt cache holding
  the window-suffix of their concatenation — this generalizes the reference,
  which only supports chunk lengths of exactly 1 or ``window``
  (``modules.py:201-220``).
  """
  seq_len = keys.shape[-3]
  window_size = cache.keys.shape[-3]

  if seq_len == 1:
    batch_idx = jnp.arange(keys.shape[0])
    slot = cache.num_tokens % window_size
    return AttentionBlockCache(
        keys=cache.keys.at[batch_idx, slot].set(keys[:, 0]),
        values=cache.values.at[batch_idx, slot].set(values[:, 0]),
        num_tokens=cache.num_tokens + 1,
    )

  if seq_len >= window_size:
    return _right_align_in_window(keys, values, segment_pos, window_size)

  # General chunked prefill: unroll the ring into time order, append, re-roll.
  def fold_one(c_keys, c_vals, n_tok, new_k, new_v, last_pos):
    # Unrolled cache in time order (oldest first).
    shift = -(n_tok % window_size)
    k_lin = jnp.roll(c_keys, shift, axis=0)
    v_lin = jnp.roll(c_vals, shift, axis=0)
    k_all = jnp.concatenate([k_lin, new_k], axis=0)[-window_size:]
    v_all = jnp.concatenate([v_lin, new_v], axis=0)[-window_size:]
    # Count only real tokens: a left-padded row's chunk may start with pads
    # (segment_pos == -1), which must land in not-yet-written (masked) ring
    # slots rather than advance the counter.
    new_n = last_pos + 1
    return (
        jnp.roll(k_all, new_n, axis=0),
        jnp.roll(v_all, new_n, axis=0),
        new_n,
    )

  new_keys, new_values, new_num = jax.vmap(fold_one)(
      cache.keys, cache.values, cache.num_tokens, keys, values,
      segment_pos[:, -1],
  )
  return AttentionBlockCache(new_keys, new_values, new_num)


def commit_attention_cache(
    keys: at.Keys,
    values: at.Values,
    cache: AttentionBlockCache,
    commit_idx: at.NumTokens,
) -> AttentionBlockCache:
  """Masked ring write for a speculative-decoding verify chunk.

  The chunk's tokens occupy contiguous positions starting at the ring
  counter; per row, only tokens up to ``commit_idx`` (the accepted draft
  prefix) are written — rejected tokens' slots keep their previous
  contents, so the ring is exactly what plain decode of the accepted
  tokens would have produced. Chunk slots are distinct because the draft
  length is far below the window.

  ``keys``/``values`` come from a ``pending_cache=True`` forward, where the
  attention block returns the chunk's rotated KVs instead of updating the
  ring (see :func:`commit_pending_cache`).
  """
  b, t = keys.shape[0], keys.shape[1]
  window = cache.keys.shape[1]
  assert t <= window, (t, window)
  offsets = jnp.arange(t)
  slots = (cache.num_tokens[:, None] + offsets[None]) % window  # [b, t]
  accept = offsets[None] <= commit_idx[:, None]  # [b, t]
  batch_idx = jnp.arange(b)[:, None]
  select = accept[..., None, None]
  new_keys = cache.keys.at[batch_idx, slots].set(
      jnp.where(select, keys, cache.keys[batch_idx, slots])
  )
  new_values = cache.values.at[batch_idx, slots].set(
      jnp.where(select, values, cache.values[batch_idx, slots])
  )
  return AttentionBlockCache(
      keys=new_keys,
      values=new_values,
      num_tokens=cache.num_tokens + commit_idx + 1,
  )


def commit_pending_cache(
    old_cache,
    pending_cache,
    commit_idx: at.NumTokens,
):
  """Resolves a ``pending_cache=True`` forward into a real decode cache.

  Speculative decoding runs the whole draft chunk through the model once;
  which prefix survives is only known after comparing the chunk's logits
  with the draft, so the per-layer cache write is deferred: the forward
  returns raw per-step material and this function commits exactly the
  accepted ``commit_idx + 1`` tokens per row —

    * RG-LRU: the per-step fp32 carries [b, t, d]; take step ``j``.
    * Conv1D: the concatenated [old tail | chunk inputs]; slice the
      ``temporal_width - 1`` inputs ending at ``j``.
    * Attention: the chunk's rotated KVs; masked ring write
      (:func:`commit_attention_cache`).

  The result equals what plain decode of the accepted tokens would have
  produced (tested to fma tolerance in tests/test_speculative.py).
  """
  idx = commit_idx.astype(jnp.int32)

  def commit_block(old, pending):
    if isinstance(old, RecurrentBlockCache):
      states = pending.rg_lru_state  # [b, t, d] fp32 carries
      h = jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
      xcat = pending.conv1d_state  # [b, tw-1+t, d]
      tail = old.conv1d_state.shape[1]  # temporal_width - 1
      conv = jax.vmap(
          lambda row, j: jax.lax.dynamic_slice_in_dim(row, j + 1, tail, 0)
      )(xcat, idx).astype(old.conv1d_state.dtype)
      return RecurrentBlockCache(rg_lru_state=h, conv1d_state=conv)
    return commit_attention_cache(
        pending.keys, pending.values, old, idx
    )

  return {
      name: commit_block(old_cache[name], pending_cache[name])
      for name in old_cache
  }


def _should_use_flash_attention(
    seq_len: int, window_size: int, override: bool | None
) -> bool:
  """Auto-dispatch for the Pallas windowed-attention kernel.

  The kernel wins when the sequence exceeds the window (it skips
  out-of-window tiles entirely and never materializes the [t, t] logits
  tensor — 3.2x at 8k tokens, and O(t * window) memory instead of O(t^2));
  at t <= window it matches the einsum path, so the einsum stays the
  default there.
  """
  if override is not None:
    return override
  if seq_len <= window_size or seq_len < 256:
    return False
  return jax.local_devices()[0].platform == "tpu"


class LocalAttentionBlock(nn.Module):
  """Sliding-window multi-query attention (one shared KV head)."""

  width: int
  num_heads: int
  window_size: int
  final_w_init_variance_scale: float = 1.0
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_rows: int = 0
  lora_alpha: float | None = None
  use_flash_attention: bool | None = None
  sharding_spec: scan.ShardingSpec | None = None
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  @property
  def head_dim(self) -> int:
    return self.width // self.num_heads

  def setup(self):
    proj_init = nn.initializers.variance_scaling(
        scale=1.0, mode="fan_in", distribution="normal"
    )
    out_init = nn.initializers.variance_scaling(
        scale=self.final_w_init_variance_scale,
        mode="fan_in",
        distribution="normal",
    )
    dense = lambda feats, name, init, bias: layers.QuantizableDense(
        features=feats,
        use_bias=bias,
        kernel_init=init,
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name=name,
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.proj_q = dense(self.width, "proj_q", proj_init, False)
    self.proj_k = dense(self.head_dim, "proj_k", proj_init, False)
    self.proj_v = dense(self.head_dim, "proj_v", proj_init, False)
    self.proj_final = dense(self.width, "proj_final", out_init, True)

  @at.typed
  def __call__(
      self,
      x: at.Activations,
      segment_pos: at.SegmentPos,
      cache: AttentionBlockCache | None = None,
      return_cache: bool = True,
      pending_cache: bool = False,
  ) -> tuple[at.Activations, AttentionBlockCache | None]:
    b, t, _ = x.shape
    assert segment_pos.shape == (b, t), segment_pos.shape

    queries = einops.rearrange(
        self.proj_q(x), "... (n h) -> ... n h", n=self.num_heads
    )
    keys = self.proj_k(x)[..., None, :]  # single KV head
    values = self.proj_v(x)[..., None, :]

    queries = apply_rope(queries, segment_pos)
    keys = apply_rope(keys, segment_pos)

    if cache is not None:
      if pending_cache:
        # Speculative decoding: defer the ring write — hand back the
        # chunk's KVs so commit_pending_cache can mask-write only the
        # accepted prefix once the verify logits pick it.
        new_cache = (
            AttentionBlockCache(
                keys=keys, values=values, num_tokens=cache.num_tokens
            )
            if return_cache
            else None
        )
      else:
        new_cache = (
            update_attention_cache(keys, values, segment_pos, cache)
            if return_cache
            else None
        )
      keys = jnp.concatenate([cache.keys, keys], axis=-3)
      values = jnp.concatenate([cache.values, values], axis=-3)
      attn_mask = compute_cache_mask(
          t, cache.num_tokens, self.window_size,
          # Chunks of a ragged batch need true per-row query positions;
          # single-token decode keeps the counter-derived positions (they
          # match the ring-write slots even under the reference position
          # quirk, where decode segment_pos can lag the counter).
          q_segment_pos=segment_pos if t > 1 else None,
      )
    else:
      new_cache = (
          _right_align_in_window(keys, values, segment_pos, self.window_size)
          if return_cache
          else None
      )
      spec = self.sharding_spec
      if (
          spec is not None
          and sp_attention.can_sequence_shard(spec, t, self.window_size)
          and _should_use_flash_attention(
              t // spec.mesh.shape[spec.sequence_axis_name],
              self.window_size,
              self.use_flash_attention,
          )
      ):
        # Sequence-parallel prefill/training: halo exchange + local flash
        # kernel under shard_map (auto-spmd cannot partition a Pallas call
        # and would replicate it; the einsum path would all-gather full KV).
        encoded = sp_attention.sequence_sharded_attention(
            queries, keys, values, segment_pos, self.window_size, spec
        )
        encoded = einops.rearrange(encoded, "... n h -> ... (n h)")
        return self.proj_final(encoded), new_cache
      if _should_use_flash_attention(
          t, self.window_size, self.use_flash_attention
      ):
        encoded = pallas_attention.flash_window_attention(
            queries, keys, values, segment_pos, self.window_size
        )
        encoded = einops.rearrange(encoded, "... n h -> ... (n h)")
        return self.proj_final(encoded), new_cache
      attn_mask = compute_forward_pass_mask(segment_pos, self.window_size)

    logits = einops.einsum(queries, keys, "b t n h, b s n h -> b n t s")
    logits = logits * (self.head_dim**-0.5)
    masked = jnp.where(attn_mask[:, None], logits, _MIN_LOGITS_VALUE)
    probs = jax.nn.softmax(masked.astype(jnp.float32), axis=-1).astype(x.dtype)
    encoded = einops.einsum(probs, values, "b n t s, b s n h -> b t n h")
    encoded = einops.rearrange(encoded, "... n h -> ... (n h)")
    return self.proj_final(encoded), new_cache

  @classmethod
  def init_cache(
      cls,
      batch_size: int,
      window_size: int,
      heads_dim: int,
      dtype: at.dtype,
  ) -> AttentionBlockCache:
    return AttentionBlockCache(
        keys=jnp.zeros((batch_size, window_size, 1, heads_dim), dtype=dtype),
        values=jnp.zeros((batch_size, window_size, 1, heads_dim), dtype=dtype),
        num_tokens=jnp.zeros((batch_size,), dtype=jnp.int32),
    )


class RecurrentBlock(nn.Module):
  """Griffin's recurrent temporal-mixing block."""

  width: int
  num_heads: int
  lru_width: int | None = None
  scan_type: common.ScanType = common.ScanType.AUTO
  conv1d_temporal_width: int = 4
  final_w_init_variance_scale: float = 1.0
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_rows: int = 0
  lora_alpha: float | None = None
  scan_sharding_spec: scan.ShardingSpec | None = None
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  def setup(self):
    lru_width = self.lru_width or self.width
    proj_init = nn.initializers.variance_scaling(
        scale=1.0, mode="fan_in", distribution="normal"
    )
    out_init = nn.initializers.variance_scaling(
        scale=self.final_w_init_variance_scale,
        mode="fan_in",
        distribution="normal",
    )
    self.linear_y = layers.QuantizableDense(
        features=lru_width,
        kernel_init=proj_init,
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="linear_y",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.linear_x = layers.QuantizableDense(
        features=lru_width,
        kernel_init=proj_init,
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="linear_x",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.linear_out = layers.QuantizableDense(
        features=self.width,
        kernel_init=out_init,
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="linear_out",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.conv_1d = layers.Conv1D(
        width=lru_width,
        temporal_width=self.conv1d_temporal_width,
        name="conv_1d",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.rg_lru = layers.RGLRU(
        width=lru_width,
        num_heads=self.num_heads,
        scan_type=self.scan_type,
        quantized=self.quantized,
        name="rg_lru",
        scan_sharding_spec=self.scan_sharding_spec,
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

  @at.typed
  def __call__(
      self,
      x: at.Activations,
      segment_pos: at.SegmentPos,
      cache: RecurrentBlockCache | None = None,
      return_cache: bool = True,
      pending_cache: bool = False,
  ) -> tuple[at.Activations, RecurrentBlockCache | None]:
    y = jax.nn.gelu(self.linear_y(x))

    x = self.linear_x(x)
    x, conv1d_state = self.conv_1d(
        x=x,
        segment_pos=segment_pos,
        cache=None if cache is None else cache.conv1d_state,
        return_cache=return_cache,
        pending_cache=pending_cache,
    )
    x, rg_lru_state = self.rg_lru(
        x=x,
        segment_pos=segment_pos,
        cache=None if cache is None else cache.rg_lru_state,
        return_cache=return_cache,
        pending_cache=pending_cache,
    )

    x = self.linear_out(x * y)
    if not return_cache:
      return x, None
    return x, RecurrentBlockCache(
        rg_lru_state=rg_lru_state, conv1d_state=conv1d_state
    )

  @classmethod
  def init_cache(
      cls,
      batch_size: int,
      lru_width: int,
      dtype: at.dtype,
      conv1d_temporal_width: int = 4,
  ) -> RecurrentBlockCache:
    return RecurrentBlockCache(
        rg_lru_state=layers.RGLRU.init_cache(batch_size, lru_width),
        conv1d_state=layers.Conv1D.init_cache(
            batch_size, lru_width, dtype, conv1d_temporal_width
        ),
    )


class MLPBlock(nn.Module):
  """Gated-GeLU MLP with fused gate/up projection."""

  width: int
  expanded_width: int
  final_w_init_variance_scale: float = 1.0
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_rows: int = 0
  lora_alpha: float | None = None
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  def setup(self):
    self.ffw_up = layers.Einsum(
        w_shape=(2, self.width, self.expanded_width),
        b_shape=(2, 1, 1, self.expanded_width),
        eqn="...td,cdD->c...tD",
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="ffw_up",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.ffw_down = layers.QuantizableDense(
        features=self.width,
        use_bias=True,
        kernel_init=nn.initializers.variance_scaling(
            scale=self.final_w_init_variance_scale,
            mode="fan_in",
            distribution="normal",
        ),
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="ffw_down",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

  @at.typed
  def __call__(self, x: at.Activations) -> at.Activations:
    gate_and_up = self.ffw_up(x)
    activations = nn.gelu(gate_and_up[0]) * gate_and_up[1]
    return self.ffw_down(activations)


class VisionLanguageConnector(nn.Module):
  """Vision→LM projector: Einsum up-projection, GeLU, Dense down to width.

  Parameter tree matches the reference's ``vl_connector``
  (``modules.py:695-744``); the input feature width is config-derived
  instead of the reference's hard-coded 2176.
  """

  width: int
  expanded_width: int
  vision_width: int = common.DEFAULT_VISION_WIDTH
  final_w_init_variance_scale: float = 1.0
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_rows: int = 0
  lora_alpha: float | None = None
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  def setup(self):
    self.ffw_up = layers.Einsum(
        w_shape=(1, self.vision_width, self.expanded_width),
        b_shape=(1, 1, 1, self.expanded_width),
        eqn="...td,rdD->r...tD",
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="ffw_up",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )
    self.ffw_down = layers.QuantizableDense(
        features=self.width,
        use_bias=True,
        kernel_init=nn.initializers.variance_scaling(
            scale=self.final_w_init_variance_scale,
            mode="fan_in",
            distribution="normal",
        ),
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="ffw_down",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

  @at.typed
  def __call__(self, x: at.Image) -> at.Activations:
    return self.ffw_down(nn.gelu(self.ffw_up(x)[0]))


class ResidualBlock(nn.Module):
  """Pre-norm residual block: temporal mixer then MLP."""

  width: int
  mlp_expanded_width: int
  num_heads: int
  attention_window_size: int
  temporal_block_type: common.TemporalBlockType
  lru_width: int | None = None
  scan_type: common.ScanType = common.ScanType.AUTO
  conv1d_temporal_width: int = 4
  final_w_init_variance_scale: float = 1.0
  quantized: bool = False
  act_quant: bool = False
  lora_rank: int = 0
  lora_rows: int = 0
  lora_alpha: float | None = None
  scan_sharding_spec: scan.ShardingSpec | None = None
  use_flash_attention: bool | None = None
  # Fuse the post-temporal residual add into the channel pre-norm with one
  # Pallas kernel (ops/fused_epilogue.py). TPU-only, default off; the
  # decode ablation loop A/Bs it (VERDICT r4 #8).
  fused_epilogue: bool = False
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  def setup(self):
    self.temporal_pre_norm = layers.RMSNorm(
        width=self.width, dtype=self.dtype, param_dtype=self.param_dtype
    )
    if self.temporal_block_type is common.TemporalBlockType.RECURRENT:
      self.recurrent_block = RecurrentBlock(
          width=self.width,
          num_heads=self.num_heads,
          lru_width=self.lru_width,
          conv1d_temporal_width=self.conv1d_temporal_width,
          scan_type=self.scan_type,
          final_w_init_variance_scale=self.final_w_init_variance_scale,
          quantized=self.quantized,
          act_quant=self.act_quant,
          lora_rank=self.lora_rank,
          lora_rows=self.lora_rows,
          lora_alpha=self.lora_alpha,
          name="recurrent_block",
          scan_sharding_spec=self.scan_sharding_spec,
          dtype=self.dtype,
          param_dtype=self.param_dtype,
      )
    else:
      self.attention_block = LocalAttentionBlock(
          width=self.width,
          num_heads=self.num_heads,
          window_size=self.attention_window_size,
          final_w_init_variance_scale=self.final_w_init_variance_scale,
          quantized=self.quantized,
          act_quant=self.act_quant,
          lora_rank=self.lora_rank,
          lora_rows=self.lora_rows,
          lora_alpha=self.lora_alpha,
          use_flash_attention=self.use_flash_attention,
          sharding_spec=self.scan_sharding_spec,
          name="attention_block",
          dtype=self.dtype,
          param_dtype=self.param_dtype,
      )
    self.channel_pre_norm = layers.RMSNorm(
        width=self.width, dtype=self.dtype, param_dtype=self.param_dtype
    )
    self.mlp_block = MLPBlock(
        width=self.width,
        expanded_width=self.mlp_expanded_width,
        final_w_init_variance_scale=self.final_w_init_variance_scale,
        quantized=self.quantized,
        act_quant=self.act_quant,
        lora_rank=self.lora_rank,
        lora_rows=self.lora_rows,
        lora_alpha=self.lora_alpha,
        name="mlp_block",
        dtype=self.dtype,
        param_dtype=self.param_dtype,
    )

  @property
  def temporal_block(self) -> nn.Module:
    if self.temporal_block_type is common.TemporalBlockType.RECURRENT:
      return self.recurrent_block
    return self.attention_block

  @at.typed
  def __call__(
      self,
      x: at.Activations,
      segment_pos: at.SegmentPos,
      cache: ResidualBlockCache | None = None,
      return_cache: bool = True,
      pending_cache: bool = False,
  ) -> tuple[at.Activations, ResidualBlockCache | None]:
    residual = x
    x = self.temporal_pre_norm(x)
    x, cache = self.temporal_block(
        x, segment_pos, cache, return_cache=return_cache,
        pending_cache=pending_cache,
    )
    if self.fused_epilogue:
      x, residual = self.channel_pre_norm(x, residual=residual)
    else:
      x = x + residual
      residual = x
      x = self.channel_pre_norm(x)
    x = self.mlp_block(x)
    return x + residual, cache

  @classmethod
  def init_cache(
      cls,
      batch_size: int,
      width: int,
      num_heads: int,
      attention_window_size: int,
      temporal_block_type: common.TemporalBlockType,
      dtype: at.dtype,
      lru_width: int | None = None,
      conv1d_temporal_width: int = 4,
  ) -> ResidualBlockCache:
    assert width % num_heads == 0
    if temporal_block_type is common.TemporalBlockType.RECURRENT:
      return RecurrentBlock.init_cache(
          batch_size=batch_size,
          lru_width=lru_width or width,
          dtype=dtype,
          conv1d_temporal_width=conv1d_temporal_width,
      )
    return LocalAttentionBlock.init_cache(
        batch_size=batch_size,
        window_size=attention_window_size,
        heads_dim=width // num_heads,
        dtype=dtype,
    )


class Embedder(nn.Module):
  """Tied input/output token embedding."""

  vocab_size: int
  embed_dim: int
  scale_by_sqrt_dim: bool
  quantized: bool = False
  dtype: at.dtype | None = None
  param_dtype: at.dtype = jnp.float32

  def setup(self):
    if self.quantized:
      self._embedding_q = self.param(
          "input_embedding_q",
          nn.initializers.zeros_init(),
          (self.vocab_size, self.embed_dim),
          jnp.int8,
      )
      self._embedding_scale = self.param(
          "input_embedding_scale",
          nn.initializers.ones_init(),
          (self.vocab_size,),
          jnp.float32,
      )
      self.input_embedding_table = None
    else:
      self.input_embedding_table = self.param(
          "input_embedding",
          nn.initializers.variance_scaling(
              scale=1.0,
              mode="fan_in",
              distribution="normal",
              in_axis=1,
              out_axis=0,
          ),
          (self.vocab_size, self.embed_dim),
          self.param_dtype,
      )

  @at.typed
  def encode(self, x: at.Tokens) -> at.Activations:
    if self.quantized:
      compute_dtype = self.dtype or jnp.bfloat16
      emb = self._embedding_q[(x,)].astype(compute_dtype)
      emb = emb * self._embedding_scale[(x,)][..., None].astype(compute_dtype)
    else:
      emb = self.input_embedding_table[(x,)]
      [emb] = nn.dtypes.promote_dtype(emb, dtype=self.dtype)
    if self.scale_by_sqrt_dim:
      # The sqrt is rounded through bfloat16 to match how the reference
      # models were trained (reference modules.py:971-973).
      emb = emb * jnp.sqrt(self.embed_dim).astype(jnp.bfloat16)
    return emb

  @at.typed
  def decode(self, x: at.Activations) -> at.TokenLogits:
    if self.quantized:
      # Per-vocab-row scales commute with the contraction over width: only
      # the int8 table streams from HBM for the logits matmul.
      compute_dtype = self.dtype or jnp.bfloat16
      logits = x.astype(compute_dtype) @ self._embedding_q.T.astype(
          compute_dtype
      )
      return logits * self._embedding_scale.astype(compute_dtype)
    x, table = nn.dtypes.promote_dtype(
        x, self.input_embedding_table, dtype=self.dtype
    )
    return x @ table.T
