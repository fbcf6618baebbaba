"""Pallas TPU kernel: sliding-window multi-query flash attention (prefill).

The Griffin attention blocks attend over a causal window of ``W`` past
positions with a single shared KV head (MQA). The einsum path materializes
the [b, t, s] logits + mask + probs tensors; this kernel streams KV blocks
through VMEM with an online softmax, touching only the ``O(t * W)`` tile
band inside the window — nothing outside it is even read.

Scope (matching how the model uses attention):
  * forward/prefill only (``cache is None``): queries and keys cover the
    same positions. Decode (t == 1 against the ring cache) stays on the
    einsum path — it is a [1, W] row, too small for a kernel to help.
  * document masking: tokens attend only within their segment; segment ids
    are cumulative counts of ``segment_pos == 0`` starts, as in the einsum
    path (``models/modules.py::compute_forward_pass_mask``).
  * gradients: a ``jax.custom_vjp`` whose backward recomputes the reference
    einsum attention and differentiates it — prefill training steps remat
    anyway, and this keeps one hand-written kernel instead of three.

Numerics match the einsum path: fp32 logits with the same large negative
mask fill and fp32 softmax accumulation, outputs cast back to the input
dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

_MIN_LOGITS_VALUE = -2.3819763e38  # Same fill as models/modules.py.

# Tile sizes: q rows per grid step, k columns per inner iteration.
_BLOCK_Q = 128
_BLOCK_K = 128


def _round_up(v: int, m: int) -> int:
  return ((v + m - 1) // m) * m


def _attn_kernel(
    seg_q_ref,   # [1, bq]       int32 segment ids for this q block
    seg_k_ref,   # [1, t_pad]    int32 segment ids for all keys
    q_ref,       # [bq, h]       queries (one head, one batch)
    k_ref,       # [t_pad, h]    all keys (single KV head)
    v_ref,       # [t_pad, h]    all values
    o_ref,       # [bq, h]       output
    *,
    seq_len: int,
    window: int,
    scale: float,
    out_dtype,
):
  """One (batch, head, q-block) step: online softmax over in-window k blocks."""
  q_block = pl.program_id(2)
  q_start = q_block * _BLOCK_Q
  head_dim = q_ref.shape[-1]

  q = q_ref[0, 0].astype(jnp.float32) * scale  # [bq, h]
  seg_q = seg_q_ref[0, :]  # [bq]

  # Key-block range covering [q_start - window, q_start + bq).
  first_kb = jnp.maximum(q_start - window, 0) // _BLOCK_K
  last_kb = (q_start + _BLOCK_Q - 1) // _BLOCK_K  # inclusive

  q_pos = q_start + jax.lax.broadcasted_iota(
      jnp.int32, (_BLOCK_Q, _BLOCK_K), 0
  )

  def body(kb, carry):
    m_prev, l_prev, acc_prev = carry  # [bq,1], [bq,1], [bq,h]
    k_start = kb * _BLOCK_K
    k = k_ref[0, pl.ds(k_start, _BLOCK_K), :].astype(jnp.float32)
    v = v_ref[0, pl.ds(k_start, _BLOCK_K), :].astype(jnp.float32)
    seg_k = seg_k_ref[0, pl.ds(k_start, _BLOCK_K)]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]

    k_pos = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (_BLOCK_Q, _BLOCK_K), 1
    )
    mask = (
        (q_pos >= k_pos)
        & (q_pos <= k_pos + window)
        & (k_pos < seq_len)
        & (seg_q[:, None] == seg_k[None, :])
    )
    logits = jnp.where(mask, logits, _MIN_LOGITS_VALUE)

    m_cur = jnp.max(logits, axis=1, keepdims=True)  # [bq,1]
    m_new = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked rows (softmax over -inf): keep the scale finite.
    m_safe = jnp.where(m_new <= _MIN_LOGITS_VALUE / 2, 0.0, m_new)
    p = jnp.exp(logits - m_safe)
    p = jnp.where(mask, p, 0.0)
    correction = jnp.where(
        m_prev <= _MIN_LOGITS_VALUE / 2, 0.0,
        jnp.exp(m_prev - m_safe),
    )  # [bq,1]
    l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc_prev * correction + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new

  m0 = jnp.full((_BLOCK_Q, 1), _MIN_LOGITS_VALUE, jnp.float32)
  l0 = jnp.zeros((_BLOCK_Q, 1), jnp.float32)
  acc0 = jnp.zeros((_BLOCK_Q, head_dim), jnp.float32)
  m, l, acc = jax.lax.fori_loop(first_kb, last_kb + 1, body, (m0, l0, acc0))

  l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows output zeros
  o_ref[0, 0] = (acc / l).astype(out_dtype)


def _flash_window_forward(
    q: jax.Array,       # [b, t, n, h]
    k: jax.Array,       # [b, t, 1, h]
    v: jax.Array,       # [b, t, 1, h]
    segment_ids: jax.Array,  # [b, t] int32
    window: int,
) -> jax.Array:
  batch, seq_len, num_heads, head_dim = q.shape
  out_dtype = q.dtype
  scale = head_dim**-0.5

  t_pad = _round_up(seq_len, max(_BLOCK_Q, _BLOCK_K))
  pad_t = t_pad - seq_len
  h_pad = _round_up(head_dim, 128) - head_dim
  if pad_t or h_pad:
    q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, h_pad)))
    k = jnp.pad(k, ((0, 0), (0, pad_t), (0, 0), (0, h_pad)))
    v = jnp.pad(v, ((0, 0), (0, pad_t), (0, 0), (0, h_pad)))
  if pad_t:
    # Padded keys get segment id -1 (matches no real segment).
    segment_ids = jnp.pad(segment_ids, ((0, 0), (0, pad_t)),
                          constant_values=-1)

  # [b, n, t, h] so (batch, head) are grid dims; KV drop the head axis.
  qh = jnp.transpose(q, (0, 2, 1, 3))
  kh = k[:, :, 0, :]
  vh = v[:, :, 0, :]
  hd = qh.shape[-1]

  grid = (batch, num_heads, t_pad // _BLOCK_Q)

  out = pl.pallas_call(
      functools.partial(
          _attn_kernel,
          seq_len=seq_len,
          window=window,
          scale=scale,
          out_dtype=out_dtype,
      ),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, _BLOCK_Q), lambda b, n, i: (b, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, t_pad), lambda b, n, i: (b, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_Q, hd), lambda b, n, i: (b, n, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, t_pad, hd), lambda b, n, i: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, t_pad, hd), lambda b, n, i: (b, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(
          (1, 1, _BLOCK_Q, hd), lambda b, n, i: (b, n, i, 0),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct(
          (batch, num_heads, t_pad, hd), out_dtype
      ),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary"),
      ),
  )(segment_ids, segment_ids, qh, kh, vh)

  out = jnp.transpose(out, (0, 2, 1, 3))
  return out[:, :seq_len, :, :head_dim]


def _reference_attention(q, k, v, segment_ids, window):
  """The einsum formulation (identical to models/modules.py) — used for
  the backward pass and as the numerical oracle in tests."""
  head_dim = q.shape[-1]
  positions = jnp.arange(q.shape[1])[None]
  same = segment_ids[:, :, None] == segment_ids[:, None, :]
  causal = positions[..., None] >= positions[..., None, :]
  in_window = positions[..., None] <= positions[..., None, :] + window
  mask = (same & causal & in_window)[:, None]
  logits = jnp.einsum("btnh,bsnh->bnts", q, k) * (head_dim**-0.5)
  masked = jnp.where(mask, logits, _MIN_LOGITS_VALUE)
  probs = jax.nn.softmax(masked.astype(jnp.float32), axis=-1).astype(q.dtype)
  return jnp.einsum("bnts,bsnh->btnh", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_window_attention(q, k, v, segment_ids, window: int):
  """Windowed MQA attention; see module docstring.

  Args:
    q: [b, t, n, h] queries (RoPE already applied).
    k: [b, t, 1, h] keys.
    v: [b, t, 1, h] values.
    segment_ids: [b, t] document ids; attention never crosses documents.
    window: The local attention window size.

  Returns:
    [b, t, n, h] attention outputs in ``q.dtype``.
  """
  return _flash_window_forward(q, k, v, segment_ids, window)


def _fwd(q, k, v, segment_ids, window):
  return _flash_window_forward(q, k, v, segment_ids, window), (
      q, k, v, segment_ids,
  )


def _bwd(window, residuals, g):
  q, k, v, segment_ids = residuals
  _, vjp = jax.vjp(
      lambda q_, k_, v_: _reference_attention(q_, k_, v_, segment_ids, window),
      q, k, v,
  )
  dq, dk, dv = vjp(g)
  return dq, dk, dv, None


flash_window_attention.defvjp(_fwd, _bwd)
