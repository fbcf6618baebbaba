"""Pallas TPU kernel: sliding-window multi-query flash attention (prefill).

The Griffin attention blocks attend over a causal window of ``W`` past
positions with a single shared KV head (MQA). The einsum path materializes
the [b, t, s] logits + mask + probs tensors; this kernel streams KV tiles
through VMEM with an online softmax, touching only the ``O(t * W)`` tile
band inside the window — nothing outside it is even fetched (the KV loop is
the innermost grid dimension and its index map offsets into the band).

Masking design (the hot spot — naive masking cost >10x the matmuls):
  * The document constraint folds into a single per-query *lower bound*:
    with contiguous positions inside a document, key ``kp`` is visible to
    query ``qp`` iff ``max(qp - W, doc_start(qp)) <= kp <= qp`` where
    ``doc_start(qp) = qp - segment_pos[qp]``. No key-side segment data is
    needed at all.
  * The lower bound is precomputed on the host side of the program and
    delivered as a [bq, 1] *column* block — loading a row vector and
    transposing it to a column inside the kernel (lane→sublane) is what
    made earlier versions 10x slower.
  * Everything else is iota-generated, so the whole mask is two compares
    and an AND per tile.

Scope (matching how the model uses attention):
  * forward/prefill only (``cache is None``): queries and keys cover the
    same positions. Decode (t == 1 against the ring cache) stays on the
    einsum path — it is a [1, W] row, too small for a kernel to help.
  * Left-padded rows (``segment_pos < 0``) get an empty mask and emit
    zeros; their outputs are ignored by every caller (logit slicing, RG-LRU
    resets, window masks of later layers).
  * gradients: a ``jax.custom_vjp`` whose backward recomputes the reference
    einsum attention and differentiates it — prefill training steps remat
    anyway, and this keeps one hand-written kernel instead of three.

Matmuls run on bf16 inputs with fp32 accumulation (converting tiles to fp32
per step was another major cost of a first version).
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

_MIN_LOGITS_VALUE = -2.3819763e38  # Same fill as models/modules.py.

# Tile sizes: q rows per grid step, k columns per KV grid step.
_BLOCK_Q = 128
_BLOCK_K = 128


def _round_up(v: int, m: int) -> int:
  return ((v + m - 1) // m) * m


def _first_kv_block(q_block, window: int):
  return jnp.maximum(q_block * _BLOCK_Q - window, 0) // _BLOCK_K


def _attn_kernel(
    lower_ref,   # [1, 1, bq, 1]   per-query first visible key position
    q_ref,       # [1, 1, bq, h]
    k_ref,       # [1, bk, h]
    v_ref,       # [1, bk, h]
    o_ref,       # [1, 1, bq, h]
    m_scr,       # [bq, 1] f32 running max
    l_scr,       # [bq, 1] f32 running normalizer
    acc_scr,     # [bq, h] f32 accumulator
    *,
    window: int,
    scale: float,
    num_kv_steps: int,
    out_dtype,
):
  q_block = pl.program_id(2)
  kv_step = pl.program_id(3)
  q_start = q_block * _BLOCK_Q
  kb = _first_kv_block(q_block, window) + kv_step
  k_start = kb * _BLOCK_K

  @pl.when(kv_step == 0)
  def _init():
    m_scr[...] = jnp.full_like(m_scr, _MIN_LOGITS_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

  # Skip tiles strictly after the causal frontier (the index map clamps the
  # window start, which can push trailing steps past the diagonal).
  @pl.when(k_start <= q_start + _BLOCK_Q - 1)
  def _compute():
    q = q_ref[0, 0]
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    # Mask: lower[q] <= kp <= qp, all from columns/iota (no transposes).
    qp_col = q_start + jax.lax.broadcasted_iota(
        jnp.int32, (_BLOCK_Q, 1), 0
    )
    kp_row = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (_BLOCK_Q, _BLOCK_K), 1
    )
    lower_col = lower_ref[0, 0]
    mask = (kp_row >= lower_col) & (kp_row <= qp_col)
    logits = jnp.where(mask, logits, _MIN_LOGITS_VALUE)

    m_prev = m_scr[...]
    m_cur = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked rows (softmax over -inf): keep the scale finite.
    m_safe = jnp.where(m_new <= _MIN_LOGITS_VALUE / 2, 0.0, m_new)
    p = jnp.exp(logits - m_safe)
    p = jnp.where(mask, p, 0.0)
    correction = jnp.where(
        m_prev <= _MIN_LOGITS_VALUE / 2, 0.0, jnp.exp(m_prev - m_safe)
    )
    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

  @pl.when(kv_step == num_kv_steps - 1)
  def _finalize():
    l = l_scr[...]
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows output zeros
    o_ref[0, 0] = (acc_scr[...] / l).astype(out_dtype)


def _flash_window_forward(
    q: jax.Array,       # [b, t, n, h]
    k: jax.Array,       # [b, t, 1, h]
    v: jax.Array,       # [b, t, 1, h]
    segment_pos: jax.Array,  # [b, t] within-document positions
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

  # Per-query first visible key: max(doc start, window start). Padded /
  # left-pad rows (segment_pos < 0 or beyond seq_len) get an empty range.
  positions = jnp.arange(t_pad, dtype=jnp.int32)[None]
  if pad_t:
    segment_pos = jnp.pad(segment_pos, ((0, 0), (0, pad_t)),
                          constant_values=-1)
  doc_start = positions - segment_pos.astype(jnp.int32)
  lower = jnp.maximum(positions - window, doc_start)
  lower = jnp.where(segment_pos < 0, t_pad + 1, lower)  # pads see nothing
  lower = jnp.broadcast_to(lower, (batch, t_pad))

  qh = jnp.transpose(q, (0, 2, 1, 3))  # [b, n, t, h]
  hd = qh.shape[-1]
  nkb = t_pad // _BLOCK_K
  kh = k[:, :, 0, :]
  vh = v[:, :, 0, :]
  lower_col = lower.reshape(batch, t_pad // _BLOCK_Q, _BLOCK_Q, 1)

  # KV steps per q block: the window band plus the diagonal block.
  num_kv_steps = min(window // _BLOCK_K + _BLOCK_Q // _BLOCK_K + 1, nkb)

  def kv_index(b, n, i, j):
    kb = _first_kv_block(i, window) + j
    return (b, jnp.minimum(kb, nkb - 1))

  grid = (batch, num_heads, t_pad // _BLOCK_Q, num_kv_steps)

  out = pl.pallas_call(
      functools.partial(
          _attn_kernel,
          window=window,
          scale=scale,
          num_kv_steps=num_kv_steps,
          out_dtype=out_dtype,
      ),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, 1, _BLOCK_Q, 1),
                       lambda b, n, i, j: (b, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_Q, hd),
                       lambda b, n, i, j: (b, n, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _BLOCK_K, hd),
                       lambda b, n, i, j: (kv_index(b, n, i, j)[0],
                                           kv_index(b, n, i, j)[1], 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _BLOCK_K, hd),
                       lambda b, n, i, j: (kv_index(b, n, i, j)[0],
                                           kv_index(b, n, i, j)[1], 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(
          (1, 1, _BLOCK_Q, hd), lambda b, n, i, j: (b, n, i, 0),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct(
          (batch, num_heads, t_pad, hd), out_dtype
      ),
      scratch_shapes=[
          pltpu.VMEM((_BLOCK_Q, 1), jnp.float32),
          pltpu.VMEM((_BLOCK_Q, 1), jnp.float32),
          pltpu.VMEM((_BLOCK_Q, hd), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary",
                               "arbitrary"),
      ),
  )(lower_col, qh, kh, vh)

  out = jnp.transpose(out, (0, 2, 1, 3))
  return out[:, :seq_len, :, :head_dim]


def _reference_attention(q, k, v, segment_pos, window):
  """The einsum formulation (identical to models/modules.py) — used for
  the backward pass and as the numerical oracle in tests."""
  head_dim = q.shape[-1]
  segment_ids = jnp.cumsum(segment_pos == 0, axis=-1)
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
def flash_window_attention(q, k, v, segment_pos, window: int):
  """Windowed MQA attention; see module docstring.

  Args:
    q: [b, t, n, h] queries (RoPE already applied).
    k: [b, t, 1, h] keys.
    v: [b, t, 1, h] values.
    segment_pos: [b, t] within-document positions (0 marks a document
      start); attention never crosses documents.
    window: The local attention window size.

  Returns:
    [b, t, n, h] attention outputs in ``q.dtype``.
  """
  return _flash_window_forward(q, k, v, segment_pos, window)


def _fwd(q, k, v, segment_pos, window):
  return _flash_window_forward(q, k, v, segment_pos, window), (
      q, k, v, segment_pos,
  )


def _bwd(window, residuals, g):
  q, k, v, segment_pos = residuals
  _, vjp = jax.vjp(
      lambda q_, k_, v_: _reference_attention(
          q_, k_, v_, segment_pos, window
      ),
      q, k, v,
  )
  dq, dk, dv = vjp(g)
  return dq, dk, dv, None


flash_window_attention.defvjp(_fwd, _bwd)
