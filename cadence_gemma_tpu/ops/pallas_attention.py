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
  * gradients: flash backward in two Pallas kernels. The forward also emits
    the per-row logsumexp; backward recomputes probabilities tile-by-tile
    from (q, k, lse) — never materializing [t, t] — and accumulates dq over
    the KV band (same grid as forward) and dk/dv over the transposed Q
    band (per head, reduced across heads outside since KV is shared in
    MQA). Training memory is O(t * window), same as inference.

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
_MASKED_LSE = 1e30  # lse sentinel for fully-masked (padded) query rows.

# Tile sizes: q rows per grid step, k columns per KV grid step.
_BLOCK_Q = 128
_BLOCK_K = 128


def _round_up(v: int, m: int) -> int:
  return ((v + m - 1) // m) * m


def _first_kv_block(q_block, window: int, q_offset: int = 0):
  return jnp.maximum(q_block * _BLOCK_Q + q_offset - window, 0) // _BLOCK_K


def _first_q_block(kv_block, q_offset: int = 0):
  """First q tile whose rows can (causally) see kv tile ``kv_block``."""
  return jnp.maximum(kv_block * _BLOCK_K - q_offset, 0) // _BLOCK_Q


def _attn_kernel(
    lower_ref,   # [1, 1, bq, 1]   per-query first visible key position
    q_ref,       # [1, 1, bq, h]
    k_ref,       # [1, bk, h]
    v_ref,       # [1, bk, h]
    o_ref,       # [1, 1, bq, h]
    lse_ref,     # [1, 1, bq, 1]   per-query logsumexp (backward residual)
    m_scr,       # [bq, 1] f32 running max
    l_scr,       # [bq, 1] f32 running normalizer
    acc_scr,     # [bq, h] f32 accumulator
    *,
    window: int,
    scale: float,
    num_kv_steps: int,
    out_dtype,
    q_offset: int = 0,
):
  q_block = pl.program_id(2)
  kv_step = pl.program_id(3)
  # All positions live in the KV-array frame: query i sits at q_offset + i
  # (q_offset > 0 when the keys carry a leading halo, e.g. the
  # sequence-parallel shards' previous-window exchange).
  q_start = q_block * _BLOCK_Q + q_offset
  kb = _first_kv_block(q_block, window, q_offset) + kv_step
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
    m = m_scr[...]
    m_safe = jnp.where(m <= _MIN_LOGITS_VALUE / 2, 0.0, m)
    # Fully-masked rows output zeros; their lse is +big so the backward's
    # recomputed probabilities exp(s - lse) are exactly zero.
    lse_ref[0, 0] = jnp.where(l == 0.0, _MASKED_LSE, m_safe + jnp.log(l))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc_scr[...] / l).astype(out_dtype)


def _pad_and_lower(q, k, v, segment_pos, window, kv_prefix=0):
  """Shared fwd/bwd prep: pad to tile multiples, per-query lower bounds.

  ``kv_prefix`` leading keys/values precede the queries (the SP halo); all
  position math runs in the KV-array frame where query ``i`` sits at
  ``kv_prefix + i``. A query whose document starts within or before the
  halo keeps its usual ``max(window start, doc start)`` lower bound — for
  the first shard (no halo neighbor) document starts land at the halo
  boundary, masking the halo's zero-filled entries automatically.
  """
  batch, seq_len, _, head_dim = q.shape
  t_pad = _round_up(seq_len, max(_BLOCK_Q, _BLOCK_K))
  pad_t = t_pad - seq_len
  h_pad = _round_up(head_dim, 128) - head_dim
  if pad_t or h_pad:
    q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, h_pad)))
    k = jnp.pad(k, ((0, 0), (0, pad_t), (0, 0), (0, h_pad)))
    v = jnp.pad(v, ((0, 0), (0, pad_t), (0, 0), (0, h_pad)))

  # Per-query first visible key: max(doc start, window start). Padded /
  # left-pad rows (segment_pos < 0 or beyond seq_len) get an empty range.
  positions = kv_prefix + jnp.arange(t_pad, dtype=jnp.int32)[None]
  if pad_t:
    segment_pos = jnp.pad(segment_pos, ((0, 0), (0, pad_t)),
                          constant_values=-1)
  doc_start = positions - segment_pos.astype(jnp.int32)
  lower = jnp.maximum(positions - window, doc_start)
  lower = jnp.where(segment_pos < 0, kv_prefix + t_pad + 1, lower)
  lower = jnp.broadcast_to(lower, (batch, t_pad))
  return q, k, v, lower, t_pad


def _split_qkv_pad(q, k, v, segment_pos, window, kv_prefix):
  """Separates the KV halo, pads bodies to tiles, re-attaches the halo."""
  if kv_prefix:
    assert kv_prefix % max(_BLOCK_Q, _BLOCK_K) == 0, kv_prefix
    halo_k, k = k[:, :kv_prefix], k[:, kv_prefix:]
    halo_v, v = v[:, :kv_prefix], v[:, kv_prefix:]
  q, k, v, lower, t_pad = _pad_and_lower(
      q, k, v, segment_pos, window, kv_prefix
  )
  if kv_prefix:
    if k.shape[-1] != halo_k.shape[-1]:
      h_pad = k.shape[-1] - halo_k.shape[-1]
      halo_k = jnp.pad(halo_k, ((0, 0), (0, 0), (0, 0), (0, h_pad)))
      halo_v = jnp.pad(halo_v, ((0, 0), (0, 0), (0, 0), (0, h_pad)))
    k = jnp.concatenate([halo_k, k], axis=1)
    v = jnp.concatenate([halo_v, v], axis=1)
  return q, k, v, lower, t_pad


def _flash_window_forward(
    q: jax.Array,       # [b, t, n, h]
    k: jax.Array,       # [b, kv_prefix + t, 1, h]
    v: jax.Array,       # [b, kv_prefix + t, 1, h]
    segment_pos: jax.Array,  # [b, t] within-document positions
    window: int,
    kv_prefix: int = 0,
) -> tuple[jax.Array, jax.Array]:
  """Returns ([b, t, n, h] outputs, [b, n, t_pad, 1] f32 logsumexp)."""
  batch, seq_len, num_heads, head_dim = q.shape
  out_dtype = q.dtype
  scale = head_dim**-0.5

  q, k, v, lower, t_pad = _split_qkv_pad(
      q, k, v, segment_pos, window, kv_prefix
  )

  qh = jnp.transpose(q, (0, 2, 1, 3))  # [b, n, t, h]
  hd = qh.shape[-1]
  nkb = (kv_prefix + t_pad) // _BLOCK_K
  kh = k[:, :, 0, :]
  vh = v[:, :, 0, :]
  lower_col = lower.reshape(batch, t_pad // _BLOCK_Q, _BLOCK_Q, 1)

  # KV steps per q block: the window band plus the diagonal block.
  num_kv_steps = min(window // _BLOCK_K + _BLOCK_Q // _BLOCK_K + 1, nkb)

  def kv_index(b, n, i, j):
    kb = _first_kv_block(i, window, kv_prefix) + j
    return (b, jnp.minimum(kb, nkb - 1))

  grid = (batch, num_heads, t_pad // _BLOCK_Q, num_kv_steps)

  out, lse = pl.pallas_call(
      functools.partial(
          _attn_kernel,
          window=window,
          scale=scale,
          num_kv_steps=num_kv_steps,
          out_dtype=out_dtype,
          q_offset=kv_prefix,
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
      out_specs=[
          pl.BlockSpec(
              (1, 1, _BLOCK_Q, hd), lambda b, n, i, j: (b, n, i, 0),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (1, 1, _BLOCK_Q, 1), lambda b, n, i, j: (b, n, i, 0),
              memory_space=pltpu.VMEM,
          ),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((batch, num_heads, t_pad, hd), out_dtype),
          jax.ShapeDtypeStruct((batch, num_heads, t_pad, 1), jnp.float32),
      ],
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
  return out[:, :seq_len, :, :head_dim], lse


def _dq_kernel(
    lower_ref,   # [1, 1, bq, 1]
    lse_ref,     # [1, 1, 1, bq, 1]
    delta_ref,   # [1, 1, 1, bq, 1]   rowsum(dO * O)
    q_ref,       # [1, 1, bq, h]
    do_ref,      # [1, 1, bq, h]
    k_ref,       # [1, bk, h]
    v_ref,       # [1, bk, h]
    dq_ref,      # [1, 1, bq, h]
    dq_scr,      # [bq, h] f32
    *,
    window: int,
    scale: float,
    num_kv_steps: int,
    out_dtype,
    q_offset: int = 0,
):
  """dq for one q tile, streaming the same KV band as the forward."""
  q_block = pl.program_id(2)
  kv_step = pl.program_id(3)
  q_start = q_block * _BLOCK_Q + q_offset
  kb = _first_kv_block(q_block, window, q_offset) + kv_step
  k_start = kb * _BLOCK_K

  @pl.when(kv_step == 0)
  def _init():
    dq_scr[...] = jnp.zeros_like(dq_scr)

  @pl.when(k_start <= q_start + _BLOCK_Q - 1)
  def _compute():
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    qp_col = q_start + jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_Q, 1), 0)
    kp_row = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (_BLOCK_Q, _BLOCK_K), 1
    )
    lower_col = lower_ref[0, 0]
    mask = (kp_row >= lower_col) & (kp_row <= qp_col)

    p = jnp.exp(s - lse_ref[0, 0, 0])
    p = jnp.where(mask, p, 0.0)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0, 0]) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

  @pl.when(kv_step == num_kv_steps - 1)
  def _finalize():
    dq_ref[0, 0] = dq_scr[...].astype(out_dtype)


def _dkv_kernel(
    lower_ref,   # [1, 1, 1, bq]     (row orientation)
    lse_ref,     # [1, 1, 1, 1, bq]
    delta_ref,   # [1, 1, 1, 1, bq]
    q_ref,       # [1, 1, bq, h]
    do_ref,      # [1, 1, bq, h]
    k_ref,       # [1, bk, h]
    v_ref,       # [1, bk, h]
    dk_ref,      # [1, 1, bk, h]   per-head partial
    dv_ref,      # [1, 1, bk, h]
    dk_scr,      # [bk, h] f32
    dv_scr,      # [bk, h] f32
    *,
    window: int,
    scale: float,
    num_q_steps: int,
    num_q_blocks: int,
    out_dtype,
    q_offset: int = 0,
):
  """dk/dv for one kv tile (one head), streaming its visible q tiles.

  Works in the transposed orientation [bk, bq]: keys on sublanes, queries
  on lanes, so the per-query lower/lse/delta vectors load as cheap row
  broadcasts (the forward's lane→sublane transpose lesson, in reverse).
  """
  kv_block = pl.program_id(2)
  q_step = pl.program_id(3)
  k_start = kv_block * _BLOCK_K
  qb = _first_q_block(kv_block, q_offset) + q_step
  q_start = qb * _BLOCK_Q + q_offset

  @pl.when(q_step == 0)
  def _init():
    dk_scr[...] = jnp.zeros_like(dk_scr)
    dv_scr[...] = jnp.zeros_like(dv_scr)

  # Visible iff some (q, k) pair in the tile satisfies k <= q <= k + window.
  @pl.when((qb <= num_q_blocks - 1)
           & (q_start + _BLOCK_Q - 1 >= k_start)
           & (q_start <= k_start + _BLOCK_K - 1 + window))
  def _compute():
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    k = k_ref[0]
    v = v_ref[0]

    # s_T[k, q] — transposed logits.
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    kp_col = k_start + jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_K, 1), 0)
    qp_row = q_start + jax.lax.broadcasted_iota(
        jnp.int32, (_BLOCK_K, _BLOCK_Q), 1
    )
    lower_row = lower_ref[0, 0]                 # [1, bq]
    mask = (kp_col >= lower_row) & (kp_col <= qp_row)

    p_t = jnp.exp(s_t - lse_ref[0, 0, 0])       # lse broadcasts [1, bq]
    p_t = jnp.where(mask, p_t, 0.0)

    dv_scr[...] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_t = p_t * (dp_t - delta_ref[0, 0, 0]) * scale
    dk_scr[...] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

  @pl.when(q_step == num_q_steps - 1)
  def _finalize():
    dk_ref[0, 0] = dk_scr[...].astype(out_dtype)
    dv_ref[0, 0] = dv_scr[...].astype(out_dtype)


def _flash_window_backward(
    q: jax.Array,            # [b, t, n, h]
    k: jax.Array,            # [b, kv_prefix + t, 1, h]
    v: jax.Array,            # [b, kv_prefix + t, 1, h]
    segment_pos: jax.Array,  # [b, t]
    o: jax.Array,            # [b, t, n, h] forward outputs
    lse: jax.Array,          # [b, n, t_pad, 1] f32 from the forward
    g: jax.Array,            # [b, t, n, h] output cotangent
    window: int,
    kv_prefix: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
  batch, seq_len, num_heads, head_dim = q.shape
  q_dtype, k_dtype, v_dtype = q.dtype, k.dtype, v.dtype
  kv_len = k.shape[1]
  scale = head_dim**-0.5

  # delta[b, n, t] = rowsum(dO * O): the softmax-jacobian diagonal term.
  delta = jnp.einsum(
      "btnh,btnh->bnt", g.astype(jnp.float32), o.astype(jnp.float32)
  )

  q, k, v, lower, t_pad = _split_qkv_pad(
      q, k, v, segment_pos, window, kv_prefix
  )
  pad_t = t_pad - seq_len
  if pad_t:
    g = jnp.pad(g, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_t)))
  h_pad = q.shape[-1] - head_dim
  if h_pad:
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, h_pad)))

  qh = jnp.transpose(q, (0, 2, 1, 3))   # [b, n, t, h]
  gh = jnp.transpose(g, (0, 2, 1, 3))
  hd = qh.shape[-1]
  kh = k[:, :, 0, :]
  vh = v[:, :, 0, :]
  nqb = t_pad // _BLOCK_Q
  nkb = (kv_prefix + t_pad) // _BLOCK_K

  lower_col = lower.reshape(batch, nqb, _BLOCK_Q, 1)
  lse_col = lse.reshape(batch, num_heads, nqb, _BLOCK_Q, 1)
  delta_col = delta.reshape(batch, num_heads, nqb, _BLOCK_Q, 1)
  lower_row = lower.reshape(batch, nqb, 1, _BLOCK_Q)
  lse_row = lse.reshape(batch, num_heads, nqb, 1, _BLOCK_Q)
  delta_row = delta.reshape(batch, num_heads, nqb, 1, _BLOCK_Q)

  num_kv_steps = min(window // _BLOCK_K + _BLOCK_Q // _BLOCK_K + 1, nkb)

  def kv_index(i, j):
    return jnp.minimum(_first_kv_block(i, window, kv_prefix) + j, nkb - 1)

  dq = pl.pallas_call(
      functools.partial(
          _dq_kernel,
          window=window,
          scale=scale,
          num_kv_steps=num_kv_steps,
          out_dtype=q_dtype,
          q_offset=kv_prefix,
      ),
      grid=(batch, num_heads, nqb, num_kv_steps),
      in_specs=[
          pl.BlockSpec((1, 1, _BLOCK_Q, 1),
                       lambda b, n, i, j: (b, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, 1, _BLOCK_Q, 1),
                       lambda b, n, i, j: (b, n, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, 1, _BLOCK_Q, 1),
                       lambda b, n, i, j: (b, n, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_Q, hd),
                       lambda b, n, i, j: (b, n, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_Q, hd),
                       lambda b, n, i, j: (b, n, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _BLOCK_K, hd),
                       lambda b, n, i, j: (b, kv_index(i, j), 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _BLOCK_K, hd),
                       lambda b, n, i, j: (b, kv_index(i, j), 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(
          (1, 1, _BLOCK_Q, hd), lambda b, n, i, j: (b, n, i, 0),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct(
          (batch, num_heads, t_pad, hd), q_dtype
      ),
      scratch_shapes=[pltpu.VMEM((_BLOCK_Q, hd), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary",
                               "arbitrary"),
      ),
  )(lower_col, lse_col, delta_col, qh, gh, kh, vh)

  # Each kv tile is visible to the q tiles covering [k_start, k_end+window].
  num_q_steps = min(window // _BLOCK_Q + _BLOCK_K // _BLOCK_Q + 1, nqb)

  def q_index(i, j):
    return jnp.minimum(_first_q_block(i, kv_prefix) + j, nqb - 1)

  dk_heads, dv_heads = pl.pallas_call(
      functools.partial(
          _dkv_kernel,
          window=window,
          scale=scale,
          num_q_steps=num_q_steps,
          num_q_blocks=nqb,
          out_dtype=jnp.float32,
          q_offset=kv_prefix,
      ),
      grid=(batch, num_heads, nkb, num_q_steps),
      in_specs=[
          pl.BlockSpec((1, 1, 1, _BLOCK_Q),
                       lambda b, n, i, j: (b, q_index(i, j), 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, 1, 1, _BLOCK_Q),
                       lambda b, n, i, j: (b, n, q_index(i, j), 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, 1, 1, _BLOCK_Q),
                       lambda b, n, i, j: (b, n, q_index(i, j), 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_Q, hd),
                       lambda b, n, i, j: (b, n, q_index(i, j), 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_Q, hd),
                       lambda b, n, i, j: (b, n, q_index(i, j), 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _BLOCK_K, hd),
                       lambda b, n, i, j: (b, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _BLOCK_K, hd),
                       lambda b, n, i, j: (b, i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec(
              (1, 1, _BLOCK_K, hd), lambda b, n, i, j: (b, n, i, 0),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (1, 1, _BLOCK_K, hd), lambda b, n, i, j: (b, n, i, 0),
              memory_space=pltpu.VMEM,
          ),
      ],
      out_shape=[
          jax.ShapeDtypeStruct(
              (batch, num_heads, kv_prefix + t_pad, hd), jnp.float32
          ),
          jax.ShapeDtypeStruct(
              (batch, num_heads, kv_prefix + t_pad, hd), jnp.float32
          ),
      ],
      scratch_shapes=[
          pltpu.VMEM((_BLOCK_K, hd), jnp.float32),
          pltpu.VMEM((_BLOCK_K, hd), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary",
                               "arbitrary"),
      ),
  )(lower_row, lse_row, delta_row, qh, gh, kh, vh)

  # The single KV head is shared across query heads (MQA): reduce.
  dk = jnp.sum(dk_heads, axis=1)[:, :, None, :]
  dv = jnp.sum(dv_heads, axis=1)[:, :, None, :]

  dq = jnp.transpose(dq, (0, 2, 1, 3))[:, :seq_len, :, :head_dim]
  # The KV cotangent covers the halo too (its grads flow back to the
  # owning shard through the ppermute's transpose).
  dk = dk[:, : kv_prefix + seq_len, :, :head_dim].astype(k_dtype)
  dv = dv[:, : kv_prefix + seq_len, :, :head_dim].astype(v_dtype)
  return dq, dk, dv


def _mha_kernel(
    q_ref,       # [1, 1, bq, h]
    k_ref,       # [1, 1, bk, h]
    v_ref,       # [1, 1, bk, h]
    o_ref,       # [1, 1, bq, h]
    m_scr,       # [bq, 1] f32 running max
    l_scr,       # [bq, 1] f32 running normalizer
    acc_scr,     # [bq, h] f32 accumulator
    *,
    scale: float,
    kv_len: int,
    num_kv_steps: int,
    out_dtype,
):
  """Bidirectional multi-head flash attention (ViT towers).

  Much simpler than the windowed Griffin kernel: every key is visible to
  every query except right-padding (``kp >= kv_len``), so the only mask is
  one iota compare per tile. KV is per-head (full MHA, not MQA).
  """
  kv_step = pl.program_id(3)
  k_start = kv_step * _BLOCK_K

  @pl.when(kv_step == 0)
  def _init():
    m_scr[...] = jnp.full_like(m_scr, _MIN_LOGITS_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

  q = q_ref[0, 0]
  k = k_ref[0, 0]
  v = v_ref[0, 0]

  logits = jax.lax.dot_general(
      q, k, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) * scale
  kp_row = k_start + jax.lax.broadcasted_iota(
      jnp.int32, (_BLOCK_Q, _BLOCK_K), 1
  )
  mask = kp_row < kv_len
  logits = jnp.where(mask, logits, _MIN_LOGITS_VALUE)

  m_prev = m_scr[...]
  m_cur = jnp.max(logits, axis=1, keepdims=True)
  m_new = jnp.maximum(m_prev, m_cur)
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
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc_scr[...] / l).astype(out_dtype)


# Longest (padded) sequence the one-pass MHA kernel holds in VMEM. The
# live fp32 [t, t] intermediates (logits, exp'd probabilities, the iota/
# mask) are t^2 * 4 bytes each — ~4 MB at t=1024 — on top of the
# double-buffered q/k/v/o blocks (t * head_dim * dtype each). bf16 inputs
# at t=1024 fit the ~16 MB budget with margin (hardware-verified at 729);
# fp32 inputs double the block traffic, so cap them at 768 and let longer
# fp32 shapes take the tiled online-softmax grid instead.
_ONEPASS_MAX_T = 1024
_ONEPASS_MAX_T_F32 = 768


def _mha_onepass_kernel(
    q_ref,       # [1, 1, t, h]
    k_ref,       # [1, 1, t, h]
    v_ref,       # [1, 1, t, h]
    o_ref,       # [1, 1, t, h]
    *,
    scale: float,
    kv_len: int,
    out_dtype,
):
  """Whole-sequence bidirectional MHA for one (batch, head) pair.

  At ViT-tower lengths (t <= ~1k) a head's full [t, t] fp32 logits fit in
  VMEM, so a plain masked softmax in two big MXU matmuls replaces the
  online-softmax tiling — the tiled ``_mha_kernel``'s (b, n, t/128,
  t/128) grid of 128-wide steps is kernel-overhead-bound at these shapes
  (measured ~1.5x SLOWER than XLA einsum at 729 tokens, r3 vision sweep),
  while this kernel still avoids the einsum path's ~34 MB/layer logits
  round trip through HBM. Padded key columns (``kp >= kv_len``) are
  masked; padded *query* rows are NOT masked (their zero logits give a
  harmless uniform softmax over the valid keys) and are sliced off by
  the caller. The ``l == 0`` guard in the finalize step only matters if
  every key column were padded, which the caller never produces; it is
  kept as cheap division-by-zero insurance, not a load-bearing path.
  """
  q = q_ref[0, 0]
  k = k_ref[0, 0]
  v = v_ref[0, 0]
  logits = jax.lax.dot_general(
      q, k, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) * scale
  kp = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
  mask = kp < kv_len
  logits = jnp.where(mask, logits, _MIN_LOGITS_VALUE)
  m = jnp.max(logits, axis=1, keepdims=True)
  m = jnp.where(m <= _MIN_LOGITS_VALUE / 2, 0.0, m)
  p = jnp.exp(logits - m)
  p = jnp.where(mask, p, 0.0)
  l = jnp.sum(p, axis=1, keepdims=True)
  l = jnp.where(l == 0.0, 1.0, l)
  o_ref[0, 0] = (
      jax.lax.dot_general(
          p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
      ) / l
  ).astype(out_dtype)


def _flash_mha_onepass(q, k, v, seq_len, head_dim):
  """One kernel instance per (batch, head); q/k/v already padded."""
  batch, num_heads, t_pad, hd = q.shape
  out = pl.pallas_call(
      functools.partial(
          _mha_onepass_kernel,
          scale=head_dim**-0.5,
          kv_len=seq_len,
          out_dtype=q.dtype,
      ),
      grid=(batch, num_heads),
      in_specs=[
          pl.BlockSpec((1, 1, t_pad, hd), lambda b, n: (b, n, 0, 0),
                       memory_space=pltpu.VMEM)
      ] * 3,
      out_specs=pl.BlockSpec(
          (1, 1, t_pad, hd), lambda b, n: (b, n, 0, 0),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct((batch, num_heads, t_pad, hd), q.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel"),
      ),
  )(q, k, v)
  return out


def _flash_mha_forward(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
  """[b, t, n, h] q/k/v → [b, t, n, h] full bidirectional attention."""
  batch, seq_len, num_heads, head_dim = q.shape
  out_dtype = q.dtype
  scale = head_dim**-0.5

  t_pad = _round_up(seq_len, max(_BLOCK_Q, _BLOCK_K))
  pad_t = t_pad - seq_len
  h_pad = _round_up(head_dim, 128) - head_dim
  if pad_t or h_pad:
    pad = ((0, 0), (0, pad_t), (0, 0), (0, h_pad))
    q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
  hd = q.shape[-1]

  qh = jnp.transpose(q, (0, 2, 1, 3))  # [b, n, t, h]
  kh = jnp.transpose(k, (0, 2, 1, 3))
  vh = jnp.transpose(v, (0, 2, 1, 3))
  onepass_max_t = (
      _ONEPASS_MAX_T if q.dtype == jnp.bfloat16 else _ONEPASS_MAX_T_F32
  )
  if t_pad <= onepass_max_t:
    out = _flash_mha_onepass(qh, kh, vh, seq_len, head_dim)
    out = jnp.transpose(out, (0, 2, 1, 3))
    return out[:, :seq_len, :, :head_dim]
  num_kv_steps = t_pad // _BLOCK_K
  grid = (batch, num_heads, t_pad // _BLOCK_Q, num_kv_steps)

  out = pl.pallas_call(
      functools.partial(
          _mha_kernel,
          scale=scale,
          kv_len=seq_len,
          num_kv_steps=num_kv_steps,
          out_dtype=out_dtype,
      ),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, 1, _BLOCK_Q, hd),
                       lambda b, n, i, j: (b, n, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_K, hd),
                       lambda b, n, i, j: (b, n, j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, _BLOCK_K, hd),
                       lambda b, n, i, j: (b, n, j, 0),
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
  )(qh, kh, vh)

  out = jnp.transpose(out, (0, 2, 1, 3))
  return out[:, :seq_len, :, :head_dim]


def _reference_mha(q, k, v):
  """Einsum formulation (identical to the ViT block's XLA path)."""
  head_dim = q.shape[-1]
  logits = jnp.einsum(
      "bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32
  ) * (head_dim**-0.5)
  probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
  return jnp.einsum("bnqk,bknh->bqnh", probs, v)


@jax.custom_vjp
def flash_mha_attention(q: jax.Array, k: jax.Array, v: jax.Array):
  """Bidirectional full-MHA flash attention for the vision towers.

  Streams KV tiles through VMEM with an online softmax, never
  materializing the [b, n, t, t] fp32 logits the einsum path round-trips
  through HBM (~34 MB/block at 729 tokens — the dominant non-matmul cost
  of the ViT forward, SURVEY §7 hard part 5). Forward is Pallas; the
  backward recomputes through the einsum formulation (the towers are
  frozen in the reference training recipe, dino_siglip.py:69-79, so the
  gradient path is cold).

  Args:
    q, k, v: [b, t, n, h] per-head queries/keys/values. Every key attends
      to every query (no causal mask); tile-alignment padding is added and
      masked internally, so any ``t`` works.

  Returns:
    [b, t, n, h] attention outputs in ``q.dtype``.
  """
  return _flash_mha_forward(q, k, v)


def _mha_fwd(q, k, v):
  return _flash_mha_forward(q, k, v), (q, k, v)


def _mha_bwd(residuals, g):
  q, k, v = residuals
  _, vjp = jax.vjp(_reference_mha, q, k, v)
  return vjp(g)


flash_mha_attention.defvjp(_mha_fwd, _mha_bwd)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_window_attention(
    q, k, v, segment_pos, window: int, kv_prefix: int = 0
):
  """Windowed MQA attention; see module docstring.

  Args:
    q: [b, t, n, h] queries (RoPE already applied).
    k: [b, kv_prefix + t, 1, h] keys.
    v: [b, kv_prefix + t, 1, h] values.
    segment_pos: [b, t] within-document positions (0 marks a document
      start); attention never crosses documents.
    window: The local attention window size.
    kv_prefix: Leading keys/values that precede the queries in time — the
      previous sequence-parallel shard's last ``window`` positions
      (exchanged via ppermute), so each shard attends its full window
      without gathering the whole sequence. Must be a tile multiple.

  Returns:
    [b, t, n, h] attention outputs in ``q.dtype``.
  """
  return _flash_window_forward(q, k, v, segment_pos, window, kv_prefix)[0]


def _fwd(q, k, v, segment_pos, window, kv_prefix):
  out, lse = _flash_window_forward(q, k, v, segment_pos, window, kv_prefix)
  return out, (q, k, v, segment_pos, out, lse)


def _bwd(window, kv_prefix, residuals, g):
  q, k, v, segment_pos, o, lse = residuals
  dq, dk, dv = _flash_window_backward(
      q, k, v, segment_pos, o, lse, g, window, kv_prefix
  )
  return dq, dk, dv, None


flash_window_attention.defvjp(_fwd, _bwd)
