"""Self-speculative greedy decoding via device-side prompt-lookup drafts.

No reference counterpart (the reference decodes strictly one token per
forward pass, ``/root/reference/recurrentgemma/jax/sampler.py:163-204``).
Decode is HBM-bandwidth-bound: every step reads all weights to produce one
token. Speculative decoding reads the weights once per *draft chunk* —
verify ``k`` drafted tokens plus the pending token in a single ``k+1``-token
forward, accept the prefix on which the model's own greedy choices agree,
and emit one extra (corrected) token on top. Greedy acceptance makes the
output tokens match plain decode regardless of draft quality — exactly up
to XLA numerics: the k+1-token verify program contracts a*h+x / softmax
with different fma fusions than the 1-token decode program (~1e-7 relative
in fp32), so an argmax whose top-2 logits are closer than that can flip.
Drafts themselves only change the speed, never the distribution.

Drafting is prompt-lookup based and runs **on device**: every position in
the history (prompt + generated) is scored by the length of its backward
match against the most recent tokens (up to ``ngram``) in one vectorized
compare, and the continuation of the longest/latest match becomes the
draft. No draft model, no host round-trips — the entire
generation loop (draft → verify → accept → cache commit) is ONE compiled
XLA while-loop program, same as the plain sampler's.

The Griffin-specific piece is the cache: recurrent state cannot be "rolled
back" like a pure KV cache, so verification runs the model in
``pending_cache`` mode (``models/griffin.py``) and
:func:`models.modules.commit_pending_cache` materializes exactly the
accepted prefix — RG-LRU fp32 carries, conv input tail, masked ring write.

Speed-of-light accounting: a spec step costs one weights read (like one
plain decode step) plus O(k) extra FLOPs (negligible at decode batch
sizes); with mean accepted length ``1 + E[j]`` the decode throughput
multiplier is ``1 + E[j]`` minus epsilon. Copy-heavy workloads (structured
extraction, code edits, quoting) see 2-5x; adversarially non-repetitive
text degrades gracefully to ~1x.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from cadence_gemma_tpu.inference import sampler as sampler_lib
from cadence_gemma_tpu.models import modules

SamplerOutput = sampler_lib.SamplerOutput


def prompt_lookup_spec_step(
    model,
    params,
    state: dict[str, Any],
    *,
    draft_len: int,
    ngram: int,
    stop_ids,
    logits_filter=None,
    constraint=None,
) -> dict[str, Any]:
  """One draft → verify → accept → commit step over a batch of rows.

  Pure and jittable; shared by :class:`SpeculativeSampler`'s generation
  while-loop and :class:`serving.ContinuousBatcher`'s speculative step
  (continuous batching × speculation).

  ``state`` keys (b = rows, H = history capacity, L = output capacity):
    hist [b, H] int32, valid_from [b], cur_len [b], cache (model decode
    caches), positions [b, 1], live [b] bool (rows to advance; others are
    bit-frozen), out [b, L] int32, write_idx [b], budget [b]. With an
    ``rng`` key ([b, 2] per-row PRNG keys) present, acceptance is the
    STOCHASTIC speculative-sampling rule instead of greedy agreement:
    the prompt-lookup draft is a one-hot proposal q, so draft token x is
    accepted with probability ``min(1, p(x)/q(x)) = p(x)`` and a
    rejection resamples from the residual ``norm(max(p - q, 0))`` — by
    the standard speculative-sampling theorem the emitted tokens are
    distributed EXACTLY as p (the temperature/top-k/top-p-filtered
    softmax given by ``logits_filter``), draft quality only affects
    speed. ``logits_filter`` maps raw logits to filtered logits
    (identity when None).

  Returns the updated state plus ``eos_hit`` [b] — the caller folds that
  (and budget exhaustion) into its own liveness bookkeeping. ``stop_ids``
  is the sampler's stop set (EOS + any ``stop_token_ids``).

  ``constraint`` (anything with the single-grammar ``mask(state, logits)``
  / ``advance(state, token)`` interface — a ``constrain.ConstraintTables``
  or a registry-bound ``constrain.BoundConstraint``) makes the verify
  GRAMMAR-AWARE: position ``i``'s logits are masked with the DFA state
  reached through the fed chunk (``state["cstate"]`` plus the drafts
  before ``i``), so a draft that would leave the grammar simply disagrees
  with the masked argmax and is rejected — speculation composes with
  constrained decoding, output-identical to constrained plain decode.
  Requires ``state["cstate"]`` [b]; the result carries it advanced over
  exactly the emitted tokens.
  """
  k, n = draft_len, ngram
  hist = state["hist"]
  b, hist_len = hist.shape
  out_len = state["out"].shape[1]
  rows = jnp.arange(b)[:, None]
  offs = jnp.arange(k + 1)[None]
  live = state["live"]

  # -- draft: longest-suffix prompt lookup. For every candidate
  # continuation start e, count how many of the last `n` tokens match the
  # tokens just before e (backwards), then draft from the candidate with
  # the LONGEST match, breaking ties toward the most recent occurrence.
  # One [b, H, n] compare — no host round-trips.
  lags = jnp.arange(n)[None, None, :]  # [1, 1, n]
  ends = jnp.arange(hist_len)[None, :, None]  # [1, H, 1]
  back_idx = jnp.clip(ends - 1 - lags, 0, hist_len - 1)  # [1, H, n]
  back = jnp.take_along_axis(
      hist[:, :, None], jnp.broadcast_to(back_idx, (b, hist_len, n)),
      axis=1,
  )  # back[b, e, l] = hist[b, e-1-l]
  gram_idx = jnp.clip(
      state["cur_len"][:, None] - 1 - jnp.arange(n)[None], 0, hist_len - 1
  )
  gram = jnp.take_along_axis(hist, gram_idx, axis=1)  # [b, n]
  eq = back == gram[:, None, :]
  # Positions reaching before the history start (or into left padding, or
  # before index 0 after the clip) cannot count as matched.
  eq &= (ends - 1 - lags) >= state["valid_from"][:, None, None]
  run = jnp.cumprod(eq.astype(jnp.int32), axis=-1)
  length = jnp.sum(run, axis=-1)  # [b, H] longest back-match ending at e
  e_axis = jnp.arange(hist_len)[None]
  # Continuation must begin inside known history; e == cur_len (the query
  # suffix itself) has no known continuation.
  usable = (length >= 1) & (e_axis <= state["cur_len"][:, None] - 1)
  score = jnp.where(usable, length * (hist_len + 1) + e_axis, -1)
  best_score = jnp.max(score, axis=1)  # [b]
  best_e = best_score % (hist_len + 1)
  has_match = best_score >= 0
  cont_idx = jnp.clip(
      best_e[:, None] + jnp.arange(k)[None], 0, hist_len - 1
  )
  draft = jnp.take_along_axis(hist, cont_idx, axis=1)
  pending = jnp.take_along_axis(hist, state["cur_len"][:, None] - 1, 1)
  # No match → draft the pending token repeated (cheap, usually rejected;
  # correctness never depends on draft quality).
  draft = jnp.where(has_match[:, None], draft, pending)

  # -- verify: one forward over [pending, draft...], deferred cache.
  chunk = jnp.concatenate([pending, draft], axis=1)  # [b, k+1]
  chunk_pos = state["positions"] + offs
  logits, pend_cache = model.apply(
      {"params": params},
      tokens=chunk,
      segment_pos=chunk_pos,
      cache=state["cache"],
      return_logits=True,
      return_cache=True,
      pending_cache=True,
  )
  if constraint is not None:
    # DFA state reached at each verify position: position 0 continues
    # from cstate (already advanced over the pending token); position i
    # additionally consumed drafts 0..i-1. Masking per position makes a
    # grammar-violating draft disagree with the (masked) argmax — the
    # ordinary rejection rule enforces the grammar.
    pos_states = [state["cstate"]]
    for i in range(1, k + 1):
      pos_states.append(constraint.advance(pos_states[-1], chunk[:, i]))
    logits = jnp.stack(
        [
            constraint.mask(pos_states[i], logits[:, i])
            for i in range(k + 1)
        ],
        axis=1,
    )
  new_rng = None
  if "rng" in state:
    # -- stochastic acceptance (categorical serving). The draft proposal
    # is one-hot, so accept d_i with prob p_i(d_i); the first rejection at
    # position j resamples from norm(max(p_j - onehot(d_j), 0)); if all k
    # drafts are accepted, the bonus token samples from p_k directly.
    filtered = logits if logits_filter is None else logits_filter(logits)
    probs = jax.nn.softmax(filtered.astype(jnp.float32), axis=-1)
    split = jax.vmap(lambda kk: jax.random.split(kk, 3))(state["rng"])
    next_keys, ukeys, ckeys = split[:, 0], split[:, 1], split[:, 2]
    d = chunk[:, 1:]  # [b, k] drafted tokens for positions 0..k-1
    p_draft = jnp.take_along_axis(
        probs[:, :k], d[..., None], axis=-1
    )[..., 0]
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(ukeys)
    accept = (u < p_draft).astype(jnp.int32)
    j = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)  # [b] in [0, k]
    onehot = jax.nn.one_hot(d, probs.shape[-1], dtype=probs.dtype)
    resid = jnp.maximum(probs[:, :k] - onehot, 0.0)
    resid_sum = jnp.sum(resid, axis=-1, keepdims=True)
    # All-zero residual (p IS the one-hot) can't be hit by a rejection
    # (accept prob was 1), but keep the categorical well-defined.
    resid = jnp.where(
        resid_sum > 0, resid / jnp.maximum(resid_sum, 1e-20), probs[:, :k]
    )
    cand = jnp.concatenate([resid, probs[:, k:]], axis=1)  # [b, k+1, v]
    resampled = jax.vmap(
        lambda kk, pr: jax.random.categorical(
            kk, jnp.log(jnp.maximum(pr, 1e-30)), axis=-1
        )
    )(ckeys, cand).astype(jnp.int32)
    d_ext = jnp.concatenate([d, d[:, -1:]], axis=1)
    # Position i emits the accepted draft below j, the rejection resample
    # (or the all-accepted bonus sample) at j; beyond j is masked off.
    emit_tok = jnp.where(offs < j[:, None], d_ext, resampled)
    new_rng = jnp.where(live[:, None], next_keys, state["rng"])
  else:
    # -- greedy acceptance: drafts agreeing with the model's own argmax.
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [b, k+1]
    agree = (chunk[:, 1:] == greedy[:, :-1]).astype(jnp.int32)
    j = jnp.sum(jnp.cumprod(agree, axis=1), axis=1)  # [b] in [0, k]
    emit_tok = greedy

  if stop_ids.shape[0] == 1:
    is_eos = emit_tok == stop_ids[0]
  else:
    is_eos = jnp.any(emit_tok[..., None] == stop_ids, axis=-1)
  eos_pos = jnp.argmax(is_eos, axis=1)
  j = jnp.where(jnp.any(is_eos, axis=1), jnp.minimum(j, eos_pos), j)

  emit_n = jnp.minimum(j + 1, state["budget"] - state["write_idx"])
  emit_n = jnp.where(live, emit_n, 0)

  # -- cache: commit exactly the EMITTED prefix; frozen rows keep their
  # cache. When the budget truncates (emit_n < j + 1), committing the
  # full accepted prefix would leave the cache ahead of the emitted
  # tokens — that state is exposed via return_state, so keep them
  # aligned. Live rows always have emit_n >= 1.
  commit_idx = jnp.maximum(emit_n - 1, 0)
  committed = modules.commit_pending_cache(
      state["cache"], pend_cache, commit_idx
  )
  new_cache = jax.tree_util.tree_map(
      lambda old, new: jnp.where(
          live.reshape((b,) + (1,) * (new.ndim - 1)), new, old
      ),
      state["cache"],
      committed,
  )

  # -- emit into the output buffer and the lookup history. Masked entries
  # scatter to an out-of-bounds index and are dropped — clipping them
  # in-bounds instead would duplicate indices, and duplicate-scatter
  # write order is undefined.
  emit_mask = offs < emit_n[:, None]
  widx = jnp.where(emit_mask, state["write_idx"][:, None] + offs, out_len)
  new_out = state["out"].at[rows, widx].set(emit_tok, mode="drop")
  hidx = jnp.where(emit_mask, state["cur_len"][:, None] + offs, hist_len)
  new_hist = hist.at[rows, hidx].set(emit_tok, mode="drop")

  result = dict(
      hist=new_hist,
      valid_from=state["valid_from"],
      cur_len=state["cur_len"] + emit_n,
      cache=new_cache,
      positions=state["positions"] + emit_n[:, None],
      live=live,
      out=new_out,
      write_idx=state["write_idx"] + emit_n,
      budget=state["budget"],
      eos_hit=jnp.any(is_eos & emit_mask, axis=1),
  )
  if constraint is not None:
    # Advance over exactly the EMITTED tokens (accepted drafts match the
    # precomputed chain; the corrected token and budget truncation make
    # this the simplest correct fold).
    c = state["cstate"]
    for i in range(k + 1):
      c = jnp.where(
          i < emit_n, constraint.advance(c, emit_tok[:, i]), c
      )
    result["cstate"] = jnp.where(live, c, state["cstate"])
  if new_rng is not None:
    result["rng"] = new_rng
  return result


class SpeculativeSampler:
  """Prompt-lookup speculative decoding, greedy or categorical.

  With a greedy sampler the emitted tokens match plain decode exactly
  (up to cross-program fma numerics). With a categorical sampler
  (``deterministic_sampling=False``) acceptance follows the stochastic
  speculative-sampling rule, so the emitted tokens are distributed
  exactly as plain categorical sampling under the same
  temperature/top-k/top-p filters (distribution-level, not
  stream-level: the accept/resample draws consume randomness
  differently than plain decode, so a shared seed does not reproduce
  the same stream — only the same distribution).

  Args:
    sampler: A :class:`Sampler`; its model, params, vocab, filters, and
      prefill programs are reused.
    draft_len: Tokens drafted per verify step (the chunk is draft_len + 1).
    ngram: MAXIMUM match length for the longest-suffix history lookup —
      candidates are ranked by how many of the last ``ngram`` tokens they
      match backwards (longer beats later).
  """

  def __init__(
      self,
      sampler: sampler_lib.Sampler,
      draft_len: int = 7,
      ngram: int = 4,
  ):
    if sampler.repetition_penalty != 1.0:
      raise ValueError(
          "Speculative decoding does not support repetition_penalty: the "
          "verify pass scores all draft positions in one forward, but the "
          "penalty depends on which earlier chunk tokens are accepted."
      )
    if draft_len < 1 or ngram < 1:
      raise ValueError(f"draft_len/ngram must be >= 1, got {draft_len}/{ngram}")
    window = getattr(sampler.model.config, "attention_window_size", None)
    if window is not None and draft_len + 1 > window:
      raise ValueError(
          f"draft_len + 1 ({draft_len + 1}) exceeds the attention window "
          f"({window}); the masked ring commit needs distinct slots."
      )
    self.sampler = sampler
    self.draft_len = draft_len
    self.ngram = ngram
    self.last_stats: dict[str, Any] = {}
    # Params enter as an argument: closing over them would bake a
    # weights-sized constant block into the lowered program.
    self._loop_fn = jax.jit(self._spec_loop, static_argnums=(8,))

  # -- device program ----------------------------------------------------------

  def _spec_loop(
      self,
      params,
      cache,
      positions,
      hist,
      valid_from,
      cur_len,
      first_token,
      rng,
      total_steps: int,
      constraint_tables=None,
      cstate=None,
  ):
    """The whole speculative generation as one XLA while-loop program."""
    s = self.sampler
    b = hist.shape[0]

    out = jnp.full((b, total_steps), s.vocab.pad_id(), jnp.int32)
    out = out.at[:, 0].set(first_token)
    state = dict(
        hist=hist,
        valid_from=valid_from,
        cur_len=cur_len,
        cache=cache,
        positions=positions,
        live=~s._is_stop_token(first_token) & (total_steps > 1),
        out=out,
        write_idx=jnp.ones((b,), jnp.int32),
        budget=jnp.full((b,), total_steps, jnp.int32),
    )
    if constraint_tables is not None:
      # Grammar DFA states after the (masked) prefill-seeded token.
      state["cstate"] = cstate
    if rng is not None:
      # Per-row keys → independent chains; presence of the key selects
      # the stochastic acceptance rule in prompt_lookup_spec_step.
      state["rng"] = jax.random.split(rng, b)
    carry = (state, jnp.zeros((), jnp.int32))

    def cond(c):
      return jnp.any(c[0]["live"])

    def body(c):
      st, steps = c
      st = prompt_lookup_spec_step(
          s.model, params, st,
          draft_len=self.draft_len, ngram=self.ngram,
          stop_ids=s._stop_ids,
          logits_filter=None if rng is None else s._filter_logits,
          constraint=constraint_tables,
      )
      eos_hit = st.pop("eos_hit")
      st["live"] = (
          st["live"] & ~eos_hit & (st["write_idx"] < st["budget"])
      )
      return (st, steps + 1)

    final, steps = jax.lax.while_loop(cond, body, carry)
    st = final
    # The last emitted token was never fed to the model; it leads the
    # next turn (PrefixState.pending_token semantics).
    pending = jnp.take_along_axis(st["hist"], st["cur_len"][:, None] - 1, 1)
    return (
        st["out"], st["write_idx"], steps, st["cache"],
        st["positions"][:, 0], pending,
    )

  # -- host API ----------------------------------------------------------------

  def __call__(
      self,
      input_strings: Sequence[str],
      total_generation_steps: int,
      prefix_state: sampler_lib.PrefixState | None = None,
      img_embed=None,
      return_state: bool = False,
      rng=None,
      constraint=None,
  ) -> SamplerOutput:
    """Speculative generation (greedy: same tokens as ``Sampler.__call__``;
    categorical: same distribution — ``rng`` required then, as in the
    plain sampler).

    The output buffer is padded with ``pad_id`` after a row's EOS (the
    plain sampler leaves post-EOS buffer contents unspecified).

    ``prefix_state`` continues from cached context (a shared system prompt
    via :meth:`Sampler.prefill_prefix`, or a previous turn's state) with
    the same contract as the plain sampler: pass raw continuation text
    (no BOS; for IT models the sampler appends the turn markers itself),
    equal-length per batch. The n-gram
    draft lookup then covers only the continuation + generated tokens (the
    prefix cache stores model state, not token ids), which costs a little
    acceptance on prefix-quoting workloads but nothing in correctness.

    ``return_state`` attaches a :class:`PrefixState` for the next turn —
    per-row exact here (each row's cache froze at its own stop, unlike
    the plain sampler's batched decode, which keeps stepping early-EOS
    rows until the whole batch stops).

    ``img_embed`` ([b, vision_tokens, vision_width] fused features)
    splices into the prefill exactly as in the plain sampler; the decode
    loop is text-only, so speculation composes with multimodal prompts at
    no cost (the visual tokens live in the cache, not the lookup history;
    positions carry the offset). Incompatible with ``prefix_state``.

    ``constraint`` (a :class:`constrain.TokenDFA` or its tables)
    grammar-masks every verify position, so the output is identical to
    CONSTRAINED plain greedy decode — and JSON/schema workloads are
    exactly the copy-heavy shape speculation accelerates. Grammar-
    violating drafts are rejected by the ordinary agreement rule.
    """
    s = self.sampler
    if total_generation_steps < 1:
      raise ValueError("total_generation_steps must be >= 1.")
    constraint_tables = s._resolve_constraint(constraint)
    if img_embed is not None and prefix_state is not None:
      raise ValueError(
          "img_embed cannot be combined with prefix_state (the image "
          "splices in after BOS, which lives in the prefix)."
      )
    if not s.deterministic_sampling and rng is None:
      raise ValueError(
          "rng must be provided when sampling non-deterministically."
      )
    prefill_rng = loop_rng = None
    if rng is not None and not s.deterministic_sampling:
      # Split once: the prefill's first-token draw and the loop's
      # accept/resample chains consume independent streams.
      prefill_rng, loop_rng = jax.random.split(rng)

    chunk = s.prefill_chunk_size
    if prefix_state is None:
      all_ids = [s.tokenize(t) for t in input_strings]
      lengths_list = [len(i) for i in all_ids]
      if img_embed is not None and len(set(lengths_list)) != 1:
        raise ValueError(
            "Multimodal sampling requires equal-length prompts per batch "
            f"(got lengths {lengths_list})."
        )
      lengths = jnp.asarray(lengths_list)
      if img_embed is not None:
        tokens = jnp.stack(all_ids, axis=0)
      else:
        tokens = s._get_padded_tokens(all_ids)
      cache, start = None, None
      if chunk is not None and tokens.shape[1] > chunk and img_embed is None:
        # Chunked prefill (Sampler.plan_prompt_chunks — the one shared
        # chunking scheme): bounds the long-prompt activation memory; the
        # image splice cannot cross chunks, so multimodal prompts stay
        # single-shot.
        mid, cache, final_tokens, start, tokens = s.plan_prompt_chunks(
            tokens, lengths
        )
        for tok_c, pos_c in mid:
          _, cache = s._compiled_chunk_fn(
              s.params, tok_c, pos_c, cache, False
          )
      else:
        final_tokens = tokens
      prompt_len = tokens.shape[1]
      valid_from = (prompt_len - lengths).astype(jnp.int32)
    else:
      mid, cache, final_tokens, start, tokens = (
          s.plan_continuation_chunks(input_strings, prefix_state)
      )
      for tok_c, pos_c in mid:
        _, cache = s._compiled_chunk_fn(
            s.params, tok_c, pos_c, cache, False
        )
      batch = tokens.shape[0]
      prompt_len = int(tokens.shape[1])
      lengths = jnp.full((batch,), prompt_len, jnp.int32)
      valid_from = jnp.zeros((batch,), jnp.int32)

    # History buffer BEFORE prefill: prompt_processing_fn donates its
    # token argument.
    hist = jnp.pad(
        tokens, ((0, 0), (0, total_generation_steps)),
        constant_values=s.vocab.pad_id(),
    )

    state = s.prompt_processing_fn(
        s.params, final_tokens, prefill_rng, lengths, 1, False, False,
        img_embed, cache, start, constraint_tables,
    )
    first_token = state.tokens_buffer[:, 0]
    hist = hist.at[:, prompt_len].set(first_token)
    cur_len = jnp.full(lengths.shape, prompt_len + 1, jnp.int32)

    out, emitted, steps, final_cache, final_pos, pending = self._loop_fn(
        s.params, state.cache, state.positions, hist, valid_from, cur_len,
        first_token, loop_rng, total_generation_steps,
        constraint_tables, state.constraint_state,
    )
    next_state = None
    if return_state:
      next_state = sampler_lib.PrefixState(
          cache=final_cache, length=final_pos, pending_token=pending
      )
    emitted_h = jax.device_get(emitted)
    steps_h = int(jax.device_get(steps))
    spec_tokens = float(emitted_h.sum() - len(emitted_h))  # minus prefill T0
    self.last_stats = {
        "verify_steps": steps_h,
        "tokens_emitted": int(emitted_h.sum()),
        # Decode-throughput multiplier vs plain decode: tokens emitted per
        # weights read (upper-bounded by draft_len + 1).
        "tokens_per_verify_step": spec_tokens / max(steps_h, 1),
    }
    token_rows = [row for row in out]
    return SamplerOutput(
        text=[
            s.vocab.DecodeIds(row[: int(m)].tolist())
            for row, m in zip(out, emitted_h)
        ],
        tokens=token_rows,
        logits=[],
        state=next_state,
    )
