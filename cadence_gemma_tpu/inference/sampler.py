"""Batch sampler for Griffin models: jitted prefill + while-loop decode.

API-compatible with the reference ``Sampler``
(``/root/reference/recurrentgemma/jax/sampler.py:75-478``): same constructor,
``__call__`` signature, ``SamplingState``/``SamplerOutput`` fields, echo /
return_logits semantics, and EOS early stopping.

Performance structure (the decode-throughput / TTFT critical path):
  * Prefill runs as one jitted program with donated buffers, split into
    "all tokens but the last" (no logits materialized) + "last token" — so
    the [b, t, vocab] logits tensor is never built for the prompt.
  * Decode is a single ``lax.while_loop`` program whose carry (cache +
    token/logits buffers) stays device-resident; one kernel launch for the
    whole generation, O(1) memory in sequence length.
  * Prompt lengths are bucketed to powers of two (>= 16) so changing prompt
    lengths hit a small, bounded set of compiled programs instead of
    recompiling per length (left-padding keeps results identical — padded
    positions carry ``segment_pos == -1`` and the first real token resets
    the recurrence at position 0). Disable with ``bucket_prompt_lengths``.

The same class implements the multimodal prefill: ``__call__`` accepts
pre-fused vision features that are spliced into the prompt on device (see
``modal_sampler.py`` for the encoder-owning wrapper). Unlike the reference,
decode positions account for the spliced visual tokens (the reference
continues from the text-only position, ``modal_sampler.py:341`` —
a train/inference mismatch we fix; set ``reference_position_quirk=True``
to reproduce the reference behavior bit-for-bit).
"""

from __future__ import annotations

from typing import Any, Callable, Generic, Sequence, TypeVar

from flax import linen as nn
from flax import struct
import jax
import jax.numpy as jnp
import jaxtyping as jt

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu import common

Cache = TypeVar("Cache")


@struct.dataclass
class SamplingState(Generic[Cache]):
  """Device-resident sampling loop state.

  Attributes:
    tokens_buffer: [b, steps(+prompt if echo)] output token accumulator.
    rng: PRNG key for categorical sampling (None when greedy).
    step: Current decode step.
    total_steps: Steps at which to stop.
    positions: Position of the next token to be generated, [b, 1].
    cache: Per-layer model cache.
    done: Per-sequence EOS flags.
    logits_buffer: Optional logits accumulator, [b, steps, vocab].
    gen_start: First buffer index holding a GENERATED token (0 without
      echo, the prompt length with echo). Keeps the repetition-penalty
      scope generated-only regardless of the echo output format.
    constraint_state: Per-row grammar-DFA state, [b] int32, when the call
      carries a ``constraint`` (see ``inference/constrain.py``); None
      otherwise.
  """

  tokens_buffer: jt.Integer[jt.Array, "*b l"]
  rng: jt.PRNGKeyArray | None
  step: jt.Integer[jt.Array, ""]
  total_steps: jt.Integer[jt.Array, ""]
  positions: jt.Integer[jt.Array, "*b 1"]
  cache: Cache
  done: jt.Bool[jt.Array, "*b"]
  logits_buffer: jt.Float[jt.Array, "*b l v"] | None = None
  gen_start: jt.Integer[jt.Array, ""] | int = 0
  constraint_state: jt.Integer[jt.Array, "*b"] | None = None


@struct.dataclass
class SamplerOutput:
  """Generated text plus per-sequence tokens and (optionally) logits.

  ``state`` is populated by ``__call__(..., return_state=True)``: pass it
  as the next call's ``prefix_state`` to continue the conversation without
  re-prefilling its history.
  """

  text: list[str]
  tokens: list[jax.Array]
  logits: list[jax.Array]
  state: Any = None


@struct.dataclass
class PrefixState(Generic[Cache]):
  """Cached model context, reusable across ``__call__``s.

  Two producers, one consumer:
    * :meth:`Sampler.prefill_prefix` — a shared system prompt / few-shot
      preamble prefilled once; its cost leaves every request's TTFT.
    * ``__call__(..., return_state=True)`` — the conversation state after a
      generation turn, so the next turn continues without re-prefilling
      the history (multi-turn chat at O(new tokens) prefill cost).
  No reference counterpart (the reference prefills the full prompt every
  call, ``jax/sampler.py:403``).

  Attributes:
    cache: Model cache after consuming the context (batch dim = the
      producer's batch; a size-1 cache broadcasts to larger request
      batches automatically).
    length: Next token position(s) — an int for a text prefix, or a [b]
      array for post-generation states (rows stop at different lengths).
    pending_token: [b, 1] last sampled token that the decode loop never
      fed back into the model; prepended to the next turn's tokens so the
      continuation context is exact. None for plain text prefixes.
  """

  cache: Cache
  length: int | jax.Array
  pending_token: jax.Array | None = None


def filter_logits_rows(logits, temp, top_k, top_p):
  """Row-wise temperature / top-k / top-p, matching
  :meth:`Sampler._filter_logits`'s sequential semantics bit-for-bit.

  One descending sort serves both filters: top-k's threshold is the k-th
  sorted value (ties kept, like the shared path); top-p's kept-mass
  threshold is computed on the top-k-FILTERED distribution — the same
  order the shared path composes them in. Rows at the defaults (temp 1,
  k 0 = off, p 1) pass through bit-identically, so rows that override
  nothing match the shared path exactly. Shared by the continuous
  batcher's ``per_request_sampling`` decode step and the per-request
  admission prefill.
  """
  neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
  lg = logits / temp[:, None]
  sorted_lg = jnp.flip(jnp.sort(lg, axis=-1), axis=-1)
  vocab = lg.shape[-1]
  k = jnp.clip(top_k, 0, vocab)
  kth = jnp.take_along_axis(
      sorted_lg, jnp.maximum(k - 1, 0)[:, None], axis=1
  )
  thr_k = jnp.where((k > 0)[:, None], kth, neg_inf)
  lg = jnp.where(lg < thr_k, neg_inf, lg)
  # top-p over the top-k-filtered distribution (sorted view: entries
  # below the k threshold become -inf in place; order is preserved).
  sorted2 = jnp.where(sorted_lg < thr_k, neg_inf, sorted_lg)
  probs = jax.nn.softmax(sorted2, axis=-1)
  cumulative = jnp.cumsum(probs, axis=-1)
  keep = cumulative - probs < top_p[:, None]
  min_kept = jnp.min(
      jnp.where(keep, sorted2, jnp.inf), axis=-1, keepdims=True
  )
  return jnp.where(lg < min_kept, neg_inf, lg)


def _next_bucket(n: int, minimum: int = 16) -> int:
  """Smallest power of two >= max(n, minimum)."""
  b = minimum
  while b < n:
    b *= 2
  return b


class Sampler(Generic[Cache]):
  """Greedy / categorical sampler for a Griffin model."""

  def __init__(
      self,
      model: nn.Module,
      vocab: Any,
      params: at.Params,
      jit_compile: bool = True,
      deterministic_sampling: bool = True,
      is_it_model: bool = False,
      bucket_prompt_lengths: bool = True,
      reference_position_quirk: bool = False,
      prefill_chunk_size: int | None = None,
      mesh: Any | None = None,
      model_axis: str = "model",
      temperature: float = 1.0,
      top_k: int | None = None,
      top_p: float | None = None,
      stop_token_ids: Sequence[int] | None = None,
      repetition_penalty: float = 1.0,
      prefill_act_quant: bool = False,
  ):
    """See the class docstring.

    Args:
      model: A Griffin instance (or any module with the same call contract).
      vocab: Tokenizer implementing the ``Vocabulary`` protocol.
      params: Model parameter tree (the ``params`` sub-tree).
      jit_compile: Jit the prefill and decode programs.
      deterministic_sampling: argmax decoding when True, else categorical.
      is_it_model: Wrap prompts in the Gemma chat template.
      bucket_prompt_lengths: Pad prompts to power-of-two buckets to bound
        the number of compiled prefill programs.
      reference_position_quirk: Reproduce the reference's multimodal decode
        positions (which ignore the spliced visual tokens).
      prefill_chunk_size: Process prompts longer than this in fixed-size
        chunks through the O(1) cache, bounding activation memory for very
        long prompts (the window cache already bounds KV memory). Chunk
        results are exact, including ragged (left-padded) batches, echo,
        and return_logits — the reference's cache update only supports
        chunk sizes of 1 or the full window (``modules.py:220``); ours is
        general. Multimodal prompts fall back to single-shot (the image
        splice cannot cross chunks). None = single-shot prefill.
      mesh: Optional device mesh for multi-chip serving: parameters are
        placed with Megatron tensor-parallel layouts over ``model_axis``
        (``parallel/partitioning.py``) and XLA propagates the activation
        shardings through prefill and the decode while-loop, inserting the
        per-layer collectives over ICI. The reference serves single-device
        only (its sampler has no sharding story, ``jax/sampler.py:75``).
      model_axis: Mesh axis name for the tensor-parallel layouts.
      temperature: Softmax temperature for categorical sampling (ignored
        when ``deterministic_sampling``). Must be > 0; greedy decoding is
        ``deterministic_sampling=True``, not temperature 0.
      top_k: Keep only the ``k`` highest-probability tokens before
        sampling (None = full vocab). The reference sampler exposes
        neither this nor ``top_p``/``temperature``
        (``jax/sampler.py:163-169`` — plain argmax/categorical only).
      top_p: Nucleus sampling — keep the smallest set of tokens whose
        cumulative probability reaches ``top_p`` (None = off). Applied
        after ``temperature`` and ``top_k``, matching the conventional
        filter order.
      stop_token_ids: Additional token ids that end a sequence exactly
        like EOS (when ``end_sampling_at_eos_token``) — e.g. the
        ``<end_of_turn>`` id for IT chat serving. The reference stops on
        EOS only.
      prefill_act_quant: Run the *prefill* forward with int8 activations
        as well as int8 weights (int8 x int8 MXU matmuls — 2x the bf16
        MXU throughput on v5e, which is what the compute-bound prefill of
        long/multimodal prompts is limited by). Decode steps stay
        weight-only int8 (they are bandwidth-bound; activation
        quantization would add error for no speed). Requires a
        ``quantized=True`` model; the same parameter tree serves both
        phases. Off by default — it changes logits slightly (measured
        in ``benchmarks/multimodal_bench.py``).
      repetition_penalty: > 1 penalizes tokens already GENERATED this
        call (HF semantics: positive logits divide by the penalty,
        negative multiply), discouraging loops; 1.0 = off. Applies to
        greedy and categorical alike, inside the compiled decode loop
        (the seen-set is a scatter over the token buffer). The first
        (prefill-sampled) token is never penalized — nothing has been
        generated yet.
    """
    self.model = model
    if prefill_act_quant:
      if not getattr(model, "quantized", False):
        raise ValueError(
            "prefill_act_quant requires a quantized=True model (the int8 "
            "MXU path contracts against int8 weights)."
        )
      self._prefill_model = model.clone(act_quant=True)
    else:
      self._prefill_model = model
    self.prefill_act_quant = prefill_act_quant
    self.vocab = vocab
    if mesh is not None:
      from cadence_gemma_tpu.parallel import partitioning

      shardings = partitioning.griffin_param_shardings(
          mesh, params, model_axis
      )
      params = jax.device_put(params, shardings)
    self.mesh = mesh
    self.model_axis = model_axis
    self.params = params
    if temperature <= 0.0:
      raise ValueError(
          f"temperature must be > 0 (got {temperature}); use "
          "deterministic_sampling=True for greedy decoding."
      )
    if top_k is not None and top_k < 1:
      raise ValueError(f"top_k must be >= 1 (got {top_k}).")
    if top_p is not None and not 0.0 < top_p <= 1.0:
      raise ValueError(f"top_p must be in (0, 1] (got {top_p}).")
    self.temperature = float(temperature)
    self.top_k = top_k
    self.top_p = top_p
    # Sampling halts on ANY of these ids (EOS always included) when
    # end_sampling_at_eos_token — e.g. <end_of_turn> for IT chat serving.
    # The reference stops on EOS only (``jax/sampler.py:380``).
    stop_ids = {int(vocab.eos_id())} | set(
        int(i) for i in (stop_token_ids or ())
    )
    self._stop_ids = jnp.asarray(sorted(stop_ids), jnp.int32)
    # Host copy: static scatter columns inside compiled programs.
    self._stop_ids_host = tuple(sorted(stop_ids))
    if repetition_penalty <= 0.0:
      raise ValueError(
          f"repetition_penalty must be > 0 (got {repetition_penalty})."
      )
    self.repetition_penalty = float(repetition_penalty)
    self.deterministic_sampling = deterministic_sampling
    self.jit_compile = jit_compile
    self.bucket_prompt_lengths = bucket_prompt_lengths
    self.reference_position_quirk = reference_position_quirk
    self.prefill_chunk_size = prefill_chunk_size
    self._is_it_model = is_it_model
    self._compiled_prompt_processing_fn = jax.jit(
        self._prompt_processing_fn,
        donate_argnums=[1, 2, 3],
        static_argnums=[4, 5, 6],
    )
    self._compiled_sample_fn = jax.jit(
        self._sample_fn, donate_argnums=[1], static_argnums=[2]
    )
    self._compiled_chunk_fn = jax.jit(
        self._prefill_chunk_step, donate_argnums=[3], static_argnums=[4]
    )

  @property
  def dtype(self) -> jnp.dtype:
    return jax.tree_util.tree_leaves(self.params)[0].dtype

  @property
  def vocab_size(self) -> int:
    return self.model.config.vocab_size

  @property
  def _vision_tokens(self) -> int:
    return getattr(self.model.config, "vision_tokens", 0)

  @property
  def prompt_processing_fn(self) -> Callable[..., SamplingState]:
    if self.jit_compile:
      return self._compiled_prompt_processing_fn
    return self._prompt_processing_fn

  @property
  def sample_fn(self) -> Callable[..., SamplingState]:
    if self.jit_compile:
      return self._compiled_sample_fn
    return self._sample_fn

  # -- model invocation -----------------------------------------------------

  def apply_model(
      self,
      params: at.Params,
      tokens: at.Tokens,
      segment_pos: at.SegmentPos,
      cache: Cache | None,
      return_logits: bool,
      return_cache: bool,
      img_embed: at.Image | None = None,
      last_logits_only: bool = False,
      prefill: bool = False,
      model=None,
  ) -> tuple[at.TokenLogits | None, Cache | None]:
    kwargs = {}
    if img_embed is not None:
      kwargs["image"] = img_embed
    if last_logits_only:
      kwargs["last_logits_only"] = True
    # Prefill may run a different (int8-activation) variant of the model;
    # both variants read the same parameter tree. ``model=`` overrides
    # both (the batcher's multi-adapter lora_rows twin).
    if model is None:
      model = self._prefill_model if prefill else self.model
    return model.apply(
        {"params": params},
        tokens=tokens,
        segment_pos=segment_pos,
        cache=cache,
        return_logits=return_logits,
        return_cache=return_cache,
        **kwargs,
    )

  # -- tokenization -----------------------------------------------------------

  def tokenize(self, input_string: str) -> jax.Array:
    """BOS + encoded prompt (optionally chat-templated)."""
    if self._is_it_model:
      input_string = common.apply_it_formatter(input_string)
    ids = self.vocab.EncodeAsIds(input_string)
    return jnp.array([self.vocab.bos_id()] + ids, dtype=jnp.int32)

  def _get_padded_tokens(self, tokens: Sequence[jax.Array]) -> at.Tokens:
    """Left-pads a ragged batch (optionally up to a length bucket)."""
    max_len = max(len(ids) for ids in tokens)
    if self.bucket_prompt_lengths:
      max_len = _next_bucket(max_len)
    padded = [
        jnp.pad(ids, (max_len - len(ids), 0),
                constant_values=self.vocab.pad_id())
        for ids in tokens
    ]
    return jnp.stack(padded, axis=0)

  # -- sampling steps ---------------------------------------------------------

  def _sample_from_logits(
      self,
      rng: jt.PRNGKeyArray | None,
      logits: jt.Float[jt.Array, "*b v"],
      row_overrides=None,
  ) -> tuple[jt.Integer[jt.Array, "*b"], jt.PRNGKeyArray | None]:
    """Greedy argmax or filtered categorical; ``row_overrides`` is an
    optional ``(temp[b], top_k[b], top_p[b])`` triple replacing the
    sampler-level filters row-wise (per-request serving)."""
    if self.deterministic_sampling:
      return jnp.argmax(logits, axis=-1), rng
    assert rng is not None
    rng, step_rng = jax.random.split(rng)
    if row_overrides is not None:
      filtered = filter_logits_rows(logits, *row_overrides)
    else:
      filtered = self._filter_logits(logits)
    return jax.random.categorical(step_rng, filtered), rng

  def _filter_logits(
      self, logits: jt.Float[jt.Array, "*b v"]
  ) -> jt.Float[jt.Array, "*b v"]:
    """Temperature / top-k / top-p filtering for categorical sampling.

    Static per-sampler settings, so the filters trace into the compiled
    prefill/decode programs with no dynamic-shape cost: top-k is a
    threshold-mask against the k-th logit (not a gather), top-p masks
    against the smallest kept logit from one descending sort — both stay
    [b, v]-shaped for the MXU-friendly categorical that follows.
    """
    if self.temperature != 1.0:
      logits = logits / self.temperature
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    if self.top_k is not None and self.top_k < logits.shape[-1]:
      kth = jax.lax.top_k(logits, self.top_k)[0][..., -1:]
      logits = jnp.where(logits < kth, neg_inf, logits)
    if self.top_p is not None and self.top_p < 1.0:
      sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
      probs = jax.nn.softmax(sorted_logits, axis=-1)
      cumulative = jnp.cumsum(probs, axis=-1)
      # Keep a token if the mass *before* it is < top_p: the first token
      # is always kept, and the token that crosses the boundary is
      # included (nucleus convention).
      keep = cumulative - probs < self.top_p
      min_kept = jnp.min(
          jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
      )
      logits = jnp.where(logits < min_kept, neg_inf, logits)
    return logits

  def _apply_repetition_penalty(
      self,
      logits: jt.Float[jt.Array, "*b v"],
      tokens_buffer: jt.Integer[jt.Array, "*b l"],
      written: jt.Bool[jt.Array, "*b l"],
  ) -> jt.Float[jt.Array, "*b v"]:
    """HF-style repetition penalty over the tokens emitted so far.

    ``seen`` is one boolean scatter of the buffer positions flagged in
    ``written`` — the decode loop flags [gen_start, step], i.e. generated
    tokens only, so one sampler config yields one token stream regardless
    of the ``echo`` output-format flag (HF penalizes the prompt too; we
    deliberately match the batcher's generated-only semantics instead —
    one fixed scope). The continuous batcher reuses this with its per-slot
    write_idx mask.
    """
    p = self.repetition_penalty
    b = tokens_buffer.shape[0]
    rows = jnp.arange(b)[:, None]
    seen = jnp.zeros(logits.shape, jnp.bool_).at[rows, tokens_buffer].max(
        written
    )
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)

  def _is_stop_token(
      self, tokens: jt.Integer[jt.Array, "*b"]
  ) -> jt.Bool[jt.Array, "*b"]:
    """True where ``tokens`` is EOS or a configured stop token."""
    if self._stop_ids.shape[0] == 1:
      return jnp.equal(tokens, self._stop_ids[0])
    return jnp.any(tokens[..., None] == self._stop_ids, axis=-1)

  def _sample_step(
      self,
      params: at.Params,
      state: SamplingState,
      end_sampling_at_eos_token: bool = True,
      constraint_tables=None,
  ) -> SamplingState:
    """One decode step: feed the last token, sample the next."""
    last_token = state.tokens_buffer[:, state.step][:, None]
    logits, cache = self.apply_model(
        params=params,
        tokens=last_token,
        segment_pos=state.positions,
        cache=state.cache,
        return_logits=True,
        return_cache=True,
    )
    step_logits = logits[:, 0]
    if self.repetition_penalty != 1.0:
      # Generated tokens only — the scope is independent of ``echo`` (the
      # echoed prompt occupies [0, gen_start) of the buffer and is not
      # penalized, matching the echo=False behavior and the batcher's).
      idx = jnp.arange(state.tokens_buffer.shape[1])[None]
      written = jnp.broadcast_to(
          (idx >= state.gen_start) & (idx <= state.step),
          state.tokens_buffer.shape,
      )
      step_logits = self._apply_repetition_penalty(
          step_logits, state.tokens_buffer, written
      )
    constraint_state = state.constraint_state
    if constraint_tables is not None:
      # Grammar mask LAST (after penalty/temperature-independent shaping):
      # forbidden tokens are -inf for greedy and categorical alike, then
      # the sampled token advances the per-row DFA state.
      step_logits = constraint_tables.mask(constraint_state, step_logits)
    next_token, rng = self._sample_from_logits(state.rng, step_logits)
    if constraint_tables is not None:
      constraint_state = constraint_tables.advance(
          constraint_state, next_token
      )
    tokens_buffer = state.tokens_buffer.at[:, state.step + 1].set(next_token)

    logits_buffer = state.logits_buffer
    if logits_buffer is not None:
      logits_buffer = logits_buffer.at[:, state.step + 1].set(logits[:, 0])

    if end_sampling_at_eos_token:
      done_now = self._is_stop_token(next_token)
    else:
      done_now = False

    return SamplingState(
        tokens_buffer=tokens_buffer,
        rng=rng,
        step=state.step + 1,
        total_steps=state.total_steps,
        positions=state.positions + 1,
        cache=cache,
        done=state.done | done_now,
        logits_buffer=logits_buffer,
        gen_start=state.gen_start,
        constraint_state=constraint_state,
    )

  def _sample_fn(
      self,
      params: at.Params,
      state: SamplingState,
      end_sampling_at_eos_token: bool = True,
      constraint_tables=None,
  ) -> SamplingState:
    """Whole decode loop as one XLA while-loop program."""
    if end_sampling_at_eos_token:
      # Check EOS on the token sampled at prefill: a prompt whose greedy
      # continuation is immediate-EOS must not decode further (the reference
      # starts `done` all-False and always decodes a second token,
      # sampler.py:380).
      first_token = jax.lax.dynamic_index_in_dim(
          state.tokens_buffer, state.step, axis=1, keepdims=False
      )
      state = state.replace(
          done=state.done | self._is_stop_token(first_token)
      )

    def body(s):
      return self._sample_step(
          params, s, end_sampling_at_eos_token, constraint_tables
      )

    def cond(s):
      # total_steps - 1 because the first token was sampled from the prompt.
      return (s.step < s.total_steps - 1) & jnp.any(~s.done)

    return jax.lax.while_loop(cond, body, state)

  def _prefill_chunk_step(
      self,
      params: at.Params,
      tokens: at.Tokens,
      segment_pos: at.SegmentPos,
      cache: Cache,
      return_logits: bool = False,
  ) -> tuple[at.TokenLogits | None, Cache]:
    """One chunk of a long prompt through the O(1) cache.

    ``return_logits`` materializes this chunk's per-token logits (needed
    only for ``echo=True`` with ``return_logits=True``).
    """
    logits, cache = self.apply_model(
        params=params,
        tokens=tokens,
        segment_pos=segment_pos,
        cache=cache,
        return_logits=return_logits,
        return_cache=True,
        prefill=True,
    )
    return logits, cache

  def _prompt_processing_fn(
      self,
      params: at.Params,
      tokens: at.Tokens,
      rng: jt.PRNGKeyArray | None,
      input_lengths: at.NumTokens,
      total_generation_steps: int,
      return_logits: bool,
      echo: bool,
      img_embed: at.Image | None = None,
      initial_cache: Cache | None = None,
      start_positions: at.NumTokens | None = None,
      constraint_tables=None,
      sampling_overrides=None,
  ) -> SamplingState:
    """Prefill: builds the cache, samples the first token, allocates buffers.

    ``initial_cache``/``start_positions`` continue a chunked prefill: the
    cache already holds earlier chunks and this call's positions start at
    ``start_positions`` instead of 0. ``constraint_tables`` masks the
    first sampled token with the grammar (decode steps continue from the
    resulting DFA state). ``sampling_overrides`` — a ``(temp[b],
    top_k[b], top_p[b], suppress_stops[b], extra_stop_cols[b, k],
    bias_ids[b, m], bias_vals[b, m])`` tuple — applies per-row sampling
    parameters to the first sampled token (the continuous batcher's
    per-request admission): rows with ``suppress_stops`` set get
    stop-token logits masked to -inf (min_tokens semantics start at the
    seed), and ``bias_ids``/``bias_vals`` add per-request logit_bias
    offsets (id -1 = unused entry) so the bias covers the seed token
    exactly like every decode step.
    """
    batch_size, prompt_length = tokens.shape

    if start_positions is not None:
      # Per-row continuation of a chunked prefill; rows whose prompt starts
      # inside this final chunk carry negative starts, clipped to the same
      # -1 padding sentinel the single-shot path uses.
      positions = (
          jnp.arange(prompt_length)[None] + start_positions[:, None]
      )
      positions = jnp.maximum(positions, -1)
    else:
      # Left-aligned positions ending at input_length - 1; padding gets -1.
      positions = jnp.repeat(
          jnp.arange(prompt_length)[None], batch_size, axis=0
      )
      positions = positions - prompt_length + input_lengths[:, None]
      positions = jnp.maximum(positions, -1)

    if total_generation_steps == 0:
      prev_logits, cache = self.apply_model(
          params=params,
          tokens=tokens,
          segment_pos=positions,
          cache=initial_cache,
          return_logits=return_logits and echo,
          return_cache=False,
          img_embed=img_embed,
          prefill=True,
      )
      logits = None
    elif prompt_length == 1:
      # return_logits=True regardless of the buffer flag: the first sampled
      # token needs logits (the reference crashes here when
      # return_logits=False, sampler.py:294-304).
      logits, cache = self.apply_model(
          params=params,
          tokens=tokens,
          segment_pos=positions,
          cache=initial_cache,
          return_logits=True,
          return_cache=True,
          img_embed=img_embed,
          prefill=True,
      )
      if img_embed is not None:
        # Only the last position's logits seed decoding.
        logits = logits[:, -1:]
      prev_logits = logits[:, :0]
    else:
      # Single-pass prefill: one forward builds the cache and the last
      # position's logits (one weights read; the reference splits this into
      # a bulk pass plus a one-token pass, reading all weights twice).
      want_prompt_logits = return_logits and echo
      all_logits, cache = self.apply_model(
          params=params,
          tokens=tokens,
          segment_pos=positions,
          cache=initial_cache,
          return_logits=True,
          return_cache=True,
          img_embed=img_embed,
          last_logits_only=not want_prompt_logits,
          prefill=True,
      )
      if want_prompt_logits:
        if img_embed is not None:
          # Drop visual-position logits so echoed logits align with the
          # text tokens (the splice inserts vision_tokens rows after BOS).
          n_img = self._vision_tokens
          all_logits = jnp.concatenate(
              [all_logits[:, :1], all_logits[:, 1 + n_img:]], axis=1
          )
        prev_logits, logits = all_logits[:, :-1], all_logits[:, -1:]
      else:
        prev_logits, logits = all_logits[:, :0], all_logits

    tokens_buffer = jnp.full(
        (batch_size, total_generation_steps),
        self.vocab.pad_id(),
        dtype=jnp.int32,
    )
    constraint_state = None
    if constraint_tables is not None:
      constraint_state = jnp.full(
          (batch_size,), constraint_tables.start, jnp.int32
      )
    if logits is not None:
      seed_logits = logits[:, 0]
      if constraint_tables is not None:
        seed_logits = constraint_tables.mask(constraint_state, seed_logits)
      row_overrides = None
      if sampling_overrides is not None:
        (temp_r, top_k_r, top_p_r, suppress, extra_cols,
         bias_ids, bias_vals) = sampling_overrides
        rows_b = jnp.arange(batch_size)[:, None]
        bias_cols = jnp.maximum(bias_ids, 0)
        bias_add = jnp.where(bias_ids >= 0, bias_vals, 0.0).astype(
            seed_logits.dtype
        )
        seed_logits = seed_logits.at[rows_b, bias_cols].add(bias_add)
        neg_inf = jnp.asarray(-jnp.inf, seed_logits.dtype)
        for col in self._stop_ids_host:
          seed_logits = seed_logits.at[:, col].set(
              jnp.where(suppress, neg_inf, seed_logits[:, col])
          )
        rows = jnp.arange(batch_size)[:, None]
        cols = jnp.maximum(extra_cols, 0)
        vals = jnp.take_along_axis(seed_logits, cols, axis=1)
        vals = jnp.where(
            (extra_cols >= 0) & suppress[:, None], neg_inf, vals
        )
        seed_logits = seed_logits.at[rows, cols].set(vals)
        row_overrides = (temp_r, top_k_r, top_p_r)
      next_token, rng = self._sample_from_logits(
          rng, seed_logits, row_overrides
      )
      if constraint_tables is not None:
        constraint_state = constraint_tables.advance(
            constraint_state, next_token
        )
      tokens_buffer = tokens_buffer.at[:, 0].set(next_token)

    if return_logits:
      logits_buffer = jnp.zeros(
          (batch_size, total_generation_steps, self.vocab_size),
          dtype=self.dtype,
      )
      if logits is not None:
        logits_buffer = logits_buffer.at[:, 0].set(logits[:, 0])
    else:
      logits_buffer = None

    step = jnp.array(0, dtype=jnp.int32)
    total_steps = jnp.array(total_generation_steps, dtype=jnp.int32)

    if echo:
      tokens_buffer = jnp.concatenate([tokens, tokens_buffer], axis=1)
      if return_logits:
        if logits is None:
          logits_buffer = prev_logits
        else:
          logits_buffer = jnp.concatenate(
              [prev_logits, logits, logits_buffer], axis=1
          )
      step = step + prompt_length
      total_steps = total_steps + prompt_length

    next_positions = positions[:, -1:] + 1
    if (
        img_embed is not None
        and prompt_length > 1
        and not self.reference_position_quirk
    ):
      next_positions = next_positions + self._vision_tokens

    return SamplingState(
        tokens_buffer=tokens_buffer,
        rng=rng,
        step=step,
        total_steps=total_steps,
        positions=next_positions,
        cache=cache,
        done=jnp.zeros((batch_size,), dtype=jnp.bool_),
        logits_buffer=logits_buffer,
        gen_start=step,
        constraint_state=constraint_state,
    )

  # -- prefix caching ---------------------------------------------------------

  def prefill_prefix(
      self, prefix: str, batch_size: int = 1
  ) -> PrefixState:
    """Prefills a shared prompt prefix once for reuse across calls.

    The returned :class:`PrefixState` is immutable from the sampler's point
    of view (no jitted program donates it), so one prefix serves any number
    of subsequent ``__call__(..., prefix_state=...)`` requests; its cost
    disappears from those requests' TTFT.

    Args:
      prefix: Prefix text; BOS is added here. For IT models only the
        user-turn OPENING (``<start_of_turn>user\\n``) wraps the prefix —
        continuation prompts extend the same user turn and
        ``encode_continuation`` appends the turn close + model opener, so
        prefix + continuation tokenizes like one full templated prompt
        (the full template here would close the user turn around the
        system prompt and strand continuations inside the model turn).
      batch_size: Batch dimension to prefill the cache with. Keep 1 and let
        requests broadcast unless the prefix itself differs per row.
    """
    if self._is_it_model:
      ids = jnp.asarray(
          [self.vocab.bos_id()]
          + self.vocab.EncodeAsIds(common.IT_USER_OPEN + prefix),
          jnp.int32,
      )
    else:
      ids = self.tokenize(prefix)
    tokens = jnp.tile(ids[None], (batch_size, 1))
    real_len = int(tokens.shape[1])
    cache = self.model.init_cache(batch_size, self.dtype)
    chunk = self.prefill_chunk_size
    if chunk is not None and real_len > chunk:
      # Same chunking as __call__: left-pad to a chunk multiple (padded
      # positions carry the -1 sentinel) and stream fixed-size chunks
      # through the O(1) cache, bounding a very long system prompt's
      # activation memory like any other long prompt.
      extra = -real_len % chunk
      if extra:
        tokens = jnp.pad(
            tokens, ((0, 0), (extra, 0)),
            constant_values=self.vocab.pad_id(),
        )
      positions = jnp.maximum(
          jnp.arange(tokens.shape[1], dtype=jnp.int32)[None] - extra, -1
      )
      positions = jnp.tile(positions, (batch_size, 1))
      for start in range(0, tokens.shape[1], chunk):
        _, cache = self._compiled_chunk_fn(
            self.params,
            tokens[:, start : start + chunk],
            positions[:, start : start + chunk],
            cache,
            False,
        )
    else:
      positions = jnp.tile(
          jnp.arange(real_len, dtype=jnp.int32)[None], (batch_size, 1)
      )
      _, cache = self._compiled_chunk_fn(
          self.params, tokens, positions, cache, False
      )
    return PrefixState(cache=cache, length=real_len)

  def _continue_from_prefix(
      self, prefix_state: PrefixState, batch_size: int
  ) -> Cache:
    """The prefix cache, broadcast to the request batch if needed."""
    leaf = jax.tree_util.tree_leaves(prefix_state.cache)[0]
    prefix_batch = leaf.shape[0]
    if prefix_batch == batch_size:
      return prefix_state.cache
    if prefix_batch != 1:
      raise ValueError(
          f"Prefix cache batch {prefix_batch} != request batch "
          f"{batch_size}; prefill the prefix with batch_size=1 (broadcast) "
          "or the exact request batch."
      )
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, batch_size, axis=0), prefix_state.cache
    )

  # -- public entry -----------------------------------------------------------

  def __call__(
      self,
      input_strings: Sequence[str],
      total_generation_steps: int,
      rng: jt.PRNGKeyArray | None = None,
      echo: bool = False,
      return_logits: bool = False,
      end_sampling_at_eos_token: bool = True,
      img_embed: at.Image | None = None,
      prefix_state: PrefixState | None = None,
      return_state: bool = False,
      constraint: Any | None = None,
  ) -> SamplerOutput:
    """Generates completions for a batch of prompts.

    Args:
      input_strings: Prompts.
      total_generation_steps: Decode steps (0 = prefill only).
      rng: PRNG key, required for non-deterministic sampling.
      echo: Include the prompt in the output buffers.
      return_logits: Accumulate per-step logits.
      end_sampling_at_eos_token: Stop a sequence once it emits EOS.
      img_embed: Optional fused vision features [b, vision_tokens,
        vision_width] spliced into the prompt on device.
      prefix_state: Optional cached context (:meth:`prefill_prefix` or a
        previous call's ``return_state=True`` output); ``input_strings``
        are then continuations: encoded without BOS, equal-length per
        batch, ``echo`` covers only the continuation. Pass RAW text — for
        IT models the sampler itself appends the turn markers (closing
        the prefix's open user turn, or wrapping a fresh user turn after
        a previous reply); do NOT pre-wrap continuations.
        Incompatible with ``img_embed`` (the image splice needs the
        in-call BOS).
      return_state: Attach the post-generation :class:`PrefixState` to the
        output so the next turn continues from it. Exact for batch 1;
        in larger batches, rows that hit EOS early keep decoding until the
        whole batch stops, so their state includes post-EOS tokens.
        Requires ``total_generation_steps >= 1``.
      constraint: Optional grammar constraint — a
        :class:`constrain.TokenDFA` (or its ``.tables``) compiled for
        THIS sampler's vocabulary. Every generated token is masked to
        keep the output inside the grammar, and stop tokens are only
        allowed once the output matches it (generation that exhausts the
        step budget may still end on an incomplete prefix). The whole
        batch shares one grammar; per-row DFA states are independent.
        Returned ``logits`` are the raw model logits (pre-mask), matching
        the repetition-penalty convention. No reference counterpart (the
        reference sampler is unconstrained, ``jax/sampler.py:163-169``).

    Returns:
      A :class:`SamplerOutput`.
    """
    self._validate_sampling_args(total_generation_steps, rng)
    constraint_tables = self._resolve_constraint(constraint)
    if return_state and total_generation_steps < 1:
      raise ValueError(
          "return_state requires total_generation_steps >= 1 (a prefill-"
          "only call builds no reusable cache; use prefill_prefix)."
      )

    if prefix_state is not None:
      return self._call_with_prefix(
          prefix_state, input_strings, total_generation_steps, rng, echo,
          return_logits, end_sampling_at_eos_token, img_embed,
          return_state, constraint_tables,
      )

    all_input_ids = [self.tokenize(s) for s in input_strings]
    lengths = [len(ids) for ids in all_input_ids]
    if img_embed is not None:
      # The image splices in after position 0 of the token array, which must
      # therefore be the real BOS: left padding would put the image after a
      # PAD token and corrupt the document masks. Multimodal batches must be
      # equal-length and are never length-bucketed.
      if len(set(lengths)) != 1:
        raise ValueError(
            "Multimodal sampling requires equal-length prompts per batch "
            f"(got lengths {lengths}); split the batch or pad the prompt "
            "text itself."
        )
      padded_tokens = jnp.stack(all_input_ids, axis=0)
    else:
      padded_tokens = self._get_padded_tokens(all_input_ids)
    input_lengths = jnp.asarray(lengths)
    pad_lengths = padded_tokens.shape[1] - input_lengths

    chunk = self.prefill_chunk_size
    use_chunks = (
        chunk is not None
        and padded_tokens.shape[1] > chunk
        # The image splices in after BOS (token 0 of the whole prompt),
        # which the per-chunk cache path cannot represent; multimodal
        # prompts prefill single-shot (they are capped at prompt length
        # anyway — the 729 visual tokens dominate and are already fused).
        and img_embed is None
    )
    if chunk is not None and not use_chunks and padded_tokens.shape[1] > chunk:
      import warnings

      warnings.warn(
          "prefill_chunk_size is set but chunking was skipped: the chunked "
          "path does not support the in-prompt image splice.",
          stacklevel=2,
      )
    if use_chunks:
      mid, cache, final_tokens, start, padded_tokens = (
          self.plan_prompt_chunks(padded_tokens, input_lengths)
      )
      pad_lengths = padded_tokens.shape[1] - input_lengths
      want_chunk_logits = echo and return_logits
      chunk_logits = []
      for tok_c, pos_c in mid:
        logits_i, cache = self._compiled_chunk_fn(
            self.params, tok_c, pos_c, cache, want_chunk_logits
        )
        if want_chunk_logits:
          chunk_logits.append(logits_i)
      state = self.prompt_processing_fn(
          self.params,
          final_tokens,
          rng,
          input_lengths,
          total_generation_steps,
          return_logits,
          echo,
          img_embed,
          cache,
          start,
          constraint_tables,
      )
      if echo:
        # The jitted prefill echoed only its own (final) chunk; prepend the
        # earlier chunks' tokens/logits so the buffers cover the whole
        # prompt, and shift the step bookkeeping accordingly.
        earlier = padded_tokens[:, : -chunk]
        logits_buffer = state.logits_buffer
        if return_logits:
          logits_buffer = jnp.concatenate(
              chunk_logits + [logits_buffer], axis=1
          )
        state = state.replace(
            tokens_buffer=jnp.concatenate(
                [earlier, state.tokens_buffer], axis=1
            ),
            logits_buffer=logits_buffer,
            step=state.step + earlier.shape[1],
            total_steps=state.total_steps + earlier.shape[1],
            # gen_start marks generated-token buffer indices (the
            # repetition-penalty scope); it shifts with the buffers.
            gen_start=state.gen_start + earlier.shape[1],
        )
    else:
      state = self.prompt_processing_fn(
          self.params,
          padded_tokens,
          rng,
          input_lengths,
          total_generation_steps,
          return_logits,
          echo,
          img_embed,
          None,
          None,
          constraint_tables,
      )
    return self._finish_sampling(
        state, pad_lengths, total_generation_steps, echo, return_logits,
        end_sampling_at_eos_token, return_state, constraint_tables,
    )

  def encode_continuation(
      self, input_strings: Sequence[str], prefix_state: PrefixState
  ) -> tuple[jax.Array, Cache, jax.Array]:
    """Tokens / cache / start positions for a prefix-continuation prefill.

    Continuations are encoded WITHOUT BOS (it lives in the prefix) and
    must be equal-length per batch: ragged left-padding would write pad
    tokens into the cache after real prefix content. A producer's pending
    token (a sampled-but-never-fed last token) leads the continuation so
    the context stays exact. Shared by ``__call__`` and
    :class:`speculative.SpeculativeSampler`.

    IT chat template: a text prefix (``prefill_prefix``) left the user
    turn OPEN, so the continuation closes it and opens the model turn —
    prefix + continuation then tokenizes like one fully templated prompt.
    A conversational state (``pending_token`` set) ended mid-model-reply,
    so the continuation closes the model turn and wraps the new text as a
    fresh user turn.
    """
    if self._is_it_model:
      if prefix_state.pending_token is not None:
        # If the previous turn already EMITTED the stop/<end_of_turn>
        # token (the recommended chat setup stops there), that pending
        # token closes the model turn in-band — prepending IT_TURN_CLOSE
        # again would put a double <end_of_turn> in the stream. Only the
        # newline that follows it in the canonical template is added.
        # Mixed batches (some rows stopped, some budget-truncated) would
        # need per-row templates of different lengths; reject them.
        import numpy as np

        pending = np.asarray(
            jax.device_get(prefix_state.pending_token)
        ).reshape(-1)
        stop_ids = np.asarray(self._stop_ids)
        closed = np.isin(pending, stop_ids)
        if closed.all():
          turn_close = "\n"
        elif closed.any():
          raise ValueError(
              "Mixed conversational batch: some rows ended on a stop "
              "token and some were budget-truncated; their continuation "
              "templates differ in length. Split the batch."
          )
        else:
          turn_close = common.IT_TURN_CLOSE
        input_strings = [
            turn_close + common.apply_it_formatter(s)
            for s in input_strings
        ]
      else:
        input_strings = [
            f"{s}{common.IT_TURN_CLOSE}{common.IT_MODEL_OPEN}"
            for s in input_strings
        ]
    ids = [
        jnp.asarray(self.vocab.EncodeAsIds(s), jnp.int32)
        for s in input_strings
    ]
    lengths = {len(i) for i in ids}
    if 0 in lengths:
      raise ValueError("Continuation prompts must be non-empty.")
    if len(lengths) != 1:
      raise ValueError(
          "Prefix continuation requires equal-length prompts per batch "
          f"(got {sorted(len(i) for i in ids)}): ragged left-padding "
          "would write pad tokens into the cache after real prefix "
          "content. Split the batch by length."
      )
    tokens = jnp.stack(ids, axis=0)
    batch = tokens.shape[0]
    cache = self._continue_from_prefix(prefix_state, batch)
    start = jnp.broadcast_to(
        jnp.asarray(prefix_state.length, jnp.int32).reshape(-1), (batch,)
    )
    if prefix_state.pending_token is not None:
      pending = jnp.broadcast_to(prefix_state.pending_token, (batch, 1))
      tokens = jnp.concatenate([pending, tokens], axis=1)
    return tokens, cache, start

  def plan_prompt_chunks(
      self, padded_tokens: at.Tokens, input_lengths: at.NumTokens
  ) -> tuple[list, Cache, at.Tokens, jax.Array, at.Tokens]:
    """Chunk plan for a fresh (BOS-leading, left-padded) prompt.

    The single source of the chunking scheme (previously hand-rolled in
    four places, which drifted): left-pad to a ``prefill_chunk_size``
    multiple (padded positions carry the -1 sentinel, identical to
    single-shot prefill), all-but-last chunks go through the cache-only
    chunk program, and the final chunk runs the sampling prefill
    continuing from per-row ``start`` positions (negative for rows whose
    prompt begins inside it).

    Returns ``(mid_chunks, cache, final_tokens, final_start,
    padded_tokens)`` where ``mid_chunks`` is a list of (tokens,
    positions) slices and ``cache`` is fresh (safe to donate to the
    chunk program).
    """
    chunk = self.prefill_chunk_size
    batch, total_len = padded_tokens.shape
    extra = -total_len % chunk
    if extra:
      padded_tokens = jnp.pad(
          padded_tokens, ((0, 0), (extra, 0)),
          constant_values=self.vocab.pad_id(),
      )
      total_len += extra
    positions = (
        jnp.tile(jnp.arange(total_len, dtype=jnp.int32)[None], (batch, 1))
        - total_len + input_lengths[:, None]
    )
    positions = jnp.maximum(positions, -1)
    num_chunks = total_len // chunk
    mid = [
        (padded_tokens[:, i * chunk : (i + 1) * chunk],
         positions[:, i * chunk : (i + 1) * chunk])
        for i in range(num_chunks - 1)
    ]
    final_start = (
        (num_chunks - 1) * chunk - total_len + input_lengths
    ).astype(jnp.int32)
    cache = self.model.init_cache(batch, self.dtype)
    return mid, cache, padded_tokens[:, -chunk:], final_start, padded_tokens

  def plan_continuation_chunks(
      self, input_strings: Sequence[str], prefix_state: PrefixState
  ) -> tuple[list, Cache, at.Tokens, jax.Array, at.Tokens]:
    """``encode_continuation`` plus the chunk plan for long continuations.

    Continuations are never padded (pads after real prefix content would
    corrupt the caches): full-size middle chunks, variable-size final
    remainder. The returned ``cache`` is SAFE TO DONATE when middle
    chunks exist — it never aliases ``prefix_state.cache`` (the chunk
    program donates its cache argument; handing it the shared prefix
    cache would delete buffers other requests still need).

    Returns ``(mid_chunks, cache, final_tokens, final_start, tokens)``.
    """
    tokens, cache, start = self.encode_continuation(
        input_strings, prefix_state
    )
    chunk = self.prefill_chunk_size
    length = int(tokens.shape[1])
    if chunk is None or length <= chunk:
      # Single-shot: the sampling prefill does not donate its cache
      # argument, so the (possibly aliased) prefix cache is fine here.
      return [], cache, tokens, start, tokens
    if (
        jax.tree_util.tree_leaves(cache)[0]
        is jax.tree_util.tree_leaves(prefix_state.cache)[0]
    ):
      cache = jax.tree_util.tree_map(jnp.copy, cache)
    positions = start[:, None] + jnp.arange(length, dtype=jnp.int32)
    n_mid = (length - 1) // chunk
    mid = [
        (tokens[:, i * chunk : (i + 1) * chunk],
         positions[:, i * chunk : (i + 1) * chunk])
        for i in range(n_mid)
    ]
    final_start = (start + n_mid * chunk).astype(jnp.int32)
    return mid, cache, tokens[:, n_mid * chunk :], final_start, tokens

  def _call_with_prefix(
      self,
      prefix_state: PrefixState,
      input_strings: Sequence[str],
      total_generation_steps: int,
      rng,
      echo: bool,
      return_logits: bool,
      end_sampling_at_eos_token: bool,
      img_embed,
      return_state: bool,
      constraint_tables=None,
  ) -> SamplerOutput:
    """Continues prompts from cached context (prefix or previous turn).

    A ``constraint`` starts fresh at the grammar's start state each turn:
    it scopes the NEW generation, not the cached history.
    """
    if img_embed is not None:
      raise ValueError(
          "prefix_state cannot be combined with img_embed: the image "
          "splices in after the BOS token, which lives in the prefix."
      )
    tokens, cache, start = self.encode_continuation(
        input_strings, prefix_state
    )
    batch = tokens.shape[0]
    state = self.prompt_processing_fn(
        self.params,
        tokens,
        rng,
        # Every continuation token is real (equal lengths, no padding);
        # positions come from `start`, so this is informational only.
        jnp.full((batch,), tokens.shape[1], jnp.int32),
        total_generation_steps,
        return_logits,
        echo,
        None,
        cache,
        start,
        constraint_tables,
    )
    # A prepended pending token belongs to the PREVIOUS turn (it was
    # already returned to the caller); echoed buffers slice it off so
    # "echo covers only the continuation" holds.
    lead = 1 if prefix_state.pending_token is not None else 0
    return self._finish_sampling(
        state, jnp.full((batch,), lead, jnp.int32), total_generation_steps,
        echo, return_logits, end_sampling_at_eos_token, return_state,
        constraint_tables,
    )

  def _validate_sampling_args(self, total_generation_steps, rng) -> None:
    if not self.deterministic_sampling and rng is None:
      raise ValueError(
          "rng must be provided when sampling non-deterministically."
      )
    if total_generation_steps < 0:
      raise ValueError("total_generation_steps must be at least 0.")

  def _resolve_constraint(self, constraint):
    """``constraint`` (TokenDFA or ConstraintTables) → device tables."""
    if constraint is None:
      return None
    tables = getattr(constraint, "tables", constraint)
    table_vocab = tables.token_lengths.shape[0]
    if table_vocab != self.vocab_size:
      raise ValueError(
          f"Constraint was compiled for a {table_vocab}-token vocabulary; "
          f"this sampler's model has {self.vocab_size}. Rebuild the "
          "TokenDFA with token_strings_from_vocab(vocab, vocab_size)."
      )
    return tables

  def _finish_sampling(
      self,
      state: SamplingState,
      pad_lengths,
      total_generation_steps: int,
      echo: bool,
      return_logits: bool,
      end_sampling_at_eos_token: bool,
      return_state: bool = False,
      constraint_tables=None,
  ) -> SamplerOutput:
    """Runs the decode loop and slices the buffers into a SamplerOutput."""
    if total_generation_steps > 1:
      state = self.sample_fn(
          self.params, state, end_sampling_at_eos_token, constraint_tables
      )

    next_state = None
    if return_state:
      # The token at buffer[step] was sampled but never fed to the model;
      # it becomes the pending lead-in of the next turn, whose positions
      # start where this turn's decode loop stopped.
      pending = jnp.take_along_axis(
          state.tokens_buffer, state.step[None, None].repeat(
              state.tokens_buffer.shape[0], axis=0
          ), axis=1,
      )
      next_state = PrefixState(
          cache=state.cache,
          length=state.positions[:, 0],
          pending_token=pending,
      )

    # Echoed buffers start with the (padded) prompt: drop per-row padding.
    tokens = [
        seq[int(l):] if echo else seq
        for seq, l in zip(state.tokens_buffer, pad_lengths)
    ]
    if return_logits:
      logits = [
          seq[int(l):] if echo else seq
          for seq, l in zip(state.logits_buffer, pad_lengths)
      ]
    else:
      logits = []

    return SamplerOutput(
        text=[self.vocab.DecodeIds(seq.tolist()) for seq in tokens],
        tokens=tokens,
        logits=logits,
        state=next_state,
    )
