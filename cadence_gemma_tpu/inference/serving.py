"""Continuous batching: requests join and leave a running decode batch.

The reference (and its upstream) serve strictly call-at-a-time: a batch
must enter ``Sampler.__call__`` together and the slowest sequence holds
every other one hostage. Production serving wants the vLLM-style loop —
new requests slot into a *running* batch as others finish — and Griffin is
unusually well suited to it: the per-sequence state is O(1) (fp32 RG-LRU
state + conv tail + a fixed window ring KV cache), so a "slot" is a fixed
byte budget regardless of how long its sequence runs.

Design (static shapes throughout, host orchestrates, device computes):
  * A :class:`ContinuousBatcher` owns ``num_slots`` cache rows. Admission
    QUEUES the prompt host-side; its prefill (one batch-1 jitted program
    per chunk, prompt-length bucketing bounds compiles) runs at the start
    of subsequent ``step`` ticks and the result scatters into the slot —
    one jitted ``dynamic_update_index_in_dim`` over the state tree. With
    ``prefill_chunk_size`` set on the sampler, admission prefill is
    chunked, and ``admission_chunks_per_tick`` bounds how much prefill
    work any one tick performs — so a long newcomer prompt stalls the
    running slots' decode by at most one chunk per tick instead of its
    whole prefill (and its activation memory is bounded by the chunk).
  * Admission can continue from a :class:`~sampler.PrefixState` (a shared
    system prompt prefilled ONCE via ``Sampler.prefill_prefix``): the
    prefix cache broadcasts into the slot and only the per-request
    continuation tokens prefill — the prefix cost leaves every request's
    admission entirely (the solo sampler's prefix semantics, in-batch).
  * ``step(n)`` advances ALL slots ``n`` decode steps as one jitted
    ``lax.fori_loop``: rows feed their own last token at their own
    position; finished/empty rows still compute (no data-dependent
    shapes) but their buffer writes, positions, and done flags are
    masked. Their cache rows take garbage — harmless, because admission
    overwrites the whole row.
  * ``pop_finished()`` returns completed requests (EOS or per-request
    step budget) and frees their slots. For incremental consumption, a
    ``stream_callback`` receives each request's newly decoded tokens
    after every tick (one fused host fetch per tick, amortized over the
    tick's ``n`` decode steps).

Correctness bar (tested): a request's tokens are bit-identical to a solo
``Sampler.__call__`` run no matter when it joins, how many neighbors it
shares the batch with, or how often ``step`` is called. (In speculative
mode the match is exact up to cross-program fma numerics; in categorical
mode the chain is reproducible from the request's rng alone and matches a
batch-1 solo run with the same key.)
"""

from __future__ import annotations

import collections
import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from cadence_gemma_tpu.inference import sampler as sampler_lib
from cadence_gemma_tpu.inference import speculative

# Compiled-program reuse across batcher instances (see
# ContinuousBatcher.__init__). Maps a trace-relevant config key to
# (sampler, {fn_name: jitted_fn}); the sampler is stored for an identity
# check (an id() in the key could be recycled after GC). Bounded LRU —
# each entry pins one batcher instance (the one whose bound methods were
# jitted), which is tiny next to the params that enter as arguments.
_PROGRAM_CACHE: collections.OrderedDict = collections.OrderedDict()
_PROGRAM_CACHE_SIZE = 8


@dataclasses.dataclass
class _Request:
  """Host-side bookkeeping for one admitted prompt."""

  request_id: int
  slot: int
  max_steps: int
  prompt: str
  started: bool = False   # prefill inserted into the slot yet?
  emitted: int = 0        # tokens already delivered via stream_callback
  want_state: bool = False  # extract a PrefixState when finished
  gid: int = 0            # grammar id (dynamic slots are refcounted)


@dataclasses.dataclass
class _Pending:
  """A queued admission: prefill work that future ticks will perform.

  ``chunks`` is a list of (tokens, positions) slices still to be fed
  through the cache-only chunk program; the final element runs through the
  full prompt-processing program (which also samples the first token) and
  then scatters into the slot.
  """

  request: _Request
  chunks: list[tuple[jax.Array, jax.Array]]
  input_length: int
  cache: Any          # running prefill cache (None until first chunk)
  start: jax.Array | None  # per-row start positions for the final chunk
  rng: Any
  prompt_tokens: jax.Array | None   # speculative history seed
  prompt_length: Any
  adapters: Any = None    # per-request LoRA tree (multi_lora mode)
  img_embed: Any = None   # per-request fused vision features
  gid: int = 0            # grammar id (0 = unconstrained)
  sampling: Any = None    # per-request sampling row (per_request_sampling)


class ContinuousBatcher:
  """Slot-based continuous batching over a greedy :class:`Sampler`.

  Class attributes:
    MAX_REQUEST_STOPS: Per-request extra stop-token capacity when
      ``per_request_sampling`` is on (a compiled-in buffer width).
    MAX_REQUEST_BIAS: Per-request ``logit_bias`` entry capacity when
      ``per_request_sampling`` is on (a compiled-in buffer width).

  Args:
    sampler: The sampler whose model/params/vocab (and, for categorical
      sampling, temperature/top-k/top-p filters) are reused. Categorical
      sampling threads an independent PRNG chain per slot: a request's
      tokens depend only on its own ``rng`` and its own step count, never
      on which slots its neighbors occupy or when they joined (tested).
    num_slots: Decode batch width (fixed; one compiled step program).
    max_steps_default: Per-request decode budget when a request does not
      specify one. Output buffers are sized to the largest budget seen,
      rounded up to a power of two (bounded recompiles).
    draft_len: > 0 turns on speculative decoding inside the batch
      (continuous batching × speculation): every ``step`` is one
      ``draft_len + 1``-token verify pass per slot via
      :func:`speculative.prompt_lookup_spec_step`, so each slot can emit
      several tokens per weights read. Greedy samplers match solo
      plain-greedy runs (exactly up to cross-program fma numerics — a
      near-tie argmax can flip, see speculative.py); categorical
      samplers use stochastic speculative sampling per slot, which is
      distribution-equal (not stream-equal) to plain categorical.
    ngram: Longest-suffix lookup window for speculative drafting.
  """

  MAX_REQUEST_STOPS = 4
  MAX_REQUEST_BIAS = 32

  def __init__(
      self,
      sampler: sampler_lib.Sampler,
      num_slots: int,
      max_steps_default: int = 256,
      draft_len: int = 0,
      ngram: int = 4,
      stream_callback: Any | None = None,
      admission_chunks_per_tick: int | None = None,
      multi_lora: bool = False,
      preserve_states: bool = False,
      constraints: Any | None = None,
      dynamic_grammar_slots: int = 0,
      dynamic_grammar_budget: tuple[int, int, int] | None = None,
      per_request_sampling: bool = False,
      record_logprobs: int = 0,
      reuse_programs: bool = True,
  ):
    """See the class docstring.

    Args:
      sampler: (documented on the class).
      num_slots: (documented on the class).
      max_steps_default: (documented on the class).
      draft_len / ngram: (documented on the class).
      stream_callback: Optional ``f(request_id, new_token_ids, done)``
        called after every tick with the tokens each live request emitted
        since the last call (and once more with ``done=True`` from
        ``pop_finished``). Costs one fused host fetch per tick.
      admission_chunks_per_tick: Bound on how many admission-prefill
        programs one ``step`` tick runs before decoding (None = drain all
        pending admissions). With the sampler's ``prefill_chunk_size``
        set, this caps the decode stall any newcomer can inflict on
        running requests at one chunk's prefill time per tick.
      multi_lora: Serve a DIFFERENT LoRA fine-tune per request over one
        shared base (S-LoRA-style multi-adapter serving). Requires the
        sampler's model to be built with ``lora_rank > 0`` (its params
        carry adapter leaves — zeros for the plain base). Each request
        may pass ``adapters=`` to :meth:`add_request`; its prefill runs
        batch-1 with those adapters merged, and at insertion they
        scatter into a per-slot stacked adapter tree that the decode
        program applies row-wise (``Griffin(lora_rows=num_slots)`` —
        the base matmuls stay one shared MXU contraction; only the
        rank-r hop is per-slot). Requests without adapters run the
        sampler's own params exactly. HBM cost is
        ``num_slots x adapter_size`` (~0.7% of the model per slot at
        rank 16), and the per-step overhead is the batched low-rank
        einsums. Composes with speculation (``draft_len``), categorical
        sampling, chunked admission, and streaming.
      preserve_states: Freeze each finished slot's cache at its own stop
        so requests may ask for their post-generation
        :class:`~cadence_gemma_tpu.inference.sampler.PrefixState`
        (``add_request(..., return_state=True)`` + :meth:`take_state`) —
        multi-turn chat through the batcher at O(new tokens) prefill
        cost. Costs one per-row select over the cache per decode step
        (cache traffic, not weight traffic; leave off when no request
        continues). The speculative path (``draft_len > 0``) freezes rows
        by construction, so there the flag only gates the API.
      constraints: Optional sequence of :class:`constrain.TokenDFA`
        grammars available to requests (``add_request(...,
        constraint=k)`` selects ``constraints[k]``; omitted = free
        generation). Stacked into one device registry
        (``constrain.stack_constraints``): every decode step gathers each
        slot's own grammar row, so constrained and free requests mix in
        one batch with no per-request programs. Composes with
        ``draft_len`` — the speculative verify masks every position with
        the DFA state reached through the draft chain, so grammar-
        violating drafts are simply rejected (JSON workloads are exactly
        the copy-heavy shape speculation accelerates). No reference
        counterpart.
      dynamic_grammar_slots: Reserves this many registry slots for
        grammars registered at RUNTIME (:meth:`register_grammar`, or
        ``add_request(constraint=<TokenDFA>)`` — the mechanism behind
        per-request JSON-schema serving). Slots are overwritten in place
        on device, so table shapes — and therefore every compiled
        program — never change; unreferenced slots are LRU-evicted when
        a new grammar needs one.
      dynamic_grammar_budget: ``(max_states, max_atoms, max_token_len)``
        sizing the reserved slots. Defaults to the dims of the largest
        registered constraint; required if ``dynamic_grammar_slots > 0``
        with no ``constraints``. A registration exceeding the budget
        raises (shapes are compiled in).
      per_request_sampling: Let each request carry its own sampling
        parameters — ``temperature`` / ``top_k`` / ``top_p`` (categorical
        samplers), ``repetition_penalty``, ``min_tokens`` (stop tokens
        suppressed until that many tokens emitted), and extra
        ``stop_token_ids`` — evaluated per slot inside the one compiled
        decode program (the filters become row-wise: one descending sort
        serves both top-k and top-p thresholds). Requests that omit a
        parameter inherit the sampler's own setting and their filtered
        logits are bit-identical to the shared path. This is what lets
        the HTTP front end HONOR OpenAI ``temperature``/``top_p``/
        ``stop`` instead of ignoring them. Incompatible with
        ``draft_len`` (the speculative verify pass uses the sampler's
        shared filters).
      record_logprobs: > 0 records, for every emitted token, its
        log-probability under the model's raw distribution (one
        log-softmax pass per step) plus the top ``record_logprobs``
        alternative (token, logprob) pairs — fetch a finished request's
        record with :meth:`take_logprobs`. This is the OpenAI
        ``logprobs`` surface. Incompatible with ``draft_len`` (verify
        steps commit several tokens per program with no per-token
        distribution materialized).
      reuse_programs: Adopt the jitted insert/step/extract programs of a
        previous batcher with identical trace-relevant config over the
        SAME sampler object (process-level LRU), so a new batcher starts
        ticking without re-tracing the model (see :meth:`_init_programs`).
        Assumes the sampler has not been mutated since; pass ``False``
        to force fresh wrappers.
    """
    self.sampler = sampler
    self.num_slots = num_slots
    self.max_steps_default = max_steps_default
    self.draft_len = draft_len
    self.ngram = ngram
    self.stream_callback = stream_callback
    if admission_chunks_per_tick is not None and admission_chunks_per_tick < 1:
      raise ValueError(
          f"admission_chunks_per_tick must be >= 1 or None (got "
          f"{admission_chunks_per_tick})."
      )
    self.admission_chunks_per_tick = admission_chunks_per_tick
    if draft_len:
      if sampler.repetition_penalty != 1.0:
        raise ValueError(
            "Speculative decoding does not support repetition_penalty "
            "(see speculative.SpeculativeSampler)."
        )
      window = getattr(sampler.model.config, "attention_window_size", None)
      if window is not None and draft_len + 1 > window:
        raise ValueError(
            f"draft_len + 1 ({draft_len + 1}) exceeds the attention "
            f"window ({window})."
        )
    self._requests: dict[int, _Request] = {}  # slot -> request
    self._pending: list[_Pending] = []        # FIFO admission queue
    self._next_id = 0
    self._buffer_len = sampler_lib._next_bucket(max_steps_default)
    self._hist_len = sampler_lib._next_bucket(self._buffer_len + 64)

    cache = sampler.model.init_cache(num_slots, sampler.dtype)
    self._state = {
        "cache": cache,
        "last_token": jnp.zeros((num_slots,), jnp.int32),
        "positions": jnp.zeros((num_slots, 1), jnp.int32),
        "active": jnp.zeros((num_slots,), jnp.bool_),
        "done": jnp.zeros((num_slots,), jnp.bool_),
        "write_idx": jnp.ones((num_slots,), jnp.int32),
        "budget": jnp.zeros((num_slots,), jnp.int32),
        "out": jnp.zeros((num_slots, self._buffer_len), jnp.int32),
        # Per-slot PRNG chains for categorical sampling (unused, but kept
        # in the state tree, for greedy samplers).
        "rng": jax.random.split(jax.random.PRNGKey(0), num_slots),
    }
    if draft_len:
      # Per-slot token history for prompt-lookup drafting.
      self._state.update(
          hist=jnp.zeros((num_slots, self._hist_len), jnp.int32),
          cur_len=jnp.zeros((num_slots,), jnp.int32),
          valid_from=jnp.zeros((num_slots,), jnp.int32),
      )

    self.record_logprobs = int(record_logprobs)
    if self.record_logprobs:
      if draft_len:
        raise ValueError(
            "record_logprobs is incompatible with draft_len > 0 (verify "
            "steps commit several tokens per program)."
        )
      k = self.record_logprobs
      self._state.update(
          chosen_lp=jnp.zeros((num_slots, self._buffer_len), jnp.float32),
          top_lp_ids=jnp.zeros(
              (num_slots, self._buffer_len, k), jnp.int32
          ),
          top_lp_vals=jnp.zeros(
              (num_slots, self._buffer_len, k), jnp.float32
          ),
      )
      self._logprob_records: dict[int, dict] = {}

    self.per_request_sampling = per_request_sampling
    if per_request_sampling:
      if draft_len:
        raise ValueError(
            "per_request_sampling is incompatible with draft_len > 0 "
            "(the speculative verify pass uses the sampler's shared "
            "filters)."
        )
      s = sampler
      self._state.update(
          temp=jnp.full((num_slots,), s.temperature, jnp.float32),
          top_k=jnp.full(
              (num_slots,), s.top_k if s.top_k is not None else 0,
              jnp.int32,
          ),
          top_p=jnp.full(
              (num_slots,), s.top_p if s.top_p is not None else 1.0,
              jnp.float32,
          ),
          rep_penalty=jnp.full(
              (num_slots,), s.repetition_penalty, jnp.float32
          ),
          min_tokens=jnp.zeros((num_slots,), jnp.int32),
          extra_stops=jnp.full(
              (num_slots, self.MAX_REQUEST_STOPS), -1, jnp.int32
          ),
          bias_ids=jnp.full(
              (num_slots, self.MAX_REQUEST_BIAS), -1, jnp.int32
          ),
          bias_vals=jnp.zeros(
              (num_slots, self.MAX_REQUEST_BIAS), jnp.float32
          ),
      )
      # Stop columns suppressed by min_tokens (host-side: static scatter
      # indices in the compiled program).
      self._global_stop_cols = tuple(
          int(i) for i in jax.device_get(sampler._stop_ids)
      )

    self._constraints = None
    self.dynamic_grammar_slots = int(dynamic_grammar_slots)
    if (constraints is not None and len(constraints)) or (
        self.dynamic_grammar_slots > 0
    ):
      from cadence_gemma_tpu.inference import constrain

      self._constrain_lib = constrain
      constraints = list(constraints or [])
      if self.dynamic_grammar_slots and dynamic_grammar_budget is None:
        if not constraints:
          raise ValueError(
              "dynamic_grammar_slots with no constraints needs an "
              "explicit dynamic_grammar_budget=(max_states, max_atoms, "
              "max_token_len) — the slot shapes are compiled into the "
              "decode program."
          )
        dynamic_grammar_budget = (1, 1, 1)  # floor; constraints dominate
      self._n_static_grammars = len(constraints) + 1
      self._constraints = constrain.stack_constraints(
          constraints, sampler.vocab_size,
          extra_slots=self.dynamic_grammar_slots,
          min_dims=dynamic_grammar_budget or (1, 1, 1),
      )
      # Per-grammar admission views, sliced once (not per admission).
      self._single_tables = [
          self._constraints.single(g)
          for g in range(self._constraints.num_grammars)
      ]
      # Dynamic-slot bookkeeping: key -> gid (LRU), gid -> live request
      # count (a slot is only evictable at refcount 0).
      import collections

      self._dynamic_by_key: collections.OrderedDict = (
          collections.OrderedDict()
      )
      self._gid_refs: dict[int, int] = {}
      # Per-slot grammar id + DFA state live in the step program's carry.
      self._state.update(
          gid=jnp.zeros((num_slots,), jnp.int32),
          cstate=jnp.zeros((num_slots,), jnp.int32),
      )

    self.multi_lora = multi_lora
    self._adapters = None       # stacked [num_slots, ...] adapter tree
    self._model_ml = None       # lora_rows=num_slots model twin
    self._sampler_adapters = None  # default row for adapter-less requests
    if multi_lora:
      from cadence_gemma_tpu.training import lora as lora_lib

      self._lora_lib = lora_lib
      if not getattr(sampler.model, "lora_rank", 0):
        raise ValueError(
            "multi_lora requires the sampler's model to be built with "
            "lora_rank > 0 so its params carry adapter leaves (use "
            "training.lora.init_adapters for a fresh zero tree)."
        )
      self._sampler_adapters, _ = lora_lib.split_lora(sampler.params)
      if not self._sampler_adapters:
        raise ValueError(
            "multi_lora: the sampler's params have no lora_a/lora_b "
            "leaves; initialize adapters (training.lora.init_adapters + "
            "merge_params) before building the batcher."
        )
      self._adapters = jax.tree_util.tree_map(
          lambda a: jnp.zeros((num_slots,) + a.shape, a.dtype),
          self._sampler_adapters,
      )
      self._model_ml = sampler.model.clone(lora_rows=num_slots)

    self.preserve_states = preserve_states
    self._states: dict[int, sampler_lib.PrefixState] = {}

    if sampler.mesh is not None:
      # Multi-chip serving: the batcher's persistent state lives on the
      # sampler's mesh from tick zero. The cache takes the same layouts
      # GSPMD propagates through the TP forward (recurrent state sharded
      # on its lru-width features, single-head KV replicated —
      # ``parallel/partitioning.py``), so inserts and decode steps never
      # reshard; every other per-slot buffer (tokens, flags, budgets,
      # grammar states, adapters) is replicated — they are gathered or
      # scattered by slot index host-side. The reference has no serving
      # loop, let alone a sharded one.
      from cadence_gemma_tpu.parallel import partitioning

      mesh = sampler.mesh
      repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
      cache_sh = partitioning.griffin_cache_shardings(
          mesh, self._state["cache"], sampler.model_axis
      )
      placed = {
          k: (jax.device_put(v, cache_sh) if k == "cache"
              else jax.device_put(
                  v, jax.tree_util.tree_map(lambda _: repl, v)
              ))
          for k, v in self._state.items()
      }
      self._state = placed
      if self._adapters is not None:
        self._adapters = jax.device_put(
            self._adapters,
            jax.tree_util.tree_map(lambda _: repl, self._adapters),
        )
      if self._constraints is not None:
        self._constraints = jax.device_put(
            self._constraints,
            jax.tree_util.tree_map(lambda _: repl, self._constraints),
        )

    self._init_programs(reuse_programs)

  def _program_cache_key(self) -> tuple:
    """Everything the traced programs close over, as a hashable key."""
    cons_sig = None
    if self._constraints is not None:
      cons_sig = tuple(
          (tuple(l.shape), str(l.dtype))
          for l in jax.tree_util.tree_leaves(self._constraints)
      )
    return (
        id(self.sampler), self.num_slots, self._buffer_len,
        self._hist_len, self.draft_len, self.ngram, self.multi_lora,
        self.preserve_states, self.record_logprobs,
        self.per_request_sampling, self.dynamic_grammar_slots, cons_sig,
    )

  def _init_programs(self, reuse: bool) -> None:
    """Builds (or adopts) the jitted device programs.

    ``jax.jit`` caches per wrapper, and each batcher's programs are jits
    of its own bound methods — so WITHOUT reuse, every new batcher over
    the same sampler re-traces and re-lowers the 2B decode/prefill-insert
    programs (tens of seconds of host work, even when the backend's
    executable cache hits). A rolling restart or per-run batcher
    (benchmarks, tests, config flips) pays that on its first ticks. With
    ``reuse_programs`` (default), batchers whose trace-relevant config
    matches share one set of jitted wrappers via a process-level LRU;
    the sampler identity is checked (not just ``id()``) before adopting.
    """
    if reuse:
      key = self._program_cache_key()
      hit = _PROGRAM_CACHE.get(key)
      if hit is not None and hit[0] is self.sampler:
        _PROGRAM_CACHE.move_to_end(key)
        fns = hit[1]
        self._insert_fn = fns["insert"]
        self._step_fn = fns["step"]
        self._extract_state_fn = fns["extract"]
        if "write_grammar" in fns:
          self._write_grammar_fn = fns["write_grammar"]
        if "scatter_adapters" in fns:
          self._scatter_adapters_fn = fns["scatter_adapters"]
        return
    self._insert_fn = jax.jit(self._insert, donate_argnums=0,
                              static_argnums=(4, 7))
    # Params enter as an argument: closing over them would bake ~weights-
    # sized constants into the lowered program (XLA warns at >5 GB and the
    # executable would carry its own copy of the weights in HBM).
    self._step_fn = jax.jit(self._step_n, donate_argnums=1,
                            static_argnums=2)
    self._extract_state_fn = jax.jit(self._extract_state)
    fns = {
        "insert": self._insert_fn,
        "step": self._step_fn,
        "extract": self._extract_state_fn,
    }
    if self._constraints is not None:
      self._write_grammar_fn = jax.jit(
          self._write_grammar, donate_argnums=0
      )
      fns["write_grammar"] = self._write_grammar_fn
    if self.multi_lora:
      self._scatter_adapters_fn = jax.jit(
          self._scatter_adapters, donate_argnums=0
      )
      fns["scatter_adapters"] = self._scatter_adapters_fn
    if reuse:
      _PROGRAM_CACHE[key] = (self.sampler, fns)
      while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_SIZE:
        _PROGRAM_CACHE.popitem(last=False)

  # -- device programs --------------------------------------------------------

  def _extract_state(self, state, slot):
    """Gathers one finished slot into a batch-1 :class:`PrefixState`.

    Mirrors the solo sampler's ``return_state`` construction
    (``sampler.py _finish_sampling``): the slot's ``last_token`` is the
    sampled-but-never-fed pending token and ``positions`` is where it
    would be fed. The gather copies the row, so the slot can be freed
    and overwritten immediately.
    """
    cache = jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=0),
        state["cache"],
    )
    if self.draft_len:
      # Speculative slots: the last emitted (never committed) token lives
      # in the drafting history at cur_len - 1; "last_token" is stale
      # (matches SpeculativeSampler's return_state, speculative.py).
      hist_row = jax.lax.dynamic_slice_in_dim(state["hist"], slot, 1, 0)
      cur = jax.lax.dynamic_slice_in_dim(state["cur_len"], slot, 1, 0)
      pending = jnp.take_along_axis(hist_row, cur[:, None] - 1, axis=1)
    else:
      pending = jax.lax.dynamic_slice_in_dim(
          state["last_token"], slot, 1, axis=0
      )[:, None]
    return sampler_lib.PrefixState(
        cache=cache,
        length=jax.lax.dynamic_slice_in_dim(
            state["positions"], slot, 1, axis=0
        )[:, 0],
        pending_token=pending,
    )

  def _write_grammar(self, registry, gid, allowed, trans, atoms, lengths,
                     start):
    """Overwrites registry slot ``gid`` in place (shapes unchanged)."""
    upd = jax.lax.dynamic_update_index_in_dim
    return type(registry)(
        allowed_bits=upd(registry.allowed_bits, allowed, gid, axis=0),
        trans=upd(registry.trans, trans, gid, axis=0),
        token_atoms=upd(registry.token_atoms, atoms, gid, axis=0),
        token_lengths=upd(registry.token_lengths, lengths, gid, axis=0),
        start=registry.start.at[gid].set(start),
    )

  def register_grammar(self, dfa: Any) -> int:
    """Installs a grammar into a reserved dynamic slot.

    Returns the INTERNAL grammar id — callers normally don't need it:
    pass the :class:`~constrain.TokenDFA` itself to
    ``add_request(constraint=...)``, which registers (or reuses) it and
    tracks the slot's live-request count. Re-registering the same
    (pattern, stop-id) grammar reuses its slot; when all slots are
    taken, the least-recently-used slot with no live requests is
    evicted. Raises when every dynamic grammar is in use by an active
    request. Call from the driver thread (device writes).
    """
    if self._constraints is None or not self.dynamic_grammar_slots:
      raise ValueError(
          "register_grammar needs ContinuousBatcher("
          "dynamic_grammar_slots=k)."
      )
    if dfa.vocab_size != self.sampler.vocab_size:
      raise ValueError(
          f"grammar compiled for a {dfa.vocab_size}-token vocabulary; "
          f"this sampler serves {self.sampler.vocab_size}."
      )
    key = (dfa.pattern, tuple(dfa.stop_ids))
    gid = self._dynamic_by_key.get(key)
    if gid is not None:
      self._dynamic_by_key.move_to_end(key)
      return gid
    first_dyn = self._n_static_grammars
    used = set(self._dynamic_by_key.values())
    free = [
        g for g in range(first_dyn, self._constraints.num_grammars)
        if g not in used
    ]
    if free:
      gid = free[0]
    else:
      for old_key, old_gid in self._dynamic_by_key.items():
        if self._gid_refs.get(old_gid, 0) == 0:
          del self._dynamic_by_key[old_key]
          gid = old_gid
          break
      else:
        raise RuntimeError(
            f"all {self.dynamic_grammar_slots} dynamic grammar slots "
            "are referenced by live requests; raise "
            "dynamic_grammar_slots or retry after pop_finished()."
        )
    s_max = int(self._constraints.trans.shape[1])
    a_max = int(self._constraints.trans.shape[2])
    l_max = int(self._constraints.token_atoms.shape[2])
    allowed, trans, atoms, lengths, start = self._constrain_lib.pad_grammar(
        dfa, s_max, a_max, l_max
    )
    self._constraints = self._write_grammar_fn(
        self._constraints, gid, jnp.asarray(allowed), jnp.asarray(trans),
        jnp.asarray(atoms), jnp.asarray(lengths),
        jnp.asarray(start, jnp.int32),
    )
    self._single_tables[gid] = self._constraints.single(gid)
    self._dynamic_by_key[key] = gid
    self._gid_refs.setdefault(gid, 0)
    return gid

  def _release_gid(self, gid: int) -> None:
    if self._constraints is not None and gid >= self._n_static_grammars:
      self._gid_refs[gid] = max(0, self._gid_refs.get(gid, 0) - 1)

  def _scatter_adapters(self, stacked, new, slot):
    """Writes one request's adapter tree into its slot's stacked row."""
    return jax.tree_util.tree_map(
        lambda s, a: jax.lax.dynamic_update_index_in_dim(
            s, a.astype(s.dtype), slot, axis=0
        ),
        stacked, new,
    )

  def _insert(self, state, prefill_state, slot, budget, grow_to=None,
              prompt_tokens=None, prompt_length=None, grow_hist_to=None,
              gid=None, sampling=None):
    """Scatters a batch-1 prefill result into slot ``slot``.

    ``prompt_tokens``/``prompt_length``/``grow_hist_to`` are only used in
    speculative mode: the (padded) prompt row seeds the slot's drafting
    history. ``gid`` (constraint registries only) records the request's
    grammar; its post-first-token DFA state arrives in
    ``prefill_state.constraint_state``.
    """
    state = dict(state)
    if grow_to is not None and grow_to != state["out"].shape[1]:
      grow_by = grow_to - state["out"].shape[1]
      state["out"] = jnp.pad(state["out"], ((0, 0), (0, grow_by)))
      if self.record_logprobs:
        state["chosen_lp"] = jnp.pad(
            state["chosen_lp"], ((0, 0), (0, grow_by))
        )
        state["top_lp_ids"] = jnp.pad(
            state["top_lp_ids"], ((0, 0), (0, grow_by), (0, 0))
        )
        state["top_lp_vals"] = jnp.pad(
            state["top_lp_vals"], ((0, 0), (0, grow_by), (0, 0))
        )
    new_cache = jax.tree_util.tree_map(
        lambda full, one: jax.lax.dynamic_update_index_in_dim(
            full, one[0], slot, axis=0
        ),
        state["cache"],
        prefill_state.cache,
    )
    first_token = prefill_state.tokens_buffer[0, 0]
    out_row = jnp.zeros((state["out"].shape[1],), jnp.int32)
    out_row = out_row.at[0].set(first_token)
    eos = self.sampler._is_stop_token(first_token)
    if sampling is not None:
      extra_stops_row = sampling[5]
      eos = eos | jnp.any(
          (first_token == extra_stops_row) & (extra_stops_row >= 0)
      )
    upd = lambda arr, v: arr.at[slot].set(v)  # noqa: E731
    rng = state["rng"]
    if prefill_state.rng is not None:
      # Continue the request's own chain from where prefill split it.
      rng = upd(rng, prefill_state.rng)
    state.update(
        cache=new_cache,
        last_token=upd(state["last_token"], first_token),
        positions=jax.lax.dynamic_update_index_in_dim(
            state["positions"], prefill_state.positions[0], slot, axis=0
        ),
        active=upd(state["active"], True),
        done=upd(state["done"], eos | (budget <= 1)),
        write_idx=upd(state["write_idx"], 1),
        budget=upd(state["budget"], budget),
        out=jax.lax.dynamic_update_index_in_dim(
            state["out"], out_row, slot, axis=0
        ),
        rng=rng,
    )
    if gid is not None:
      state.update(
          gid=upd(state["gid"], gid),
          cstate=upd(state["cstate"], prefill_state.constraint_state[0]),
      )
    if self.record_logprobs:
      # Seed-token logprobs from the admission prefill's materialized
      # [1, 1, V] logits (requested via return_logits).
      lp0 = jax.nn.log_softmax(prefill_state.logits_buffer[0, 0])
      lp_row = jnp.zeros((state["chosen_lp"].shape[1],), jnp.float32)
      lp_row = lp_row.at[0].set(lp0[first_token])
      tv, ti = jax.lax.top_k(lp0, self.record_logprobs)
      ids_row = jnp.zeros(state["top_lp_ids"].shape[1:], jnp.int32)
      vals_row = jnp.zeros(state["top_lp_vals"].shape[1:], jnp.float32)
      ids_row = ids_row.at[0].set(ti)
      vals_row = vals_row.at[0].set(tv)
      state.update(
          chosen_lp=jax.lax.dynamic_update_index_in_dim(
              state["chosen_lp"], lp_row, slot, axis=0
          ),
          top_lp_ids=jax.lax.dynamic_update_index_in_dim(
              state["top_lp_ids"], ids_row, slot, axis=0
          ),
          top_lp_vals=jax.lax.dynamic_update_index_in_dim(
              state["top_lp_vals"], vals_row, slot, axis=0
          ),
      )
    if sampling is not None:
      (temp, top_k, top_p, rep_penalty, min_tokens, extra_stops,
       bias_ids, bias_vals) = sampling
      state.update(
          temp=upd(state["temp"], temp),
          top_k=upd(state["top_k"], top_k),
          top_p=upd(state["top_p"], top_p),
          rep_penalty=upd(state["rep_penalty"], rep_penalty),
          min_tokens=upd(state["min_tokens"], min_tokens),
          extra_stops=jax.lax.dynamic_update_index_in_dim(
              state["extra_stops"], extra_stops, slot, axis=0
          ),
          bias_ids=jax.lax.dynamic_update_index_in_dim(
              state["bias_ids"], bias_ids, slot, axis=0
          ),
          bias_vals=jax.lax.dynamic_update_index_in_dim(
              state["bias_vals"], bias_vals, slot, axis=0
          ),
      )
    if prompt_tokens is not None:
      if grow_hist_to is not None and grow_hist_to != state["hist"].shape[1]:
        state["hist"] = jnp.pad(
            state["hist"],
            ((0, 0), (0, grow_hist_to - state["hist"].shape[1])),
        )
      padded_len = prompt_tokens.shape[1]
      hist_row = jnp.zeros((state["hist"].shape[1],), jnp.int32)
      hist_row = jax.lax.dynamic_update_slice_in_dim(
          hist_row, prompt_tokens[0], 0, axis=0
      )
      hist_row = hist_row.at[padded_len].set(first_token)
      state.update(
          hist=jax.lax.dynamic_update_index_in_dim(
              state["hist"], hist_row, slot, axis=0
          ),
          cur_len=upd(state["cur_len"], padded_len + 1),
          valid_from=upd(state["valid_from"], padded_len - prompt_length),
      )
    return state

  def _step_n(self, params, state, n, adapters=None, constraints=None):
    """Advances every slot ``n`` decode (or verify) steps in one program.

    ``constraints`` (a :class:`constrain.StackedConstraintTables`) enters
    as an argument — closing over a [G, S, V/32] registry would bake it
    into the executable as a constant.
    """
    model = self.sampler.model
    if adapters is not None:
      # Multi-adapter serving: overlay the stacked [num_slots, ...]
      # adapter tree (a tree restructure, free under jit) and run the
      # lora_rows model twin, whose low-rank hop contracts row i of the
      # stack against batch row i. Base weights are shared and stream
      # once per step, exactly as without adapters.
      params = self._lora_lib.merge_params(params, adapters)
      model = self._model_ml
    if self.draft_len:

      categorical = not self.sampler.deterministic_sampling

      def spec_body(_, s):
        live = s["active"] & ~s["done"]
        st = dict(
            hist=s["hist"],
            valid_from=s["valid_from"],
            cur_len=s["cur_len"],
            cache=s["cache"],
            positions=s["positions"],
            live=live,
            out=s["out"],
            write_idx=s["write_idx"],
            budget=s["budget"],
        )
        bound = None
        if constraints is not None:
          # Mixed-grammar batch through the grammar-agnostic verify:
          # each slot's registry row binds in (gid 0 = allow-all).
          bound = self._constrain_lib.BoundConstraint(
              tables=constraints, gid=s["gid"]
          )
          st["cstate"] = s["cstate"]
        if categorical:
          # Stochastic speculative sampling per slot: each slot's chain
          # advances on its own live steps only. Distribution-equal to
          # plain categorical serving (not stream-equal — acceptance
          # consumes randomness differently than one-draw-per-token).
          st["rng"] = s["rng"]
        st = speculative.prompt_lookup_spec_step(
            model, params, st,
            draft_len=self.draft_len, ngram=self.ngram,
            stop_ids=self.sampler._stop_ids,
            logits_filter=(
                self.sampler._filter_logits if categorical else None
            ),
            constraint=bound,
        )
        eos_hit = st.pop("eos_hit")
        nxt = {
            **s,
            "cache": st["cache"],
            "positions": st["positions"],
            "hist": st["hist"],
            "cur_len": st["cur_len"],
            "out": st["out"],
            "write_idx": st["write_idx"],
            "rng": st.get("rng", s["rng"]),
            "done": s["done"]
            | eos_hit
            | (live & (st["write_idx"] >= s["budget"])),
        }
        if constraints is not None:
          nxt["cstate"] = st["cstate"]
        return nxt

      return jax.lax.fori_loop(0, n, spec_body, state)

    def body(_, s):
      live = s["active"] & ~s["done"]
      logits, cache = self.sampler.apply_model(
          params=params,
          tokens=s["last_token"][:, None],
          segment_pos=s["positions"],
          cache=s["cache"],
          return_logits=True,
          return_cache=True,
          model=model,
      )
      if self.preserve_states:
        # Freeze finished rows' caches at their own stop: without this a
        # done slot keeps re-feeding its held last_token (harmless when
        # the row is only ever overwritten on reuse, but fatal for
        # per-request return_state — the conv tail shifts and the LRU
        # carry advances on every re-feed).
        cache = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                live.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            cache, s["cache"],
        )
      rng = s["rng"]
      step_logits = logits[:, 0]
      raw_lp = None
      if self.record_logprobs:
        # The model's raw distribution (pre-penalty/grammar/filters) —
        # the standard OpenAI logprobs meaning. One extra [b, V] pass.
        raw_lp = jax.nn.log_softmax(step_logits, axis=-1)
      per_req = self.per_request_sampling
      if per_req:
        # Row-wise repetition penalty (rows at 1.0 are exact no-ops:
        # x/1 and x*1 preserve bits).
        written = (
            jnp.arange(s["out"].shape[1])[None] < s["write_idx"][:, None]
        )
        rows_ = jnp.arange(self.num_slots)[:, None]
        seen = jnp.zeros(step_logits.shape, jnp.bool_).at[
            rows_, s["out"]
        ].max(written)
        p = s["rep_penalty"][:, None]
        step_logits = jnp.where(
            seen,
            jnp.where(step_logits > 0, step_logits / p, step_logits * p),
            step_logits,
        )
        # Per-request logit_bias (OpenAI semantics: added to the logits
        # prior to sampling). Applied AFTER the repetition penalty (a
        # strong bias stays strong however often its token was emitted)
        # and BEFORE the grammar mask (a bias cannot resurrect a
        # grammar-banned token: -inf + bias = -inf). Unused entries
        # (id -1) scatter 0.0 onto column 0 — an exact no-op.
        bias_cols = jnp.maximum(s["bias_ids"], 0)
        bias_vals = jnp.where(
            s["bias_ids"] >= 0, s["bias_vals"], 0.0
        ).astype(step_logits.dtype)
        step_logits = step_logits.at[rows_, bias_cols].add(bias_vals)
      elif self.sampler.repetition_penalty != 1.0:
        # Same scope as a solo non-echo run: tokens this request emitted.
        written = (
            jnp.arange(s["out"].shape[1])[None] < s["write_idx"][:, None]
        )
        step_logits = self.sampler._apply_repetition_penalty(
            step_logits, s["out"], written
        )
      if constraints is not None:
        # Each slot's own grammar row: the allow-all grammar (gid 0)
        # masks nothing, so free and constrained requests share this
        # program.
        step_logits = constraints.mask(s["gid"], s["cstate"], step_logits)
      if per_req:
        # min_tokens: stop tokens are illegal until the request emitted
        # that many. Applied AFTER the grammar mask — a forced-long
        # generation overrides the grammar's permission to stop (it
        # cannot force an all--inf row unless the grammar left only
        # stops legal; callers combining the two own that contract).
        neg_inf = jnp.asarray(-jnp.inf, step_logits.dtype)
        suppress = (s["write_idx"] < s["min_tokens"])[:, None]
        for col in self._global_stop_cols:
          step_logits = step_logits.at[:, col].set(
              jnp.where(suppress[:, 0], neg_inf, step_logits[:, col])
          )
        rows_ = jnp.arange(self.num_slots)[:, None]
        stop_cols = jnp.maximum(s["extra_stops"], 0)
        cur_vals = jnp.take_along_axis(step_logits, stop_cols, axis=1)
        masked_vals = jnp.where(
            (s["extra_stops"] >= 0) & suppress, neg_inf, cur_vals
        )
        step_logits = step_logits.at[rows_, stop_cols].set(masked_vals)
      if self.sampler.deterministic_sampling:
        sampled = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
      else:
        # Independent per-slot chains: a slot's key advances only on its
        # own live steps, so a request's tokens are a function of its rng
        # and step count alone — not of its neighbors or join time.
        # Carry/step order matches Sampler._sample_from_logits (carry =
        # split[0], step = split[1]) so a batch-1 solo run with the same
        # rng produces the same chain.
        split = jax.vmap(lambda key: jax.random.split(key, 2))(rng)
        next_keys, step_keys = split[:, 0], split[:, 1]
        if per_req:
          filtered = sampler_lib.filter_logits_rows(
              step_logits, s["temp"], s["top_k"], s["top_p"]
          )
        else:
          filtered = self.sampler._filter_logits(step_logits)
        sampled = jax.vmap(jax.random.categorical)(
            step_keys, filtered
        ).astype(jnp.int32)
        rng = jnp.where(live[:, None], next_keys, rng)
      next_token = jnp.where(live, sampled, s["last_token"])
      extra = {}
      if per_req:
        for key in ("temp", "top_k", "top_p", "rep_penalty",
                    "min_tokens", "extra_stops", "bias_ids", "bias_vals"):
          extra[key] = s[key]
      if constraints is not None:
        extra["gid"] = s["gid"]
        extra["cstate"] = jnp.where(
            live,
            constraints.advance(s["gid"], s["cstate"], next_token),
            s["cstate"],
        )
      rows = jnp.arange(self.num_slots)
      idx = jnp.minimum(s["write_idx"], s["out"].shape[1] - 1)
      out = s["out"].at[rows, idx].set(
          jnp.where(live, next_token, s["out"][rows, idx])
      )
      if raw_lp is not None:
        chosen = jnp.take_along_axis(
            raw_lp, next_token[:, None], axis=1
        )[:, 0]
        top_vals, top_ids = jax.lax.top_k(raw_lp, self.record_logprobs)
        extra["chosen_lp"] = s["chosen_lp"].at[rows, idx].set(
            jnp.where(live, chosen, s["chosen_lp"][rows, idx])
        )
        live_k = live[:, None]
        extra["top_lp_ids"] = s["top_lp_ids"].at[rows, idx].set(
            jnp.where(live_k, top_ids, s["top_lp_ids"][rows, idx])
        )
        extra["top_lp_vals"] = s["top_lp_vals"].at[rows, idx].set(
            jnp.where(live_k, top_vals, s["top_lp_vals"][rows, idx])
        )
      write_idx = s["write_idx"] + live
      stop_hit = self.sampler._is_stop_token(next_token)
      if per_req:
        stop_hit = stop_hit | jnp.any(
            (next_token[:, None] == s["extra_stops"])
            & (s["extra_stops"] >= 0),
            axis=1,
        )
      done = s["done"] | (
          live & (stop_hit | (write_idx >= s["budget"]))
      )
      return {
          "cache": cache,
          "last_token": next_token,
          "positions": s["positions"] + live[:, None],
          "active": s["active"],
          "done": done,
          "write_idx": write_idx,
          "budget": s["budget"],
          "out": out,
          "rng": rng,
          **extra,
      }

    return jax.lax.fori_loop(0, n, body, state)

  # -- host API ----------------------------------------------------------------

  @property
  def active_count(self) -> int:
    return len(self._requests)

  @property
  def has_capacity(self) -> bool:
    return len(self._requests) < self.num_slots

  def add_request(
      self,
      prompt: str,
      max_steps: int | None = None,
      rng=None,
      prefix_state: sampler_lib.PrefixState | None = None,
      adapters: Any | None = None,
      img_embed: Any | None = None,
      pixels: Any | None = None,
      img_path: str | None = None,
      return_state: bool = False,
      constraint: int | None = None,
      temperature: float | None = None,
      top_k: int | None = None,
      top_p: float | None = None,
      min_tokens: int = 0,
      stop_token_ids: Any | None = None,
      repetition_penalty: float | None = None,
      logit_bias: dict | None = None,
  ) -> int:
    """Queues a prompt for admission into a free slot; returns a request id.

    Host-side only: tokenization happens here, the prefill programs run at
    the start of subsequent :meth:`step` ticks (chunked when the sampler
    has ``prefill_chunk_size``; ``admission_chunks_per_tick`` bounds the
    per-tick work). The request starts decoding on the tick after its
    prefill completes. ``rng`` seeds the request's own sampling chain
    (required for a categorical sampler; its tokens are then reproducible
    independent of batch composition).

    ``prefix_state`` continues from cached context (a shared system
    prompt from ``Sampler.prefill_prefix``, or a prior conversational
    state): the prefix cache broadcasts into the slot and only the
    continuation tokens prefill, exactly like the solo sampler's
    ``prefix_state=`` path (IT turn templating included).

    ``adapters`` (``multi_lora`` batchers only) is this request's LoRA
    tree (``training.lora.split_lora`` layout); the request decodes as
    if the sampler served ``merge_params(base, adapters)`` solo. Omitted
    → the sampler's own params apply unchanged. Combined with
    ``prefix_state``, the shared prefix stays as prefilled (under the
    sampler's params — the point of sharing it); only the continuation
    and decode run under the request's adapters.

    ``return_state=True`` (requires ``preserve_states=True`` on the
    batcher) extracts this request's post-generation context when it
    finishes; fetch it with :meth:`take_state` and pass it back as the
    next turn's ``prefix_state`` — multi-turn chat through the batcher
    at O(new tokens) prefill cost, exactly like the solo sampler's
    ``return_state``/``prefix_state`` pair (IT turn templating
    included).

    ``constraint=k`` masks this request's generation with registered
    grammar ``constraints[k]`` (see the constructor); ``constraint=``
    a :class:`~constrain.TokenDFA` installs it into a dynamic slot. Its
    tokens always form a live prefix of the grammar and stop tokens are
    only legal once the output matches. Other slots are unaffected.

    ``temperature`` / ``top_k`` / ``top_p`` / ``repetition_penalty`` /
    ``min_tokens`` / ``stop_token_ids`` (``per_request_sampling``
    batchers only) override the sampler's settings for THIS request:
    the request decodes exactly as a solo sampler configured with those
    values (the categorical knobs need a categorical sampler).
    ``min_tokens`` suppresses all stop tokens until that many tokens
    emitted; ``stop_token_ids`` adds up to ``MAX_REQUEST_STOPS`` extra
    per-request stops on top of the sampler's. ``logit_bias`` maps up to
    ``MAX_REQUEST_BIAS`` token ids to additive logit offsets (OpenAI
    semantics, values in [-100, 100]: -100 effectively bans a token,
    +100 effectively forces it) applied to every decode step of THIS
    request; works with greedy and categorical samplers, composes with
    the repetition penalty (bias applies after) and grammars (the
    grammar mask wins).

    ``img_embed`` grounds the request in an image: fused vision features
    ``[1, vision_tokens, vision_width]`` splice in after the prompt's BOS
    during this request's admission prefill, exactly like the solo
    sampler's ``img_embed=`` path — after insertion an image slot is
    byte-for-byte an ordinary slot (the vision context lives in the O(1)
    recurrent state), so decode ticks are unchanged and image and text
    requests mix freely. ``pixels`` / ``img_path`` encode on the spot
    instead (the sampler must be a :class:`ModalSampler` with a vision
    encoder). Images are incompatible with ``prefix_state`` (the splice
    needs the in-call BOS), matching the solo sampler.
    """
    gid = 0
    if constraint is not None:
      if self._constraints is None:
        raise ValueError(
            "constraint= requires ContinuousBatcher(constraints=[...] "
            "and/or dynamic_grammar_slots=k)."
        )
      if hasattr(constraint, "pattern"):  # a TokenDFA: dynamic slot
        gid = self.register_grammar(constraint)
      else:
        n_registered = self._n_static_grammars - 1
        if not 0 <= constraint < n_registered:
          raise ValueError(
              f"constraint must index the registered grammars "
              f"[0, {n_registered}) (got {constraint}), or be a "
              "TokenDFA for a dynamic slot."
          )
        gid = constraint + 1
    sampling = None
    overridden = [
        a is not None
        for a in (temperature, top_k, top_p, repetition_penalty,
                  stop_token_ids, logit_bias)
    ]
    if not self.per_request_sampling:
      if any(overridden) or min_tokens:
        raise ValueError(
            "per-request sampling parameters need ContinuousBatcher("
            "per_request_sampling=True)."
        )
    else:
      s_ = self.sampler
      if s_.deterministic_sampling and any(
          a is not None for a in (temperature, top_k, top_p)
      ):
        raise ValueError(
            "temperature/top_k/top_p are categorical-sampling knobs; "
            "this batcher's sampler is greedy (deterministic_sampling="
            "True)."
        )
      if temperature is not None and temperature <= 0.0:
        raise ValueError(f"temperature must be > 0 (got {temperature}).")
      if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1 (got {top_k}).")
      if top_p is not None and not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1] (got {top_p}).")
      if repetition_penalty is not None and repetition_penalty <= 0.0:
        raise ValueError(
            f"repetition_penalty must be > 0 (got {repetition_penalty})."
        )
      if min_tokens < 0:
        raise ValueError(f"min_tokens must be >= 0 (got {min_tokens}).")
      stops = [int(i) for i in (stop_token_ids or ())]
      if len(stops) > self.MAX_REQUEST_STOPS:
        raise ValueError(
            f"at most {self.MAX_REQUEST_STOPS} per-request stop tokens "
            f"(got {len(stops)}); configure the rest on the sampler."
        )
      stops += [-1] * (self.MAX_REQUEST_STOPS - len(stops))
      bias_items = sorted(
          (int(t), float(b)) for t, b in (logit_bias or {}).items()
      )
      if len(bias_items) > self.MAX_REQUEST_BIAS:
        raise ValueError(
            f"at most {self.MAX_REQUEST_BIAS} logit_bias entries "
            f"(got {len(bias_items)})."
        )
      for t, b in bias_items:
        if not 0 <= t < self.sampler.vocab_size:
          raise ValueError(
              f"logit_bias token id {t} outside the vocabulary "
              f"[0, {self.sampler.vocab_size})."
          )
        if not -100.0 <= b <= 100.0:
          raise ValueError(
              f"logit_bias values must be in [-100, 100] (got {b} "
              f"for token {t})."
          )
      bias_ids = [t for t, _ in bias_items]
      bias_vals = [b for _, b in bias_items]
      pad = self.MAX_REQUEST_BIAS - len(bias_items)
      bias_ids += [-1] * pad
      bias_vals += [0.0] * pad
      sampling = (
          jnp.float32(
              temperature if temperature is not None else s_.temperature
          ),
          jnp.int32(
              top_k if top_k is not None
              else (s_.top_k if s_.top_k is not None else 0)
          ),
          jnp.float32(
              top_p if top_p is not None
              else (s_.top_p if s_.top_p is not None else 1.0)
          ),
          jnp.float32(
              repetition_penalty if repetition_penalty is not None
              else s_.repetition_penalty
          ),
          jnp.int32(min_tokens),
          jnp.asarray(stops, jnp.int32),
          jnp.asarray(bias_ids, jnp.int32),
          jnp.asarray(bias_vals, jnp.float32),
      )
    if return_state and not self.preserve_states:
      raise ValueError(
          "return_state requires ContinuousBatcher(preserve_states=True) "
          "— otherwise finished slots' caches keep advancing and the "
          "extracted context would be corrupt."
      )
    n_img = sum(x is not None for x in (img_embed, pixels, img_path))
    if n_img > 1:
      raise ValueError(
          "Pass at most one of img_embed, pixels, or img_path."
      )
    if img_path is not None:
      encode = getattr(self.sampler, "encode_image", None)
      if encode is None:
        raise ValueError(
            "img_path= needs a ModalSampler with a vision_encoder; pass "
            "img_embed directly otherwise."
        )
      img_embed = encode(img_path)
    elif pixels is not None:
      encode = getattr(self.sampler, "_encode_fn", None)
      if encode is None:
        raise ValueError(
            "pixels= needs a ModalSampler with a vision_encoder; pass "
            "img_embed directly otherwise."
        )
      img_embed = encode(self.sampler.vision_params, pixels).astype(
          jnp.bfloat16
      )
    if img_embed is not None:
      if prefix_state is not None:
        raise ValueError(
            "Image requests are incompatible with prefix_state: the "
            "image splices in after the prompt's BOS, which a "
            "continuation prefill does not have (same as the solo "
            "sampler)."
        )
      img_embed = jnp.asarray(img_embed)
      if img_embed.ndim != 3 or img_embed.shape[0] != 1:
        raise ValueError(
            "Per-request image features must be [1, vision_tokens, "
            f"vision_width]; got {img_embed.shape}."
        )
    if adapters is not None:
      if not self.multi_lora:
        raise ValueError(
            "Per-request adapters require ContinuousBatcher("
            "multi_lora=True)."
        )
      expect = jax.tree_util.tree_structure(self._sampler_adapters)
      got = jax.tree_util.tree_structure(adapters)
      if got != expect:
        raise ValueError(
            "adapters tree does not match the sampler's adapter leaves "
            f"(training.lora.split_lora layout); got {got} != {expect}."
        )
    if not self.has_capacity:
      raise RuntimeError(
          f"All {self.num_slots} slots busy; pop_finished() first."
      )
    if not self.sampler.deterministic_sampling and rng is None:
      raise ValueError(
          "rng must be provided per request for categorical sampling."
      )
    if max_steps is None:
      max_steps = self.max_steps_default
    if max_steps < 1:
      raise ValueError(f"max_steps must be >= 1 (got {max_steps}).")
    slot = next(
        i for i in range(self.num_slots) if i not in self._requests
    )
    s = self.sampler
    chunk = s.prefill_chunk_size

    if prefix_state is not None:
      # Continuation admission via the shared chunk planner (its cache is
      # donation-safe — never the shared prefix cache itself).
      mid, cache, final_tokens, start, tokens = (
          s.plan_continuation_chunks([prompt], prefix_state)
      )
      chunks = list(mid) + [(final_tokens, None)]
      input_length = int(tokens.shape[1])
      prompt_tokens = (
          jnp.array(tokens, copy=True) if self.draft_len else None
      )
      prompt_length = (
          jnp.int32(input_length) if self.draft_len else None
      )
    else:
      ids = s.tokenize(prompt)
      if img_embed is not None:
        # The image splices in after token 0, which must be the real BOS:
        # bucket left-padding would put the image after a PAD token and
        # corrupt the document masks (same rule as the solo sampler's
        # multimodal batches, which are never length-bucketed).
        tokens = jnp.asarray([ids], jnp.int32)
      else:
        tokens = s._get_padded_tokens([ids])
      input_length = len(ids)
      if (chunk is not None and int(tokens.shape[1]) > chunk
          and img_embed is not None):
        # Mirror the solo sampler: the per-chunk cache path cannot
        # represent the in-prompt image splice, so image admissions
        # prefill single-shot.
        import warnings

        warnings.warn(
            "prefill_chunk_size is set but chunking was skipped for an "
            "image admission: the chunked path does not support the "
            "in-prompt image splice.",
            stacklevel=2,
        )
        chunk = None
      if chunk is not None and int(tokens.shape[1]) > chunk:
        mid, cache, final_tokens, start, tokens = s.plan_prompt_chunks(
            tokens, jnp.asarray([input_length])
        )
        chunks = list(mid) + [(final_tokens, None)]
      else:
        chunks = [(tokens, None)]
        start = None
        cache = None
      prompt_tokens = (
          jnp.array(tokens, copy=True) if self.draft_len else None
      )
      prompt_length = jnp.int32(input_length) if self.draft_len else None

    if rng is not None:
      # The prefill program donates its rng argument; keep the caller's
      # key alive (reproducibility tests reuse one key across batchers).
      rng = jnp.array(rng, copy=True)
    request_id = self._next_id
    self._next_id += 1
    req = _Request(
        request_id=request_id, slot=slot, max_steps=max_steps,
        prompt=prompt, want_state=return_state, gid=gid,
    )
    if self._constraints is not None and gid >= self._n_static_grammars:
      self._gid_refs[gid] = self._gid_refs.get(gid, 0) + 1
    self._requests[slot] = req
    self._pending.append(_Pending(
        request=req, chunks=chunks, input_length=input_length,
        cache=cache, start=start, rng=rng,
        prompt_tokens=prompt_tokens, prompt_length=prompt_length,
        adapters=adapters, img_embed=img_embed, gid=gid,
        sampling=sampling,
    ))
    return request_id

  def _admission_params(self, p: _Pending):
    """Params for a pending request's prefill programs: the sampler's
    tree, with this request's adapters overlaid in multi_lora mode (the
    overlay is a host-side tree restructure — leaf shapes match the
    compiled programs' signature, so no recompilation)."""
    if p.adapters is None:
      return self.sampler.params
    return self._lora_lib.merge_params(self.sampler.params, p.adapters)

  def _finish_admission(self, p: _Pending) -> None:
    """Runs a pending request's final prefill chunk and fills its slot."""
    s = self.sampler
    final_tokens, _ = p.chunks.pop(0)
    # Every grammar's slice shares the registry's padded shapes, so all
    # admissions (free ones run the allow-all grammar 0) hit ONE compiled
    # prefill program.
    tables = (
        self._single_tables[p.gid]
        if self._constraints is not None else None
    )
    overrides = None
    if p.sampling is not None:
      (temp, top_k, top_p, _, min_tokens, extra_stops,
       bias_ids, bias_vals) = p.sampling
      # Batch-1 rows; min_tokens >= 1 suppresses stops at the seed too,
      # and the logit_bias covers the seed token like every decode step.
      overrides = (
          temp[None], top_k[None], top_p[None],
          (min_tokens > 0)[None], extra_stops[None],
          bias_ids[None], bias_vals[None],
      )
    prefill = s.prompt_processing_fn(
        self._admission_params(p),
        final_tokens,
        p.rng,
        jnp.asarray([p.input_length]),
        1,  # buffers here only seed the first token; ours are per-slot
        bool(self.record_logprobs),  # logits → seed-token logprobs
        False,
        p.img_embed,
        p.cache,
        p.start,
        tables,
        overrides,
    )
    grow_to = None
    need = sampler_lib._next_bucket(p.request.max_steps)
    if need > self._buffer_len:
      self._buffer_len = grow_to = need
    grow_hist_to = None
    if self.draft_len:
      hist_need = sampler_lib._next_bucket(
          p.prompt_tokens.shape[1] + max(need, self._buffer_len) + 1
      )
      if hist_need > self._hist_len:
        self._hist_len = grow_hist_to = hist_need
    self._state = self._insert_fn(
        self._state, prefill, p.request.slot,
        jnp.int32(p.request.max_steps), grow_to,
        p.prompt_tokens, p.prompt_length, grow_hist_to,
        jnp.int32(p.gid) if self._constraints is not None else None,
        p.sampling,
    )
    if self.multi_lora:
      # The slot row must always be (re)written: a freed slot still
      # holds its previous occupant's adapters. Adapter-less requests
      # get the sampler's own adapter leaves, so they decode exactly as
      # a solo run of the sampler's params.
      self._adapters = self._scatter_adapters_fn(
          self._adapters,
          p.adapters if p.adapters is not None else self._sampler_adapters,
          p.request.slot,
      )
    p.request.started = True

  def _drain_admissions(self) -> None:
    """Runs up to ``admission_chunks_per_tick`` prefill programs (FIFO)."""
    budget = self.admission_chunks_per_tick
    s = self.sampler
    while self._pending and (budget is None or budget > 0):
      p = self._pending[0]
      while len(p.chunks) > 1 and (budget is None or budget > 0):
        tokens_c, pos_c = p.chunks.pop(0)
        _, p.cache = s._compiled_chunk_fn(
            self._admission_params(p), tokens_c, pos_c, p.cache, False
        )
        if budget is not None:
          budget -= 1
      if len(p.chunks) == 1 and (budget is None or budget > 0):
        self._finish_admission(p)
        self._pending.pop(0)
        if budget is not None:
          budget -= 1
      else:
        return

  def _stream(self) -> None:
    """Delivers newly decoded tokens to the stream callback (one fetch)."""
    if self.stream_callback is None:
      return
    live = [r for r in self._requests.values() if r.started]
    if not live:
      return
    out, write_idx = jax.device_get(
        (self._state["out"], self._state["write_idx"])
    )
    for r in live:
      upto = int(write_idx[r.slot])
      if upto > r.emitted:
        self.stream_callback(
            r.request_id, out[r.slot, r.emitted : upto].tolist(), False
        )
        r.emitted = upto

  def step(self, n: int = 8) -> None:
    """One tick: admission prefill work, then ``n`` decode steps, then
    streaming delivery. All device work; the only host fetch is the
    optional streaming one."""
    self._drain_admissions()
    if any(r.started for r in self._requests.values()):
      self._state = self._step_fn(
          self.sampler.params, self._state, n, self._adapters,
          self._constraints,
      )
    self._stream()

  def pop_finished(self) -> list[tuple[int, list[int], str]]:
    """Returns ``(request_id, token_ids, text)`` for each completed
    request and frees their slots."""
    # One fused host fetch (each device_get on this relay costs ~30 ms).
    done, write_idx = jax.device_get(
        (self._state["done"], self._state["write_idx"])
    )
    out = None
    finished = []
    for slot, req in list(self._requests.items()):
      # A freshly reserved slot may still carry the previous occupant's
      # done flag until its prefill inserts; skip unstarted requests.
      if not req.started or not done[slot]:
        continue
      if req.want_state:
        # Gathered (copied) BEFORE the slot frees; preserve_states froze
        # the row's cache at this request's own stop.
        self._states[req.request_id] = self._extract_state_fn(
            self._state, req.slot
        )
      if out is None:
        fetch = [self._state["out"]]
        if self.record_logprobs:
          fetch += [self._state["chosen_lp"], self._state["top_lp_ids"],
                    self._state["top_lp_vals"]]
        fetched = jax.device_get(tuple(fetch))
        out = fetched[0]
        lp_arrays = fetched[1:] if self.record_logprobs else None
      upto = int(write_idx[slot])
      tokens = out[slot, :upto].tolist()
      if self.record_logprobs:
        chosen_lp, top_ids, top_vals = lp_arrays
        self._logprob_records[req.request_id] = {
            "token_logprobs": chosen_lp[slot, :upto].tolist(),
            "top_ids": top_ids[slot, :upto].tolist(),
            "top_logprobs": top_vals[slot, :upto].tolist(),
        }
      if self.stream_callback is not None:
        self.stream_callback(
            req.request_id, tokens[req.emitted :], True
        )
      finished.append(
          (req.request_id, tokens, self.sampler.vocab.DecodeIds(tokens))
      )
      self._release_gid(req.gid)
      del self._requests[slot]
      self._state = dict(self._state)
      self._state["active"] = self._state["active"].at[slot].set(False)
    finished.sort(key=lambda t: t[0])
    return finished

  def take_logprobs(self, request_id: int) -> dict:
    """Pops a finished request's logprob record (``record_logprobs``
    batchers; call after :meth:`pop_finished` returned the request).

    Returns ``{"token_logprobs": [float], "top_ids": [[int]],
    "top_logprobs": [[float]]}`` aligned with the request's tokens.
    """
    if not self.record_logprobs:
      raise ValueError(
          "take_logprobs needs ContinuousBatcher(record_logprobs=k)."
      )
    try:
      return self._logprob_records.pop(request_id)
    except KeyError:
      raise KeyError(
          f"No logprobs for request {request_id}: not finished yet "
          "(pop_finished first) or already taken."
      ) from None

  def take_state(self, request_id: int) -> sampler_lib.PrefixState:
    """Pops the post-generation context of a finished ``return_state``
    request (one holder: states are request-sized cache copies, so they
    are handed over, not retained)."""
    try:
      return self._states.pop(request_id)
    except KeyError:
      raise KeyError(
          f"No state for request {request_id}: it was not added with "
          "return_state=True, has not finished (pop_finished first), or "
          "its state was already taken."
      ) from None

  def cancel(self, request_id: int) -> bool:
    """Cancels a request; returns False if the id is unknown/finished.

    A cancelled request never appears in :meth:`pop_finished` and its
    already-decoded tokens are discarded. The slot frees immediately:
    queued admissions are dropped host-side; started slots clear their
    ``active`` flag (the decode program's live mask is ``active & ~done``,
    so the row stops advancing — neighbors are untouched) and the next
    admission overwrites every per-slot field. With a ``stream_callback``
    a final ``(request_id, [], True)`` call marks the stream closed.
    """
    for i, p in enumerate(self._pending):
      if p.request.request_id == request_id:
        del self._pending[i]
        self._release_gid(p.request.gid)
        del self._requests[p.request.slot]
        if self.stream_callback is not None:
          self.stream_callback(request_id, [], True)
        return True
    for slot, req in list(self._requests.items()):
      if req.request_id == request_id:
        self._state = dict(self._state)
        self._state["active"] = self._state["active"].at[slot].set(False)
        self._release_gid(req.gid)
        del self._requests[slot]
        if self.stream_callback is not None:
          self.stream_callback(request_id, [], True)
        return True
    return False

  def run_until_drained(self, step_size: int = 8, max_ticks: int = 10_000):
    """Convenience loop: step until every admitted request completes."""
    results = []
    for _ in range(max_ticks):
      if not self._requests:
        return results
      self.step(step_size)
      results.extend(self.pop_finished())
    err = RuntimeError(
        f"max_ticks exceeded before the batch drained; {len(results)} "
        "completed results are attached as .results."
    )
    err.results = results
    raise err
