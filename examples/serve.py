"""Serving CLI: continuous batching + optional shared-prefix caching.

Demonstrates the serving loop the reference lacks (its sampler is strictly
call-at-a-time, ``/root/reference/recurrentgemma/jax/sampler.py:403``):
requests stream into a running decode batch, finished sequences free their
slots immediately, and a shared system prompt can be prefilled once.

Example:
  python examples/serve.py \
      --checkpoint_path=/ckpts/2b-it --tokenizer_path=/ckpts/tok.model \
      --system_prompt "You are a helpful assistant." \
      --request "What is a TPU?" --request "Define MXU." \
      --num_slots 4 --max_steps 128
"""

import time

from absl import app
from absl import flags
import jax

import cadence_gemma_tpu as cg

_CHECKPOINT = flags.DEFINE_string("checkpoint_path", None, "Orbax checkpoint.")
_TOKENIZER = flags.DEFINE_string("tokenizer_path", None, "SentencePiece model.")
_REQUESTS = flags.DEFINE_multi_string(
    "request", ["Tell me a fact about the Griffin architecture."],
    "Request prompt(s); all are streamed through the batcher.",
)
_SYSTEM = flags.DEFINE_string(
    "system_prompt", "",
    "Optional shared prefix, prefilled once via Sampler.prefill_prefix and "
    "demonstrated separately (the batcher itself serves raw prompts).",
)
_SLOTS = flags.DEFINE_integer("num_slots", 4, "Concurrent decode slots.")
_STEPS = flags.DEFINE_integer("max_steps", 128, "Per-request decode budget.")
_STEP_CHUNK = flags.DEFINE_integer(
    "step_chunk", 8, "Decode steps per device program dispatch."
)
_IT = flags.DEFINE_boolean("is_it_model", True, "Apply the chat template.")
_INT8 = flags.DEFINE_boolean("int8", False, "Serve int8 weight-only.")
_SPECULATIVE = flags.DEFINE_boolean(
    "speculative", False,
    "Serve each request with greedy self-speculative decoding (prompt-"
    "lookup drafts; outputs identical to plain decode) instead of the "
    "continuous batcher — the low-latency single-stream mode.",
)
_DRAFT_LEN = flags.DEFINE_integer("draft_len", 7, "Speculative draft length.")
_PRESET = flags.DEFINE_enum_class(
    "preset", cg.Preset.RECURRENT_GEMMA_2B_V1, cg.Preset,
    "Preset supplying hypers not inferable from the checkpoint.",
)
_HTTP_PORT = flags.DEFINE_integer(
    "http_port", None,
    "Serve over HTTP instead of running --requests: starts "
    "ServingHTTPServer (POST /v1/generate with optional streaming, "
    "POST /v1/cancel, GET /v1/health, plus the OpenAI-compatible "
    "GET /v1/models, POST /v1/completions and /v1/chat/completions) "
    "on this port and blocks. 0 binds an ephemeral port.",
)
_SERVE_DRAFT = flags.DEFINE_integer(
    "serve_draft_len", 0,
    "HTTP serving: run the batcher speculatively with this draft length "
    "(0 = plain decode). Composes with --json_mode — grammar-violating "
    "drafts are rejected by the verify pass.",
)
_PER_REQUEST = flags.DEFINE_boolean(
    "per_request_sampling", False,
    "HTTP serving: honor OpenAI temperature/top_p/top_k/stop per request "
    "(needs a categorical sampler: pass --nodeterministic).",
)
_LOGPROBS = flags.DEFINE_integer(
    "logprobs", 0,
    "HTTP serving: record per-token logprobs (+ this many top "
    "alternatives) and serve the OpenAI logprobs fields.",
)
_DETERMINISTIC = flags.DEFINE_boolean(
    "deterministic", True,
    "Greedy decoding; --nodeterministic serves categorical sampling "
    "(per-request seeds; auto-seeded when the client sends none).",
)
_JSON_MODE = flags.DEFINE_boolean(
    "json_mode", False,
    "Register a JSON grammar for HTTP serving: requests with "
    "response_format {'type': 'json_object'} (OpenAI routes) or "
    "{'constraint': 'json_object'} (/v1/generate) are masked to emit "
    "only valid JSON. Grammar build is once at startup.",
)
_DYN_SLOTS = flags.DEFINE_integer(
    "dynamic_grammar_slots", 0,
    "HTTP serving: reserve this many per-request grammar slots — the "
    "machinery behind response_format json_schema AND forced tool_choice "
    "(tools) on /v1/chat/completions — without the full --json_mode "
    "grammar (--json_mode already implies 4 slots sized by the JSON "
    "grammar). Standalone slots are budgeted at (2048, 512, 16) "
    "(states, atoms, max token length), ample for typical schemas.",
)
_ADAPTERS = flags.DEFINE_multi_string(
    "adapter_path", [],
    "Optional LoRA adapter checkpoint(s) (orbax trees of lora_a/lora_b "
    "leaves, e.g. saved from training.lora). Request i serves with "
    "adapter i % len(adapter_path) merged — multi-adapter serving over "
    "one shared base (multi_lora batching). All adapters must share one "
    "rank.",
)


def main(argv):
  del argv
  params = cg.load_parameters(_CHECKPOINT.value, "single_device")
  params = params.get("params", params)
  config = cg.GriffinConfig.from_flax_params_or_variables(
      params, preset=_PRESET.value
  )
  if _INT8.value:
    params = cg.quantize_params(params)

  adapter_trees = []
  lora_rank = 0
  if _ADAPTERS.value:
    if _SPECULATIVE.value:
      raise app.UsageError(
          "--adapter_path is a multi_lora batcher feature; it does not "
          "combine with --speculative single-stream serving (merge the "
          "adapter into the checkpoint for that)."
      )
    from cadence_gemma_tpu.training import lora as lora_lib

    for path in _ADAPTERS.value:
      tree = cg.load_parameters(path, "single_device")
      adapter_trees.append(tree.get("params", tree))
    for p, leaf in jax.tree_util.tree_flatten_with_path(adapter_trees[0])[0]:
      if "lora_a" in str(p[-1]):
        lora_rank = int(leaf.shape[-1])
        break
    if not lora_rank:
      raise app.UsageError(
          f"{_ADAPTERS.value[0]} has no lora_a leaves — not an adapter "
          "checkpoint (save the tree from training.lora.split_lora)."
      )
    # The sampler's params must carry (zero) adapter leaves so every
    # compiled program has one tree signature; per-request adapters
    # overlay them at admission.
    params = lora_lib.merge_params(
        params,
        jax.tree_util.tree_map(
            lambda a: jax.numpy.zeros_like(a), adapter_trees[0]
        ),
    )

  model = cg.Griffin(config, quantized=_INT8.value, lora_rank=lora_rank,
                     gradient_checkpointing=False)
  vocab = cg.load_sentencepiece(_TOKENIZER.value)
  stop_ids = None
  if _IT.value:
    # Chat serving should stop at the end of the model's turn, not only
    # at EOS (Gemma's tokenizer encodes <end_of_turn> as one piece).
    eot = vocab.EncodeAsIds("<end_of_turn>")
    if len(eot) == 1:
      stop_ids = eot
  sampler = cg.Sampler(model, vocab, params, is_it_model=_IT.value,
                       stop_token_ids=stop_ids,
                       deterministic_sampling=_DETERMINISTIC.value)

  if _SYSTEM.value:
    t0 = time.perf_counter()
    prefix = sampler.prefill_prefix(_SYSTEM.value)
    print(f"[serve] shared prefix prefilled once "
          f"({prefix.length} tokens, {time.perf_counter() - t0:.3f}s); "
          "subsequent prefix_state= calls skip it entirely.")

  if _SPECULATIVE.value:
    spec = cg.SpeculativeSampler(sampler, draft_len=_DRAFT_LEN.value)
    t0 = time.perf_counter()
    total = 0
    for prompt in _REQUESTS.value:
      out = spec([prompt], total_generation_steps=_STEPS.value)
      total += spec.last_stats["tokens_emitted"]
      print(f"\n=== {prompt!r}\n{out.text[0]}")
      print(f"[serve] {spec.last_stats['tokens_per_verify_step']:.2f} "
            "tokens per weights read")
    dt = time.perf_counter() - t0
    print(f"\n[serve] speculative: {total} tokens, {total / dt:.1f} tok/s")
    return

  if _HTTP_PORT.value is not None:
    constraints = None
    constraint_names = None
    dynamic_slots = _DYN_SLOTS.value
    dynamic_budget = (2048, 512, 16) if dynamic_slots else None
    if _JSON_MODE.value:
      t0 = time.perf_counter()
      constraints = [cg.json_mode_dfa(
          vocab, config.vocab_size, extra_stop_ids=stop_ids or ()
      )]
      constraint_names = {"json_object": 0}
      # The JSON grammar's dims also budget per-request json_schema /
      # tool-call slots (schema grammars are far smaller than full JSON).
      dynamic_slots = max(dynamic_slots, 4)
      dynamic_budget = None  # sized by the registered JSON grammar
      print(f"[serve] JSON grammar compiled in "
            f"{time.perf_counter() - t0:.1f}s "
            f"({constraints[0].n_states} DFA states); "
            f"{dynamic_slots} dynamic slots for response_format "
            "json_schema.")
    batcher = cg.ContinuousBatcher(
        sampler, num_slots=_SLOTS.value, max_steps_default=_STEPS.value,
        admission_chunks_per_tick=1, multi_lora=bool(adapter_trees),
        # Chat sessions extract per-request states; the per-step cache
        # select it costs is cache traffic, not weight traffic.
        preserve_states=True,
        constraints=constraints,
        dynamic_grammar_slots=dynamic_slots,
        dynamic_grammar_budget=dynamic_budget,
        # Speculative serving (grammar-aware when --json_mode) /
        # per-request OpenAI knobs / logprobs — the batcher validates
        # the incompatible combinations.
        draft_len=_SERVE_DRAFT.value,
        per_request_sampling=_PER_REQUEST.value,
        record_logprobs=_LOGPROBS.value,
    )
    frontend = cg.ServingFrontend(
        batcher,
        constraint_names=constraint_names,
        # --system applies to every request (sessions start from it).
        default_prefix_state=prefix if _SYSTEM.value else None,
        # HTTP requests pick an adapter with {"adapter": i}.
        adapter_resolver=(
            (lambda i: adapter_trees[int(i) % len(adapter_trees)])
            if adapter_trees else None
        ),
    )
    server = cg.ServingHTTPServer(
        frontend, host="0.0.0.0", port=_HTTP_PORT.value
    )
    print(f"[serve] HTTP serving on :{server.port} — "
          "POST /v1/generate {'prompt': ..., 'stream': true, "
          "'session': ..., 'adapter': i}, POST /v1/cancel, POST "
          "/v1/reset, GET /v1/health; OpenAI-compatible: GET "
          "/v1/models, POST /v1/completions, POST /v1/chat/completions "
          "(SSE streaming). Ctrl-C to stop.")
    try:
      while True:
        time.sleep(60)
    except KeyboardInterrupt:
      server.close()
    return

  def stream(request_id, new_tokens, done):
    # Incremental delivery: decode and flush each tick's new tokens.
    piece = vocab.DecodeIds(new_tokens)
    if piece:
      print(f"[{request_id}] {piece}", flush=True)

  batcher = cg.ContinuousBatcher(
      sampler, num_slots=_SLOTS.value, max_steps_default=_STEPS.value,
      stream_callback=stream,
      # With a chunked sampler this also bounds how long a newcomer's
      # prefill can stall running requests each tick.
      admission_chunks_per_tick=1,
      multi_lora=bool(adapter_trees),
  )
  shared_prefix = prefix if _SYSTEM.value else None
  pending = list(enumerate(_REQUESTS.value))
  submitted = {}
  t_start = time.perf_counter()
  generated = 0
  while pending or batcher.active_count:
    while pending and batcher.has_capacity:
      idx, prompt = pending.pop(0)
      # Requests join on top of the once-prefilled system prompt; with
      # --adapter_path, request i serves its own LoRA over the shared base.
      submitted[batcher.add_request(
          prompt, prefix_state=shared_prefix,
          adapters=(adapter_trees[idx % len(adapter_trees)]
                    if adapter_trees else None),
      )] = prompt
    batcher.step(_STEP_CHUNK.value)
    for request_id, tokens, text in batcher.pop_finished():
      generated += len(tokens)
      print(f"\n=== [{request_id}] {submitted[request_id]!r}\n{text}")
  dt = time.perf_counter() - t_start
  print(f"\n[serve] {len(submitted)} requests, {generated} tokens, "
        f"{generated / dt:.1f} tok/s aggregate")


if __name__ == "__main__":
  flags.mark_flags_as_required(["checkpoint_path", "tokenizer_path"])
  app.run(main)
