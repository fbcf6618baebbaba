"""Headline benchmark: CadenceGemma-2B multimodal decode + TTFT on one chip.

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_per_chip_2b_multimodal",
   "value": <ours>, "unit": "tokens/sec/chip", "vs_baseline": <ours/ref>,
   ...extra diagnostics...}

The baseline is the reference implementation's JAX path
(/root/reference/recurrentgemma/jax) executed in-process on the same chip
with the same parameter tree (the parameter layouts are checkpoint-
compatible by construction). Reference dependencies that the measured path
never calls (sentencepiece, torch2jax, timm) are stubbed; if the reference
cannot run at all, vs_baseline falls back to 1.0.

Note: the reference's *multimodal* path cannot run in this environment at
all (it requires timm/torch CUDA ViTs on the host); its decode loop is
modality-independent, so decode throughput is compared on text decode,
which is identical math. TTFT including on-device image prefill is reported
for our pipeline as ttft_ms; the reference's ttft is text-only prefill of
the same prompt length (a lower bound on its multimodal TTFT).

Methodology: every timed repetition uses distinct random prompts/images and
small random parameters — the serving stack deduplicates byte-identical
dispatches, which would otherwise fake the timings. Synchronization is via
host fetch of a scalar from the computation's output (on the remote-TPU
backend ``block_until_ready`` does not wait); the measured fetch round-trip
overhead is subtracted from TTFT and reported as sync_overhead_ms.
"""

import json
import statistics
import os
import sys
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

try:
  # Persist compiled executables so repeat runs (e.g. the driver's) skip
  # the multi-minute remote compiles of the 2B programs.
  jax.config.update(
      "jax_compilation_cache_dir", "/tmp/cadence_gemma_jax_cache"
  )
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
  pass


def _probe_backend(timeout_s: float = 120.0) -> str | None:
  """Fails fast when the remote TPU relay is down.

  Device initialization on the axon backend HANGS (not errors) while the
  relay is unreachable, which would stall the driver's unattended bench run
  indefinitely. Probe ``jax.devices()`` in a subprocess with a hard
  timeout — the sitecustomize registers the same backend there — and
  return an error string if it cannot come up.
  """
  import subprocess

  try:
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, timeout=timeout_s,
    )
  except subprocess.TimeoutExpired:
    return f"backend init did not complete within {timeout_s:.0f}s"
  if proc.returncode != 0:
    return f"backend init failed: {proc.stderr.strip()[-300:]}"
  return None


def _sync(array) -> None:
  """Forces completion of the program producing ``array`` via a host fetch."""
  np.asarray(jax.device_get(jnp.sum(array)))


def measure_sync_overhead() -> float:
  """Median round-trip cost of dispatch + scalar fetch for a trivial op."""
  f = jax.jit(lambda x: x + 1)
  z = jnp.ones((8, 128))
  _sync(f(z))
  times = []
  for i in range(5):
    t0 = time.perf_counter()
    _sync(f(z + i))
    times.append(time.perf_counter() - t0)
  return statistics.median(times)

PROMPT_LEN = 128
DECODE_STEPS = 256
BATCH = 1
# Long-prompt head-to-head lengths: at 128 tokens the ~1.8 ms relay
# dispatch + multi-ms enqueue jitter can dominate a 4-13 ms prefill; at
# these lengths the prefill itself dominates, so the cross-stack ratio is
# measured where it is statistically meaningful.
LONG_PROMPT_LENS = (512, 1024, 2048)


def _sync_many(arrays) -> None:
  """Forces completion of many arrays with ONE host round trip."""
  jax.device_get(tuple(jnp.sum(a) for a in arrays))


def _device_prefill_ms(forward, params, label, iters=(4, 12), reps=3):
  """In-program amortized prefill time (device compute, dispatch excluded).

  Runs ``forward(params, i)`` — a full prefill whose input content varies
  with ``i`` — inside ONE jitted ``fori_loop`` and times the delta between
  a 12- and a 4-iteration execution of the same program. Per-execution
  relay overhead (~1.8 ms measured on this backend: a matmul costs
  372 us inside a loop program but ~2.2 ms as an individually enqueued
  execution, BASELINE.md) and the sync round trip are fixed costs that
  cancel in the delta, so this is the number a local (non-relayed)
  serving host would see per prefill. Content varies per iteration
  (dedup-safe, CLAUDE.md gotcha 3) and the accumulator consumes logits
  and every cache leaf (DCE/hoist-safe). ``params`` is threaded as an
  explicit jit argument — closing over it would lower the whole weight
  tree as a multi-GB constant block (CLAUDE.md gotcha 8).
  """

  @jax.jit
  def loop(params, n, seed0):
    def body(i, acc):
      return acc + forward(params, seed0 + i)

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

  lo, hi = iters
  _sync(loop(params, jnp.int32(2), jnp.int32(0)))  # compile
  deltas = []
  for rep in range(reps):
    t0 = time.perf_counter()
    _sync(loop(params, jnp.int32(lo), jnp.int32(1000 + 31 * rep)))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(loop(params, jnp.int32(hi), jnp.int32(5000 + 31 * rep)))
    t_big = time.perf_counter() - t0
    deltas.append((t_big - t_small) / (hi - lo))
  ms = max(statistics.median(deltas), 1e-9) * 1e3
  print(
      f"[bench] {label}: {ms:.2f} ms/prefill (in-program)", file=sys.stderr
  )
  return ms


def _prefill_forward(model, with_image=False, config=None,
                     last_logits_only=True, length=None):
  """Builds the per-iteration prefill body for :func:`_device_prefill_ms`.

  ``last_logits_only=False`` reproduces the reference sampler's prefill
  semantics (full [b, t, vocab] logits, then the last position —
  ``/root/reference/recurrentgemma/jax/sampler.py:306-325``); ours uses
  the ``last_logits_only`` fast path.
  """
  length = PROMPT_LEN if length is None else length
  pos = jnp.tile(jnp.arange(length)[None], (BATCH, 1))
  base = _rand_tokens(777, length)
  img_base = None
  if with_image:
    img_base = jax.random.normal(
        jax.random.PRNGKey(4242),
        (BATCH, config.vision_tokens, config.vision_width),
        jnp.bfloat16,
    )

  def forward(params, i):
    toks = 3 + (base + i) % 997
    kwargs = {}
    if with_image:
      kwargs["image"] = img_base * (
          1.0 + 0.001 * i.astype(jnp.bfloat16)
      )
    if last_logits_only:
      kwargs["last_logits_only"] = True
    logits, cache = model.apply({"params": params}, toks, pos, **kwargs)
    if not last_logits_only:
      logits = logits[:, -1]
    acc = logits.astype(jnp.float32).mean()
    for leaf in jax.tree_util.tree_leaves(cache):
      acc = acc + leaf.astype(jnp.float32).mean()
    return acc

  return forward
VOCAB_SIZE = 256_000


class _BenchVocab:
  """Protocol-compatible vocab; EOS never fires during benchmark decode."""

  def pad_id(self):
    return 0

  def bos_id(self):
    return 2

  def eos_id(self):
    return 1

  def EncodeAsIds(self, text):  # noqa: N802
    return [(3 + (i % 1000)) for i in range(len(text.split()))]

  def DecodeIds(self, ids):  # noqa: N802
    return " ".join(str(i) for i in ids)


def _random_params_like(shapes, scale=0.02):
  """Small random params so activations (and caches) are content-dependent."""
  leaves, treedef = jax.tree_util.tree_flatten(shapes)

  @jax.jit
  def build():
    out = []
    for i, s in enumerate(leaves):
      key = jax.random.PRNGKey(i)
      out.append(
          (scale * jax.random.normal(key, s.shape, jnp.float32)).astype(
              s.dtype
          )
      )
    return out

  return jax.tree_util.tree_unflatten(treedef, build())


def _rand_tokens(seed, length=None):
  length = PROMPT_LEN if length is None else length
  return jax.random.randint(
      jax.random.PRNGKey(seed), (BATCH, length), 3, 1000, jnp.int32
  )


def _bench_sampler(s, make_prefill_args, label, sync_overhead,
                   prompt_len=None, reps=8, blocks=5,
                   measure_decode=True):
  """Times prefill (TTFT) and the decode while-loop for a sampler."""
  prompt_len = PROMPT_LEN if prompt_len is None else prompt_len

  def prefill(seed, sync=True):
    args = tuple(jax.device_put(a) for a in make_prefill_args(seed))
    extra = tuple(jax.device_put(e) for e in make_extra(seed))
    # Fresh every call: the jitted prefill donates its token/length inputs.
    input_lengths = jnp.full((BATCH,), prompt_len, jnp.int32)
    # Pre-stage inputs so staging isn't part of the timed region.
    _sync_many(args + extra)
    t0 = time.perf_counter()
    state = s.prompt_processing_fn(
        s.params, *args, None, input_lengths, DECODE_STEPS, False, False,
        *extra,
    )
    if sync:
      # tokens_buffer depends on the sampled first token (i.e. the full
      # forward); positions would complete early on per-buffer backends.
      _sync(state.tokens_buffer)
    return state, time.perf_counter() - t0

  make_extra = getattr(make_prefill_args, "extra", lambda seed: ())

  prefill(0)  # compile
  # Amortized TTFT: enqueue N distinct prefills back-to-back (the device
  # executes them serially), sync once at the end. This removes the ~30 ms
  # per-call round-trip noise of the remote backend from the measurement.
  # One amortized block still drifts ±1-2 ms between bench runs on this
  # shared relay (queueing spikes are strictly additive), so measure
  # several blocks and report the median. Staging syncs once per block
  # (one fused fetch), not once per buffer.
  block_ttfts = []
  for block in range(blocks):
    staged = []
    for rep in range(reps):
      seed = 1 + block * reps + rep
      args = tuple(jax.device_put(a) for a in make_prefill_args(seed))
      extra = tuple(jax.device_put(e) for e in make_extra(seed))
      staged.append((args, extra))
    _sync_many([a for args, extra in staged for a in args + extra])
    t0 = time.perf_counter()
    states = [
        s.prompt_processing_fn(
            s.params, *args, None,
            jnp.full((BATCH,), prompt_len, jnp.int32),
            DECODE_STEPS, False, False, *extra,
        )
        for args, extra in staged
    ]
    _sync(states[-1].tokens_buffer)
    block_ttfts.append(
        max((time.perf_counter() - t0 - sync_overhead) / reps, 1e-9)
    )
    del states
  ttft = statistics.median(block_ttfts)

  if not measure_decode:
    print(f"[bench] {label}: ttft {ttft * 1e3:.1f} ms", file=sys.stderr)
    return None, ttft * 1e3

  def decode(st):
    t0 = time.perf_counter()
    out = s.sample_fn(s.params, st, False)
    _sync(out.step)
    return time.perf_counter() - t0

  decode(prefill(100)[0])  # compile
  times = []
  for rep in range(5):
    st, _ = prefill(200 + rep)
    times.append(decode(st))
  decode_time = max(statistics.median(times) - sync_overhead, 1e-9)
  tps = (DECODE_STEPS - 1) / decode_time
  print(
      f"[bench] {label}: decode {tps:.1f} tok/s, ttft {ttft * 1e3:.1f} ms",
      file=sys.stderr,
  )
  return tps, ttft * 1e3


# Enqueued (end-to-end on this relay) long-prompt variants are measured at
# these lengths only; 1024 keeps its device-amortized fields (the ratio
# that matters) but drops the 3 extra enqueued compiles (VERDICT-r4 #7).
LONG_ENQUEUED_LENS = (512, 2048)


def build_ours_context():
  """Model/params/sampler state shared by the ours_* phases."""
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1, vocab_size=VOCAB_SIZE
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens = jnp.ones((BATCH, 8), jnp.int32)
  pos = jnp.tile(jnp.arange(8)[None], (BATCH, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens, pos)
  )
  params = _random_params_like(shapes)["params"]
  qparams = jax.jit(quantization.quantize_params)(params)
  qmodel = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=True
  )
  return {
      "config": config,
      "model": model,
      "params": params,
      "qmodel": qmodel,
      "qparams": qparams,
      "act_model": qmodel.clone(act_quant=True),
      "overhead": measure_sync_overhead(),
  }


def bench_ours_core(ctx):
  """Decode throughput + 128-token TTFTs + roofline for our stack."""
  from cadence_gemma_tpu.inference import sampler as sampler_lib

  config, model, params = ctx["config"], ctx["model"], ctx["params"]
  qmodel, qparams = ctx["qmodel"], ctx["qparams"]
  act_model, overhead = ctx["act_model"], ctx["overhead"]

  s = sampler_lib.Sampler(
      model, _BenchVocab(), params, bucket_prompt_lengths=False
  )

  def make_args(seed):
    return (_rand_tokens(seed),)

  def make_extra(seed):
    img = jax.random.normal(
        jax.random.PRNGKey(10_000 + seed),
        (BATCH, config.vision_tokens, config.vision_width),
        jnp.bfloat16,
    )
    return (img,)

  make_args.extra = make_extra
  tps, ttft_mm = _bench_sampler(
      s, make_args, "ours (multimodal prefill)", overhead
  )

  def make_args_text(seed):
    return (_rand_tokens(seed),)

  _, ttft_text = _bench_sampler(
      s, make_args_text, "ours (text prefill)", overhead
  )

  # int8 weight-only quantized decode: halves the weight bytes streamed per
  # step, so bandwidth-bound decode should nearly double.
  del s
  sq = sampler_lib.Sampler(
      qmodel, _BenchVocab(), qparams, bucket_prompt_lengths=False
  )
  make_args_text.extra = make_extra
  tps_int8, ttft_mm_int8_wo = _bench_sampler(
      sq, make_args_text, "ours int8 weight-only (multimodal prefill)",
      overhead,
  )

  def make_args_text_only(seed):
    return (_rand_tokens(seed),)

  _, ttft_text_int8_wo = _bench_sampler(
      sq, make_args_text_only, "ours int8 weight-only (text prefill)",
      overhead,
  )

  # int8 *activation* prefill (int8 x int8 MXU matmuls): prefill of a long
  # (especially multimodal, 857-token) prompt is MXU-compute-bound at bf16
  # peak; int8 doubles the MXU rate. Decode steps inside the same sampler
  # stay weight-only (bandwidth-bound). Kept in ctx for the long-prompt
  # phase.
  del sq
  sq_act = sampler_lib.Sampler(
      qmodel, _BenchVocab(), qparams, bucket_prompt_lengths=False,
      prefill_act_quant=True,
  )
  ctx["sq_act"] = sq_act
  make_args_text2 = lambda seed: (_rand_tokens(seed),)
  make_args_text2.extra = make_extra
  _, ttft_mm_int8 = _bench_sampler(
      sq_act, make_args_text2, "ours int8+act (multimodal prefill)", overhead
  )
  _, ttft_text_int8 = _bench_sampler(
      sq_act, make_args_text_only, "ours int8+act (text prefill)", overhead
  )

  # Accuracy delta of the act-quant prefill: first-token logits vs the
  # weight-only int8 prefill and vs bf16, same prompt/params.
  toks = _rand_tokens(999)
  pos = jnp.tile(jnp.arange(PROMPT_LEN)[None], (BATCH, 1))

  def first_logits(m, p):
    f = jax.jit(
        lambda p_, t: m.apply(
            {"params": p_}, t, pos, return_cache=False,
            last_logits_only=True,
        )[0]
    )
    return np.asarray(jax.device_get(f(p, toks)), np.float32)

  l_bf16 = first_logits(model, params)
  l_int8 = first_logits(qmodel, qparams)
  l_act = first_logits(act_model, qparams)

  # Device-compute TTFT (dispatch overhead excluded — see
  # _device_prefill_ms): the per-prefill time a local serving host sees.
  dev = {
      "ttft_text_device_ms": round(_device_prefill_ms(
          _prefill_forward(model), params,
          "ours bf16 text prefill (device)",
      ), 3),
      "ttft_text_int8_device_ms": round(_device_prefill_ms(
          _prefill_forward(act_model), qparams,
          "ours int8+act text prefill (device)",
      ), 3),
      "ttft_mm_int8_device_ms": round(_device_prefill_ms(
          _prefill_forward(act_model, with_image=True, config=config),
          qparams,
          "ours int8+act multimodal prefill (device)",
      ), 3),
  }
  scale_ref = float(np.abs(l_bf16).max()) or 1.0

  # Roofline health fields (machine-checkable versions of the BASELINE.md
  # analyses): decode is weight-bandwidth-bound — fraction of the 819 GB/s
  # HBM paper rate the int8 decode step streams its weight bytes at;
  # prefill is MXU-compute-bound — fraction of the 197 TFLOP/s bf16 peak
  # the device-amortized bf16 prefill sustains (matmul FLOPs only: the
  # vocab projection runs once per prefill under last_logits_only).
  weight_bytes = sum(
      leaf.size * leaf.dtype.itemsize
      for leaf in jax.tree_util.tree_leaves(qparams)
  )
  embed_params = config.vocab_size * config.width
  matmul_params = sum(
      leaf.size for leaf in jax.tree_util.tree_leaves(params)
  ) - embed_params
  prefill_flops = 2.0 * (
      matmul_params * PROMPT_LEN + embed_params * 1
  )
  best_tps = max(tps, tps_int8)
  # Headline TTFT fields follow the PRE-REGISTERED per-shape int8 prefill
  # policy (bench_schema 4+): act-quant for multimodal/long prompts
  # (MXU-compute-bound), weight-only for 128-token text.
  return {
      "value": round(best_tps, 2),
      "decode_tps_bf16": round(tps, 2),
      "decode_tps_int8": round(tps_int8, 2),
      "ttft_ms": round(ttft_mm, 2),
      "ttft_ms_int8": round(ttft_mm_int8, 2),
      "ttft_text_ms": round(ttft_text, 2),
      "ttft_text_ms_int8": round(ttft_text_int8_wo, 2),
      "ttft_ms_int8_weightonly": round(ttft_mm_int8_wo, 2),
      "ttft_text_ms_int8_weightonly": round(ttft_text_int8_wo, 2),
      "ttft_ms_int8_act": round(ttft_mm_int8, 2),
      "ttft_text_ms_int8_act": round(ttft_text_int8, 2),
      **dev,
      "int8_logit_rel_err": round(
          float(np.abs(l_int8 - l_bf16).max()) / scale_ref, 5
      ),
      "act_quant_logit_rel_err": round(
          float(np.abs(l_act - l_bf16).max()) / scale_ref, 5
      ),
      "act_quant_vs_int8_logit_rel_err": round(
          float(np.abs(l_act - l_int8).max()) / scale_ref, 5
      ),
      "decode_hbm_fraction": round(
          (weight_bytes * tps_int8) / 819e9, 3
      ) if tps_int8 else None,
      "prefill_tflops_fraction": round(
          prefill_flops
          / (dev["ttft_text_device_ms"] * 1e-3)
          / 197e12,
          3,
      ) if dev["ttft_text_device_ms"] > 0 else None,
      "weight_bytes_int8": int(weight_bytes),
  }


def bench_ours_long(ctx, ln):
  """One long-prompt length for our stack (the north-star lengths).

  Ran as its own phase PER LENGTH (incremental artifact granularity).
  Device-amortized (the strictly comparable dispatch-free number) at
  every length; enqueued (what this relayed environment delivers) at
  LONG_ENQUEUED_LENS only. bf16 and the pre-registered long-prompt int8
  config (act-quant — it wins on MXU compute at every length >= 512 in
  every recorded run, BASELINE.md).
  """
  from cadence_gemma_tpu.inference import sampler as sampler_lib

  model, params = ctx["model"], ctx["params"]
  qparams, act_model = ctx["qparams"], ctx["act_model"]
  sq_act, overhead = ctx["sq_act"], ctx["overhead"]

  long_fields = {}
  iters, reps_dev = ((2, 6), 2) if ln >= 1024 else ((4, 12), 2)
  long_fields[f"ttft_{ln}_bf16_device_ms"] = round(_device_prefill_ms(
      _prefill_forward(model, length=ln), params,
      f"ours bf16 text prefill {ln} (device)", iters=iters, reps=reps_dev,
  ), 3)
  long_fields[f"ttft_{ln}_int8_device_ms"] = round(_device_prefill_ms(
      _prefill_forward(act_model, length=ln), qparams,
      f"ours int8+act text prefill {ln} (device)", iters=iters,
      reps=reps_dev,
  ), 3)
  if ln in LONG_ENQUEUED_LENS:

    def mk(seed, ln=ln):
      return (_rand_tokens(seed, ln),)

    s_long = sampler_lib.Sampler(
        model, _BenchVocab(), params, bucket_prompt_lengths=False
    )
    _, t_bf16 = _bench_sampler(
        s_long, mk, f"ours bf16 (text {ln})", overhead, prompt_len=ln,
        reps=4, blocks=3, measure_decode=False,
    )
    del s_long
    _, t_act = _bench_sampler(
        sq_act, mk, f"ours int8+act (text {ln})", overhead, prompt_len=ln,
        reps=4, blocks=3, measure_decode=False,
    )
    long_fields[f"ttft_{ln}_bf16_ms"] = round(t_bf16, 2)
    long_fields[f"ttft_{ln}_int8_ms"] = round(t_act, 2)
  return long_fields


def bench_speculative_ours():
  """Speculative decoding (int8), delegated to the extended bench harness.

  One definition of the speculative benchmark lives in
  benchmarks/multimodal_bench.py (``spec`` / ``spec_int8`` modes); this
  just maps its result into the headline JSON's field names.
  """
  r = _load_multimodal_bench().bench_speculative(int8=True)
  return {
      "decode_tps_speculative_int8": r["value"],
      "spec_tokens_per_verify_step": r["tokens_per_verify_step"],
      "spec_speedup_vs_plain_decode": r["speedup_vs_plain"],
  }


def bench_tower_roofline():
  """Vision encoder device time + fraction of its compute roofline.

  Loop-delta (dispatch-free) device time of the full DinoSigLIP encoder
  in the int8+act serving configuration, against the CORRECTED bf16
  compute roofline (~1.04 TFLOP / 197 TFLOP/s ≈ 5.3 ms — r3's 530 GFLOP
  figure dropped the multiply-accumulate factor of 2). The full per-op
  breakdown lives in ``multimodal_bench.py vision_breakdown``.
  """
  from cadence_gemma_tpu.models import vit as vit_lib
  from cadence_gemma_tpu.ops import quantization

  # Exact contraction FLOPs of the two towers (2*M*K*N each).
  total = 0.0
  for cfg, t in ((vit_lib.DINOV2_LARGE_REG4_384, 734),
                 (vit_lib.SIGLIP_SO400M_384, 729)):
    d, m = cfg.embed_dim, cfg.mlp_hidden_dim
    h, hd = cfg.num_heads, cfg.embed_dim // cfg.num_heads
    per_block = (
        2 * t * d * (3 * d) + 2 * t * d * d + 2 * 2 * t * d * m
        + 2 * 2 * h * t * hd * t
    )
    total += (cfg.output_layer + 1) * per_block
    total += 2 * t * (3 * cfg.patch_size**2) * d  # patch embed
  roofline_ms = total / 197e12 * 1e3

  pixels0 = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 384, 384))
  shapes = jax.eval_shape(
      lambda: vit_lib.DinoSigLIPEncoder().init(jax.random.PRNGKey(1),
                                               pixels0)
  )
  leaves, treedef = jax.tree_util.tree_flatten(shapes)

  @jax.jit
  def build():
    return [
        (0.02 * jax.random.normal(jax.random.PRNGKey(i), s.shape)).astype(
            s.dtype
        )
        for i, s in enumerate(leaves)
    ]

  params = jax.tree_util.tree_unflatten(treedef, build())["params"]
  qparams = jax.jit(quantization.quantize_params)(params)

  def measure(enc):
    def enc_fn(i, p_, px):
      px = px * (1 + 1e-6 * i.astype(px.dtype))
      return enc.apply({"params": p_}, px).astype(jnp.float32).mean()

    @jax.jit
    def loop(p_, px, n, seed0):
      def body(i, acc):
        return acc + enc_fn(seed0 + i, p_, px)

      return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    _sync(loop(qparams, pixels0, jnp.int32(1), jnp.int32(0)))  # compile
    deltas = []
    for rep in range(2):
      t0 = time.perf_counter()
      _sync(loop(qparams, pixels0, jnp.int32(2), jnp.int32(1000 + rep)))
      t_small = time.perf_counter() - t0
      t0 = time.perf_counter()
      _sync(loop(qparams, pixels0, jnp.int32(8), jnp.int32(5000 + rep)))
      t_big = time.perf_counter() - t0
      deltas.append((t_big - t_small) / 6)
    return max(statistics.median(deltas), 1e-9) * 1e3

  # Same-process A/B (the only method that produced stable orderings on
  # this chip, BASELINE.md §Vision-r4): the r4 serving config vs the r5
  # bf16-resident-softmax variant (VERDICT-r4 next #4a).
  ms = measure(vit_lib.DinoSigLIPEncoder(quantized=True, act_quant=True))
  ms_sm16 = measure(vit_lib.DinoSigLIPEncoder(
      quantized=True, act_quant=True, softmax_bf16=True
  ))
  best = min(ms, ms_sm16)
  print(f"[bench] vision encoder int8+act: {ms:.2f} ms/image, "
        f"+softmax_bf16: {ms_sm16:.2f} ms/image (device)",
        file=sys.stderr)
  return {
      "tower_device_ms_int8_act": round(ms, 2),
      "tower_device_ms_int8_act_sm16": round(ms_sm16, 2),
      "tower_roofline_ms": round(roofline_ms, 2),
      "tower_roofline_fraction": round(roofline_ms / best, 3),
  }


def bench_pp_bubble():
  """Interleaved-vs-GPipe pipeline wall-clock (VERDICT r3 next #8).

  The pipeline needs a multi-device mesh, so this runs
  ``tools/pp_bubble_bench.py`` in a SUBPROCESS on the 8-virtual-CPU-device
  mesh (the same environment the multichip dryrun uses) and merges its
  one-line JSON. The TPU stays idle meanwhile; expect ~4-8 min of CPU
  compile+run time.
  """
  import subprocess

  env = dict(os.environ)
  env.update({
      "PALLAS_AXON_POOL_IPS": "",
      "JAX_PLATFORMS": "cpu",
      "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
      "PYTHONPATH": os.path.dirname(os.path.abspath(__file__)),
  })
  out = subprocess.run(
      [sys.executable,
       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "tools", "pp_bubble_bench.py")],
      env=env, capture_output=True, text=True, timeout=1500, check=True,
  )
  r = json.loads(out.stdout.strip().splitlines()[-1])
  print(f"[bench] pp bubble: v2/v1 wall ratio "
        f"{r['pp_time_ratio_v2_over_v1']} (predicted "
        f"{r['pp_predicted_ratio']})", file=sys.stderr)
  return r


def _load_multimodal_bench():
  import importlib.util

  spec = importlib.util.spec_from_file_location(
      "multimodal_bench",
      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "benchmarks", "multimodal_bench.py"),
  )
  mb = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mb)
  return mb


def bench_serving_slos():
  """Serving tail latency under Poisson load, PRODUCTION configuration.

  r4 measured SLOs on a non-production config (bf16, 4 slots) and its
  tail was queueing behind those slots (VERDICT-r4 weak #3). This drives
  the config the framework would actually ship — int8 weights, 8 decode
  slots (the batched-decode sweet spot) — through ServingFrontend's
  driver thread with Poisson client arrivals, at a SELF-CALIBRATED 50%
  of the capacity measured in the same process, plus a speculative-
  batcher variant at low concurrency. Defined once in
  benchmarks/multimodal_bench.py (``frontend`` mode); this maps its
  result into headline field names so serving regressions are visible
  round-over-round in BENCH_r{N}.json.
  """
  r = _load_multimodal_bench().bench_frontend_serving()
  to_ms = lambda s: round(s * 1e3, 1) if s is not None else None  # noqa: E731
  return {
      # Throughput from the saturating arrival rate; latency percentiles
      # from the 50%-of-measured-capacity Poisson run (at saturation TTFT
      # only measures queue drain — that figure is kept as *_saturated_*).
      "serving_tok_s_under_load": r["value"],
      "serving_config": r.get("config"),
      "serving_p50_ttft_ms": to_ms(r["ttft_s_p50"]),
      "serving_p90_ttft_ms": to_ms(r["ttft_s_p90"]),
      "serving_p99_ttft_ms": to_ms(r["ttft_s_p99"]),
      "serving_p50_wall_ms": to_ms(r["wall_s_p50"]),
      "serving_p99_wall_ms": to_ms(r["wall_s_p99"]),
      "serving_saturated_p50_ttft_ms": to_ms(r["saturated_ttft_s_p50"]),
      "serving_saturated_p99_ttft_ms": to_ms(r["saturated_ttft_s_p99"]),
      "serving_slo_interarrival_s": r.get("slo_interarrival_s"),
      "serving_idle_boost_steps": r.get("idle_boost_steps"),
      "serving_idle_p50_ttft_ms": to_ms(r.get("idle_ttft_s_p50")),
      "serving_idle_p90_ttft_ms": to_ms(r.get("idle_ttft_s_p90")),
      "serving_idle_p99_ttft_ms": to_ms(r.get("idle_ttft_s_p99")),
      "serving_spec_p50_ttft_ms": to_ms(r.get("spec_ttft_s_p50")),
      "serving_spec_p99_ttft_ms": to_ms(r.get("spec_ttft_s_p99")),
      "serving_spec_p50_wall_ms": to_ms(r.get("spec_wall_s_p50")),
  }


def bench_real_weights_validation(timeout_s=900):
  """Machine-readable record of the real-trained-weights validation gap.

  The reference's quality story (Kaggle 2B/9B orbax weights, timm
  pretrained ViTs, GSM8K 19.33%) has never flowed through this framework
  because downloads are environment-blocked (VERDICT-r4 missing #1).
  Each bench run attempts `tools/validate_real_weights.py` if a real
  checkpoint is present (CADENCE_REAL_WEIGHTS_DIR, or conventional
  paths) and otherwise records the blocker in the artifact instead of
  staying silent.
  """
  import subprocess

  root = os.environ.get("CADENCE_REAL_WEIGHTS_DIR", "")
  candidates = [root] if root else [
      "/root/weights", "/root/checkpoints", "/root/real_weights",
  ]
  found = next(
      (c for c in candidates if c and os.path.isdir(c)), None
  )
  if found is None:
    return {"real_weights_validation": (
        "blocked: no real trained checkpoint in this environment "
        "(downloads are blocked; set CADENCE_REAL_WEIGHTS_DIR to a dir "
        "with the Kaggle 2b-it orbax checkpoint + tokenizer.model to "
        "run tools/validate_real_weights.py). The no-download stand-in "
        "— realistic-statistics synthetic weights — runs as the "
        "quant_accuracy phase."
    )}
  tok = os.path.join(found, "tokenizer.model")
  ckpt = next(
      (os.path.join(found, d) for d in sorted(os.listdir(found))
       if os.path.isdir(os.path.join(found, d))), None,
  )
  if not os.path.isfile(tok) or ckpt is None:
    return {"real_weights_validation": (
        f"blocked: {found} exists but no tokenizer.model + checkpoint "
        "subdir layout recognized"
    )}
  try:
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tools", "validate_real_weights.py"),
         f"--lm_checkpoint={ckpt}", f"--tokenizer={tok}", "--limit=50"],
        capture_output=True, text=True, timeout=timeout_s,
    )
  except subprocess.TimeoutExpired:
    return {"real_weights_validation":
            f"attempted: timed out after {timeout_s}s"}
  tail = (proc.stdout + proc.stderr).strip()[-400:]
  status = "pass" if proc.returncode == 0 else f"fail(rc={proc.returncode})"
  return {"real_weights_validation": f"{status}: {tail}"}


def _per_row_agreement(a: np.ndarray, b: np.ndarray):
  """Per-prompt greedy-agreement stats between two [n, t] token buffers.

  Returns (match_fraction[n], prefix_match[n], first_divergence[n]) where
  first_divergence is -1 for rows that never diverge.
  """
  n = min(a.shape[1], b.shape[1])
  eq = a[:, :n] == b[:, :n]
  match = eq.mean(axis=1)
  all_eq = eq.all(axis=1)
  first_div = np.where(all_eq, -1, np.argmax(~eq, axis=1))
  prefix = np.where(all_eq, 1.0, first_div / max(n, 1))
  return match, prefix, first_div


def bench_quant_accuracy(n_prompts=16, seeds=(42, 1337)):
  """Quantization accuracy on trained-like weight statistics.

  r4 measured greedy-token agreement on ONE prompt from ONE synthetic
  seed — rare-event statistics (argmax flips) need more support
  (VERDICT-r4 weak #4). This decodes ``n_prompts`` distinct prompts as
  ONE batched greedy decode per (variant, seed) — the batch rows are
  independent generations, so one compiled program covers all prompts —
  across ``len(seeds)`` realistic-statistics synthetic checkpoints
  (``checkpoint/synthetic.py``; trained-like per-tensor statistics, the
  no-download stand-in for real weights). Reports min/mean agreement and
  the first-divergence step per prompt, plus the first-token logit
  errors. Compiled programs are reused across seeds (params enter as an
  argument).
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.checkpoint import synthetic
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1, vocab_size=VOCAB_SIZE
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  qmodel = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=True
  )
  act_model = qmodel.clone(act_quant=True)

  def prompts():
    return jax.random.randint(
        jax.random.PRNGKey(2024), (n_prompts, PROMPT_LEN), 3, 1000,
        jnp.int32,
    )

  pos = jnp.tile(jnp.arange(PROMPT_LEN)[None], (n_prompts, 1))

  def first_logits(m, p):
    f = jax.jit(
        lambda p_, t: m.apply(
            {"params": p_}, t, pos, return_cache=False,
            last_logits_only=True,
        )[0]
    )
    return np.asarray(jax.device_get(f(p, prompts())), np.float32)

  samplers = {}  # variant -> Sampler (compiled once, reused across seeds)

  def decode_tokens(key, m, p, act=False):
    if key not in samplers:
      samplers[key] = sampler_lib.Sampler(
          m, _BenchVocab(), p, bucket_prompt_lengths=False,
          prefill_act_quant=act,
      )
    s = samplers[key]
    # Params flow in as an explicit argument; drop the constructor-time
    # reference so at most one seed's trees are device-resident.
    s.params = p
    state = s.prompt_processing_fn(
        p, prompts(), None,
        jnp.full((n_prompts,), PROMPT_LEN, jnp.int32),
        DECODE_STEPS, False, False,
    )
    out = s.sample_fn(p, state, False)
    toks_out = np.asarray(jax.device_get(out.tokens_buffer))
    print(f"[bench] quant accuracy decode done: {key}", file=sys.stderr)
    return toks_out

  stats = {"int8": [], "act": []}  # per-variant (match, prefix, first_div)
  logit_errs = {"int8": [], "act": []}
  scale = None
  for seed in seeds:
    params = synthetic.realistic_params(model, jax.random.PRNGKey(seed))
    qparams = jax.jit(quantization.quantize_params)(params)
    l_bf16 = first_logits(model, params)
    l_int8 = first_logits(qmodel, qparams)
    l_act = first_logits(act_model, qparams)
    s_ = float(np.abs(l_bf16).max()) or 1.0
    scale = s_ if scale is None else scale
    logit_errs["int8"].append(float(np.abs(l_int8 - l_bf16).max()) / s_)
    logit_errs["act"].append(float(np.abs(l_act - l_bf16).max()) / s_)

    t_bf16 = decode_tokens("bf16", model, params)
    t_int8 = decode_tokens("int8", qmodel, qparams)
    t_act = decode_tokens("act", qmodel, qparams, act=True)
    stats["int8"].append(_per_row_agreement(t_bf16, t_int8))
    stats["act"].append(_per_row_agreement(t_bf16, t_act))
    for s in samplers.values():
      s.params = None  # free this seed's trees before building the next
    del params, qparams

  def fields(key, prefix_name):
    match = np.concatenate([m for m, _, _ in stats[key]])
    pref = np.concatenate([p for _, p, _ in stats[key]])
    fdiv = np.concatenate([d for _, _, d in stats[key]])
    return {
        f"{prefix_name}_token_agreement": round(float(match.mean()), 4),
        f"{prefix_name}_token_agreement_min": round(float(match.min()), 4),
        f"{prefix_name}_token_agreement_mean": round(float(match.mean()), 4),
        f"{prefix_name}_token_prefix_match": round(float(pref.mean()), 4),
        f"{prefix_name}_token_prefix_match_min": round(float(pref.min()), 4),
        f"{prefix_name}_first_divergence_steps": [int(x) for x in fdiv],
    }

  return {
      "int8_logit_rel_err_realistic": round(
          max(logit_errs["int8"]), 5
      ),
      "act_quant_logit_rel_err_realistic": round(
          max(logit_errs["act"]), 5
      ),
      "realistic_logit_scale": round(scale, 3),
      "quant_accuracy_prompts": int(n_prompts * len(seeds)),
      "quant_accuracy_seeds": list(seeds),
      **fields("int8", "int8"),
      **fields("act", "act_quant"),
  }


def build_reference_context():
  """Loads the reference implementation and builds its model/sampler."""
  # Stub modules the reference imports but the measured path never calls.
  stubs = {
      "sentencepiece": {"SentencePieceProcessor": object},
      "torch2jax": {"j2t": lambda x: x, "t2j": lambda x: x},
      "timm": {},
      "timm.data": {},
      "torchvision": {},
      "torchvision.transforms": {
          "Compose": object, "Resize": object
      },
  }
  for name, attrs in stubs.items():
    if name not in sys.modules:
      mod = types.ModuleType(name)
      for k, v in attrs.items():
        setattr(mod, k, v)
      sys.modules[name] = mod
  # jax 0.9 removed jax._src.lax.control_flow.for_loop; the reference's
  # pallas module imports it at module scope. We only run the reference's
  # LINEAR_NATIVE path, so a named stub suffices.
  import jax._src.lax.control_flow as _cf
  if not hasattr(_cf, "for_loop"):
    _fl = types.ModuleType("jax._src.lax.control_flow.for_loop")
    _fl.for_loop = None
    _cf.for_loop = _fl
    sys.modules["jax._src.lax.control_flow.for_loop"] = _fl
  sys.path.insert(0, "/root/reference")
  try:
    from recurrentgemma import common as ref_common  # noqa: PLC0415
    from recurrentgemma.jax import griffin as ref_griffin  # noqa: PLC0415
    from recurrentgemma.jax import sampler as ref_sampler  # noqa: PLC0415
  finally:
    # Imports are done (modules live in sys.modules); drop the path so it
    # cannot shadow anything for the rest of the run.
    sys.path.remove("/root/reference")

  config = ref_common.GriffinConfig.from_preset(
      ref_common.Preset.RECURRENT_GEMMA_2B_V1, vocab_size=VOCAB_SIZE
  )
  # The reference's Pallas kernel cannot run on current JAX (it imports
  # the removed jax._src.lax.control_flow.for_loop API); its only
  # runnable scan is the native one.
  config = config._replace(scan_type=ref_common.ScanType.LINEAR_NATIVE)
  model = ref_griffin.Griffin(config, gradient_checkpointing=False)
  tokens = jnp.ones((BATCH, 8), jnp.int32)
  pos = jnp.tile(jnp.arange(8)[None], (BATCH, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens, pos)
  )
  params = _random_params_like(shapes)["params"]
  return {
      "model": model,
      "params": params,
      "sampler": ref_sampler.Sampler(model, _BenchVocab(), params),
      "overhead": measure_sync_overhead(),
  }


def bench_reference_core(ctx, result):
  """Reference decode + 128-token head-to-head vs the stored ours fields.

  The ours context is freed before this runs — only its numbers (already
  in ``result``) are needed.
  """
  model, params = ctx["model"], ctx["params"]
  s, overhead = ctx["sampler"], ctx["overhead"]

  def make_args(seed):
    return (_rand_tokens(seed),)

  tps, ttft = _bench_sampler(
      s, make_args, "reference (text prefill)", overhead
  )
  # Same in-program device-time methodology as ours, reproducing the
  # reference sampler's full-logits prefill semantics.
  dev_ms = _device_prefill_ms(
      _prefill_forward(model, last_logits_only=False), params,
      "reference text prefill (device)",
  )
  best_tps = result.get("value") or 0.0
  ours_tps = result.get("decode_tps_bf16")
  ours_text_ttft_ms = result.get("ttft_text_ms")
  int8_text_ttft_ms = result.get("ttft_text_ms_int8")
  ours_text_dev = result.get("ttft_text_device_ms")
  ours_text_int8_dev = result.get("ttft_text_int8_device_ms")
  return {
      "reference_decode_tps": round(tps, 2) if tps else None,
      "reference_text_ttft_ms": round(ttft, 2) if ttft else None,
      "reference_text_ttft_device_ms": (
          round(dev_ms, 3) if dev_ms else None
      ),
      "vs_baseline": round(best_tps / tps, 3) if tps else 1.0,
      "vs_baseline_bf16": (
          round(ours_tps / tps, 3) if tps and ours_tps else 1.0
      ),
      "ttft_text_vs_reference": (
          round(ttft / ours_text_ttft_ms, 3)
          if ttft and ours_text_ttft_ms else None
      ),
      "ttft_text_int8_vs_reference": (
          round(ttft / int8_text_ttft_ms, 3)
          if ttft and int8_text_ttft_ms else None
      ),
      "ttft_text_device_vs_reference": (
          round(dev_ms / ours_text_dev, 3)
          if dev_ms and ours_text_dev else None
      ),
      "ttft_text_int8_device_vs_reference": (
          round(dev_ms / ours_text_int8_dev, 3)
          if dev_ms and ours_text_int8_dev else None
      ),
  }


def bench_reference_long(ctx, result, ln):
  """One long-prompt length: reference measurement + that length's ratios.

  Ran as its own phase PER LENGTH so each ``ttft_ratio_{L}`` lands in the
  incremental artifact the moment it exists — the r4 driver kill happened
  mid-way through exactly this loop (BENCH_r04 tail), which under the old
  all-at-the-end structure lost every ratio. Enqueued variants at
  LONG_ENQUEUED_LENS only.
  """
  model, params = ctx["model"], ctx["params"]
  s, overhead = ctx["sampler"], ctx["overhead"]
  iters = (2, 6) if ln >= 1024 else (4, 12)
  fields = {}
  fields[f"ttft_{ln}_ref_device_ms"] = round(_device_prefill_ms(
      _prefill_forward(model, last_logits_only=False, length=ln),
      params, f"reference text prefill {ln} (device)", iters=iters,
      reps=2,
  ), 3)
  if ln in LONG_ENQUEUED_LENS:

    def mk(seed, ln=ln):
      return (_rand_tokens(seed, ln),)

    _, t_ref = _bench_sampler(
        s, mk, f"reference (text {ln})", overhead, prompt_len=ln,
        reps=4, blocks=3, measure_decode=False,
    )
    fields[f"ttft_{ln}_ref_ms"] = round(t_ref, 2)

  # This length's ratio fields (the north-star measurement): reference
  # bf16 over ours, device-amortized (dispatch-free, strictly comparable)
  # and enqueued (end-to-end on this relay).
  ref_dev = fields.get(f"ttft_{ln}_ref_device_ms")
  ref_enq = fields.get(f"ttft_{ln}_ref_ms")
  ours_dev = result.get(f"ttft_{ln}_int8_device_ms")
  ours_dev_bf16 = result.get(f"ttft_{ln}_bf16_device_ms")
  ours_enq = result.get(f"ttft_{ln}_int8_ms")
  fields[f"ttft_ratio_{ln}"] = (
      round(ref_dev / ours_dev, 3) if ref_dev and ours_dev else None
  )
  fields[f"ttft_ratio_{ln}_bf16"] = (
      round(ref_dev / ours_dev_bf16, 3)
      if ref_dev and ours_dev_bf16 else None
  )
  fields[f"ttft_ratio_{ln}_enqueued"] = (
      round(ref_enq / ours_enq, 3) if ref_enq and ours_enq else None
  )
  return fields


NOTES = (
    "INCREMENTAL ARTIFACT (bench_schema 5): a cumulative headline JSON "
    "line is printed after EVERY phase, most-important-first, so the "
    "last parsed JSON line always carries every field measured so far "
    "even if the process is killed mid-run (BENCH_r04 lost all headline "
    "fields to an rc=124 timeout). completed_phases / skipped_phases / "
    "bench_elapsed_s record coverage; BENCH_BUDGET_S (default 2700 s) "
    "bounds the run — core phases run until the budget is exhausted, "
    "extras (speculative/tower/pp_bubble) only start if their estimate "
    "still fits. "
    "vs_baseline compares our best serving path (int8 weight-only, a "
    "capability the reference lacks) to the reference at bf16; the "
    "apples-to-apples bf16 decode figure is vs_baseline_bf16 (~1.0x — "
    "both are HBM-bandwidth-bound at the same weight bytes/step). "
    "The reference runs its LINEAR_NATIVE scan because its Pallas "
    "kernel imports an API removed in jax 0.9 (scan is <2% of decode "
    "step time, so this does not distort the comparison). ttft_ms "
    "includes on-device image prefill (729 visual tokens); the "
    "reference multimodal path cannot run here (needs timm CUDA "
    "ViTs); reference_text_ttft_ms is its text-only prefill of the "
    "same prompt, directly comparable to ttft_text_ms. "
    "ttft_ms_int8 / ttft_text_ms_int8 follow the PRE-REGISTERED "
    "per-shape int8 prefill policy (since bench_schema 4): act-quant "
    "for multimodal/long prompts (>=512 tokens, where its MXU-compute "
    "win is consistent), weight-only for 128-token text (below that, "
    "the modes differ by less than run jitter); raw per-mode numbers "
    "*_int8_act / *_weightonly ship alongside. "
    "ttft_{512,1024,2048}_* are the long-prompt text head-to-head "
    "(same prompt, same methodology, both stacks): ttft_ratio_{L} "
    "= reference bf16 over ours int8-act on the device-amortized "
    "numbers; *_bf16 variants alongside, *_enqueued at 512/2048 only "
    "(schema 5 trim). *_device_ms are in-program loop-amortized "
    "prefill times (varying content per iteration): the relay's "
    "~1.8 ms per-execution dispatch overhead and enqueue jitter "
    "cancel in an iteration-count delta, so these are the "
    "device-compute times a local host would see; the enqueued ttft_* "
    "counterparts are what THIS relayed environment delivers "
    "end-to-end. The reference device number reproduces its "
    "full-[b,t,vocab]-logits prefill semantics. "
    "int8_token_agreement_* are greedy-token agreement vs bf16 over "
    "quant_accuracy_prompts independent 255-step decodes on "
    "realistic-statistics synthetic checkpoints (multi-prompt, "
    "multi-seed since schema 5; the scalar int8_token_agreement is "
    "their mean, comparable to r4's single-prompt value). "
    "serving_p*_ttft_ms are from the PRODUCTION config (int8 weights, "
    "8 slots) at a self-calibrated 50% of measured capacity — r4's "
    "bf16/4-slot numbers are not directly comparable. "
    "decode_tps_speculative_int8 is greedy self-speculative decoding "
    "(prompt-lookup drafts, exact outputs); its speedup equals the "
    "measured acceptance and is workload-dependent — the benchmarked "
    "prompt is n-gram predictable, so it shows the mechanism's ceiling."
)


def main():
  t_start = time.monotonic()
  budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))
  result = {
      "metric": "decode_tokens_per_sec_per_chip_2b_multimodal",
      "bench_schema": 5,
      "value": 0.0,
      "unit": "tokens/sec/chip",
      "vs_baseline": 1.0,
      "bench_budget_s": budget_s,
      "completed_phases": [],
      "skipped_phases": [],
      "notes": NOTES,
  }

  def emit():
    result["bench_elapsed_s"] = round(time.monotonic() - t_start, 1)
    print(json.dumps(result), flush=True)

  probe_error = _probe_backend()
  if probe_error is not None:
    # An honest failure record beats a hang: value 0 is unmistakably not a
    # measurement, and the error field says why.
    result["vs_baseline"] = 0.0
    result["error"] = f"tpu_relay_unavailable: {probe_error}"
    result["notes"] = (
        "The remote TPU relay did not come up; no measurement was "
        "taken this run. See BASELINE.md for the most recent recorded "
        "numbers from this same benchmark."
    )
    emit()
    return

  ctx = {}

  def phase_kernels():
    # Kernel numerics on the real hardware (tiling/layout bugs don't
    # show in CPU interpret mode; a kernel can be fast and wrong).
    import verify_kernels

    return verify_kernels.run()

  def phase_ours_core():
    ctx.update(build_ours_context())
    return bench_ours_core(ctx)

  ref_ctx = {}

  def phase_reference_core():
    ctx.clear()  # free our params/samplers before the reference's tree
    ref_ctx.update(build_reference_context())
    return bench_reference_core(ref_ctx, result)

  # (name, core, est_s, fn): core phases run whenever any budget remains
  # (each carries fields the round's artifact must have; incremental
  # emission protects against an external kill); extra phases only start
  # if their cold-cache estimate still fits in the budget. Long-prompt
  # lengths are separate phases — each ttft_ratio_{L} lands the moment it
  # is measured — ordered 512, 2048, 1024 (the enqueued-variant lengths
  # first; 1024 is device-only).
  phases = [
      ("kernel_numerics", True, 240, phase_kernels),
      ("real_weights_validation", True, 60, bench_real_weights_validation),
      ("ours_core", True, 600, phase_ours_core),
      ("ours_long_512", True, 150, lambda: bench_ours_long(ctx, 512)),
      ("ours_long_2048", True, 180, lambda: bench_ours_long(ctx, 2048)),
      ("ours_long_1024", True, 90, lambda: bench_ours_long(ctx, 1024)),
      ("reference_core", True, 300, phase_reference_core),
      ("reference_long_512", True, 120,
       lambda: bench_reference_long(ref_ctx, result, 512)),
      ("reference_long_2048", True, 150,
       lambda: bench_reference_long(ref_ctx, result, 2048)),
      ("reference_long_1024", True, 60,
       lambda: bench_reference_long(ref_ctx, result, 1024)),
      ("quant_accuracy", True, 420,
       lambda: (ref_ctx.clear(), bench_quant_accuracy())[1]),
      ("serving_slos", True, 420, bench_serving_slos),
      # Core since schema 5.1: the speculative decode throughput is a
      # headline (3.1-3.3x reference decode) — a cold-compile run must
      # not drop it while extras (tower/pp) still may.
      ("speculative", True, 300, bench_speculative_ours),
      ("tower_roofline", False, 240, bench_tower_roofline),
      ("pp_bubble", False, 360, bench_pp_bubble),
  ]
  for name, core, est_s, fn in phases:
    elapsed = time.monotonic() - t_start
    over = (
        elapsed > budget_s if core else elapsed + est_s > budget_s
    )
    if budget_s > 0 and over:
      result["skipped_phases"].append(name)
      print(f"[bench] SKIP {name}: elapsed {elapsed:.0f}s vs budget "
            f"{budget_s:.0f}s", file=sys.stderr)
      emit()
      continue
    t_phase = time.monotonic()
    try:
      fields = fn()
      if fields:
        result.update(fields)
      result["completed_phases"].append(name)
    except Exception as e:
      print(f"[bench] phase {name} failed: {e!r}", file=sys.stderr)
      result[f"{name}_error"] = repr(e)[:200]
    print(f"[bench] phase {name}: {time.monotonic() - t_phase:.0f}s",
          file=sys.stderr)
    emit()


if __name__ == "__main__":
  main()
