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


def bench_ours():
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.models import griffin

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
  overhead = measure_sync_overhead()
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
  from cadence_gemma_tpu.ops import quantization

  del s
  qparams = jax.jit(quantization.quantize_params)(params)
  qmodel = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=True
  )
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
  # stay weight-only (bandwidth-bound).
  del sq
  sq_act = sampler_lib.Sampler(
      qmodel, _BenchVocab(), qparams, bucket_prompt_lengths=False,
      prefill_act_quant=True,
  )
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
  act_model = qmodel.clone(act_quant=True)
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
  acc = {
      "int8_logit_rel_err": round(
          float(np.abs(l_int8 - l_bf16).max()) / scale_ref, 5
      ),
      "act_quant_logit_rel_err": round(
          float(np.abs(l_act - l_bf16).max()) / scale_ref, 5
      ),
      "act_quant_vs_int8_logit_rel_err": round(
          float(np.abs(l_act - l_int8).max()) / scale_ref, 5
      ),
  }

  # Long-prompt text prefill: the north-star ratio measured where the
  # prefill dominates the relay's dispatch jitter (see LONG_PROMPT_LENS).
  # Device-amortized (the strictly comparable dispatch-free number) and
  # enqueued (what this relayed environment delivers), bf16 and the
  # pre-registered long-prompt int8 config (act-quant — it wins on MXU
  # compute at every length >= 512 in every recorded run, BASELINE.md).
  long_fields = {}
  for ln in LONG_PROMPT_LENS:
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
  roofline = {
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
  return {
      "tps": tps,
      "ttft_mm": ttft_mm,
      "ttft_text": ttft_text,
      "tps_int8": tps_int8,
      "ttft_mm_int8": ttft_mm_int8,
      "ttft_mm_int8_weightonly": ttft_mm_int8_wo,
      "ttft_text_int8": ttft_text_int8,
      "ttft_text_int8_weightonly": ttft_text_int8_wo,
      **dev,
      **acc,
      **long_fields,
      **roofline,
  }


def bench_speculative_ours():
  """Speculative decoding (int8), delegated to the extended bench harness.

  One definition of the speculative benchmark lives in
  benchmarks/multimodal_bench.py (``spec`` / ``spec_int8`` modes); this
  just maps its result into the headline JSON's field names.
  """
  import importlib.util

  spec = importlib.util.spec_from_file_location(
      "multimodal_bench",
      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "benchmarks", "multimodal_bench.py"),
  )
  mb = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mb)
  r = mb.bench_speculative(int8=True)
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
  enc = vit_lib.DinoSigLIPEncoder(quantized=True, act_quant=True)

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
  ms = max(statistics.median(deltas), 1e-9) * 1e3
  print(f"[bench] vision encoder int8+act: {ms:.2f} ms/image (device)",
        file=sys.stderr)
  return {
      "tower_device_ms_int8_act": round(ms, 2),
      "tower_roofline_ms": round(roofline_ms, 2),
      "tower_roofline_fraction": round(roofline_ms / ms, 3),
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


def bench_serving_slos():
  """Serving tail latency under Poisson load (VERDICT r3 weak #8).

  Drives the production path — ServingFrontend's driver thread with
  Poisson client arrivals on the 2B preset — and reports the
  client-experienced latency percentiles from the frontend's own
  /v1/health metrics, plus aggregate throughput under that load. Defined
  once in benchmarks/multimodal_bench.py (``frontend`` mode); this maps
  its result into headline field names so serving regressions are
  visible round-over-round in BENCH_r{N}.json.
  """
  import importlib.util

  spec = importlib.util.spec_from_file_location(
      "multimodal_bench",
      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "benchmarks", "multimodal_bench.py"),
  )
  mb = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mb)
  r = mb.bench_frontend_serving()
  to_ms = lambda s: round(s * 1e3, 1) if s is not None else None  # noqa: E731
  return {
      # Throughput from the saturating arrival rate; latency percentiles
      # from the ~50%-utilization Poisson run (at saturation TTFT only
      # measures queue drain — that figure is kept as *_saturated_*).
      "serving_tok_s_under_load": r["value"],
      "serving_p50_ttft_ms": to_ms(r["ttft_s_p50"]),
      "serving_p90_ttft_ms": to_ms(r["ttft_s_p90"]),
      "serving_p99_ttft_ms": to_ms(r["ttft_s_p99"]),
      "serving_p50_wall_ms": to_ms(r["wall_s_p50"]),
      "serving_p99_wall_ms": to_ms(r["wall_s_p99"]),
      "serving_saturated_p50_ttft_ms": to_ms(r["saturated_ttft_s_p50"]),
      "serving_saturated_p99_ttft_ms": to_ms(r["saturated_ttft_s_p99"]),
  }


def bench_quant_accuracy():
  """Quantization accuracy on trained-like weight statistics.

  BENCH_r03's logit-error fields were measured on uniform 0.02-scale
  random weights, which overstate relative error (tiny logits) and
  understate argmax margins. This re-measures on a synthetic checkpoint
  with realistic per-tensor statistics (the model's own initializers +
  trained-like norm/embedder perturbations —
  ``checkpoint/synthetic.py``), and adds the metric that matters for
  exact serving: greedy-token agreement over a 255-step decode.
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
  params = synthetic.realistic_params(model, jax.random.PRNGKey(42))
  qparams = jax.jit(quantization.quantize_params)(params)
  qmodel = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=True
  )
  act_model = qmodel.clone(act_quant=True)

  toks = _rand_tokens(2024)
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
  scale = float(np.abs(l_bf16).max()) or 1.0

  def decode_tokens(m, p, label, act=False):
    s = sampler_lib.Sampler(
        m, _BenchVocab(), p, bucket_prompt_lengths=False,
        prefill_act_quant=act,
    )
    state = s.prompt_processing_fn(
        s.params, _rand_tokens(2024), None,
        jnp.full((BATCH,), PROMPT_LEN, jnp.int32),
        DECODE_STEPS, False, False,
    )
    out = s.sample_fn(s.params, state, False)
    toks_out = np.asarray(jax.device_get(out.tokens_buffer))
    print(f"[bench] quant accuracy decode done: {label}", file=sys.stderr)
    return toks_out

  t_bf16 = decode_tokens(model, params, "bf16 (realistic weights)")
  t_int8 = decode_tokens(qmodel, qparams, "int8 (realistic weights)")
  t_act = decode_tokens(
      qmodel, qparams, "int8+act prefill (realistic weights)", act=True
  )
  agree_int8 = synthetic.greedy_token_agreement(t_bf16, t_int8)
  agree_act = synthetic.greedy_token_agreement(t_bf16, t_act)
  return {
      "int8_logit_rel_err_realistic": round(
          float(np.abs(l_int8 - l_bf16).max()) / scale, 5
      ),
      "act_quant_logit_rel_err_realistic": round(
          float(np.abs(l_act - l_bf16).max()) / scale, 5
      ),
      "realistic_logit_scale": round(scale, 3),
      "int8_token_agreement": agree_int8["match_fraction"],
      "int8_token_prefix_match": agree_int8["prefix_match"],
      "act_quant_token_agreement": agree_act["match_fraction"],
      "act_quant_token_prefix_match": agree_act["prefix_match"],
  }


def bench_reference():
  """Runs the reference JAX implementation on the same chip."""
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

    s = ref_sampler.Sampler(model, _BenchVocab(), params)

    def make_args(seed):
      return (_rand_tokens(seed),)

    overhead = measure_sync_overhead()
    tps, ttft = _bench_sampler(
        s, make_args, "reference (text prefill)", overhead
    )
    # Same in-program device-time methodology as ours, reproducing the
    # reference sampler's full-logits prefill semantics.
    dev_ms = _device_prefill_ms(
        _prefill_forward(model, last_logits_only=False), params,
        "reference text prefill (device)",
    )
    # Long-prompt head-to-head (same methodology as ours — the reference
    # prefill materializes the full [b, t, vocab] logits, its sampler's
    # actual semantics).
    long_fields = {}
    for ln in LONG_PROMPT_LENS:
      iters = (2, 6) if ln >= 1024 else (4, 12)
      long_fields[f"ttft_{ln}_ref_device_ms"] = round(_device_prefill_ms(
          _prefill_forward(model, last_logits_only=False, length=ln),
          params, f"reference text prefill {ln} (device)", iters=iters,
          reps=2,
      ), 3)

      def mk(seed, ln=ln):
        return (_rand_tokens(seed, ln),)

      _, t_ref = _bench_sampler(
          s, mk, f"reference (text {ln})", overhead, prompt_len=ln,
          reps=4, blocks=3, measure_decode=False,
      )
      long_fields[f"ttft_{ln}_ref_ms"] = round(t_ref, 2)
    return tps, ttft, dev_ms, long_fields
  finally:
    sys.path.remove("/root/reference")


def main():
  probe_error = _probe_backend()
  if probe_error is not None:
    # An honest failure record beats a hang: value 0 is unmistakably not a
    # measurement, and the error field says why.
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_2b_multimodal",
        "value": 0.0,
        "unit": "tokens/sec/chip",
        "vs_baseline": 0.0,
        "error": f"tpu_relay_unavailable: {probe_error}",
        "notes": (
            "The remote TPU relay did not come up; no measurement was "
            "taken this run. See BASELINE.md for the most recent recorded "
            "numbers from this same benchmark."
        ),
    }))
    return
  # Kernel numerics on the real hardware first (tiling/layout bugs don't
  # show in CPU interpret mode; a kernel can be fast and wrong).
  try:
    import verify_kernels

    kernel_results = verify_kernels.run()
  except Exception as e:
    kernel_results = {
        "kernel_numerics_ok": False, "kernel_check_error": repr(e)[:200]
    }
  ours = bench_ours()
  ours_tps = ours["tps"]
  ours_ttft_ms = ours["ttft_mm"]
  ours_text_ttft_ms = ours["ttft_text"]
  int8_tps = ours["tps_int8"]
  # Two int8 prefill configurations ship (weight-only and int8-activation).
  # The headline picks the PRE-REGISTERED per-shape default (r4 change,
  # closing the r3 best-of-two-noisy-medians advisory): act-quant for the
  # 857-token multimodal prefill (MXU-compute-bound; act-quant won it
  # ~1.5x in every recorded run) and weight-only for the 128-token text
  # prefill (below the length where the compute win beats the extra
  # quantize passes; at 128 tokens the two differ by less than run
  # jitter). Raw per-mode numbers ship alongside; long-prompt text fields
  # use act-quant (its consistent-win regime).
  int8_ttft_ms = ours["ttft_mm_int8"]
  int8_text_ttft_ms = ours["ttft_text_int8_weightonly"]
  try:
    ref_tps, ref_ttft_ms, ref_dev_ms, ref_long = bench_reference()
  except Exception as e:  # Reference may not run in this environment.
    print(f"[bench] reference baseline failed: {e!r}", file=sys.stderr)
    ref_tps, ref_ttft_ms, ref_dev_ms, ref_long = None, None, None, {}
  try:
    spec_results = bench_speculative_ours()
  except Exception as e:
    print(f"[bench] speculative decode failed: {e!r}", file=sys.stderr)
    spec_results = {}
  try:
    quant_acc = bench_quant_accuracy()
  except Exception as e:
    print(f"[bench] quant accuracy failed: {e!r}", file=sys.stderr)
    quant_acc = {}
  try:
    serving_slos = bench_serving_slos()
  except Exception as e:
    print(f"[bench] serving SLOs failed: {e!r}", file=sys.stderr)
    serving_slos = {}
  try:
    tower = bench_tower_roofline()
  except Exception as e:
    print(f"[bench] tower roofline failed: {e!r}", file=sys.stderr)
    tower = {}
  try:
    pp_bubble = bench_pp_bubble()
  except Exception as e:
    print(f"[bench] pp bubble failed: {e!r}", file=sys.stderr)
    pp_bubble = {}

  # Headline: the best decode throughput the framework can serve at (the
  # int8 weight-only path, a capability the reference lacks); bf16 numbers
  # are reported alongside for the like-for-like comparison.
  best_tps = max(ours_tps, int8_tps)
  # Long-prompt ratio fields (the north-star measurement): reference bf16
  # over ours, per length, device-amortized (dispatch-free, strictly
  # comparable) and enqueued (end-to-end on this relay).
  long_prompt = {}
  for ln in LONG_PROMPT_LENS:
    for suffix in ("bf16", "int8"):
      long_prompt[f"ttft_{ln}_{suffix}_device_ms"] = ours.get(
          f"ttft_{ln}_{suffix}_device_ms"
      )
      long_prompt[f"ttft_{ln}_{suffix}_ms"] = ours.get(
          f"ttft_{ln}_{suffix}_ms"
      )
    ref_dev = ref_long.get(f"ttft_{ln}_ref_device_ms") if ref_long else None
    ref_enq = ref_long.get(f"ttft_{ln}_ref_ms") if ref_long else None
    long_prompt[f"ttft_{ln}_ref_device_ms"] = ref_dev
    long_prompt[f"ttft_{ln}_ref_ms"] = ref_enq
    ours_dev = ours.get(f"ttft_{ln}_int8_device_ms")
    ours_dev_bf16 = ours.get(f"ttft_{ln}_bf16_device_ms")
    ours_enq = ours.get(f"ttft_{ln}_int8_ms")
    long_prompt[f"ttft_ratio_{ln}"] = (
        round(ref_dev / ours_dev, 3) if ref_dev and ours_dev else None
    )
    long_prompt[f"ttft_ratio_{ln}_bf16"] = (
        round(ref_dev / ours_dev_bf16, 3)
        if ref_dev and ours_dev_bf16 else None
    )
    long_prompt[f"ttft_ratio_{ln}_enqueued"] = (
        round(ref_enq / ours_enq, 3) if ref_enq and ours_enq else None
    )
  result = {
      "metric": "decode_tokens_per_sec_per_chip_2b_multimodal",
      "bench_schema": 4,
      "value": round(best_tps, 2),
      "unit": "tokens/sec/chip",
      "vs_baseline": round(best_tps / ref_tps, 3) if ref_tps else 1.0,
      "vs_baseline_bf16": round(ours_tps / ref_tps, 3) if ref_tps else 1.0,
      "decode_tps_bf16": round(ours_tps, 2),
      "decode_tps_int8": round(int8_tps, 2),
      "ttft_ms": round(ours_ttft_ms, 2),
      "ttft_ms_int8": round(int8_ttft_ms, 2),
      "ttft_text_ms": round(ours_text_ttft_ms, 2),
      "ttft_text_ms_int8": round(int8_text_ttft_ms, 2),
      "reference_decode_tps": round(ref_tps, 2) if ref_tps else None,
      "reference_text_ttft_ms": (
          round(ref_ttft_ms, 2) if ref_ttft_ms else None
      ),
      "ttft_text_vs_reference": (
          round(ref_ttft_ms / ours_text_ttft_ms, 3)
          if ref_ttft_ms and ours_text_ttft_ms
          else None
      ),
      "ttft_text_int8_vs_reference": (
          round(ref_ttft_ms / int8_text_ttft_ms, 3)
          if ref_ttft_ms and int8_text_ttft_ms
          else None
      ),
      "ttft_ms_int8_weightonly": round(
          ours["ttft_mm_int8_weightonly"], 2
      ),
      "ttft_text_ms_int8_weightonly": round(
          ours["ttft_text_int8_weightonly"], 2
      ),
      "ttft_ms_int8_act": round(ours["ttft_mm_int8"], 2),
      "ttft_text_ms_int8_act": round(ours["ttft_text_int8"], 2),
      "ttft_text_device_ms": ours["ttft_text_device_ms"],
      "ttft_text_int8_device_ms": ours["ttft_text_int8_device_ms"],
      "ttft_mm_int8_device_ms": ours["ttft_mm_int8_device_ms"],
      "reference_text_ttft_device_ms": (
          round(ref_dev_ms, 3) if ref_dev_ms else None
      ),
      "ttft_text_device_vs_reference": (
          round(ref_dev_ms / ours["ttft_text_device_ms"], 3)
          if ref_dev_ms and ours["ttft_text_device_ms"] > 0 else None
      ),
      "ttft_text_int8_device_vs_reference": (
          round(ref_dev_ms / ours["ttft_text_int8_device_ms"], 3)
          if ref_dev_ms and ours["ttft_text_int8_device_ms"] > 0 else None
      ),
      "int8_logit_rel_err": ours["int8_logit_rel_err"],
      "act_quant_logit_rel_err": ours["act_quant_logit_rel_err"],
      "act_quant_vs_int8_logit_rel_err": ours[
          "act_quant_vs_int8_logit_rel_err"
      ],
      **long_prompt,
      "decode_hbm_fraction": ours["decode_hbm_fraction"],
      "prefill_tflops_fraction": ours["prefill_tflops_fraction"],
      "weight_bytes_int8": ours["weight_bytes_int8"],
      "notes": (
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
          "decode_tps_speculative_int8 is greedy self-speculative decoding "
          "(prompt-lookup drafts, exact outputs); its speedup equals the "
          "measured acceptance (spec_tokens_per_verify_step) and is "
          "workload-dependent — the benchmarked prompt is n-gram "
          "predictable, so it shows the mechanism's ceiling. "
          "ttft_ms_int8 / ttft_text_ms_int8 follow the PRE-REGISTERED "
          "per-shape int8 prefill policy (bench_schema 4): act-quant for "
          "multimodal/long prompts (>=512 tokens, where its MXU-compute "
          "win is consistent), weight-only for 128-token text (below "
          "that, the modes differ by less than run jitter). In "
          "BENCH_r03 these same field names were best-of-two-modes and "
          "in r01/r02 act-quant-only; the raw per-mode numbers "
          "*_int8_act / *_weightonly are comparable across all rounds. "
          "ttft_{512,1024,2048}_* are the long-prompt text head-to-head "
          "(same prompt, same methodology, both stacks): ttft_ratio_{L} "
          "= reference bf16 over ours int8-act on the device-amortized "
          "numbers; *_bf16 and *_enqueued variants alongside. "
          "The *_logit_rel_err fields are the measured first-token logit "
          "deltas of each quantization mode vs bf16 on the same prompt. "
          "*_device_ms are in-program loop-amortized prefill times "
          "(varying content per iteration): the relay's ~1.8 ms "
          "per-execution dispatch overhead and run-to-run enqueue jitter "
          "cancel in a 12-vs-4-iteration delta, so these are the "
          "device-compute times a local host would see; the enqueued "
          "ttft_* counterparts above are what THIS relayed environment "
          "delivers end-to-end. The reference device number reproduces "
          "its full-[b,t,vocab]-logits prefill semantics."
      ),
  }
  result.update(kernel_results)
  result.update(spec_results)
  result.update(quant_acc)
  result.update(serving_slos)
  result.update(tower)
  result.update(pp_bubble)
  print(json.dumps(result))


if __name__ == "__main__":
  main()
