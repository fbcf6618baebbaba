"""Extended benchmarks: vision encoder, batched decode, long-window prefill.

Covers BASELINE.json configs #2 (encoder+projector only) and #4 (batched
multimodal prefill+decode stressing the window cache). Random weights —
these measure compute paths, not model quality. Prints one JSON line per
measurement.

Run on the TPU: python benchmarks/multimodal_bench.py
"""

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

try:
  # Persist compiled executables across runs (same cache as bench.py) —
  # the variant sweeps compile many distinct 300M+ programs.
  jax.config.update(
      "jax_compilation_cache_dir", "/tmp/cadence_gemma_jax_cache"
  )
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
  pass


def _sync(tree):
  for leaf in jax.tree_util.tree_leaves(tree):
    if hasattr(leaf, "dtype"):
      np.asarray(jax.device_get(jnp.sum(leaf)))
      return


def _bench(fn, make_args, reps=5):
  fn(*make_args(0))  # compile
  times = []
  for i in range(reps):
    args = make_args(i + 1)
    for a in jax.tree_util.tree_leaves(args):
      _sync(a)
    t0 = time.perf_counter()
    _sync(fn(*args))
    times.append(time.perf_counter() - t0)
  return statistics.median(times)


def _bench_amortized(fn, make_args, n=16):
  """Per-call time with the relay round-trip amortized over ``n`` calls.

  Enqueues ``n`` calls with distinct inputs (dedup-safe) and syncs once at
  the end — the pattern CLAUDE.md prescribes for sub-100 ms measurements on
  this backend, where a single dispatch+fetch costs ~30 ms.
  """
  _sync(fn(*make_args(0)))  # compile
  t0 = time.perf_counter()
  outs = [fn(*make_args(i + 1)) for i in range(n)]
  _sync(outs[-1])
  return (time.perf_counter() - t0) / n


def bench_vision_encoder():
  """Config #2: image pixels → fused features → projected visual tokens.

  Sweeps the tower execution variants (the VERDICT r2 top item): bf16
  einsum attention (the r2 path), bf16 + flash MHA kernel, int8 weights,
  and int8 weights+activations; also reports per-tower times for the best
  variant. Times are amortized over enqueued calls (CLAUDE.md gotcha #2).
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import modules, vit
  from cadence_gemma_tpu.ops import quantization

  pixels0 = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 384, 384))
  shapes = jax.eval_shape(
      lambda: vit.DinoSigLIPEncoder().init(jax.random.PRNGKey(1), pixels0)
  )
  leaves, treedef = jax.tree_util.tree_flatten(shapes)

  @jax.jit
  def build():
    # Small RANDOM params (not zeros): zero weights baked as constants
    # would let XLA fold the network away; params are also passed as real
    # jit ARGUMENTS below — closing over them bakes GB-sized constant
    # blocks into the lowered program (CLAUDE.md gotcha #8).
    return [
        (0.02 * jax.random.normal(jax.random.PRNGKey(i), s.shape)).astype(
            s.dtype
        )
        for i, s in enumerate(leaves)
    ]

  params = jax.tree_util.tree_unflatten(treedef, build())["params"]
  qparams = jax.jit(quantization.quantize_params)(params)

  connector = modules.VisionLanguageConnector(
      width=2560, expanded_width=common.DEFAULT_VL_EXPANDED_WIDTH
  )
  cshapes = jax.eval_shape(
      lambda: connector.init(
          jax.random.PRNGKey(2), jnp.zeros((1, 729, 2176), jnp.bfloat16)
      )
  )
  cleaves, ctreedef = jax.tree_util.tree_flatten(cshapes)

  @jax.jit
  def cbuild():
    return [
        (0.02 * jax.random.normal(jax.random.PRNGKey(100 + i),
                                  s.shape)).astype(s.dtype)
        for i, s in enumerate(cleaves)
    ]

  cparams = jax.tree_util.tree_unflatten(ctreedef, cbuild())["params"]

  def make_px(seed):
    return jax.random.uniform(jax.random.PRNGKey(seed), (1, 3, 384, 384))

  variants = {
      "bf16_einsum": (dict(), params),  # default path (einsum attention)
      "bf16_flash": (dict(use_flash_attention=True), params),
      "int8_einsum": (dict(quantized=True), qparams),
      "int8_act_einsum": (dict(quantized=True, act_quant=True), qparams),
      "int8_act_flash": (
          dict(quantized=True, act_quant=True, use_flash_attention=True),
          qparams,
      ),
      # r5: bf16-resident softmax logits (fp32 accumulation) — targets the
      # fp32 [n,t,t] logits round trip, the towers' largest non-matmul
      # cost (VERDICT-r4 next #4a).
      "int8_act_sm16": (
          dict(quantized=True, act_quant=True, softmax_bf16=True),
          qparams,
      ),
  }
  results = {}
  for name, (kwargs, p) in variants.items():
    encoder = vit.DinoSigLIPEncoder(**kwargs)

    @jax.jit
    def encode_and_project(p_, cp_, px, _encoder=encoder):
      feats = _encoder.apply({"params": p_}, px)
      return connector.apply({"params": cp_}, feats)

    dt = _bench_amortized(
        encode_and_project, lambda seed: (p, cparams, make_px(seed)), n=8
    )
    results[f"{name}_ms"] = round(dt * 1e3, 2)

  # Per-tower breakdown for the int8+act variant (and bf16 for contrast).
  for tower, tcfg in (("dino", vit.DINOV2_LARGE_REG4_384),
                      ("siglip", vit.SIGLIP_SO400M_384)):
    for label, kwargs, p in (
        ("bf16", dict(), params),
        ("bf16_flash", dict(use_flash_attention=True), params),
        ("int8_act", dict(quantized=True, act_quant=True), qparams),
    ):
      tower_model = vit.VisionTransformer(tcfg, **kwargs)

      @jax.jit
      def run_tower(tp_, px, _m=tower_model, _t=tower):
        mean = vit.DINO_MEAN if _t == "dino" else vit.SIGLIP_MEAN
        std = vit.DINO_STD if _t == "dino" else vit.SIGLIP_STD
        return _m.apply({"params": tp_}, vit.preprocess(px, mean, std))

      dt = _bench_amortized(
          run_tower, lambda seed: (p[tower], make_px(seed)), n=8
      )
      results[f"tower_{tower}_{label}_ms"] = round(dt * 1e3, 2)

  out = jax.jit(
      lambda p_, cp_, px: connector.apply(
          {"params": cp_},
          vit.DinoSigLIPEncoder().apply({"params": p_}, px),
      )
  )(params, cparams, make_px(99))
  best = min(
      (v, k) for k, v in results.items() if not k.startswith("tower_")
  )
  print(json.dumps({
      "metric": "vision_encode_project_ms",
      "value": best[0],
      "unit": f"ms/image (best variant: {best[1][:-3]})",
      "output_shape": list(out.shape),
      **results,
      "notes": "pixels->DinoSigLIP(block22)->VL projection, one jit program "
               "on device; the reference runs this on host PyTorch. "
               "Variants isolate the flash-MHA kernel effect (vs "
               "fp32-softmax einsum) and the int8 weight/activation "
               "effects; params are jit arguments (never closure "
               "constants) and random (never foldable zeros).",
  }))


def bench_batched_decode(batch=8, prompt_len=128, steps=128, int8=False):
  """Config #4: batched multimodal prefill + decode."""
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((batch, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (batch, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  if int8:
    params = jax.jit(quantization.quantize_params)(params)
    model = griffin.Griffin(
        config, gradient_checkpointing=False, quantized=True
    )
  s = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )

  def prefill(seed):
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed), (batch, prompt_len), 3, 1000, jnp.int32
    )
    img = jax.random.normal(
        jax.random.PRNGKey(1000 + seed),
        (batch, config.vision_tokens, config.vision_width),
        jnp.bfloat16,
    )
    lengths = jnp.full((batch,), prompt_len, jnp.int32)
    state = s.prompt_processing_fn(
        s.params, tokens, None, lengths, steps, False, False, img
    )
    return state

  ttft = _bench(lambda seed: prefill(seed), lambda i: (i,))

  def decode(seed):
    state = prefill(seed)
    _sync(state.positions)
    t0 = time.perf_counter()
    out = s.sample_fn(s.params, state, False)
    _sync(out.step)
    return time.perf_counter() - t0

  decode(500)  # compile
  dts = [decode(600 + i) for i in range(3)]
  dt = statistics.median(dts)
  tps = batch * (steps - 1) / dt
  print(json.dumps({
      "metric": "batched_decode_tokens_per_sec_per_chip"
                + ("_int8" if int8 else ""),
      "value": round(tps, 1),
      "unit": f"tokens/sec/chip (batch={batch})",
      "batched_mm_prefill_ms": round(ttft * 1e3, 2),
      "decode_steps": steps,
  }))


def bench_long_window_prefill(prompt_len=4096):
  """Long prompt exceeding the attention window (ring-cache stress)."""
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import griffin

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  shapes = jax.eval_shape(
      lambda: model.init(
          jax.random.PRNGKey(0), tokens0, jnp.arange(8)[None]
      )
  )
  params = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), shapes
  )

  @jax.jit
  def forward(tokens):
    pos = jnp.tile(jnp.arange(tokens.shape[1])[None], (tokens.shape[0], 1))
    _, cache = model.apply(
        params, tokens, pos, return_logits=False, return_cache=True
    )
    return cache

  def make_args(seed):
    return (
        jax.random.randint(
            jax.random.PRNGKey(seed), (1, prompt_len), 3, 1000, jnp.int32
        ),
    )

  dt = _bench(forward, make_args, reps=3)
  print(json.dumps({
      "metric": "long_prefill_ms",
      "value": round(dt * 1e3, 2),
      "unit": f"ms ({prompt_len} tokens, window "
              f"{config.attention_window_size})",
      "tokens_per_sec": round(prompt_len / dt, 0),
  }))


def bench_sft_step(batch=1, seq_len=512):
  """Config #5: frozen-connector multimodal SFT step (2B LM frozen).

  The full 2B fine-tune (params + grads + Adam moments ≈ 22 GB) does not
  fit one 16 GB chip — the sharded train step covers that on a mesh; this
  measures the stage-1 step that does fit.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.training import trainer

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config)  # remat on
  tokens0 = jnp.ones((batch, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (batch, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
  )
  params = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), shapes
  )["params"]
  optimizer = trainer.make_optimizer(1e-4)
  opt_state = optimizer.init(params["vl_connector"])

  def make_batch(seed):
    k = jax.random.PRNGKey(seed)
    tokens = jax.random.randint(k, (batch, seq_len), 3, 1000, jnp.int32)
    mask = jnp.ones((batch, seq_len), jnp.bool_)
    img = jax.random.normal(
        jax.random.fold_in(k, 1),
        (batch, config.vision_tokens, config.vision_width),
        jnp.bfloat16,
    )
    return tokens, mask, img

  def step(seed, p, o):
    tokens, mask, img = make_batch(seed)
    loss, p, o = trainer.frozen_train_step(
        model, p, optimizer, o, 0, tokens, mask, img
    )
    return loss, p, o

  loss, params, opt_state = step(0, params, opt_state)  # compile
  _sync(loss)
  times = []
  for i in range(3):
    t0 = time.perf_counter()
    loss, params, opt_state = step(i + 1, params, opt_state)
    _sync(loss)
    times.append(time.perf_counter() - t0)
  dt = statistics.median(times)
  print(json.dumps({
      "metric": "sft_frozen_step_ms",
      "value": round(dt * 1e3, 2),
      "unit": f"ms/step (batch={batch}, seq={seq_len}+729 visual)",
      "tokens_per_sec": round(batch * (seq_len + 729) / dt, 0),
  }))


def bench_lora_step(batch=1, seq_len=512, rank=16, int8_base=False,
                    preset=None):
  """LoRA SFT step adapting ALL 2B projections on one chip.

  Full-tree SFT needs params + grads + Adam moments ≈ 4x the 5.4 GB bf16
  weights — past one 16 GB v5e
  (``bench_sft_step`` measures the frozen-connector stage that does fit).
  With LoRA (``training/lora.py``) gradients and moments exist only at
  adapter size, so whole-model adaptation fits; ``int8_base=True`` is the
  QLoRA-style variant (2.7 GB frozen base — enough headroom for 9B).
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization
  from cadence_gemma_tpu.training import lora

  preset = preset or common.Preset.RECURRENT_GEMMA_2B_V1
  config = common.GriffinConfig.from_preset(preset)
  model = griffin.Griffin(config, quantized=int8_base, lora_rank=rank)
  fp_model = griffin.Griffin(config)
  tokens0 = jnp.ones((batch, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (batch, 1))
  shapes = jax.eval_shape(
      lambda: fp_model.init(jax.random.PRNGKey(0), tokens0, pos0)
  )
  base_shapes = shapes["params"]
  if int8_base:
    # Materialize the int8 tree directly — a bf16 9B tree (17.7 GB) would
    # OOM the chip before quantize_params could ever shrink it.
    base_shapes = jax.eval_shape(quantization.quantize_params, base_shapes)
  base = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), base_shapes
  )
  adapters = lora.init_adapters(model, jax.random.PRNGKey(1))
  adapters = jax.tree_util.tree_map(
      lambda v: v.astype(jnp.bfloat16), adapters
  )
  n_adapter = lora.lora_parameter_count(adapters)
  tx = lora.make_optimizer(1e-4)
  opt_state = tx.init(adapters)

  def make_batch(seed):
    k = jax.random.PRNGKey(seed)
    tokens = jax.random.randint(k, (batch, seq_len), 3, 1000, jnp.int32)
    mask = jnp.ones((batch, seq_len), jnp.bool_)
    img = jax.random.normal(
        jax.random.fold_in(k, 1),
        (batch, config.vision_tokens, config.vision_width),
        jnp.bfloat16,
    )
    return tokens, mask, img

  def step(seed, a, o):
    tokens, mask, img = make_batch(seed)
    loss, a, o = lora.lora_train_step(
        model, a, base, tx, o, 0, tokens, mask, img
    )
    return loss, a, o

  loss, adapters, opt_state = step(0, adapters, opt_state)  # compile
  _sync(loss)
  times = []
  for i in range(3):
    t0 = time.perf_counter()
    loss, adapters, opt_state = step(i + 1, adapters, opt_state)
    _sync(loss)
    times.append(time.perf_counter() - t0)
  dt = statistics.median(times)
  print(json.dumps({
      "metric": "lora_sft_step_ms"
                + ("_int8base" if int8_base else "")
                + ("_9b" if "9B" in preset.name else ""),
      "value": round(dt * 1e3, 2),
      "unit": f"ms/step (batch={batch}, seq={seq_len}+729 visual, "
              f"rank={rank}, {'int8' if int8_base else 'bf16'} base)",
      "tokens_per_sec": round(batch * (seq_len + 729) / dt, 0),
      "adapter_params": n_adapter,
      "notes": "adapts every projection of the 2B model on one chip; "
               "full-tree SFT cannot fit (grads+moments ~4x weights).",
  }))


def bench_fused_image_ttft(prompt_len=128, reps=6, int8=False):
  """North-star: raw pixels + prompt → first sampled token, one program.

  ``int8=True`` runs the serving configuration: int8 weights everywhere,
  int8 activations through the compute-bound prefill (towers + Griffin);
  decode stays weight-only.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import modal_sampler as modal_lib
  from cadence_gemma_tpu.models import griffin, vit
  from cadence_gemma_tpu.ops import quantization

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  base_model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  lm_shapes = jax.eval_shape(
      lambda: base_model.init(
          jax.random.PRNGKey(0), tokens0, jnp.arange(8)[None]
      )
  )
  lm_params = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), lm_shapes
  )["params"]

  px0 = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 384, 384))
  v_shapes = jax.eval_shape(
      lambda: vit.DinoSigLIPEncoder().init(jax.random.PRNGKey(2), px0)
  )
  v_params = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), v_shapes
  )["params"]

  if int8:
    lm_params = jax.jit(quantization.quantize_params)(lm_params)
    model = griffin.Griffin(
        config, gradient_checkpointing=False, quantized=True
    )
    # Towers run int8 weights + activations too: the r3 5-variant sweep
    # (same-run comparison; einsum vs one-pass-flash attention, int8
    # weight/act combinations) puts int8_act_einsum first at 729 tokens
    # (11.7-11.9 ms vs 13.4-14.3 bf16). An earlier single run that
    # measured int8 slower was run-to-run variance on the relay chip.
    encoder = vit.DinoSigLIPEncoder(quantized=True, act_quant=True)
    v_params = jax.jit(quantization.quantize_params)(v_params)
  else:
    model = base_model
    encoder = vit.DinoSigLIPEncoder()

  s = modal_lib.ModalSampler(
      model, Vocab(), lm_params,
      vision_encoder=encoder, vision_params=v_params,
      bucket_prompt_lengths=False,
      prefill_act_quant=int8,
  )
  prompt = " ".join(["word"] * (prompt_len - 1))
  ids = [s.tokenize(prompt)]
  lengths = jnp.asarray([len(i) for i in ids])
  padded = s._get_padded_tokens(ids)

  def prefill(seed):
    px = jax.random.uniform(jax.random.PRNGKey(100 + seed), (1, 3, 384, 384))
    return s._fused_prefill_fn(
        s.params, s.vision_params, px, padded, None, lengths, 8, False, False
    )

  _sync(prefill(0).tokens_buffer)  # compile
  states = [prefill(i + 1) for i in range(0)]  # pre-warm nothing
  pixels = [
      jax.random.uniform(jax.random.PRNGKey(200 + i), (1, 3, 384, 384))
      for i in range(reps)
  ]
  for p in pixels:
    _sync(p)
  t0 = time.perf_counter()
  states = [
      s._fused_prefill_fn(
          s.params, s.vision_params, p, padded, None, lengths, 8, False,
          False,
      )
      for p in pixels
  ]
  _sync(states[-1].tokens_buffer)
  dt = (time.perf_counter() - t0) / reps
  print(json.dumps({
      "metric": "fused_image_ttft_ms" + ("_int8" if int8 else ""),
      "value": round(dt * 1e3, 2),
      "unit": f"ms (pixels + {prompt_len}-token prompt -> first token, "
              "one XLA program)",
      "notes": "preprocess + DinoSigLIP towers + VL projection + 2B "
               "Griffin prefill + first-token sample, fully on device. The "
               "reference runs the vision half on host PyTorch per image."
               + (" int8 weights; int8 activations through the prefill "
                  "(decode weight-only)." if int8 else ""),
  }))
  return dt * 1e3


def bench_decode_roofline(int8=True, steps=64):
  """Decode-step time breakdown vs the HBM roofline (VERDICT r2 #9).

  All variants run ``steps`` iterations inside ONE jitted loop program, so
  the ~1.8 ms/dispatch relay overhead and host noise divide away:
    * decode: the real decode step (feed one token, sample argmax).
    * decode minus the vocab projection (the [2560, 256k] matmul, ~25% of
      weight bytes).
    * decode without cache writes (reads the same cache every step).
  """
  import time as _time

  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=int8
  )
  # A/B twin for the fused residual-add+RMSNorm epilogue (VERDICT r4 #8):
  # same param tree, one Pallas kernel per block boundary instead of two
  # XLA elementwise fusions.
  fused_model = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=int8,
      fused_epilogue=True,
  )
  fp_model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: fp_model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  if int8:
    params = jax.jit(quantization.quantize_params)(params)
  param_bytes = sum(
      leaf.size * leaf.dtype.itemsize
      for leaf in jax.tree_util.tree_leaves(params)
  )
  cache0 = model.init_cache(1, jnp.bfloat16)

  def decode_loop(return_logits=True, write_cache=True, m=model):
    @jax.jit
    def f(p, c, tok):
      def body(i, carry):
        t, cc, acc = carry
        logits, new_c = m.apply(
            {"params": p}, t, jnp.full((1, 1), 100 + i, jnp.int32),
            cache=cc, return_logits=return_logits,
            return_cache=True, last_logits_only=True,
        )
        # Consume EVERY layer's cache every iteration — without this,
        # XLA dead-code-eliminates all blocks the output does not depend
        # on (measured: the no-vocab variant collapsed to block 0 only).
        probe = sum(
            jnp.sum(l.astype(jnp.float32)) * 1e-9
            for l in jax.tree_util.tree_leaves(new_c)
        )
        if return_logits:
          nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        else:
          nxt = t + (probe.astype(jnp.int32) % 3)
        return nxt, (new_c if write_cache else cc), acc + probe
      t, cc, acc = jax.lax.fori_loop(0, steps, body, (tok, c, 0.0))
      return t, acc
    return f

  def run_once(fn, make_args):
    _sync(fn(*make_args(0)))  # compile
    args = make_args(1)       # distinct content: byte-identical dispatches
    for a in jax.tree_util.tree_leaves(args):  # get deduplicated upstream
      _sync(a)
    t0 = _time.perf_counter()
    _sync(fn(*args))
    return (_time.perf_counter() - t0) / steps

  make_tok = lambda i: (params, cache0, jnp.full((1, 1), 7 + i, jnp.int32))
  results = {}
  results["decode_step_ms"] = round(
      run_once(decode_loop(), make_tok) * 1e3, 3
  )
  results["decode_step_no_vocab_ms"] = round(
      run_once(decode_loop(return_logits=False), make_tok) * 1e3, 3
  )
  results["decode_step_no_cache_writes_ms"] = round(
      run_once(decode_loop(write_cache=False), make_tok) * 1e3, 3
  )
  try:
    results["decode_step_fused_epilogue_ms"] = round(
        run_once(decode_loop(m=fused_model), make_tok) * 1e3, 3
    )
  except Exception as e:  # record, don't kill the breakdown
    results["decode_step_fused_epilogue_error"] = repr(e)[:160]

  hbm_gbps = 819.0  # v5e paper number
  floor_ms = param_bytes / (hbm_gbps * 1e9) * 1e3
  results.update(
      param_gib=round(param_bytes / 2**30, 3),
      hbm_floor_ms=round(floor_ms, 3),
      decode_vs_floor=round(results["decode_step_ms"] / floor_ms, 3),
      vocab_matmul_ms=round(
          results["decode_step_ms"] - results["decode_step_no_vocab_ms"], 3
      ),
      cache_write_ms=round(
          results["decode_step_ms"]
          - results["decode_step_no_cache_writes_ms"], 3
      ),
  )
  print(json.dumps({
      "metric": "decode_roofline_breakdown" + ("_int8" if int8 else "_bf16"),
      "value": results["decode_vs_floor"],
      "unit": "decode step / theoretical HBM weight-stream floor",
      **results,
      "notes": "every variant loops inside one program so the ~1.8 ms "
               "relay dispatch overhead divides away (the cache probe "
               "adds ~0.2 ms to every variant equally, and is required: "
               "without consuming all cache leaves per iteration XLA "
               "dead-code-eliminates whole layers; a pure weight-READ "
               "loop gets hoisted entirely, so the floor is computed, "
               "not measured). vocab_matmul_ms and cache_write_ms are "
               "ablation deltas.",
  }))
  return results


def bench_poisson_serving(num_slots=4, steps=48, prompt_len=256,
                          n_requests=12, mean_interarrival_ticks=2.0,
                          chunk=64):
  """Aggregate serving throughput under a Poisson arrival load.

  The round-2 weakness: admission prefill ran whole-prompt on the tick
  critical path, stalling every running slot for the full prefill.
  This bench drives the same arrival schedule through (a) unbounded
  admission (drain whole prompts per tick) and (b) chunked admission with
  ``admission_chunks_per_tick=1``, and reports aggregate tokens/sec plus
  per-tick latency percentiles — (b) should bound the p95/max tick time
  without losing aggregate throughput.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.inference import serving
  from cadence_gemma_tpu.models import griffin

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  sampler = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False,
      prefill_chunk_size=chunk,
  )

  def words(n, seed):
    return " ".join(f"w{seed}_{i}" for i in range(n - 1))

  # One fixed arrival schedule for every variant (and the warmups).
  arrivals = np.cumsum(
      np.random.RandomState(0).exponential(
          mean_interarrival_ticks, n_requests
      )
  ).astype(int)

  def run(per_tick, seed0):
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=num_slots, max_steps_default=steps,
        admission_chunks_per_tick=per_tick,
    )
    tick = next_req = generated = 0
    tick_times = []
    while next_req < n_requests or batcher.active_count:
      while (next_req < n_requests and arrivals[next_req] <= tick
             and batcher.has_capacity):
        batcher.add_request(
            words(prompt_len, seed0 + next_req), max_steps=steps
        )
        next_req += 1
      t0 = time.perf_counter()
      batcher.step(8)
      # pop_finished's device_get is the tick's natural sync point; the
      # measured tick time is what a caller polling for tokens would see.
      for _, toks, _ in batcher.pop_finished():
        generated += len(toks)
      tick_times.append(time.perf_counter() - t0)
      tick += 1
    return generated, tick_times

  results = {}
  for label, per_tick in (("unbounded", None), ("chunked_1_per_tick", 1)):
    run(per_tick, 100)  # warmup: compile at the exact shapes used
    t0 = time.perf_counter()
    generated, tick_times = run(per_tick, 500)
    dt = time.perf_counter() - t0
    tt = np.sort(np.asarray(tick_times))
    results[label] = {
        "tokens_per_sec": round(generated / dt, 1),
        "tick_ms_p50": round(float(tt[len(tt) // 2]) * 1e3, 1),
        "tick_ms_p95": round(float(tt[int(len(tt) * 0.95)]) * 1e3, 1),
        "tick_ms_max": round(float(tt[-1]) * 1e3, 1),
        "ticks": len(tt),
    }
  print(json.dumps({
      "metric": "poisson_serving_tokens_per_sec_per_chip",
      "value": results["chunked_1_per_tick"]["tokens_per_sec"],
      "unit": f"tokens/sec/chip ({n_requests} Poisson arrivals, "
              f"{num_slots} slots, {prompt_len}-token prompts, "
              f"{steps} steps each, admission chunk={chunk})",
      **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
      "notes": "chunked_1_per_tick bounds the decode stall any admission "
               "can inflict on running slots at one chunk per tick; "
               "compare tick_ms_p95/max against the unbounded variant.",
  }))


def bench_frontend_serving(num_slots=8, n_requests=32, steps=48,
                           prompt_len=128, mean_interarrival_s=0.02,
                           slo_utilization=0.5, int8=True,
                           speculative=True, draft_len=7,
                           spec_utilization=0.25, spec_n_requests=16,
                           idle_boost=32):
  """End-to-end HTTP-frontend latency under a Poisson client load.

  Unlike ``bench_poisson_serving`` (which measures the raw batcher tick
  loop), this drives the production path — ServingFrontend's single
  driver thread + handler-side submissions — and reports what a CLIENT
  experiences: time-to-first-token and request wall time from submit,
  queueing included, straight from the frontend's /v1/health metrics.

  Since r5 the measured configuration is the PRODUCTION one
  (VERDICT-r4 next #2): int8 weights (the best shipped decode path) and
  8 slots (the batched-decode sweet spot), and the SLO regime is
  self-calibrated — a saturating run (``mean_interarrival_s`` far above
  capacity) first measures this process's actual aggregate capacity,
  then the latency run arrives at ``slo_utilization`` of it. r4's fixed
  0.7 s interarrival presumed a ~3 req/s bf16 capacity; hard-coding a
  rate mislabels the utilization whenever chip speed drifts, which is
  exactly what made r4's 70%-utilization attempt unstable.

  ``speculative=True`` adds a third regime: the same frontend over a
  speculative batcher (``draft_len`` prompt-lookup drafts/step) at
  ``spec_utilization`` of plain capacity — the low-concurrency,
  latency-focused deployment where speculation pays.
  """
  import threading as _threading

  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.inference import server as server_lib
  from cadence_gemma_tpu.inference import serving
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  if int8:
    params = jax.jit(quantization.quantize_params)(params)
    model = griffin.Griffin(
        config, gradient_checkpointing=False, quantized=True
    )
  sampler = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )

  def words(n, seed):
    return " ".join(f"w{seed}_{i}" for i in range(n - 1))

  def run(seed0, interarrival_s, n=n_requests, batcher_kwargs=None,
          fe_kwargs=None):
    gaps = np.random.RandomState(0).exponential(interarrival_s, n)
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=num_slots, max_steps_default=steps,
        **(batcher_kwargs or {}),
    )
    fe = server_lib.ServingFrontend(batcher, step_size=8,
                                    **(fe_kwargs or {}))
    subs = []

    def client():
      for i in range(n):
        time.sleep(float(gaps[i]))
        subs.append(fe.submit(words(prompt_len, seed0 + i)))

    t0 = time.perf_counter()
    th = _threading.Thread(target=client)
    th.start()
    th.join()
    total = 0
    while len(subs) < n:
      time.sleep(0.01)
    for sub in subs:
      tokens, _ = sub.result(timeout=600)
      total += len(tokens)
    dt = time.perf_counter() - t0
    stats = fe.stats
    fe.close()
    return total / dt, stats

  # Warmup compiles at the exact shapes (fewer requests, same programs).
  run(100, mean_interarrival_s, n=num_slots + 2)
  tps, sat_stats = run(500, mean_interarrival_s)
  # Self-calibrated SLO regime: each request generates ~`steps` tokens,
  # so measured request capacity is tps/steps req/s; arrive at
  # `slo_utilization` of that.
  slo_interarrival_s = round(
      max(steps / max(slo_utilization * tps, 1e-9), 0.02), 4
  )
  _, stats = run(700, slo_interarrival_s)
  idle_fields = {}
  if idle_boost:
    # Same Poisson regime, but the driver runs `idle_boost`-step decode
    # programs whenever the admission queue is empty — fewer fixed
    # per-tick host round trips per token at the cost of a bounded
    # extra admission wait for mid-tick arrivals (server.py
    # step_size_idle). One extra compiled program (n=idle_boost).
    run(800, mean_interarrival_s, n=num_slots + 2,
        fe_kwargs={"step_size_idle": idle_boost})  # compile it
    _, idle_stats = run(
        850, slo_interarrival_s,
        fe_kwargs={"step_size_idle": idle_boost},
    )
    idle_fields = {
        "idle_boost_steps": idle_boost,
        "idle_ttft_s_p50": idle_stats.get("ttft_s_p50"),
        "idle_ttft_s_p90": idle_stats.get("ttft_s_p90"),
        "idle_ttft_s_p99": idle_stats.get("ttft_s_p99"),
        "idle_wall_s_p50": idle_stats.get("wall_s_p50"),
        "idle_wall_s_p99": idle_stats.get("wall_s_p99"),
    }
  spec_fields = {}
  if speculative:
    spec_kwargs = {"draft_len": draft_len}
    run(900, mean_interarrival_s, n=num_slots + 2,
        batcher_kwargs=spec_kwargs)  # compile the verify program
    spec_interarrival_s = round(
        max(steps / max(spec_utilization * tps, 1e-9), 0.02), 4
    )
    _, spec_stats = run(
        1100, spec_interarrival_s, n=spec_n_requests,
        batcher_kwargs=spec_kwargs,
    )
    spec_fields = {
        "spec_ttft_s_p50": spec_stats.get("ttft_s_p50"),
        "spec_ttft_s_p99": spec_stats.get("ttft_s_p99"),
        "spec_wall_s_p50": spec_stats.get("wall_s_p50"),
        "spec_wall_s_p99": spec_stats.get("wall_s_p99"),
        "spec_draft_len": draft_len,
        "spec_interarrival_s": spec_interarrival_s,
    }
  config_str = (
      f"{'int8' if int8 else 'bf16'} weights, {num_slots} slots, "
      f"{prompt_len}-token prompts, {steps} steps, "
      f"{int(slo_utilization * 100)}% of measured capacity"
  )
  result = {
      "metric": "frontend_serving_tokens_per_sec_per_chip",
      "value": round(tps, 1),
      "unit": f"tokens/sec/chip ({n_requests} Poisson clients, "
              f"{config_str}, through the HTTP frontend driver)",
      "config": config_str,
      "ttft_s_p50": stats.get("ttft_s_p50"),
      "ttft_s_p90": stats.get("ttft_s_p90"),
      "ttft_s_p99": stats.get("ttft_s_p99"),
      "wall_s_p50": stats.get("wall_s_p50"),
      "wall_s_p90": stats.get("wall_s_p90"),
      "wall_s_p99": stats.get("wall_s_p99"),
      "saturated_ttft_s_p50": sat_stats.get("ttft_s_p50"),
      "saturated_ttft_s_p99": sat_stats.get("ttft_s_p99"),
      "slo_interarrival_s": slo_interarrival_s,
      "slo_utilization": slo_utilization,
      **idle_fields,
      **spec_fields,
      "notes": "client-experienced latency from submit (queueing "
               "included), read from the frontend's /v1/health metrics. "
               "value (tok/s) is from the saturating arrival rate "
               f"({mean_interarrival_s} s mean gap); the ttft/wall "
               "percentiles are from the self-calibrated "
               f"{int(slo_utilization * 100)}%-of-measured-capacity run "
               f"({slo_interarrival_s} s mean gap), where they measure "
               "serving latency rather than queue drain. spec_* fields "
               "are the speculative batcher at "
               f"{int(spec_utilization * 100)}% of plain capacity (the "
               "low-concurrency deployment where speculation pays; "
               "random-word prompts give near-zero draft acceptance, so "
               "these are worst-case speculative TTFTs).",
  }
  print(json.dumps(result))
  return result


def bench_multilora_serving(num_slots=4, rank=16, ticks=6, step_size=16):
  """Per-step cost of multi-adapter serving vs the plain batcher.

  ``multi_lora`` adds two batched low-rank einsums per projection
  ([slots, 1, d] x [slots, d, r]) on top of the shared base decode; the
  base weight stream (the decode bottleneck) is unchanged. This measures
  aggregate decode tokens/sec with every slot live, plain vs stacked
  adapters, on the 2B preset.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.inference import serving
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.training import lora as lora_lib

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(
      config, gradient_checkpointing=False, lora_rank=rank
  )
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  sampler = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )
  adapters0, _ = lora_lib.split_lora(params)

  def adapters_for(seed):
    ls, td = jax.tree_util.tree_flatten(adapters0)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(ls))
    return jax.tree_util.tree_unflatten(
        td,
        [(0.02 * jax.random.normal(k, l.shape)).astype(l.dtype)
         for k, l in zip(keys, ls)],
    )

  def run(multi):
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=num_slots,
        max_steps_default=2 * ticks * step_size + 8, multi_lora=multi,
    )
    for i in range(num_slots):
      batcher.add_request(
          " ".join(f"w{i}_{j}" for j in range(12)),
          adapters=adapters_for(10 + i) if multi else None,
      )
    batcher.step(4)  # admissions + compile
    _sync = jax.device_get(batcher._state["write_idx"])
    t0 = time.perf_counter()
    for _ in range(ticks):
      batcher.step(step_size)
    jax.device_get(batcher._state["write_idx"])
    dt = time.perf_counter() - t0
    return num_slots * ticks * step_size / dt

  plain = run(False)
  multi = run(True)
  print(json.dumps({
      "metric": "multilora_serving_tokens_per_sec_per_chip",
      "value": round(multi, 1),
      "unit": f"tokens/sec/chip ({num_slots} slots, rank-{rank} adapter "
              "per slot, bf16 2B base)",
      "plain_batcher_tokens_per_sec": round(plain, 1),
      "overhead_pct": round(100.0 * (plain - multi) / plain, 1),
      "notes": "each slot serves its own LoRA fine-tune over the shared "
               "base; overhead is the batched rank-hop einsums only.",
  }))


def bench_longcontext_sft(batch=1, seq_len=8192, use_flash=None):
  """Long-context SFT step: 4x-window sequences through the flash kernels.

  With the Pallas flash backward, activation memory is O(t * window): an
  8k-token frozen-connector step fits and runs; the einsum path would
  materialize [b, n, t, t] fp32 logits (10 GB/layer at 8k) in the backward
  and cannot (``use_flash=False`` measures it for contrast if it fits).
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.training import trainer

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, use_flash_attention=use_flash)
  tokens0 = jnp.ones((batch, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (batch, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
  )
  params = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), shapes
  )["params"]
  optimizer = trainer.make_optimizer(1e-4)
  opt_state = optimizer.init(params["vl_connector"])

  def make_batch(seed):
    k = jax.random.PRNGKey(seed)
    tokens = jax.random.randint(k, (batch, seq_len), 3, 1000, jnp.int32)
    mask = jnp.ones((batch, seq_len), jnp.bool_)
    img = jax.random.normal(
        jax.random.fold_in(k, 1),
        (batch, config.vision_tokens, config.vision_width),
        jnp.bfloat16,
    )
    return tokens, mask, img

  def step(seed, p, o):
    tokens, mask, img = make_batch(seed)
    loss, p, o = trainer.frozen_train_step(
        model, p, optimizer, o, 0, tokens, mask, img
    )
    return loss, p, o

  loss, params, opt_state = step(0, params, opt_state)  # compile
  _sync(loss)
  times = []
  for i in range(3):
    t0 = time.perf_counter()
    loss, params, opt_state = step(i + 1, params, opt_state)
    _sync(loss)
    times.append(time.perf_counter() - t0)
  dt = statistics.median(times)
  total = batch * (seq_len + 729)
  print(json.dumps({
      "metric": "longcontext_sft_step_ms",
      "value": round(dt * 1e3, 2),
      "unit": f"ms/step (batch={batch}, seq={seq_len}+729 visual)",
      "tokens_per_sec": round(total / dt, 0),
      "attention": "flash fwd+bwd Pallas" if use_flash is not False
                   else "einsum",
  }))


def bench_9b_int8(prompt_len=128, steps=64):
  """RecurrentGemma-9B served on ONE v5e chip via int8 weight-only.

  The 9B model is 17+ GB at bf16 — it cannot even be materialized in a
  single v5e's 16 GB HBM, so the reference cannot serve it on this chip at
  all. int8 weights (~9 GB + fp scales) fit; the quantized parameter tree
  is built directly at int8 (random content) without ever allocating the
  bf16 tree.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_9B_V1
  )
  model_bf16 = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: quantization.quantize_params(
          model_bf16.init(jax.random.PRNGKey(0), tokens0, pos0)["params"]
      )
  )
  leaves, treedef = jax.tree_util.tree_flatten(shapes)

  @jax.jit
  def build():
    out = []
    for i, s in enumerate(leaves):
      key = jax.random.PRNGKey(i)
      if s.dtype == jnp.int8:
        out.append(
            jax.random.randint(key, s.shape, -127, 128, jnp.int32).astype(
                jnp.int8
            )
        )
      else:
        # Scales and un-quantized leaves: small positive-ish values keep
        # activations content-dependent without overflow.
        out.append(
            (1e-4 + 2e-4 * jnp.abs(jax.random.normal(key, s.shape))).astype(
                s.dtype
            )
        )
    return out

  params = jax.tree_util.tree_unflatten(treedef, build())
  model = griffin.Griffin(
      config, gradient_checkpointing=False, quantized=True
  )
  s = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )

  def prefill(seed):
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed), (1, prompt_len), 3, 1000, jnp.int32
    )
    lengths = jnp.full((1,), prompt_len, jnp.int32)
    return s.prompt_processing_fn(
        s.params, tokens, None, lengths, steps, False, False, None
    )

  ttft = _bench_amortized(lambda seed: prefill(seed), lambda i: (i,), n=8)

  def decode(seed):
    state = prefill(seed)
    _sync(state.positions)
    t0 = time.perf_counter()
    out = s.sample_fn(s.params, state, False)
    _sync(out.step)
    return time.perf_counter() - t0

  decode(0)  # compile
  dts = [decode(i + 1) for i in range(3)]
  dt = statistics.median(dts)
  print(json.dumps({
      "metric": "decode_tokens_per_sec_per_chip_9b_int8",
      "value": round((steps - 1) / dt, 1),
      "unit": "tokens/sec/chip",
      "ttft_text_ms": round(ttft * 1e3, 2),
      "notes": "RecurrentGemma-9B on ONE v5e: bf16 weights (17+ GB) "
               "cannot fit in 16 GB HBM, so the reference cannot serve "
               "this model on this chip at all; int8 weight-only fits "
               "with room for the decode cache.",
  }))


def bench_speculative(prompt_len=128, steps=256, draft_len=7, ngram=2,
                      int8=False):
  """Speculative decoding vs plain greedy decode at 2B.

  The prompt is structured (a repeating word cycle) so the random-weight
  model's greedy continuation is n-gram predictable — this measures the
  *mechanism's* ceiling on this hardware; real-text acceptance depends on
  the workload (reported alongside as tokens_per_verify_step).
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.inference import speculative
  from cadence_gemma_tpu.models import griffin
  from cadence_gemma_tpu.ops import quantization

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      # Deterministic across processes (Python's hash() varies under
      # PYTHONHASHSEED randomization, which would make the speculative
      # acceptance numbers irreproducible between runs).
      import zlib

      return [3 + (zlib.crc32(w.encode()) % 1000) for w in text.split()]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  if int8:
    params = jax.jit(quantization.quantize_params)(params)
    model = griffin.Griffin(
        config, gradient_checkpointing=False, quantized=True
    )
  s = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )
  spec = speculative.SpeculativeSampler(s, draft_len=draft_len, ngram=ngram)

  cycle = ["w%d" % i for i in range(8)]
  prompt = " ".join(cycle[i % 8] for i in range(prompt_len - 1))

  def run_plain(seed):
    return s([prompt + " w%d" % seed], total_generation_steps=steps)

  def run_spec(seed):
    return spec([prompt + " w%d" % seed], total_generation_steps=steps)

  run_plain(0)  # compile
  t0 = time.perf_counter()
  out_p = run_plain(1)
  assert len(out_p.tokens[0]) == steps
  dt_plain = time.perf_counter() - t0

  run_spec(0)  # compile
  t0 = time.perf_counter()
  out_s = run_spec(1)
  dt_spec = time.perf_counter() - t0
  emitted = spec.last_stats["tokens_emitted"]

  result = {
      "metric": "speculative_decode_tokens_per_sec_per_chip",
      "value": round(emitted / dt_spec, 1),
      "unit": "tokens/sec/chip"
              + (" int8" if int8 else " bf16")
              + f" (draft_len={draft_len}, ngram={ngram})",
      "plain_decode_tps": round(steps / dt_plain, 1),
      "speedup_vs_plain": round((emitted / dt_spec) / (steps / dt_plain), 2),
      "tokens_per_verify_step": round(
          spec.last_stats["tokens_per_verify_step"], 2
      ),
      "notes": "structured prompt; acceptance (hence speedup) is "
               "workload-dependent — tokens_per_verify_step is the "
               "measured mean accepted length per weights read.",
  }
  print(json.dumps(result))
  return result


def bench_serving(prefix_len=512, suffix_len=32, steps=64, num_slots=8):
  """Serving features: prefix-cached TTFT + continuous-batching throughput.

  Prefix caching: a ``prefix_len``-token shared prompt is prefilled once;
  requests then prefill only their ``suffix_len`` continuation. Reported
  against the full-prompt TTFT measured with the same harness.

  Continuous batching: ``2 * num_slots`` staggered requests stream through
  ``num_slots`` slots; aggregate tok/s counts only written tokens.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.inference import serving
  from cadence_gemma_tpu.models import griffin

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (1, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  s = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )

  def words(n, seed):
    return " ".join(f"w{seed}_{i}" for i in range(n))

  # Prefix-cached TTFT vs full-prompt TTFT. Times the prefill *programs*
  # directly (as every other TTFT figure in this file does): the public
  # __call__ adds host tokenize/detokenize and per-call fetches, which on
  # the relay backend cost ~30 ms each and would swamp a few-ms prefill.
  prefix_state = s.prefill_prefix(words(prefix_len - 1, 0))
  start = jnp.full((1,), prefix_state.length, jnp.int32)

  def continue_prefill(seed):
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed), (1, suffix_len), 3, 1000, jnp.int32
    )
    lengths = jnp.full((1,), suffix_len, jnp.int32)
    return s.prompt_processing_fn(
        s.params, tokens, None, lengths, 1, False, False, None,
        prefix_state.cache, start,
    )

  cached = _bench_amortized(lambda seed: continue_prefill(seed),
                            lambda i: (i,))

  def full_prefill(seed):
    total = prefix_len + suffix_len
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed), (1, total), 3, 1000, jnp.int32
    )
    lengths = jnp.full((1,), total, jnp.int32)
    return s.prompt_processing_fn(
        s.params, tokens, None, lengths, 1, False, False, None
    )

  full = _bench_amortized(lambda seed: full_prefill(seed), lambda i: (i,))
  print(json.dumps({
      "metric": "prefix_cached_ttft_ms",
      "value": round(cached * 1e3, 2),
      "unit": f"ms ({prefix_len}-token shared prefix, {suffix_len}-token "
              "continuation)",
      "full_prompt_ttft_ms": round(full * 1e3, 2),
      "speedup": round(full / cached, 2),
  }))

  # Continuous batching: staggered arrivals, aggregate throughput. The
  # warmup pass runs the IDENTICAL workload first so the timed pass sees
  # no compiles (a remote 2B compile is minutes and `step`'s program is
  # specialized on the step count).
  batcher = serving.ContinuousBatcher(
      s, num_slots=num_slots, max_steps_default=steps
  )
  n_requests = 2 * num_slots

  def run_workload(seed0):
    pending = [words(suffix_len, seed0 + i) for i in range(n_requests)]
    generated = 0
    while pending or batcher.active_count:
      while pending and batcher.has_capacity:
        batcher.add_request(pending.pop(), max_steps=steps)
      batcher.step(16)
      for _, toks, _ in batcher.pop_finished():
        generated += len(toks)
    return generated

  run_workload(100)  # compile insert/step/pop at the exact shapes used
  t0 = time.perf_counter()
  generated = run_workload(500)
  # One data-dependent fetch already happened per pop; timing closed here.
  dt = time.perf_counter() - t0
  print(json.dumps({
      "metric": "continuous_batching_tokens_per_sec_per_chip",
      "value": round(generated / dt, 1),
      "unit": f"tokens/sec/chip ({n_requests} staggered requests, "
              f"{num_slots} slots, {steps} steps each)",
      "requests": n_requests,
  }))

  # Continuous batching x speculation: same workload, each tick is one
  # verify pass per slot (several tokens per weights read on acceptance).
  spec_batcher = serving.ContinuousBatcher(
      s, num_slots=num_slots, max_steps_default=steps, draft_len=7
  )

  def run_spec_workload(seed0):
    cycle = ["w%d" % i for i in range(8)]
    base = " ".join(cycle[i % 8] for i in range(suffix_len - 1))
    pending = [base + f" u{seed0 + i}" for i in range(n_requests)]
    generated = 0
    while pending or spec_batcher.active_count:
      while pending and spec_batcher.has_capacity:
        spec_batcher.add_request(pending.pop(), max_steps=steps)
      spec_batcher.step(4)
      for _, toks, _ in spec_batcher.pop_finished():
        generated += len(toks)
    return generated

  run_spec_workload(100)
  t0 = time.perf_counter()
  generated = run_spec_workload(500)
  dt = time.perf_counter() - t0
  print(json.dumps({
      "metric": "speculative_batching_tokens_per_sec_per_chip",
      "value": round(generated / dt, 1),
      "unit": f"tokens/sec/chip ({n_requests} staggered requests, "
              f"{num_slots} slots, {steps} steps each, draft_len=7)",
      "requests": n_requests,
  }))


def _synthetic_token_strings(vocab_size):
  """Deterministic sentencepiece-like pieces for a synthetic vocabulary.

  Mix of word-like ASCII pieces, digits, and punctuation — the
  distribution that matters for grammar compile cost (atom dedup +
  dead-token folding), not linguistics. ids 0-3 are control (empty).
  """
  import zlib

  letters = "abcdefghijklmnopqrstuvwxyz"
  punct = list("{}[]:,\"' .-+eE0123456789\n\t")
  out = ["", "", "", ""]
  for i in range(4, vocab_size):
    h = zlib.crc32(str(i).encode())
    if i - 4 < len(punct):
      out.append(punct[i - 4])
      continue
    n = 1 + (h % 9)
    piece = "".join(
        letters[(h >> (5 * j)) % 26] for j in range(n)
    )
    if h % 7 == 0:
      piece = " " + piece
    if h % 31 == 0:
      piece += str(h % 10)
    out.append(piece)
  return out


def bench_constrained_decode(batch=4, prompt_len=64, steps=128):
  """Grammar-constrained decoding: build cost + decode-step overhead.

  The constraint adds, per decode step, one [S, V/32] bitmask row gather
  + unpack and <= max_token_len scalar gathers per row — both tiny next
  to the 2B weights read. This measures that end to end: same prefill,
  decode loop with and without the JSON grammar tables threaded in
  (end_sampling_at_eos_token=False so both run all ``steps``).
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import constrain
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.models import griffin

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((batch, 8), jnp.int32)
  pos0 = jnp.tile(jnp.arange(8)[None], (batch, 1))
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  s = sampler_lib.Sampler(
      model, Vocab(), params, bucket_prompt_lengths=False
  )

  t0 = time.perf_counter()
  strings = _synthetic_token_strings(config.vocab_size)
  dfa = constrain.TokenDFA(constrain.json_regex(3), strings, eos_id=1)
  build_s = time.perf_counter() - t0
  tables = dfa.tables
  _sync(tables.allowed_bits)
  table_mb = (
      dfa._allowed_bits.nbytes + dfa._token_atoms.nbytes
      + dfa._token_lengths.nbytes + dfa.char_dfa.trans.nbytes
  ) / 1e6

  def prefill(seed):
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed), (batch, prompt_len), 3, 1000, jnp.int32
    )
    lengths = jnp.full((batch,), prompt_len, jnp.int32)
    return s.prompt_processing_fn(
        s.params, tokens, None, lengths, steps, False, False, None,
        None, None, tables,
    )

  def decode(seed, constrained):
    state = prefill(seed)
    _sync(state.positions)
    t0 = time.perf_counter()
    out = s.sample_fn(
        s.params, state, False, tables if constrained else None
    )
    _sync(out.step)
    return time.perf_counter() - t0

  for constrained in (False, True):
    decode(500, constrained)  # compile
  free = statistics.median([decode(600 + i, False) for i in range(3)])
  cons = statistics.median([decode(700 + i, True) for i in range(3)])
  tps_free = batch * (steps - 1) / free
  tps_cons = batch * (steps - 1) / cons
  print(json.dumps({
      "metric": "constrained_decode_tokens_per_sec_per_chip",
      "value": round(tps_cons, 1),
      "unit": f"tokens/sec/chip (batch={batch}, JSON depth-3 grammar)",
      "unconstrained_tokens_per_sec": round(tps_free, 1),
      "overhead_pct": round(100 * (free / cons - 1) if cons else 0, 2),
      "grammar_build_s": round(build_s, 2),
      "grammar_states": dfa.n_states,
      "grammar_unique_tokens": dfa.n_unique_tokens,
      "grammar_tables_mb": round(table_mb, 1),
  }))


def bench_per_request_sampling(num_slots=8, steps=96):
  """Row-wise sampling filters vs the shared-filter batcher step.

  The per-request path adds one [slots, 256k] descending sort (top-k +
  top-p thresholds) and a row-wise penalty scatter per decode step;
  this measures the aggregate tok/s delta at a full batch.
  """
  from cadence_gemma_tpu import common
  from cadence_gemma_tpu.inference import sampler as sampler_lib
  from cadence_gemma_tpu.inference import serving as serving_lib
  from cadence_gemma_tpu.models import griffin

  class Vocab:
    def pad_id(self):
      return 0

    def bos_id(self):
      return 2

    def eos_id(self):
      return 1

    def EncodeAsIds(self, text):  # noqa: N802
      return [3 + (i % 1000) for i in range(len(text.split()))]

    def DecodeIds(self, ids):  # noqa: N802
      return ""

  config = common.GriffinConfig.from_preset(
      common.Preset.RECURRENT_GEMMA_2B_V1
  )
  model = griffin.Griffin(config, gradient_checkpointing=False)
  tokens0 = jnp.ones((1, 8), jnp.int32)
  pos0 = jnp.arange(8)[None]
  shapes = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), tokens0, pos0)
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
  results = {}
  for per_req in (False, True):
    s = sampler_lib.Sampler(
        model, Vocab(), params, bucket_prompt_lengths=False,
        deterministic_sampling=False, temperature=0.8, top_p=0.95,
    )
    b = serving_lib.ContinuousBatcher(
        s, num_slots=num_slots, max_steps_default=steps + 8,
        per_request_sampling=per_req,
    )
    for i in range(num_slots):
      kwargs = dict(rng=jax.random.PRNGKey(i))
      if per_req:
        kwargs.update(temperature=0.7 + 0.05 * i, top_k=32 + i)
      b.add_request("p " * 32, **kwargs)
    b.step(1)  # admissions + compile
    _sync(b._state["positions"])
    t0 = time.perf_counter()
    b.step(steps)
    _sync(b._state["positions"])
    dt = time.perf_counter() - t0
    results[per_req] = num_slots * steps / dt
  print(json.dumps({
      "metric": "per_request_sampling_tokens_per_sec_per_chip",
      "value": round(results[True], 1),
      "unit": f"tokens/sec/chip ({num_slots} slots, distinct knobs/slot)",
      "shared_filters_tokens_per_sec": round(results[False], 1),
      "overhead_pct": round(
          100 * (results[False] / results[True] - 1), 2
      ),
  }))


def _device_loop_us(fn, args, lo=8, hi=40, reps=3):
  """In-program per-iteration time in µs (fori_loop delta, dispatch-free).

  ``fn(i, *args) -> scalar`` must make its output depend on every input
  and vary content with ``i`` (dedup/DCE-safe). The hi-vs-lo iteration
  delta cancels the relay's per-execution dispatch cost, so this resolves
  ops in the 10 µs - 1 ms range the enqueue-amortized helper cannot.
  """

  @jax.jit
  def loop(args, n, seed0):
    def body(i, acc):
      return acc + fn(seed0 + i, *args)

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

  _sync(loop(args, jnp.int32(2), jnp.int32(0)))  # compile
  deltas = []
  for rep in range(reps):
    t0 = time.perf_counter()
    _sync(loop(args, jnp.int32(lo), jnp.int32(1000 + 31 * rep)))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(loop(args, jnp.int32(hi), jnp.int32(5000 + 31 * rep)))
    t_big = time.perf_counter() - t0
    deltas.append((t_big - t_small) / (hi - lo))
  return max(statistics.median(deltas), 1e-12) * 1e6


def bench_vision_breakdown():
  """Per-op time breakdown of one ViT tower block (VERDICT r3 weak #2d).

  r3 recorded "many mid-size matmuls, no single fixable hotspot" without
  a measured table; this produces the table. Each piece of a tower block
  is timed in-program (fori_loop delta) with its FLOP count and implied
  MXU efficiency, for both towers, bf16:

    * ``block``         — the full pre-norm block (the ViTBlock math)
    * ``block_pad768``  — same block at t padded 729/734 → 768 (6x128
      lanes exactly; measures whether XLA's handling of the odd 729
      costs anything)
    * ``dense_matmuls`` — the 4 dense contractions alone (qkv, proj,
      fc1, fc2)
    * ``attn_core``     — logits einsum (fp32) + softmax + out einsum
    * ``attn_einsums``  — the 2 attention einsums with a constant probs
      (softmax cost = attn_core - attn_einsums)
    * ``vector_ops``    — 2 LayerNorms + the [t, mlp] gelu (VPU work)

  Also prints the CORRECTED whole-encoder FLOP count: r3's "530 GFLOP /
  2.7 ms roofline" dropped the multiply-accumulate factor of 2 — the
  true bf16 encoder roofline is ~1.05 TFLOP ≈ 5.3 ms at 197 TFLOP/s, so
  the measured 14.3 ms bf16 is ~2.7x off roofline, not 4-5x.
  """
  specs = {
      "dino": dict(t=734, d=1024, heads=16, hd=64, mlp=4096, blocks=23),
      "siglip": dict(t=729, d=1152, heads=16, hd=72, mlp=4304, blocks=23),
  }

  def ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

  results = {}
  encoder_flops = 0.0
  for name, s in specs.items():
    d, h, hd, m = s["d"], s["heads"], s["hd"], s["mlp"]

    def make_args(t, seed=0):
      key = jax.random.PRNGKey(seed)
      ks = jax.random.split(key, 6)
      mk = lambda k, *shape: (
          0.02 * jax.random.normal(k, shape, jnp.float32)
      ).astype(jnp.bfloat16)
      return (
          mk(ks[0], 1, t, d),          # x
          mk(ks[1], d, 3 * d),         # wqkv
          mk(ks[2], d, d),             # wproj
          mk(ks[3], d, m),             # w1
          mk(ks[4], m, d),             # w2
      )

    def block_fn(t):
      def f(i, x, wqkv, wproj, w1, w2):
        x = x * (1 + 1e-6 * i.astype(jnp.bfloat16))
        hn = ln(x)
        qkv = hn @ wqkv
        q, k, v = jnp.split(qkv, 3, -1)
        rs = lambda z: z.reshape(1, t, h, hd)
        q, k, v = rs(q), rs(k), rs(v)
        logits = jnp.einsum(
            "bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, -1).astype(x.dtype)
        out = jnp.einsum("bnqk,bknh->bqnh", probs, v).reshape(1, t, d)
        x = x + out @ wproj
        h2 = ln(x)
        h2 = jax.nn.gelu(h2 @ w1)
        x = x + h2 @ w2
        return x.astype(jnp.float32).mean()

      return f

    def dense_fn(t):
      def f(i, x, wqkv, wproj, w1, w2):
        x = x * (1 + 1e-6 * i.astype(jnp.bfloat16))
        qkv = x @ wqkv
        o = qkv[..., :d] @ wproj
        f1 = (x + o) @ w1
        f2 = f1 @ w2
        return f2.astype(jnp.float32).mean()

      return f

    def attn_core_fn(t):
      def f(i, q, k, v):
        q = q * (1 + 1e-6 * i.astype(q.dtype))
        v = v * (1 + 1e-6 * i.astype(v.dtype))
        logits = jnp.einsum(
            "bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, -1).astype(q.dtype)
        out = jnp.einsum("bnqk,bknh->bqnh", probs, v)
        return out.astype(jnp.float32).mean()

      return f

    def softmax_only_fn(t):
      # The softmax pass alone on a [1, h, t, t] fp32 logits tensor that
      # varies per iteration (einsum cost = attn_core - this).
      def f(i, logits):
        lg = logits + i.astype(jnp.float32)
        probs = jax.nn.softmax(lg, -1).astype(jnp.bfloat16)
        return probs.astype(jnp.float32).mean()

      return f

    def attn_onepass_fn(t):
      # The whole-sequence VMEM kernel as the attention core (r3's
      # _mha_onepass_kernel, auto-selected inside flash_mha_attention
      # for t <= 1024): measures the kernel against attn_core directly.
      from cadence_gemma_tpu.ops import pallas_attention as pa

      def f(i, q, k, v):
        q = q * (1 + 1e-6 * i.astype(q.dtype))
        v = v * (1 + 1e-6 * i.astype(v.dtype))
        out = pa.flash_mha_attention(q, k, v)
        return out.astype(jnp.float32).mean()

      return f

    def block_bnqh_fn(t):
      # Same block, but q/k/v transposed ONCE to [b, n, t, h] so both
      # attention einsums contract in the layout the MXU wants, with no
      # per-einsum relayout of the 4-D tensors.
      def f(i, x, wqkv, wproj, w1, w2):
        x = x * (1 + 1e-6 * i.astype(jnp.bfloat16))
        hn = ln(x)
        qkv = hn @ wqkv
        q, k, v = jnp.split(qkv, 3, -1)
        rs = lambda z: z.reshape(1, t, h, hd).transpose(0, 2, 1, 3)
        q, k, v = rs(q), rs(k), rs(v)
        logits = jnp.einsum(
            "bnqh,bnkh->bnqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, -1).astype(x.dtype)
        out = jnp.einsum("bnqk,bnkh->bnqh", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(1, t, d)
        x = x + out @ wproj
        h2 = ln(x)
        h2 = jax.nn.gelu(h2 @ w1)
        x = x + h2 @ w2
        return x.astype(jnp.float32).mean()

      return f

    def vector_fn(t):
      def f(i, x, big):
        x = x * (1 + 1e-6 * i.astype(jnp.bfloat16))
        a = ln(x).astype(jnp.float32).mean()
        b = ln(x * 2).astype(jnp.float32).mean()
        c = jax.nn.gelu(big * (1 + 1e-6 * i.astype(jnp.bfloat16)))
        return a + b + c.astype(jnp.float32).mean()

      return f

    t = s["t"]
    args = make_args(t)
    # FLOP counts (2*M*K*N per contraction).
    fl_dense = 2 * t * d * (3 * d) + 2 * t * d * d + 2 * 2 * t * d * m
    fl_attn = 2 * 2 * h * t * hd * t
    fl_block = fl_dense + fl_attn
    encoder_flops += s["blocks"] * fl_block

    us_block = _device_loop_us(block_fn(t), args, lo=16, hi=64)
    args768 = make_args(768)
    us_block768 = _device_loop_us(block_fn(768), args768, lo=16, hi=64)
    us_dense = _device_loop_us(dense_fn(t), args, lo=16, hi=64)
    x, wqkv, wproj, w1, w2 = args
    key = jax.random.PRNGKey(7)
    q = (0.02 * jax.random.normal(key, (1, t, h, hd))).astype(jnp.bfloat16)
    kk = q * 1.1
    v = q * 0.9
    us_attn = _device_loop_us(attn_core_fn(t), (q, kk, v), lo=16, hi=64)
    logits0 = jax.random.normal(key, (1, h, t, t), jnp.float32)
    us_softmax = _device_loop_us(
        softmax_only_fn(t), (logits0,), lo=16, hi=64
    )
    big = (0.02 * jax.random.normal(key, (1, t, m))).astype(jnp.bfloat16)
    us_vec = _device_loop_us(vector_fn(t), (x, big), lo=16, hi=64)
    us_attn_onepass = _device_loop_us(
        attn_onepass_fn(t), (q, kk, v), lo=16, hi=64
    )
    us_block_bnqh = _device_loop_us(
        block_bnqh_fn(t), args, lo=16, hi=64
    )

    us_attn_mm = us_attn - us_softmax
    eff = lambda flops, us: round(flops / (us * 1e-6) / 197e12, 3)
    results[name] = {
        "block_us": round(us_block, 1),
        "block_mxu_fraction": eff(fl_block, us_block),
        "block_pad768_us": round(us_block768, 1),
        "dense_matmuls_us": round(us_dense, 1),
        "dense_mxu_fraction": eff(fl_dense, us_dense),
        "attn_core_us": round(us_attn, 1),
        "attn_einsums_us": round(us_attn_mm, 1),
        "attn_mxu_fraction": eff(fl_attn, max(us_attn_mm, 1e-9)),
        "softmax_us": round(us_softmax, 1),
        "attn_onepass_us": round(us_attn_onepass, 1),
        "block_bnqh_us": round(us_block_bnqh, 1),
        "vector_ops_us": round(us_vec, 1),
        "unexplained_us": round(
            us_block - us_dense - us_attn - us_vec, 1
        ),
        "block_flops_g": round(fl_block / 1e9, 2),
        "tower_extrapolated_ms": round(
            s["blocks"] * us_block / 1e3, 2
        ),
    }

  # Whole-encoder device time, dispatch-free (the loop-delta method):
  # the r3 tower sweep's enqueue-amortized numbers carry ~1.8 ms/call
  # relay dispatch, which at ~10 ms/image is a 15-20% inflation — these
  # are the true device times the ≤8 ms/image target should be judged on.
  from cadence_gemma_tpu.models import vit as vit_lib
  from cadence_gemma_tpu.ops import quantization as quant_lib

  pixels0 = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 384, 384))
  eshapes = jax.eval_shape(
      lambda: vit_lib.DinoSigLIPEncoder().init(jax.random.PRNGKey(1),
                                               pixels0)
  )
  eleaves, etreedef = jax.tree_util.tree_flatten(eshapes)

  @jax.jit
  def ebuild():
    return [
        (0.02 * jax.random.normal(jax.random.PRNGKey(i), s.shape)).astype(
            s.dtype
        )
        for i, s in enumerate(eleaves)
    ]

  eparams = jax.tree_util.tree_unflatten(etreedef, ebuild())["params"]
  eqparams = jax.jit(quant_lib.quantize_params)(eparams)
  for label, kwargs, p in (
      ("bf16", dict(), eparams),
      ("bf16_flash", dict(use_flash_attention=True), eparams),
      ("int8_act", dict(quantized=True, act_quant=True), eqparams),
      ("int8_act_flash",
       dict(quantized=True, act_quant=True, use_flash_attention=True),
       eqparams),
  ):
    enc = vit_lib.DinoSigLIPEncoder(**kwargs)

    def enc_fn(i, p_, px, _enc=enc):
      px = px * (1 + 1e-6 * i.astype(px.dtype))
      return _enc.apply({"params": p_}, px).astype(jnp.float32).mean()

    us = _device_loop_us(enc_fn, (p, pixels0), lo=2, hi=8, reps=3)
    results.setdefault("encoder", {})[f"device_{label}_ms"] = round(
        us / 1e3, 2
    )

  print(json.dumps({
      "metric": "vision_block_breakdown",
      "value": results["dino"]["block_us"],
      "unit": "us per DINO block (bf16, in-program)",
      **{f"{k}_{m2}": v for k, r in results.items()
         for m2, v in r.items()},
      "encoder_total_gflop": round(encoder_flops / 1e9, 1),
      "encoder_bf16_roofline_ms": round(encoder_flops / 197e12 * 1e3, 2),
      "notes": "Corrected FLOP count (r3's 530 GFLOP dropped the MAC "
               "factor 2). block = full ViTBlock math; dense_matmuls = "
               "the 4 dense contractions; attn_core = fp32-logits "
               "einsum + softmax + out einsum; attn_einsums = the same "
               "two einsums with constant probs; vector_ops = 2 "
               "LayerNorms + the [t, mlp] gelu. unexplained = block - "
               "dense - attn_core - vector (fusion interactions).",
  }))
  return results


if __name__ == "__main__":
  which = sys.argv[1] if len(sys.argv) > 1 else "all"
  if which == "vision_breakdown":
    bench_vision_breakdown()
  if which in ("all", "fused"):
    bench_fused_image_ttft()
  if which in ("all", "fused_int8"):
    bench_fused_image_ttft(int8=True)
  if which in ("all", "vision"):
    bench_vision_encoder()
  if which in ("all", "batched"):
    bench_batched_decode()
  if which in ("all", "batched_int8"):
    bench_batched_decode(int8=True)
  if which in ("all", "long"):
    bench_long_window_prefill()
  if which in ("all", "sft"):
    bench_sft_step()
  if which in ("all", "lora"):
    bench_lora_step()
    bench_lora_step(int8_base=True)
  if which == "lora9b":
    from cadence_gemma_tpu import common as _c
    bench_lora_step(int8_base=True, preset=_c.Preset.RECURRENT_GEMMA_9B_V1)
  if which in ("all", "longsft"):
    bench_longcontext_sft()
  if which == "longsft_einsum":
    bench_longcontext_sft(use_flash=False)
  if which in ("all", "poisson"):
    bench_poisson_serving()
  if which in ("all", "multilora"):
    bench_multilora_serving()
  if which in ("all", "frontend"):
    bench_frontend_serving()
  if which in ("all", "roofline"):
    bench_decode_roofline(int8=True)
  if which == "roofline_bf16":
    bench_decode_roofline(int8=False)
  if which in ("all", "serving"):
    bench_serving()
  if which in ("all", "spec"):
    bench_speculative()
  if which in ("all", "constrain"):
    bench_constrained_decode()
  if which in ("all", "perreq"):
    bench_per_request_sampling()
  if which == "spec_int8":
    bench_speculative(int8=True)
  if which == "9b":
    bench_9b_int8()
