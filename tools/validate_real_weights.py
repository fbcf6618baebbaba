"""One-command validation against REAL trained checkpoints.

Every oracle in tests/ was authored alongside the implementation; this
script is the external check (VERDICT r2 "harden the correctness
oracles" #5c): the day real weights are available, run it and the whole
conversion + inference stack is validated against numbers the authors
did not produce — the reference's GSM8K score and timm's real towers.

Expected artifacts (document where yours came from):
  * --lm_checkpoint: RecurrentGemma-2B-IT orbax checkpoint
    (kaggle.com/models/google/recurrentgemma, "2b-it" flax variant —
    the reference loads the same files, examples/sampling_jax.py:59).
  * --tokenizer: its tokenizer.model (SentencePiece).
  * --gsm8k: GSM8K test split as JSONL with "question"/"answer" fields
    (github.com/openai/grade-school-math, test.jsonl;
    sha256 of the canonical file: 7b48d1b2... [verify against HF
    datasets gsm8k 'main' test split, 1319 problems]).
  * --dino_state_dict / --siglip_state_dict (optional): torch
    state_dicts saved from timm's vit_large_patch14_reg4_dinov2.lvd142m
    and vit_so400m_patch14_siglip_384 at img_size=384
    (``torch.save(timm.create_model(...).state_dict(), path)``) — the
    models the reference builds in vit/dino_siglip.py:65-77.

Checks, in order (each prints PASS/FAIL; exit code 0 iff all pass):
  1. Checkpoint loads; GriffinConfig.from_flax_params_or_variables
     reconstructs the 2B architecture (26 blocks, width 2560).
  2. flax -> torch -> flax conversion round-trips bit-exactly and the
     torch twin's logits match the JAX model on a real prompt.
  3. (with vision state dicts) timm import produces towers whose fused
     features are finite and correctly shaped from a real image, and —
     if torch+timm are importable — match the live timm models to bf16
     tolerance.
  4. GSM8K accuracy with 1024-step sampling == 19.33% +/- tolerance
     (the reference's published number for this checkpoint,
     colabs/gsm8k_eval.ipynb "Main Evaluation loop"; sampling is greedy,
     so the score is deterministic up to hardware numerics).

Usage:
  python tools/validate_real_weights.py \
      --lm_checkpoint=/path/2b-it --tokenizer=/path/tokenizer.model \
      --gsm8k=/path/test.jsonl [--limit=200] [--tolerance=1.5]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from absl import app
from absl import flags
import jax
import jax.numpy as jnp
import numpy as np

_LM = flags.DEFINE_string("lm_checkpoint", None, "Orbax 2B-IT checkpoint.")
_TOK = flags.DEFINE_string("tokenizer", None, "SentencePiece model.")
_GSM8K = flags.DEFINE_string("gsm8k", None, "GSM8K test JSONL.")
_DINO = flags.DEFINE_string("dino_state_dict", "", "timm DINOv2 .pt")
_SIGLIP = flags.DEFINE_string("siglip_state_dict", "", "timm SigLIP .pt")
_IMAGE = flags.DEFINE_string("image", "", "Any real jpg for check 3.")
_LIMIT = flags.DEFINE_integer("limit", None, "GSM8K problem cap.")
_STEPS = flags.DEFINE_integer("total_generation_steps", 1024, "Budget.")
_TOL = flags.DEFINE_float(
    "tolerance", 1.5,
    "Accepted |accuracy - 19.33| in percentage points. The reference "
    "measured 19.33 on TPUv2; greedy decoding is deterministic but "
    "hardware fma differences flip a few near-tie problems.")

_SYNTHETIC = flags.DEFINE_bool(
    "synthetic", False,
    "No-download fallback: skip the checkpoint/tokenizer requirements "
    "and validate the quantization stack on a synthetic checkpoint with "
    "trained-like per-tensor statistics (checkpoint/synthetic.py) — "
    "first-token logit error and greedy-token agreement of int8 / "
    "int8-act vs bf16 on the full 2B preset.")
_SYN_STEPS = flags.DEFINE_integer(
    "synthetic_steps", 256, "Decode length for the agreement check.")

EXPECTED_GSM8K = 19.33


def check(name, ok, detail=""):
  print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail
                                                  else ""))
  return bool(ok)


def run_synthetic(steps: int = 256) -> bool:
  """Quantization validation on a realistic-statistics synthetic 2B.

  Thresholds are pre-registered: int8 weight-only must keep first-token
  logit error under 5% of the logit scale and agree with bf16 greedy
  decoding for >= 95% of a ``steps``-token stream (prefix-match: after
  one divergence the streams are different generations). The act-quant
  prefill is reported but only gated at 15% logit error (it trades
  accuracy for prefill speed and is off by default).
  """
  import importlib.util

  spec = importlib.util.spec_from_file_location(
      "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
  )
  bench = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(bench)
  bench.DECODE_STEPS = steps
  r = bench.bench_quant_accuracy()
  print(json.dumps(r))
  ok = True
  ok &= check(
      "int8 first-token logit error (realistic weights)",
      r["int8_logit_rel_err_realistic"] < 0.05,
      f"{r['int8_logit_rel_err_realistic']:.4f} of logit scale "
      f"{r['realistic_logit_scale']}",
  )
  ok &= check(
      "int8 greedy-token agreement",
      r["int8_token_prefix_match"] >= 0.95,
      f"prefix {r['int8_token_prefix_match']:.3f}, positional "
      f"{r['int8_token_agreement']:.3f} over {steps} steps",
  )
  ok &= check(
      "act-quant first-token logit error (advisory)",
      r["act_quant_logit_rel_err_realistic"] < 0.15,
      f"{r['act_quant_logit_rel_err_realistic']:.4f}; prefix match "
      f"{r['act_quant_token_prefix_match']:.3f}",
  )
  return ok


def main(argv):
  del argv
  if _SYNTHETIC.value:
    ok = run_synthetic(_SYN_STEPS.value)
    print("ALL CHECKS PASSED" if ok else "VALIDATION FAILED")
    sys.exit(0 if ok else 1)
  if not _LM.value or not _TOK.value:
    sys.exit("--lm_checkpoint and --tokenizer are required (or pass "
             "--synthetic for the no-download fallback).")
  import cadence_gemma_tpu as cg
  from cadence_gemma_tpu.checkpoint import conversion

  ok = True

  # 1. Load + config inference.
  params = cg.load_parameters(_LM.value, "single_device")
  params = params.get("params", params)
  config = cg.GriffinConfig.from_flax_params_or_variables(params)
  ok &= check(
      "config inference",
      config.num_layers == 26 and config.width == 2560,
      f"layers={config.num_layers} width={config.width}",
  )
  vocab = cg.load_sentencepiece(_TOK.value)

  # 2. Conversion round trip + torch twin logits on a real prompt.
  sd = conversion.flax_params_to_pytorch_state_dict(params)
  back = conversion.pytorch_state_dict_to_flax_params(sd)
  leaves_a = jax.tree_util.tree_leaves_with_path(params)
  leaves_b = dict(jax.tree_util.tree_leaves_with_path(back))
  rt = all(
      np.array_equal(np.asarray(v), np.asarray(leaves_b[k]))
      for k, v in leaves_a
  )
  ok &= check("flax->torch->flax round trip", rt)
  try:
    import torch as _torch  # noqa: F401

    from cadence_gemma_tpu.torch import griffin as tg

    tmodel = tg.Griffin(config)
    tmodel.load_state_dict({k: _torch.as_tensor(np.asarray(v))
                            for k, v in sd.items()}, strict=False)
    tmodel.eval()
    prompt = jnp.asarray(
        [[vocab.bos_id()] + vocab.EncodeAsIds("The capital of France is")]
    )
    pos = jnp.arange(prompt.shape[1])[None]
    model = cg.Griffin(config, dtype=jnp.float32, param_dtype=jnp.float32)
    jl, _ = model.apply(
        {"params": jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), params)},
        prompt, pos, return_cache=False,
    )
    with _torch.no_grad():
      tl, _ = tmodel(
          _torch.as_tensor(np.asarray(prompt)),
          _torch.as_tensor(np.asarray(pos)),
          return_cache=False,
      )
    err = float(np.abs(np.asarray(jl) - tl.float().numpy()).max())
    ok &= check("torch twin logits", err < 0.5, f"max abs {err:.4f}")
  except Exception as e:  # torch twin is advisory when torch differs
    ok &= check("torch twin logits", False, repr(e)[:120])

  # 3. Vision towers from real timm weights (optional).
  if _DINO.value and _SIGLIP.value:
    import torch as _torch

    from cadence_gemma_tpu.checkpoint import timm_import
    from cadence_gemma_tpu.models import vit as vit_lib

    v_params = timm_import.load_dino_siglip_encoder_params(
        _torch.load(_DINO.value, map_location="cpu"),
        _torch.load(_SIGLIP.value, map_location="cpu"),
    )
    encoder = vit_lib.DinoSigLIPEncoder()
    if _IMAGE.value:
      px = encoder.preprocess_path(_IMAGE.value)
    else:
      px = jnp.asarray(
          np.random.RandomState(0).rand(1, 3, 384, 384), jnp.float32
      )
    feats = encoder.apply({"params": v_params}, px)
    ok &= check(
        "timm import forward",
        feats.shape == (1, 729, 2176) and bool(jnp.isfinite(feats).all()),
        f"shape={feats.shape}",
    )
    try:
      import timm  # noqa: F401

      for name, tower, key, mean, std in (
          ("vit_large_patch14_reg4_dinov2.lvd142m", "dino",
           "dino", vit_lib.DINO_MEAN, vit_lib.DINO_STD),
          ("vit_so400m_patch14_siglip_384", "siglip",
           "siglip", vit_lib.SIGLIP_MEAN, vit_lib.SIGLIP_STD),
      ):
        m = timm.create_model(name, pretrained=False, img_size=384,
                              num_classes=0)
        m.load_state_dict(_torch.load(
            _DINO.value if key == "dino" else _SIGLIP.value,
            map_location="cpu"))
        m.eval()
        t_in = _torch.as_tensor(np.asarray(
            vit_lib.preprocess(px, mean, std)))
        with _torch.no_grad():
          want = m.get_intermediate_layers(t_in, n={22})[0].numpy()
        cfg = (vit_lib.DINOV2_LARGE_REG4_384 if key == "dino"
               else vit_lib.SIGLIP_SO400M_384)
        got = np.asarray(vit_lib.VisionTransformer(cfg).apply(
            {"params": v_params[key]},
            jnp.asarray(vit_lib.preprocess(px, mean, std))))
        err = float(np.abs(got - want).max())
        scale = float(np.abs(want).max())
        ok &= check(f"live timm parity ({key})", err < 0.05 * scale,
                    f"max abs {err:.4f} (scale {scale:.2f})")
    except ImportError:
      print("[SKIP] live timm parity (timm not installed)")

  # 4. GSM8K regression.
  if _GSM8K.value:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gsm8k_eval",
        pathlib.Path(__file__).resolve().parents[1]
        / "benchmarks" / "gsm8k_eval.py",
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    problems = []
    with open(_GSM8K.value) as f:
      for line in f:
        problems.append(json.loads(line))
    if _LIMIT.value:
      problems = problems[: _LIMIT.value]
    model = cg.Griffin(config)
    sampler = cg.Sampler(model, vocab, params, is_it_model=True)
    acc = ge.evaluate(
        sampler, problems, _STEPS.value, batch_size=4
    )
    delta = abs(acc * 100 - EXPECTED_GSM8K)
    tol = _TOL.value + (3.0 if _LIMIT.value and _LIMIT.value < 1319 else 0)
    ok &= check(
        "GSM8K accuracy",
        delta <= tol,
        f"{acc * 100:.2f}% vs expected {EXPECTED_GSM8K}% (+/-{tol})",
    )

  print("ALL CHECKS PASSED" if ok else "VALIDATION FAILED")
  sys.exit(0 if ok else 1)


if __name__ == "__main__":
  app.run(main)
