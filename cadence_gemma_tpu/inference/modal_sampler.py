"""Image+text sampler: fuses vision encoding into the device-side prefill.

API-compatible with the reference ``ModalSampler``
(``/root/reference/recurrentgemma/jax/modal_sampler.py:81-501``), but the
vision pathway is JAX end-to-end: the reference runs two timm/PyTorch ViTs
on the host and copies features across frameworks per call
(``modal_sampler.py:452-454``); here the encoder is a jitted JAX module, so
image preprocessing → ViT towers → VL projection → Griffin prefill is one
device program with no host round-trips — the TTFT path the build targets.

The encoder is pluggable: anything callable as ``encoder(pixels) ->
[b, vision_tokens, vision_width]`` works (see
:class:`cadence_gemma_tpu.models.vit.DinoSigLIPEncoder`). Pre-computed
feature tensors are also accepted directly via ``img_embed``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import jaxtyping as jt

from cadence_gemma_tpu import array_typing as at
from cadence_gemma_tpu.inference import sampler as sampler_lib
from cadence_gemma_tpu.parallel import partitioning

SamplerOutput = sampler_lib.SamplerOutput


class ModalSampler(sampler_lib.Sampler):
  """Sampler that also accepts an image path / pixels / features."""

  def __init__(
      self,
      model,
      vocab: Any,
      params: at.Params,
      jit_compile: bool = True,
      deterministic_sampling: bool = True,
      is_it_model: bool = False,
      vision_encoder: Any | None = None,
      vision_params: at.Params | None = None,
      **kwargs,
  ):
    """See :class:`cadence_gemma_tpu.inference.sampler.Sampler`.

    Args:
      vision_encoder: Optional encoder module with
        ``apply({'params': vision_params}, pixels)`` →
        ``[b, vision_tokens, vision_width]`` and a
        ``preprocess_path(img_path)`` → pixels helper. Required only when
        calling with ``img_path``/``pixels`` rather than ``img_embed``.
      vision_params: Parameters for the encoder.
    """
    super().__init__(
        model,
        vocab,
        params,
        jit_compile=jit_compile,
        deterministic_sampling=deterministic_sampling,
        is_it_model=is_it_model,
        **kwargs,
    )
    self.vision_encoder = vision_encoder
    if vision_params is not None and self.mesh is not None:
      # Multi-chip serving: the LM params take the Megatron TP layouts
      # (base class), and since r5 the vision towers do too —
      # attn_qkv/mlp_fc1 column-parallel, attn_proj/mlp_fc2 row-parallel
      # over the ``model`` axis (parallel/partitioning.py ViT rules) —
      # so a TP-8 mesh no longer carries the full ~800M-param encoder
      # pair on every chip (r4 replicated them). Falls back to
      # replication for meshes without a model axis, and per-leaf for
      # indivisible dims. Everything stays on one mesh (mixing
      # mesh-committed LM params with host-committed vision params
      # would not compile).
      vision_params = jax.device_put(
          vision_params,
          partitioning.param_shardings_or_replicated(
              self.mesh, vision_params
          ),
      )
    self.vision_params = vision_params
    if vision_encoder is not None and jit_compile:
      self._encode_fn = jax.jit(
          lambda p, px: vision_encoder.apply({"params": p}, px)
      )
      # Fully fused prefill: raw pixels -> preprocessing -> ViT towers ->
      # VL projection -> Griffin prefill, one XLA program (the north-star
      # path; the reference crosses host/torch/jax per image,
      # modal_sampler.py:452-454).
      # Model params enter as a real argument — closing over them would
      # bake a weights-sized constant block into the lowered program.
      self._fused_prefill_fn = jax.jit(
          self._fused_prefill, static_argnums=[6, 7, 8]
      )
    elif vision_encoder is not None:
      self._encode_fn = lambda p, px: vision_encoder.apply({"params": p}, px)
      self._fused_prefill_fn = self._fused_prefill
    else:
      self._encode_fn = None
      self._fused_prefill_fn = None

  def _fused_prefill(
      self,
      params,
      vision_params,
      pixels,
      tokens,
      rng,
      input_lengths,
      total_generation_steps,
      return_logits,
      echo,
      constraint_tables=None,
  ):
    features = self.vision_encoder.apply(
        {"params": vision_params}, pixels
    ).astype(jnp.bfloat16)
    return self._prompt_processing_fn(
        params,
        tokens,
        rng,
        input_lengths,
        total_generation_steps,
        return_logits,
        echo,
        features,
        None,
        None,
        constraint_tables,
    )

  def encode_image(self, img_path: str) -> at.Image:
    """Decodes + preprocesses + encodes an image file to fused features."""
    if self.vision_encoder is None:
      raise ValueError(
          "ModalSampler needs a vision_encoder to take image paths; pass "
          "img_embed directly otherwise."
      )
    pixels = self.vision_encoder.preprocess_path(img_path)
    features = self._encode_fn(self.vision_params, pixels)
    return features.astype(jnp.bfloat16)

  def __call__(
      self,
      input_strings: Sequence[str],
      total_generation_steps: int,
      rng: jt.PRNGKeyArray | None = None,
      echo: bool = False,
      return_logits: bool = False,
      end_sampling_at_eos_token: bool = True,
      img_path: str = "",
      pixels: at.ImagePixels | None = None,
      img_embed: at.Image | None = None,
      prefix_state=None,
      return_state: bool = False,
      constraint=None,
  ) -> SamplerOutput:
    """Samples completions, optionally conditioned on one image.

    Exactly one (or none) of ``img_path`` / ``pixels`` / ``img_embed`` may
    be given. An empty ``img_path`` means text-only (the reference crashes
    on that path, ``modal_sampler.py:451-472``; here it degrades cleanly).

    ``return_state`` / ``prefix_state`` follow the base sampler: an
    image-grounded first turn with ``return_state=True`` encodes and
    prefills the image once, and follow-up turns continue text-only from
    the returned state.
    """
    given = [img_path != "", pixels is not None, img_embed is not None]
    if sum(given) > 1:
      raise ValueError(
          "Pass at most one of img_path, pixels, or img_embed."
      )
    if prefix_state is not None and any(given):
      raise ValueError(
          "prefix_state cannot be combined with an image argument: the "
          "image splices in after the BOS token, which lives in the "
          "cached context."
      )
    if img_path:
      if self.vision_encoder is None:
        raise ValueError(
            "ModalSampler needs a vision_encoder to take image paths; pass "
            "img_embed directly otherwise."
        )
      pixels = self.vision_encoder.preprocess_path(img_path)

    if pixels is not None:
      # Fused path: decode is the only host step; everything from raw
      # pixels to the first sampled token is one device program.
      self._validate_sampling_args(total_generation_steps, rng)
      if return_state and total_generation_steps < 1:
        # Validate before the fused prefill runs — the base sampler also
        # rejects this combination before doing any device work.
        raise ValueError(
            "return_state requires total_generation_steps >= 1."
        )
      all_ids = [self.tokenize(s) for s in input_strings]
      lengths = [len(ids) for ids in all_ids]
      if len(set(lengths)) != 1:
        # Same constraint as the feature path: the image splices in after
        # token 0, which must be the real BOS (no left padding).
        raise ValueError(
            "Multimodal sampling requires equal-length prompts per batch "
            f"(got lengths {lengths})."
        )
      padded_tokens = jnp.stack(all_ids, axis=0)
      input_lengths = jnp.asarray(lengths)
      pad_lengths = padded_tokens.shape[1] - input_lengths
      constraint_tables = self._resolve_constraint(constraint)
      state = self._fused_prefill_fn(
          self.params,
          self.vision_params,
          pixels,
          padded_tokens,
          rng,
          input_lengths,
          total_generation_steps,
          return_logits,
          echo,
          constraint_tables,
      )
      return self._finish_sampling(
          state, pad_lengths, total_generation_steps, echo, return_logits,
          end_sampling_at_eos_token, return_state, constraint_tables,
      )

    return super().__call__(
        input_strings=input_strings,
        total_generation_steps=total_generation_steps,
        rng=rng,
        echo=echo,
        return_logits=return_logits,
        end_sampling_at_eos_token=end_sampling_at_eos_token,
        img_embed=img_embed,
        prefix_state=prefix_state,
        return_state=return_state,
        constraint=constraint,
    )
