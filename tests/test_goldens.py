"""Hand-computed golden vectors for the trickiest conversions (VERDICT r2
"harden the oracles": every other numeric test compares two
implementations the same author wrote; these pin semantics to literals
computed independently — plain-Python scalar math for the RG-LRU step,
and values recorded from real ``torch.nn.functional.interpolate`` for the
pos-embed resample — so a shared misreading cannot pass silently)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cadence_gemma_tpu.checkpoint import timm_import
from cadence_gemma_tpu.models import layers


def sigmoid(v):
  return 1.0 / (1.0 + math.exp(-v))


def softplus(v):
  return math.log1p(math.exp(v))


class TestRGLRUGolden:
  """One RG-LRU step against scalar pencil-and-paper math.

  Step semantics (reference ``jax/layers.py:191-326``):
    gate_x = sigmoid(x @ W_x + b_x);  gate_a = sigmoid(x @ W_a + b_a)
    log_a  = -8 * gate_a * softplus(Lambda);  a = exp(log_a)
    y      = a * h0 + x * gate_x * sqrt(1 - a^2)     (non-reset)
    y      = x * gate_x                              (segment_pos == 0)
  """

  W_X = [[0.5, -0.25], [0.1, 0.3]]
  B_X = [0.1, -0.2]
  W_A = [[0.2, 0.4], [-0.3, 0.1]]
  B_A = [0.05, 0.15]
  LAM = [0.0, 0.5]
  X = [0.4, -0.6]
  H0 = [0.25, -0.5]

  def _expected(self, reset: bool):
    out = []
    for j in range(2):
      pre_x = sum(self.X[i] * self.W_X[i][j] for i in range(2)) + self.B_X[j]
      pre_a = sum(self.X[i] * self.W_A[i][j] for i in range(2)) + self.B_A[j]
      gate_x = sigmoid(pre_x)
      gate_a = sigmoid(pre_a)
      log_a = -8.0 * gate_a * softplus(self.LAM[j])
      a = math.exp(log_a)
      if reset:
        out.append(self.X[j] * gate_x)
      else:
        mult = math.sqrt(1.0 - math.exp(2.0 * log_a))
        out.append(a * self.H0[j] + self.X[j] * gate_x * mult)
    return out

  def _run(self, segment_pos):
    layer = layers.RGLRU(width=2, num_heads=1, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    params = {
        "a_param": jnp.asarray(self.LAM, jnp.float32),
        "input_gate": {
            "w": jnp.asarray([self.W_X], jnp.float32),
            "b": jnp.asarray([self.B_X], jnp.float32),
        },
        "a_gate": {
            "w": jnp.asarray([self.W_A], jnp.float32),
            "b": jnp.asarray([self.B_A], jnp.float32),
        },
    }
    x = jnp.asarray([[self.X]], jnp.float32)  # [b=1, t=1, d=2]
    pos = jnp.asarray([[segment_pos]], jnp.int32)
    cache = jnp.asarray([self.H0], jnp.float32)
    y, _ = layer.apply({"params": params}, x, pos, cache)
    return np.asarray(y)[0, 0]

  def test_step_matches_scalar_math(self):
    np.testing.assert_allclose(
        self._run(segment_pos=3), self._expected(reset=False), rtol=1e-6
    )

  def test_reset_step_matches_scalar_math(self):
    np.testing.assert_allclose(
        self._run(segment_pos=0), self._expected(reset=True), rtol=1e-6
    )


class TestPosEmbedResampleGolden:
  """4x4 → 3x3 bicubic pos-embed resample vs RECORDED torch output.

  The literals below are ``torch.nn.functional.interpolate(x, size=(3, 3),
  mode='bicubic', antialias=True)`` (torch 2.x CPU) on the input grid —
  the exact call timm's ``resample_abs_pos_embed`` makes
  (``vit/dino_siglip.py`` loads checkpoints whose 518px grids timm
  resamples to 384px). Pinning them catches any drift in our
  ``jax.image.resize`` usage (e.g. antialias=False, which is 0.45 max-abs
  away on this input) without needing torch at test time.
  """

  # x = (arange(32).reshape(1, 4, 4, 2) - 15.5) / 7.25
  TORCH_GOLDEN = [
      [-1.87595689, -1.73802567],
      [-1.51455843, -1.37662733],
      [-1.15316033, -1.01522946],
      [-0.43036371, -0.29243273],
      [-0.06896553, 0.06896552],
      [0.29243273, 0.43036374],
      [1.01522923, 1.15316021],
      [1.37662733, 1.51455843],
      [1.73802590, 1.87595701],
  ]

  def test_resample_matches_recorded_torch(self):
    x = (np.arange(32, dtype=np.float32).reshape(1, 16, 2) - 15.5) / 7.25
    grid, prefix = timm_import._resize_pos_embed(
        x, num_prefix=0, target_patches=9
    )
    assert prefix is None
    np.testing.assert_allclose(
        grid.reshape(9, 2), np.asarray(self.TORCH_GOLDEN), atol=1e-5
    )

  def test_prefix_rows_preserved(self):
    x = np.concatenate(
        [np.full((1, 1, 2), 7.0, np.float32),
         (np.arange(32, dtype=np.float32).reshape(1, 16, 2) - 15.5) / 7.25],
        axis=1,
    )
    grid, prefix = timm_import._resize_pos_embed(
        x, num_prefix=1, target_patches=9
    )
    np.testing.assert_array_equal(prefix, np.full((1, 1, 2), 7.0))
    np.testing.assert_allclose(
        grid.reshape(9, 2), np.asarray(self.TORCH_GOLDEN), atol=1e-5
    )
