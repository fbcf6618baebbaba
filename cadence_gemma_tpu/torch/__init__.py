"""PyTorch reference path: behavior-parity twin of the JAX implementation.

Counterpart of the reference's ``recurrentgemma/torch`` package
(``/root/reference/recurrentgemma/torch/*``): the same Griffin semantics in
eager PyTorch, used (a) by users without TPU access and (b) as the
cross-framework golden-parity oracle for the JAX path (see
``tests/test_torch_parity.py`` and ``torch_.test_utils``).

Unlike the reference's torch path, the recurrence runs as a vectorized
log-depth scan rather than a Python loop over time (the reference's
``rnn_scan`` is a per-step loop, ``torch/layers.py:146-199`` — the README
calls that path "quite slow").
"""

from cadence_gemma_tpu.torch.griffin import Griffin
from cadence_gemma_tpu.torch.layers import BlockDiagonalLinear
from cadence_gemma_tpu.torch.layers import Conv1D
from cadence_gemma_tpu.torch.layers import Einsum
from cadence_gemma_tpu.torch.layers import RGLRU
from cadence_gemma_tpu.torch.layers import RMSNorm
from cadence_gemma_tpu.torch.layers import rnn_scan
from cadence_gemma_tpu.torch.modules import AttentionBlockCache
from cadence_gemma_tpu.torch.modules import Embedder
from cadence_gemma_tpu.torch.modules import LocalAttentionBlock
from cadence_gemma_tpu.torch.modules import MLPBlock
from cadence_gemma_tpu.torch.modules import RecurrentBlock
from cadence_gemma_tpu.torch.modules import RecurrentBlockCache
from cadence_gemma_tpu.torch.modules import ResidualBlock
from cadence_gemma_tpu.torch.modules import VisionLanguageConnector
from cadence_gemma_tpu.torch.sampler import Sampler
from cadence_gemma_tpu.torch import vit

try:  # DDP twin (gloo); torch builds without distributed support skip it.
  from cadence_gemma_tpu.torch import distributed
except ImportError:  # pragma: no cover
  distributed = None
