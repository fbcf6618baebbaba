"""CadenceGemma-TPU: a TPU-native multimodal Griffin/RecurrentGemma framework.

A from-scratch JAX/XLA/Pallas implementation of the CadenceGemma stack
(Griffin backbone + DINOv2/SigLIP vision pathway), designed for TPU:
Pallas kernels for the RG-LRU scan, sharded execution over ``jax.sharding``
meshes, fully on-device multimodal prefill, and a single-program decode loop.

The public API mirrors ``recurrentgemma.jax`` (the reference's supported
entry point, ``/root/reference/recurrentgemma/jax/__init__.py:28-69``) so
existing user code ports by changing the import.
"""

from cadence_gemma_tpu import common
from cadence_gemma_tpu import complex_lib
from cadence_gemma_tpu.common import apply_it_formatter
from cadence_gemma_tpu.common import GriffinConfig
from cadence_gemma_tpu.common import Preset
from cadence_gemma_tpu.common import ScanType
from cadence_gemma_tpu.common import TemporalBlockType
from cadence_gemma_tpu.checkpoint.export import export_serving
from cadence_gemma_tpu.checkpoint.export import load_serving_export
from cadence_gemma_tpu.checkpoint.export import save_serving_export
from cadence_gemma_tpu.checkpoint.io import load_parameters
from cadence_gemma_tpu.checkpoint.io import load_train_state
from cadence_gemma_tpu.checkpoint.io import save_parameters
from cadence_gemma_tpu.checkpoint.io import save_train_state
from cadence_gemma_tpu.inference.constrain import choice_regex
from cadence_gemma_tpu.inference.constrain import json_mode_dfa
from cadence_gemma_tpu.inference.constrain import json_regex
from cadence_gemma_tpu.inference.constrain import schema_dfa
from cadence_gemma_tpu.inference.constrain import schema_regex
from cadence_gemma_tpu.inference.constrain import token_strings_from_vocab
from cadence_gemma_tpu.inference.constrain import TokenDFA
from cadence_gemma_tpu.inference.constrain import tool_call_schema
from cadence_gemma_tpu.inference.modal_sampler import ModalSampler
from cadence_gemma_tpu.inference.sampler import PrefixState
from cadence_gemma_tpu.inference.serving import ContinuousBatcher
from cadence_gemma_tpu.inference.server import ServingFrontend
from cadence_gemma_tpu.inference.server import ServingHTTPServer
from cadence_gemma_tpu.inference.sampler import Sampler
from cadence_gemma_tpu.inference.sampler import SamplerOutput
from cadence_gemma_tpu.inference.sampler import SamplingState
from cadence_gemma_tpu.inference.speculative import SpeculativeSampler
from cadence_gemma_tpu.models.griffin import Cache
from cadence_gemma_tpu.models.griffin import Griffin
from cadence_gemma_tpu.models.layers import BlockDiagonalLinear
from cadence_gemma_tpu.models.layers import Conv1D
from cadence_gemma_tpu.models.layers import Einsum
from cadence_gemma_tpu.models.layers import RGLRU
from cadence_gemma_tpu.models.layers import RMSNorm
from cadence_gemma_tpu.models.layers import rnn_param_init
from cadence_gemma_tpu.models.layers import sqrt_bound_derivative
from cadence_gemma_tpu.models.modules import AttentionBlockCache
from cadence_gemma_tpu.models.modules import Embedder
from cadence_gemma_tpu.models.modules import LocalAttentionBlock
from cadence_gemma_tpu.models.modules import MLPBlock
from cadence_gemma_tpu.models.modules import RecurrentBlock
from cadence_gemma_tpu.models.modules import RecurrentBlockCache
from cadence_gemma_tpu.models.modules import ResidualBlock
from cadence_gemma_tpu.models.modules import ResidualBlockCache
from cadence_gemma_tpu.models.modules import VisionLanguageConnector
from cadence_gemma_tpu.models.vit import DinoSigLIPEncoder
from cadence_gemma_tpu.models.vit import VisionTransformer
from cadence_gemma_tpu.ops.pallas_lru import lru_pallas_scan
from cadence_gemma_tpu.ops.quantization import quantize_params
from cadence_gemma_tpu.training import lora
from cadence_gemma_tpu.ops.scan import linear_scan
from cadence_gemma_tpu.parallel.sharding import make_mesh
from cadence_gemma_tpu.parallel.sharding import multi_shard_correction
from cadence_gemma_tpu.parallel.sharding import ShardingSpec
from cadence_gemma_tpu.tokenizers import load_sentencepiece
from cadence_gemma_tpu.tokenizers import SimpleVocab
from cadence_gemma_tpu.tokenizers import Vocabulary

__version__ = "0.1.0"
