from cadence_gemma_tpu.utils import image_cpp
from cadence_gemma_tpu.utils import logging
from cadence_gemma_tpu.utils import profiling
