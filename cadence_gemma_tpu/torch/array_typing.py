"""jaxtyping-on-torch shape aliases (counterpart of the reference's
``recurrentgemma/torch/array_typing.py``)."""

from typing import Any, Mapping

import jaxtyping as jt
import torch

dtype = Any

Tokens = jt.Integer[torch.Tensor, "*b t"]
SegmentPos = jt.Integer[torch.Tensor, "*b t"]
NumTokens = jt.Integer[torch.Tensor, "*b"]

Activations = jt.Shaped[torch.Tensor, "*b t d"]
ExpandedActivations = jt.Shaped[torch.Tensor, "*b t e"]
TokenLogits = jt.Float[torch.Tensor, "*b ot v"]

Queries = jt.Shaped[torch.Tensor, "*b t n h"]
Keys = jt.Shaped[torch.Tensor, "*b t 1 h"]
Values = jt.Shaped[torch.Tensor, "*b t 1 h"]
CachedKeys = jt.Shaped[torch.Tensor, "*b w 1 h"]
CachedValues = jt.Shaped[torch.Tensor, "*b w 1 h"]
AttentionMask = jt.Bool[torch.Tensor, "*b t s"]

RNNState = jt.Shaped[torch.Tensor, "*b d"]
Conv1DState = jt.Shaped[torch.Tensor, "*b tw d"]
RNNDiagonal = jt.Shaped[torch.Tensor, "d"]

Image = jt.Shaped[torch.Tensor, "*b p i"]

Params = Mapping[str, Any]
