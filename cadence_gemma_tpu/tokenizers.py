"""Tokenizer protocol and adapters.

The samplers only need five methods of SentencePiece's processor, captured
here as :class:`Vocabulary`. Anything duck-typing it works — the real Gemma
``sentencepiece`` tokenizer (adapter below, import-gated since the extension
is optional), a HuggingFace tokenizer via :class:`HFVocabulary`, or the tiny
:class:`SimpleVocab` used in tests (mirrors the reference's MockVocab
pattern, ``jax/sampler_test.py:28-67``).
"""

from __future__ import annotations

from typing import Protocol, Sequence, runtime_checkable


@runtime_checkable
class Vocabulary(Protocol):
  """The tokenizer interface the samplers rely on."""

  def pad_id(self) -> int:
    ...

  def bos_id(self) -> int:
    ...

  def eos_id(self) -> int:
    ...

  def EncodeAsIds(self, text: str) -> list[int]:  # noqa: N802
    ...

  def DecodeIds(self, ids: Sequence[int]) -> str:  # noqa: N802
    ...


def load_sentencepiece(model_path: str) -> "Vocabulary":
  """Loads a SentencePiece ``tokenizer.model`` (e.g. the official Gemma one).

  Uses the ``sentencepiece`` extension when installed; otherwise falls back
  to the framework's self-contained implementation
  (:class:`cadence_gemma_tpu.sp_native.NativeSentencePiece` — protobuf wire
  parser + unigram/BPE segmentation with a native C++ hot loop), so real
  checkpoints tokenize without the optional dependency.
  """
  try:
    import sentencepiece as spm  # pytype: disable=import-error
  except ImportError:
    from cadence_gemma_tpu import sp_native

    return sp_native.NativeSentencePiece(model_path)
  vocab = spm.SentencePieceProcessor()
  vocab.Load(model_path)
  return vocab


class HFVocabulary:
  """Adapts a HuggingFace tokenizer to the Vocabulary protocol."""

  def __init__(self, tokenizer):
    self._tok = tokenizer

  def pad_id(self) -> int:
    pad = self._tok.pad_token_id
    return pad if pad is not None else 0

  def bos_id(self) -> int:
    return self._tok.bos_token_id

  def eos_id(self) -> int:
    return self._tok.eos_token_id

  def EncodeAsIds(self, text: str) -> list[int]:  # noqa: N802
    return self._tok.encode(text, add_special_tokens=False)

  def DecodeIds(self, ids: Sequence[int]) -> str:  # noqa: N802
    return self._tok.decode(list(ids), skip_special_tokens=True)


class SimpleVocab:
  """A tiny whitespace vocabulary for tests and offline smoke runs.

  ids: 0=pad, 1=bos, 2=eos, 3=unk, then one id per word.
  """

  def __init__(self, words: Sequence[str]):
    self._words = list(words)
    self._ids = {w: i + 4 for i, w in enumerate(self._words)}

  def pad_id(self) -> int:
    return 0

  def bos_id(self) -> int:
    return 1

  def eos_id(self) -> int:
    return 2

  def unk_id(self) -> int:
    return 3

  def GetPieceSize(self) -> int:  # noqa: N802
    return len(self._words) + 4

  def EncodeAsIds(self, text: str) -> list[int]:  # noqa: N802
    return [self._ids.get(w, 3) for w in text.split(" ") if w]

  def DecodeIds(self, ids: Sequence[int]) -> str:  # noqa: N802
    return " ".join(
        self._words[i - 4] for i in ids if i >= 4 and i - 4 < len(self._words)
    )
