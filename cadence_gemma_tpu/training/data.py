"""Dataset pipeline for LLaVA-style multimodal SFT JSON files.

Counterpart of the reference ``DatasetBuilder``
(``/root/reference/training/train_jax.py:114-349``), which iterates
llava_instruct_150k / lvis_instruct4v / LRV / DVQA / VizWiz JSON records of
the form::

    {"image": "...jpg",
     "conversations": [{"from": "human", "value": "..."},
                       {"from": "gpt", "value": "..."}, ...]}

Each record becomes a training example: the human turns are prompt (masked
out of the loss), the gpt turns are targets, everything is wrapped in the
Gemma chat template, truncated/padded to ``max_seq_len``. Unlike the
reference (which re-encodes images with a host torch ViT every step,
``train_jax.py:629-633``), image pixels are decoded on the host worker and
encoded on device by the jitted vision tower inside the training step.
"""

from __future__ import annotations

import dataclasses
import json
import queue as queue_lib
import threading
from typing import Any, Iterable, Iterator, Sequence

import jax
import numpy as np

from cadence_gemma_tpu import common


@dataclasses.dataclass
class TrainingInput:
  """One batch: token ids, loss mask, and (optionally) image pixel arrays."""

  input_tokens: np.ndarray          # [b, t] int32
  target_mask: np.ndarray           # [b, t] bool
  image_paths: list[str] | None = None
  pixels: np.ndarray | None = None  # [b, 3, h, w] float32 in [0, 1]


@dataclasses.dataclass
class DatasetBuilder:
  """Streams batched, tokenized examples from LLaVA-style JSON files.

  Attributes:
    vocab: Tokenizer implementing the Vocabulary protocol.
    json_path: Path to the JSON list of conversation records.
    image_root: Directory prefix for the records' image paths.
    max_seq_len: Examples are truncated / right-padded to this length.
    batch_size: Examples per batch.
    load_pixels: Decode images to pixel arrays (requires PIL); otherwise
      only image paths are carried through.
  """

  vocab: Any
  json_path: str
  image_root: str = ""
  max_seq_len: int = 1024
  batch_size: int = 1
  load_pixels: bool = False

  def __post_init__(self):
    with open(self.json_path) as f:
      self._records = json.load(f)

  def __len__(self) -> int:
    return len(self._records)

  def _encode_record(
      self, record: dict[str, Any]
  ) -> tuple[np.ndarray, np.ndarray]:
    """Tokenizes one conversation; mask is True on answer tokens only."""
    ids: list[int] = [self.vocab.bos_id()]
    mask: list[bool] = [False]
    for turn in record.get("conversations", []):
      text = turn.get("value", "").replace("<image>", "").strip()
      is_answer = turn.get("from") == "gpt"
      if is_answer:
        piece = f"{text}<end_of_turn>\n"
      else:
        piece = (
            f"<start_of_turn>user\n{text}<end_of_turn>\n"
            "<start_of_turn>model\n"
        )
      turn_ids = self.vocab.EncodeAsIds(piece)
      ids.extend(turn_ids)
      mask.extend([is_answer] * len(turn_ids))
    ids.append(self.vocab.eos_id())
    mask.append(True)

    ids = ids[: self.max_seq_len]
    mask = mask[: self.max_seq_len]
    pad = self.max_seq_len - len(ids)
    tokens = np.asarray(ids + [self.vocab.pad_id()] * pad, np.int32)
    target = np.asarray(mask + [False] * pad, bool)
    return tokens, target

  def _image_path(self, record: dict[str, Any]) -> str | None:
    name = record.get("image")
    if not name:
      return None
    return f"{self.image_root}/{name}" if self.image_root else name

  def __iter__(self) -> Iterator[TrainingInput]:
    return self.iterate()

  def iterate(
      self, start: int = 0, limit: int | None = None
  ) -> Iterator[TrainingInput]:
    records = self._records[start:limit]
    for lo in range(0, len(records) - self.batch_size + 1, self.batch_size):
      chunk = records[lo : lo + self.batch_size]
      tokens, masks, paths = [], [], []
      for rec in chunk:
        t, m = self._encode_record(rec)
        tokens.append(t)
        masks.append(m)
        paths.append(self._image_path(rec))
      pixels = None
      if self.load_pixels and all(paths):
        # Native C++ loader (threaded JPEG decode + PIL-exact bicubic);
        # transparently falls back to PIL when unavailable.
        from cadence_gemma_tpu.utils import image_cpp  # noqa: PLC0415

        pixels = image_cpp.load_jpeg_batch(paths, size=384)
      yield TrainingInput(
          input_tokens=np.stack(tokens),
          target_mask=np.stack(masks),
          image_paths=paths if all(paths) else None,
          pixels=pixels,
      )


def prefetch_to_device(
    iterator: Iterable[Any],
    buffer_size: int = 2,
    device: Any | None = None,
) -> Iterator[Any]:
  """Overlaps host batch prep + H2D transfer with device compute.

  TPU-native counterpart of the reference DataLoader's worker/pinned-memory
  overlap (``/root/reference/training/train.py`` builds
  ``DataLoader(..., num_workers, pin_memory=True)``): a producer thread
  pulls batches from ``iterator``, moves every ndarray field to the device
  (an async transfer on TPU), and keeps up to ``buffer_size`` batches in
  flight, so tokenization, JPEG decode, and the copy of step N+1 hide
  behind the device computing step N.

  Order is preserved and producer exceptions re-raise at the consumer.
  Opt-in via ``TrainingConfig.prefetch_batches`` — keep it off when the
  data iterator has side effects that must stay in lockstep with training
  steps (the producer runs ahead by ``buffer_size``).
  """
  q: queue_lib.Queue = queue_lib.Queue(maxsize=buffer_size)
  sentinel = object()
  stop = threading.Event()

  def to_device(batch):
    def put(x):
      return jax.device_put(x, device) if isinstance(x, np.ndarray) else x

    if dataclasses.is_dataclass(batch) and not isinstance(batch, type):
      return dataclasses.replace(
          batch,
          **{
              f.name: put(getattr(batch, f.name))
              for f in dataclasses.fields(batch)
          },
      )
    return jax.tree_util.tree_map(put, batch)

  def offer(item) -> bool:
    """Enqueues unless the consumer has gone away; returns False to stop."""
    while not stop.is_set():
      try:
        q.put(item, timeout=0.1)
        return True
      except queue_lib.Full:
        continue
    return False

  def producer():
    try:
      for item in iterator:
        if not offer(to_device(item)):
          return  # consumer abandoned the generator (early return/break)
      offer(sentinel)
    except BaseException as e:  # noqa: BLE001 — re-raised at the consumer
      offer(e)

  thread = threading.Thread(
      target=producer, daemon=True, name="cadence-data-prefetch"
  )
  thread.start()
  try:
    while True:
      item = q.get()
      if item is sentinel:
        return
      if isinstance(item, BaseException):
        raise item
      yield item
  finally:
    # Runs when the consumer breaks out early (train_loop hitting
    # max_steps / preemption) and the generator is closed or collected:
    # unblock the producer so it exits instead of pinning device batches.
    stop.set()


def apply_it_template(prompt: str) -> str:
  return common.apply_it_formatter(prompt)
