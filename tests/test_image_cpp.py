"""Native image-preprocessing library: PIL bit-exactness and fallbacks."""

import os
import tempfile

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from cadence_gemma_tpu.utils import image_cpp  # noqa: E402


@pytest.fixture(scope="module")
def jpegs():
  d = tempfile.mkdtemp()
  rng = np.random.RandomState(0)
  paths = []
  for i, shape in enumerate([(517, 389), (100, 800), (64, 64)]):
    arr = (rng.rand(*shape, 3) * 255).astype(np.uint8)
    p = os.path.join(d, f"img{i}.jpg")
    Image.fromarray(arr).save(p, quality=95)
    paths.append(p)
  return d, paths


def _pil_reference(path, size=384):
  with open(path, "rb") as f:
    img = Image.open(f).convert("RGB").resize((size, size), Image.BICUBIC)
  return np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))


needs_native = pytest.mark.skipif(
    not image_cpp.available(), reason="native library not built"
)


@needs_native
class TestNative:

  def test_single_bit_exact_vs_pil(self, jpegs):
    _, paths = jpegs
    for p in paths:
      np.testing.assert_array_equal(
          image_cpp.load_jpeg(p, 384), _pil_reference(p)
      )

  def test_batch_matches_singles(self, jpegs):
    _, paths = jpegs
    batch = image_cpp.load_jpeg_batch(paths, 384)
    assert batch.shape == (len(paths), 3, 384, 384)
    for i, p in enumerate(paths):
      np.testing.assert_array_equal(batch[i], image_cpp.load_jpeg(p, 384))

  def test_non_jpeg_fallback(self, jpegs):
    d, _ = jpegs
    png = os.path.join(d, "x.png")
    Image.fromarray(
        (np.random.RandomState(1).rand(50, 60, 3) * 255).astype(np.uint8)
    ).save(png)
    out = image_cpp.load_jpeg(png, 384)
    np.testing.assert_array_equal(out, _pil_reference(png))

  def test_missing_file_falls_back_cleanly(self, jpegs):
    d, _ = jpegs
    with pytest.raises(FileNotFoundError):
      image_cpp.load_jpeg(os.path.join(d, "nope.jpg"), 384)


def test_pil_fallback_path(jpegs, monkeypatch):
  """With the native library forced off, the loader still works via PIL."""
  _, paths = jpegs
  monkeypatch.setattr(image_cpp, "_load_library", lambda: None)
  out = image_cpp.load_jpeg(paths[0], 384)
  assert out.shape == (3, 384, 384)
  batch = image_cpp.load_jpeg_batch(paths, 384)
  assert batch.shape == (len(paths), 3, 384, 384)
