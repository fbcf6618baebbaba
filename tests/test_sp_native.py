"""Tests for the self-contained SentencePiece tokenizer (sp_native.py).

Oracles are deliberately independent of the implementation under test:

  * model files are serialized with **google.protobuf** (dynamic
    descriptors) — not with a hand-written mirror of our wire parser;
  * unigram and BPE segmentation are cross-checked against **HuggingFace
    ``tokenizers``** (an independent reimplementation of SentencePiece's
    algorithms) on randomized vocabularies and inputs;
  * the precompiled-charsmap reader is fed a double-array built by a tiny
    local builder and cross-checked against HF ``normalizers.Precompiled``
    (the ``spm_precompiled`` Rust crate) on single-character keys;
  * the native C++ segmenter is equality-tested against the pure-Python
    reference on randomized models and texts.
"""

from __future__ import annotations

import random
import struct

import pytest

from cadence_gemma_tpu import sp_native
from cadence_gemma_tpu import tokenizers as tok_lib
from cadence_gemma_tpu.utils import sp_cpp

# -- model-file builder (google.protobuf dynamic messages) --------------------


def _model_proto_class():
  from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

  fdp = descriptor_pb2.FileDescriptorProto()
  fdp.name = "sp_test_model.proto"
  fdp.package = "sptest"
  # proto2 (field presence) — sentencepiece_model.proto is proto2.

  piece = fdp.message_type.add()
  piece.name = "SentencePiece"
  for name, num, ftype in [
      ("piece", 1, descriptor_pb2.FieldDescriptorProto.TYPE_STRING),
      ("score", 2, descriptor_pb2.FieldDescriptorProto.TYPE_FLOAT),
      ("type", 3, descriptor_pb2.FieldDescriptorProto.TYPE_INT32),
  ]:
    f = piece.field.add()
    f.name, f.number, f.type = name, num, ftype
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

  trainer = fdp.message_type.add()
  trainer.name = "TrainerSpec"
  for name, num, ftype in [
      ("model_type", 3, descriptor_pb2.FieldDescriptorProto.TYPE_INT32),
      ("byte_fallback", 35, descriptor_pb2.FieldDescriptorProto.TYPE_BOOL),
      ("unk_id", 40, descriptor_pb2.FieldDescriptorProto.TYPE_INT32),
      ("bos_id", 41, descriptor_pb2.FieldDescriptorProto.TYPE_INT32),
      ("eos_id", 42, descriptor_pb2.FieldDescriptorProto.TYPE_INT32),
      ("pad_id", 43, descriptor_pb2.FieldDescriptorProto.TYPE_INT32),
      ("unk_surface", 44, descriptor_pb2.FieldDescriptorProto.TYPE_STRING),
  ]:
    f = trainer.field.add()
    f.name, f.number, f.type = name, num, ftype
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

  norm = fdp.message_type.add()
  norm.name = "NormalizerSpec"
  for name, num, ftype in [
      ("name", 1, descriptor_pb2.FieldDescriptorProto.TYPE_STRING),
      ("precompiled_charsmap", 2,
       descriptor_pb2.FieldDescriptorProto.TYPE_BYTES),
      ("add_dummy_prefix", 3, descriptor_pb2.FieldDescriptorProto.TYPE_BOOL),
      ("remove_extra_whitespaces", 4,
       descriptor_pb2.FieldDescriptorProto.TYPE_BOOL),
      ("escape_whitespaces", 5,
       descriptor_pb2.FieldDescriptorProto.TYPE_BOOL),
  ]:
    f = norm.field.add()
    f.name, f.number, f.type = name, num, ftype
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

  model = fdp.message_type.add()
  model.name = "ModelProto"
  f = model.field.add()
  f.name, f.number = "pieces", 1
  f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
  f.type_name = ".sptest.SentencePiece"
  f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED
  for name, num, tname in [
      ("trainer_spec", 2, ".sptest.TrainerSpec"),
      ("normalizer_spec", 3, ".sptest.NormalizerSpec"),
  ]:
    f = model.field.add()
    f.name, f.number = name, num
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    f.type_name = tname
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

  pool = descriptor_pool.DescriptorPool()
  pool.Add(fdp)
  return message_factory.GetMessageClass(
      pool.FindMessageTypeByName("sptest.ModelProto")
  )


_MODEL_CLS = _model_proto_class()


def build_model_bytes(
    pieces,
    model_type=sp_native.UNIGRAM,
    unk_id=3,  # std_specials layout: <pad>=0 <bos>=1 <eos>=2 <unk>=3
    bos_id=1,
    eos_id=2,
    pad_id=None,
    byte_fallback=None,
    unk_surface=None,
    add_dummy_prefix=None,
    remove_extra_whitespaces=None,
    escape_whitespaces=None,
    precompiled_charsmap=None,
) -> bytes:
  """Serializes a ModelProto with google.protobuf (independent encoder)."""
  msg = _MODEL_CLS()
  for piece, score, ptype in pieces:
    p = msg.pieces.add()
    p.piece, p.score, p.type = piece, score, ptype
  msg.trainer_spec.model_type = model_type
  msg.trainer_spec.unk_id = unk_id
  msg.trainer_spec.bos_id = bos_id
  msg.trainer_spec.eos_id = eos_id
  if pad_id is not None:
    msg.trainer_spec.pad_id = pad_id
  if byte_fallback is not None:
    msg.trainer_spec.byte_fallback = byte_fallback
  if unk_surface is not None:
    msg.trainer_spec.unk_surface = unk_surface
  if add_dummy_prefix is not None:
    msg.normalizer_spec.add_dummy_prefix = add_dummy_prefix
  if remove_extra_whitespaces is not None:
    msg.normalizer_spec.remove_extra_whitespaces = remove_extra_whitespaces
  if escape_whitespaces is not None:
    msg.normalizer_spec.escape_whitespaces = escape_whitespaces
  if precompiled_charsmap is not None:
    msg.normalizer_spec.precompiled_charsmap = precompiled_charsmap
  return msg.SerializeToString()


def std_specials():
  return [
      ("<pad>", 0.0, sp_native.CONTROL),
      ("<bos>", 0.0, sp_native.CONTROL),
      ("<eos>", 0.0, sp_native.CONTROL),
      ("<unk>", 0.0, sp_native.UNKNOWN),
  ]


# pad=0, bos=1, eos=2, unk=3 for every model built via std_specials.
_STD = dict(pad_id=0, bos_id=1, eos_id=2, unk_id=3)


# -- wire parser ---------------------------------------------------------------


class TestWireParser:

  def test_pieces_and_spec_round_trip(self):
    data = build_model_bytes(
        std_specials() + [("▁hi", -1.5, sp_native.NORMAL)],
        model_type=sp_native.BPE,
        unk_id=0,
        pad_id=7,
        byte_fallback=True,
        unk_surface="<?>",
        add_dummy_prefix=False,
        remove_extra_whitespaces=False,
        escape_whitespaces=False,
    )
    proto = sp_native.parse_model_proto(data)
    assert [p[0] for p in proto.pieces[-1:]] == ["▁hi"]
    assert proto.pieces[-1][1] == pytest.approx(-1.5)
    assert proto.pieces[-1][2] == sp_native.NORMAL
    assert proto.model_type == sp_native.BPE
    assert (proto.unk_id, proto.bos_id, proto.eos_id, proto.pad_id) == (
        0, 1, 2, 7,
    )
    assert proto.byte_fallback is True
    assert proto.unk_surface == "<?>"
    assert proto.add_dummy_prefix is False
    assert proto.remove_extra_whitespaces is False
    assert proto.escape_whitespaces is False

  def test_proto2_defaults_apply_when_fields_absent(self):
    # Only pieces serialized: trainer/normalizer defaults must match
    # sentencepiece_model.proto's declared defaults.
    msg = _MODEL_CLS()
    p = msg.pieces.add()
    p.piece, p.score, p.type = "a", -1.0, sp_native.NORMAL
    proto = sp_native.parse_model_proto(msg.SerializeToString())
    assert proto.model_type == sp_native.UNIGRAM
    assert (proto.unk_id, proto.bos_id, proto.eos_id, proto.pad_id) == (
        0, 1, 2, -1,
    )
    assert proto.byte_fallback is False
    assert proto.add_dummy_prefix is True
    assert proto.remove_extra_whitespaces is True
    assert proto.escape_whitespaces is True
    assert proto.unk_surface == " ⁇ "

  def test_negative_pad_id(self):
    data = build_model_bytes(std_specials(), pad_id=-1)
    assert sp_native.parse_model_proto(data).pad_id == -1


# -- normalizer ---------------------------------------------------------------


class TestNormalizerFlags:

  def _norm(self, **kwargs):
    data = build_model_bytes(std_specials(), **kwargs)
    return sp_native.Normalizer(sp_native.parse_model_proto(data))

  def test_default_pipeline(self):
    norm = self._norm()
    assert norm("hello  world ") == "▁hello▁world"

  def test_no_dummy_prefix(self):
    norm = self._norm(add_dummy_prefix=False)
    assert norm("hello world") == "hello▁world"

  def test_no_escape(self):
    norm = self._norm(escape_whitespaces=False, add_dummy_prefix=False)
    assert norm("hello world") == "hello world"

  def test_keep_extra_whitespace(self):
    norm = self._norm(remove_extra_whitespaces=False,
                      add_dummy_prefix=False)
    assert norm("a  b") == "a▁▁b"

  def test_empty(self):
    assert self._norm()("") == ""
    assert self._norm()("   ") == ""


# -- precompiled charsmap (darts-clone double array) --------------------------


def build_charsmap(mapping: dict[str, str]) -> bytes:
  """Builds a precompiled-charsmap blob (tiny double-array + pool).

  Brute-force slot allocation; only suitable for small key sets. Unit
  encodings follow darts-clone's DoubleArrayUnit (label low 8 bits,
  has_leaf bit 8, offset << 10 with extension flag clear; value units have
  bit 31 set).
  """
  pool = bytearray()
  values = {}
  for key, repl in mapping.items():
    values[key] = len(pool)
    pool += repl.encode("utf-8") + b"\0"

  # Trie of keys over UTF-8 bytes.
  root: dict = {}
  for key in mapping:
    node = root
    for b in key.encode("utf-8"):
      assert b != 0
      node = node.setdefault(b, {})
    node[None] = values[key]

  units = [0] * 4
  used = {0}
  used_bases = set()  # one base per node, or label checks alias across nodes

  def grow(n):
    while len(units) <= n:
      units.append(0)

  def place(node, pos):
    labels = sorted(b for b in node if b is not None)
    slots = labels + ([0] if None in node else [])
    base = 1
    while True:
      targets = [base ^ s for s in slots]
      if base not in used_bases and all(
          t not in used and t != 0 for t in targets
      ):
        break
      base += 1
    used_bases.add(base)
    for t in targets:
      used.add(t)
      grow(t)
    offset = base ^ pos
    has_leaf = 1 if None in node else 0
    if None in node:
      units[base] = 0x80000000 | node[None]
    children = []
    for b in labels:
      child_pos = base ^ b
      children.append((node[b], child_pos, b))
    return offset, has_leaf, children

  # Root: its unit carries only the offset (label/leaf unchecked).
  offset, has_leaf, children = place(root, 0)
  assert has_leaf == 0, "empty key unsupported"
  units[0] = offset << 10
  queue = list(children)
  while queue:
    node, pos, label = queue.pop()
    offset, has_leaf, children = place(node, pos)
    assert offset < (1 << 21)
    units[pos] = (offset << 10) | (has_leaf << 8) | label
    queue.extend(children)

  blob = struct.pack("<I", 4 * len(units))
  blob += struct.pack(f"<{len(units)}I", *units)
  return blob + bytes(pool)


class TestCharsMap:

  MAPPING = {"A": "a", "Ç": "c", "ﬁ": "fi", "１": "1"}

  def _vocab_norm(self, mapping):
    blob = build_charsmap(mapping)
    data = build_model_bytes(
        std_specials(),
        precompiled_charsmap=blob,
        add_dummy_prefix=False,
        remove_extra_whitespaces=False,
        escape_whitespaces=False,
    )
    return sp_native.Normalizer(sp_native.parse_model_proto(data)), blob

  def test_single_char_replacements(self):
    norm, _ = self._vocab_norm(self.MAPPING)
    assert norm("AÇﬁ１x") == "acfi1x"

  def test_matches_hf_precompiled(self):
    # HF normalizers.Precompiled is the spm_precompiled Rust crate — an
    # independent reader of the same blob format. (Single-char keys: the
    # crate's grapheme-chunked walk agrees with sentencepiece only there.)
    tokenizers = pytest.importorskip("tokenizers")
    norm, blob = self._vocab_norm(self.MAPPING)
    hf = tokenizers.normalizers.Precompiled(blob)
    rng = random.Random(0)
    alphabet = list("AÇﬁ１xyz à✓") + ["￥"]
    for _ in range(50):
      s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
      assert norm(s) == hf.normalize_str(s), repr(s)

  def test_multichar_key_longest_match(self):
    norm, _ = self._vocab_norm({"a": "x", "ab": "Y"})
    assert norm("abab a b") == "YY x b"


# -- unigram vs HuggingFace ---------------------------------------------------


def _random_unigram_pieces(rng, alphabet="abcdef"):
  """Specials + full single-char coverage + random multi-char pieces."""
  pieces = std_specials()
  seen = set()
  for ch in alphabet + "▁":
    pieces.append((ch, round(rng.uniform(-8, -1), 3), sp_native.NORMAL))
    seen.add(ch)
  for _ in range(60):
    length = rng.randrange(2, 5)
    body = "".join(rng.choice(alphabet) for _ in range(length))
    piece = ("▁" if rng.random() < 0.5 else "") + body
    if piece in seen:
      continue
    seen.add(piece)
    pieces.append((piece, round(rng.uniform(-9, -1), 3), sp_native.NORMAL))
  return pieces


class TestUnigramVsHF:

  def test_random_models_match_hf(self):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import models, pre_tokenizers

    rng = random.Random(1234)
    for model_seed in range(4):
      pieces = _random_unigram_pieces(random.Random(model_seed))
      data = build_model_bytes(pieces, remove_extra_whitespaces=False)
      vocab = sp_native.NativeSentencePiece(data, use_native=False)

      hf = tokenizers.Tokenizer(
          models.Unigram([(p, s) for p, s, _ in pieces], unk_id=3,
                         byte_fallback=False)
      )
      hf.pre_tokenizer = pre_tokenizers.Metaspace(
          replacement="▁", prepend_scheme="always", split=False
      )
      for _ in range(40):
        n = rng.randrange(1, 30)
        text = "".join(rng.choice("abcdef ") for _ in range(n)).strip("  ")
        if not text:
          continue
        ours = vocab.EncodeAsIds(text)
        theirs = hf.encode(text).ids
        assert ours == theirs, (text, ours, theirs)

  def test_viterbi_picks_best_split(self):
    # "ab" (-1) beats "a"+"b" (-2.5 total).
    pieces = std_specials() + [
        ("a", -1.5, sp_native.NORMAL),
        ("b", -1.0, sp_native.NORMAL),
        ("ab", -1.0, sp_native.NORMAL),
        ("▁", -2.0, sp_native.NORMAL),
    ]
    data = build_model_bytes(pieces, add_dummy_prefix=False)
    vocab = sp_native.NativeSentencePiece(data, use_native=False)
    ids = vocab.EncodeAsIds("ab")
    assert [vocab.IdToPiece(i) for i in ids] == ["ab"]

  def test_unknown_chars_merge_to_one_unk(self):
    pieces = std_specials() + [
        ("a", -1.0, sp_native.NORMAL),
        ("▁", -1.0, sp_native.NORMAL),
    ]
    data = build_model_bytes(pieces, add_dummy_prefix=False)
    vocab = sp_native.NativeSentencePiece(data, use_native=False)
    assert vocab.EncodeAsIds("aXYZa") == [4, 3, 4]  # a, <unk>, a

  def test_byte_fallback(self):
    pieces = std_specials() + [
        ("a", -1.0, sp_native.NORMAL),
        ("▁", -1.0, sp_native.NORMAL),
    ]
    byte_ids = {}
    for b in range(256):
      byte_ids[b] = len(pieces)
      pieces.append((f"<0x{b:02X}>", 0.0, sp_native.BYTE))
    data = build_model_bytes(
        pieces, add_dummy_prefix=False, byte_fallback=True
    )
    vocab = sp_native.NativeSentencePiece(data, use_native=False)
    ids = vocab.EncodeAsIds("aé")
    assert ids == [4, byte_ids[0xC3], byte_ids[0xA9]]
    assert vocab.DecodeIds(ids) == "aé"


# -- BPE vs HuggingFace -------------------------------------------------------


def _random_bpe_model(seed, alphabet="abcd"):
  """Returns (pieces, hf_vocab, hf_merges) for one random BPE model.

  SP-BPE merges any adjacent pair whose *concatenated string* is in the
  vocab; HF-BPE merges only listed pairs. The two agree only when every
  vocab piece has a unique adjacent-pair decomposition, so generation is
  tiered: 2-char pieces from single chars (unique by construction) and
  4-char pieces from exactly two 2-char pieces (unique because no 3-char
  pieces exist and the alternate 2+2 split is excluded).
  """
  rng = random.Random(seed)
  pieces = std_specials()
  hf_vocab = {}
  for p, _, _ in pieces:
    hf_vocab[p] = len(hf_vocab)
  for ch in "▁" + alphabet:
    hf_vocab[ch] = len(hf_vocab)
    pieces.append((ch, 0.0, sp_native.NORMAL))

  def add(a, b, rank):
    merged = a + b
    merges.append((a, b))
    hf_vocab[merged] = len(hf_vocab)
    # SP encodes merge priority as the piece score: higher = earlier.
    pieces.append((merged, float(-(rank + 1)), sp_native.NORMAL))
    return merged

  merges = []
  singles = ["▁"] + list(alphabet)
  tier1 = []
  rank = 0
  for _ in range(14):
    a, b = rng.choice(singles), rng.choice(singles)
    if a + b in hf_vocab:
      continue
    tier1.append(add(a, b, rank))
    rank += 1
  for _ in range(10):
    if not tier1:
      break
    a, b = rng.choice(tier1), rng.choice(tier1)
    if a + b in hf_vocab:
      continue
    add(a, b, rank)
    rank += 1
  return pieces, hf_vocab, merges


class TestBpeVsHF:

  def test_random_models_match_hf(self):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import models, pre_tokenizers

    rng = random.Random(99)
    for model_seed in range(4):
      pieces, hf_vocab, merges = _random_bpe_model(model_seed)
      data = build_model_bytes(
          pieces, model_type=sp_native.BPE, remove_extra_whitespaces=False
      )
      vocab = sp_native.NativeSentencePiece(data, use_native=False)
      hf = tokenizers.Tokenizer(
          models.BPE(vocab=hf_vocab, merges=merges, fuse_unk=True)
      )
      hf.pre_tokenizer = pre_tokenizers.Metaspace(
          replacement="▁", prepend_scheme="always", split=False
      )
      for _ in range(40):
        n = rng.randrange(1, 24)
        text = "".join(rng.choice("abcd ") for _ in range(n)).strip(" ")
        if not text:
          continue
        ours = vocab.EncodeAsIds(text)
        theirs = hf.encode(text).ids
        assert ours == theirs, (model_seed, text, ours, theirs)

  def test_merge_order_follows_scores(self):
    # "ab" has a better score than "bc": "abc" -> [ab, c].
    pieces = std_specials() + [
        ("a", 0.0, sp_native.NORMAL),
        ("b", 0.0, sp_native.NORMAL),
        ("c", 0.0, sp_native.NORMAL),
        ("▁", 0.0, sp_native.NORMAL),
        ("ab", -1.0, sp_native.NORMAL),
        ("bc", -2.0, sp_native.NORMAL),
    ]
    data = build_model_bytes(
        pieces, model_type=sp_native.BPE, add_dummy_prefix=False
    )
    vocab = sp_native.NativeSentencePiece(data, use_native=False)
    ids = vocab.EncodeAsIds("abc")
    assert [vocab.IdToPiece(i) for i in ids] == ["ab", "c"]


# -- user-defined pieces ------------------------------------------------------


class TestUserDefined:

  def _vocab(self, model_type=sp_native.UNIGRAM):
    pieces = std_specials() + [
        ("<start_of_turn>", 0.0, sp_native.USER_DEFINED),
        ("<end_of_turn>", 0.0, sp_native.USER_DEFINED),
        ("▁", -1.0, sp_native.NORMAL),
        ("u", -1.0, sp_native.NORMAL),
        ("s", -1.0, sp_native.NORMAL),
        ("e", -1.0, sp_native.NORMAL),
        ("r", -1.0, sp_native.NORMAL),
        ("<", -3.0, sp_native.NORMAL),
        (">", -3.0, sp_native.NORMAL),
        ("user", -1.0, sp_native.NORMAL),
    ]
    data = build_model_bytes(
        pieces, model_type=model_type, add_dummy_prefix=False
    )
    return sp_native.NativeSentencePiece(data, use_native=False)

  @pytest.mark.parametrize(
      "model_type", [sp_native.UNIGRAM, sp_native.BPE]
  )
  def test_atomic_match(self, model_type):
    vocab = self._vocab(model_type)
    ids = vocab.EncodeAsIds("<start_of_turn>user")
    assert ids[0] == 4
    assert vocab.IdToPiece(ids[0]) == "<start_of_turn>"
    assert vocab.DecodeIds(ids) == "<start_of_turn>user"

  def test_control_pieces_do_not_match_text(self):
    vocab = self._vocab()
    ids = vocab.EncodeAsIds("<eos>")  # the literal text, not the control id
    assert 2 not in ids


# -- decode -------------------------------------------------------------------


class TestDecode:

  def test_skips_control_and_renders_unk(self):
    pieces = std_specials() + [
        ("▁hi", -1.0, sp_native.NORMAL),
        ("▁there", -1.0, sp_native.NORMAL),
    ]
    data = build_model_bytes(pieces)
    vocab = sp_native.NativeSentencePiece(data, use_native=False)
    assert vocab.DecodeIds([1, 4, 3, 5, 2]) == "hi ⁇  there"

  def test_round_trip(self):
    rng = random.Random(7)
    pieces = _random_unigram_pieces(random.Random(3))
    data = build_model_bytes(pieces)
    vocab = sp_native.NativeSentencePiece(data, use_native=False)
    for _ in range(25):
      text = " ".join(
          "".join(rng.choice("abcdef") for _ in range(rng.randrange(1, 6)))
          for _ in range(rng.randrange(1, 6))
      )
      assert vocab.DecodeIds(vocab.EncodeAsIds(text)) == text


# -- native C++ parity --------------------------------------------------------


@pytest.mark.skipif(not sp_cpp.available(), reason="native lib unavailable")
class TestNativeParity:

  @pytest.mark.parametrize("model_type", [sp_native.UNIGRAM, sp_native.BPE])
  @pytest.mark.parametrize("byte_fallback", [False, True])
  def test_random_models_and_texts(self, model_type, byte_fallback):
    rng = random.Random(model_type * 10 + byte_fallback)
    for model_seed in range(3):
      if model_type == sp_native.UNIGRAM:
        pieces = _random_unigram_pieces(random.Random(model_seed))
      else:
        pieces, _, _ = _random_bpe_model(model_seed)
      pieces = pieces + [
          ("<turn>", 0.0, sp_native.USER_DEFINED),
      ]
      if byte_fallback:
        pieces = pieces + [
            (f"<0x{b:02X}>", 0.0, sp_native.BYTE) for b in range(256)
        ]
      data = build_model_bytes(
          pieces, model_type=model_type, byte_fallback=byte_fallback
      )
      vocab = sp_native.NativeSentencePiece(data, use_native=True)
      if vocab._native is None:
        pytest.skip("native build failed")
      alphabet = "abcdef é✓" if byte_fallback else "abcdef "
      for _ in range(30):
        n = rng.randrange(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        if rng.random() < 0.3:
          text = text[: n // 2] + "<turn>" + text[n // 2 :]
        normalized = vocab.normalizer(text)
        native = vocab._native.encode(normalized)
        python = vocab.encoder.encode(normalized)
        assert native == python, (model_type, byte_fallback, text)


# -- integration with the framework -------------------------------------------


class TestFrameworkIntegration:

  def _it_vocab(self, tmp_path):
    pieces = std_specials() + [
        ("<start_of_turn>", 0.0, sp_native.USER_DEFINED),
        ("<end_of_turn>", 0.0, sp_native.USER_DEFINED),
    ]
    for ch in "▁abcdefghijklmnopqrstuvwxyz\n":
      pieces.append((ch, -2.0, sp_native.NORMAL))
    for word in ["▁hello", "▁world", "user", "model"]:
      pieces.append((word, -1.0, sp_native.NORMAL))
    for b in range(256):
      pieces.append((f"<0x{b:02X}>", 0.0, sp_native.BYTE))
    data = build_model_bytes(pieces, byte_fallback=True, pad_id=0)
    path = tmp_path / "tokenizer.model"
    path.write_bytes(data)
    return path

  def test_load_sentencepiece_falls_back_to_native(self, tmp_path):
    path = self._it_vocab(tmp_path)
    vocab = tok_lib.load_sentencepiece(str(path))
    assert isinstance(vocab, sp_native.NativeSentencePiece)
    assert vocab.pad_id() == 0
    assert vocab.bos_id() == 1
    assert vocab.eos_id() == 2
    text = "hello world"
    assert vocab.DecodeIds(vocab.EncodeAsIds(text)) == text

  def test_it_template_round_trip(self, tmp_path):
    from cadence_gemma_tpu import common

    vocab = sp_native.NativeSentencePiece(str(self._it_vocab(tmp_path)))
    prompt = common.apply_it_formatter("hello world")
    ids = vocab.EncodeAsIds(prompt)
    sot = vocab.PieceToId("<start_of_turn>")
    eot = vocab.PieceToId("<end_of_turn>")
    assert ids.count(sot) == 2  # user + model turn openers
    assert ids.count(eot) == 1
    assert "hello world" in vocab.DecodeIds(ids)

  def test_token_strings_for_grammar(self, tmp_path):
    from cadence_gemma_tpu.inference import constrain

    vocab = sp_native.NativeSentencePiece(str(self._it_vocab(tmp_path)))
    strings = constrain.token_strings_from_vocab(
        vocab, vocab.GetPieceSize()
    )
    assert strings[0] == ""  # pad
    assert strings[vocab.PieceToId("▁hello")] == " hello"
    newline_byte = vocab.PieceToId("<0x0A>")
    assert strings[newline_byte] == "\n"
