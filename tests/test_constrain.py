"""Grammar-constrained decoding tests.

No reference counterpart (the reference sampler is unconstrained,
``/root/reference/recurrentgemma/jax/sampler.py:163-169``). Oracles:
  * the regex compiler is cross-checked against Python's ``re.fullmatch``
    by exhaustive enumeration over a small alphabet;
  * the device tables (bitpacked mask + char-walk advance) are checked
    against their host-side mirrors state by state;
  * end-to-end sampling asserts every generated string (greedy and
    categorical, echo, chunked prefill, prefix continuation) fullmatches
    the grammar.
"""

import itertools
import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.inference import constrain
from cadence_gemma_tpu.inference import sampler as sampler_lib
from cadence_gemma_tpu.models import griffin


class CharVocab:
  """Character-level test vocabulary: each id appends a known string.

  ids: 0=pad, 1=bos, 2=eos, 3=unk, then one id per piece (pieces may be
  multi-character, exercising the token-closure walk).
  """

  def __init__(self, pieces):
    self.pieces = list(pieces)
    self._ids = {p: i + 4 for i, p in enumerate(self.pieces)}

  def pad_id(self):
    return 0

  def bos_id(self):
    return 1

  def eos_id(self):
    return 2

  def GetPieceSize(self):  # noqa: N802
    return len(self.pieces) + 4

  def EncodeAsIds(self, text):  # noqa: N802
    # Greedy longest-match segmentation.
    ids, i = [], 0
    while i < len(text):
      for length in range(min(4, len(text) - i), 0, -1):
        piece = text[i : i + length]
        if piece in self._ids:
          ids.append(self._ids[piece])
          i += length
          break
      else:
        ids.append(3)
        i += 1
    return ids

  def DecodeIds(self, ids):  # noqa: N802
    return "".join(
        self.pieces[i - 4] for i in ids if 4 <= i < len(self.pieces) + 4
    )

  def token_strings(self):
    return ["", "", "", ""] + self.pieces


# -- regex compiler vs Python re ----------------------------------------------

ALPHABET = "abcd1 "
PATTERNS = [
    "a*b",
    "(ab|cd)+",
    "[a-c]{2,4}",
    "a?b{2}c*",
    "(a|bc)*d",
    "[^a]b.",
    "\\d+",
    "a{2}",
    "a{2,}",
    "(?:ab)?c",
    "[ab][^cd]",
    "a|",
    "a b",
    "(a|b)(c|d)*",
    "[a-c1]+d?",
]


class TestRegexEngine:

  @pytest.mark.parametrize("pattern", PATTERNS)
  def test_matches_python_re(self, pattern):
    dfa = constrain.compile_regex(pattern, ALPHABET)
    ref = re.compile(pattern)
    for n in range(0, 5):
      for chars in itertools.product(ALPHABET, repeat=n):
        s = "".join(chars)
        assert dfa.accepts(s) == bool(ref.fullmatch(s)), (pattern, s)

  def test_dot_excludes_newline(self):
    dfa = constrain.compile_regex(".", "a\n")
    assert dfa.accepts("a") and not dfa.accepts("\n")

  @pytest.mark.parametrize(
      "bad", ["*a", "a(", "a)", "[ab", "a{2", "a{3,1}", "a\\"]
  )
  def test_malformed_patterns_raise(self, bad):
    with pytest.raises(constrain.RegexError):
      constrain.compile_regex(bad, ALPHABET)

  @pytest.mark.parametrize("pattern", PATTERNS[:8])
  def test_minimization_preserves_language(self, pattern):
    full = constrain.compile_regex(pattern, ALPHABET, minimize=False)
    mini = constrain.compile_regex(pattern, ALPHABET)
    assert mini.trans.shape[0] <= full.trans.shape[0]
    for n in range(0, 5):
      for chars in itertools.product(ALPHABET, repeat=n):
        s = "".join(chars)
        assert full.accepts(s) == mini.accepts(s), (pattern, s)

  def test_minimization_shrinks_json_grammar(self):
    chars = sorted(set('{}[]:,"abc0123456789 .eE+-truefalsnl'))
    full = constrain.compile_regex(
        constrain.json_regex(1), chars, minimize=False
    )
    mini = constrain.compile_regex(constrain.json_regex(1), chars)
    assert mini.trans.shape[0] < full.trans.shape[0]
    for doc in ('{"a": 1}', "[true]", "-2e5", '{"a":}', "[1,]"):
      assert full.accepts(doc) == mini.accepts(doc), doc

  def test_escape_literal_round_trip(self):
    text = "a.b{c}|d*[e]+\\f"
    dfa = constrain.compile_regex(
        constrain.escape_literal(text), sorted(set(text))
    )
    assert dfa.accepts(text)
    assert not dfa.accepts(text[:-1])


# -- TokenDFA host semantics ---------------------------------------------------


class TestTokenDFA:

  def make(self, pattern, pieces, **kw):
    vocab = CharVocab(pieces)
    return vocab, constrain.TokenDFA(
        pattern, vocab.token_strings(), eos_id=vocab.eos_id(), **kw
    )

  def test_token_walk_matches_char_walk(self):
    vocab, dfa = self.make("(ab|cd)+", ["a", "b", "c", "d", "ab", "cd", "abc"])
    for state in range(dfa.n_states):
      for tok, piece in enumerate(vocab.token_strings()):
        if not piece:
          continue
        s = state
        for ch in piece:
          a = dfa.char_dfa.atom_of[ch]
          s = int(dfa.char_dfa.trans[s, a])
        assert dfa.token_advance(state, tok) == s
        assert dfa.token_allowed(state, tok) == (s != dfa.char_dfa.dead)

  def test_eos_only_at_accepting(self):
    vocab, dfa = self.make("ab", ["a", "b"])
    eos = vocab.eos_id()
    start = dfa.char_dfa.start
    assert not dfa.token_allowed(start, eos)
    after_a = dfa.token_advance(start, 4)  # "a"
    assert not dfa.token_allowed(after_a, eos)
    after_ab = dfa.token_advance(after_a, 5)  # "b"
    assert dfa.token_allowed(after_ab, eos)
    # Consuming EOS never advances the DFA.
    assert dfa.token_advance(after_ab, eos) == after_ab

  def test_non_text_ids_forbidden(self):
    vocab, dfa = self.make("[ab]*", ["a", "b"])
    for special in (vocab.pad_id(), vocab.bos_id(), 3):
      for state in range(dfa.n_states):
        assert not dfa.token_allowed(state, special)

  def test_extra_stop_ids(self):
    vocab = CharVocab(["a", "b"])
    dfa = constrain.TokenDFA(
        "ab", vocab.token_strings(), eos_id=vocab.eos_id(),
        extra_stop_ids=[3],
    )
    done = dfa.token_advance(dfa.token_advance(dfa.char_dfa.start, 4), 5)
    assert dfa.token_allowed(done, 3)
    assert not dfa.token_allowed(dfa.char_dfa.start, 3)
    assert dfa.token_advance(done, 3) == done

  def test_stuck_state_fails_open_to_eos(self):
    # Grammar needs a 'b' but no token emits one: the state after 'a'
    # would be all--inf; it fails open to EOS instead. (Minimization
    # folds such can-never-accept states into the dead state, which
    # itself fails open — either way the row is never all--inf.)
    vocab, dfa = self.make("ab", ["a", "c"])
    after_a = dfa.token_advance(dfa.char_dfa.start, 4)
    assert dfa.token_allowed(after_a, vocab.eos_id())
    assert (after_a == dfa.char_dfa.dead
            or after_a in dfa._stuck_states)
    # Unminimized, the stuck state stays distinct and is recorded.
    raw = constrain.TokenDFA(
        "ab",
        CharVocab(["a", "c"]).token_strings(),
        eos_id=vocab.eos_id(),
        _minimize=False,
    )
    after_a_raw = raw.token_advance(raw.char_dfa.start, 4)
    assert after_a_raw != raw.char_dfa.dead
    assert after_a_raw in raw._stuck_states

  def test_native_walker_matches_numpy(self):
    from cadence_gemma_tpu.utils import constrain_cpp

    if not constrain_cpp.available():
      pytest.skip("native constrain walker unavailable")
    pieces = [f"{a}{b}" for a in "abcd" for b in "abcd"] + list("abcd1 ")
    pieces += ["cat", "dog", "catd", "é"]  # incl. out-of-alphabet
    vocab = CharVocab(pieces)
    kw = dict(
        token_strings=vocab.token_strings(), eos_id=vocab.eos_id(),
        extra_stop_ids=[3],
    )
    for pattern in ("(ab|cd)+", "(cat|dog)( (cat|dog))*", "[a-c]{2,5}d?"):
      native = constrain.TokenDFA(pattern, _use_native=True, **kw)
      numpy_ = constrain.TokenDFA(pattern, _use_native=False, **kw)
      np.testing.assert_array_equal(
          native._allowed_bits, numpy_._allowed_bits, err_msg=pattern
      )
      assert native._stuck_states == numpy_._stuck_states

  def test_state_chunking_is_invisible(self):
    vocab = CharVocab(["a", "b", "ab", "ba"])
    big = constrain.TokenDFA(
        "(ab|ba){1,3}", vocab.token_strings(), eos_id=2, _state_chunk=1,
        _use_native=False,
    )
    one = constrain.TokenDFA(
        "(ab|ba){1,3}", vocab.token_strings(), eos_id=2,
        _state_chunk=4096, _use_native=False,
    )
    np.testing.assert_array_equal(big._allowed_bits, one._allowed_bits)

  def test_save_load_round_trip(self, tmp_path):
    vocab, dfa = self.make(
        "(ab|cd)+x?", ["a", "b", "c", "d", "ab", "cd", "x"]
    )
    path = str(tmp_path / "grammar.npz")
    dfa.save(path)
    back = constrain.TokenDFA.load(path)
    np.testing.assert_array_equal(back._allowed_bits, dfa._allowed_bits)
    np.testing.assert_array_equal(back._token_atoms, dfa._token_atoms)
    np.testing.assert_array_equal(
        back._token_lengths, dfa._token_lengths
    )
    np.testing.assert_array_equal(back.char_dfa.trans, dfa.char_dfa.trans)
    assert back.pattern == dfa.pattern
    assert back.eos_id == dfa.eos_id and back.stop_ids == dfa.stop_ids
    assert back.allows_text("abcd") and not back.allows_text("ac")
    assert back.token_advance(0, 8) == dfa.token_advance(0, 8)
    # The loaded constraint drives the same device tables.
    np.testing.assert_array_equal(
        np.asarray(back.tables.allowed_bits),
        np.asarray(dfa.tables.allowed_bits),
    )

  def test_text_helpers(self):
    _, dfa = self.make("[ab]{2,3}", ["a", "b"])
    assert dfa.allows_text("ab") and dfa.allows_text("aba")
    assert not dfa.allows_text("a") and not dfa.allows_text("abab")
    assert dfa.is_live_prefix("a") and not dfa.is_live_prefix("abab")


# -- device tables vs host mirrors ---------------------------------------------


class TestDeviceTables:

  def test_mask_and_advance_match_host(self):
    # > 32 tokens so the bitpack spans multiple uint32 words.
    pieces = [f"{a}{b}" for a in "abcd" for b in "abcd"] + list("abcd1 ")
    pieces += [f"{a}1" for a in "abcd"] + [f"1{a}" for a in "abcd"]
    vocab = CharVocab(pieces)
    assert vocab.GetPieceSize() > 32
    dfa = constrain.TokenDFA(
        "([ab]c|d1)*[ab]?", vocab.token_strings(), eos_id=vocab.eos_id()
    )
    tables = dfa.tables
    states = jnp.asarray(
        [s % dfa.n_states for s in range(0, 3 * dfa.n_states, 7)][:8],
        jnp.int32,
    )
    logits = jnp.zeros((states.shape[0], vocab.GetPieceSize()), jnp.float32)
    masked = np.asarray(tables.mask(states, logits))
    for r, s in enumerate(np.asarray(states)):
      for v in range(vocab.GetPieceSize()):
        expected = 0.0 if dfa.token_allowed(int(s), v) else -np.inf
        assert masked[r, v] == expected, (int(s), v)
    tokens = jnp.asarray(
        [4 + (5 * v) % (vocab.GetPieceSize() - 4)
         for v in range(states.shape[0])],
        jnp.int32,
    )
    advanced = np.asarray(tables.advance(states, tokens))
    for r, (s, v) in enumerate(zip(np.asarray(states), np.asarray(tokens))):
      assert advanced[r] == dfa.token_advance(int(s), int(v))

  def test_tables_work_under_jit(self):
    vocab = CharVocab(["a", "b", "ab"])
    dfa = constrain.TokenDFA("(ab)+", vocab.token_strings(), eos_id=2)
    tables = dfa.tables

    @jax.jit
    def step(t, state, logits, token):
      return t.mask(state, logits), t.advance(state, token)

    state = jnp.asarray([dfa.char_dfa.start], jnp.int32)
    logits = jnp.ones((1, vocab.GetPieceSize()), jnp.bfloat16)
    masked, nxt = step(tables, state, logits, jnp.asarray([6], jnp.int32))
    assert np.isfinite(np.asarray(masked, np.float32)[0, 6])
    assert int(nxt[0]) == dfa.token_advance(dfa.char_dfa.start, 6)


# -- end-to-end through the sampler ---------------------------------------------

PIECES = ["a", "b", "c", "d", "ab", "cd", "cat", "dog", "t", "g", "o"]


@pytest.fixture(scope="module")
def setup():
  vocab = CharVocab(PIECES)
  config = common.GriffinConfig(
      vocab_size=vocab.GetPieceSize(),
      width=16,
      mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True,
      attention_window_size=8,
      logits_soft_cap=30.0,
      lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  tokens = jnp.zeros((1, 5), jnp.int32)
  params = model.init(
      jax.random.PRNGKey(11), tokens, jnp.arange(5)[None]
  )["params"]
  return model, vocab, params


def make_dfa(vocab, pattern, **kw):
  return constrain.TokenDFA(
      pattern, vocab.token_strings(), eos_id=vocab.eos_id(), **kw
  )


def generated_text(vocab, out, row=0):
  """Decoded generation up to (excluding) the first stop token."""
  ids = []
  for t in np.asarray(out.tokens[row]):
    if t == vocab.eos_id():
      break
    ids.append(int(t))
  return vocab.DecodeIds(ids), any(
      int(t) == vocab.eos_id() for t in np.asarray(out.tokens[row])
  )


class TestConstrainedSampling:

  def test_greedy_fullmatch_and_termination(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, "[ab]{2,4}")
    out = s(["ab cd"], total_generation_steps=10, constraint=dfa)
    text, stopped = generated_text(vocab, out)
    # At 4 characters only EOS remains legal, so the loop must stop.
    assert stopped
    assert re.fullmatch("[ab]{2,4}", text), text

  def test_choice_grammar_forces_an_option(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, constrain.choice_regex(["cat", "dog"]))
    out = s(["a", "d"], total_generation_steps=8, constraint=dfa)
    for row in range(2):
      text, stopped = generated_text(vocab, out, row)
      assert stopped and text in ("cat", "dog"), text

  def test_unconstrained_output_would_violate(self, setup):
    # The constraint must actually change behavior, otherwise the suite
    # proves nothing: the unconstrained generation must NOT match.
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, constrain.choice_regex(["cat", "dog"]))
    free = s(["a", "d"], total_generation_steps=8)
    texts = [generated_text(vocab, free, r)[0] for r in range(2)]
    assert any(t not in ("cat", "dog") for t in texts), texts

  def test_categorical_stays_in_grammar(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(
        model, vocab, params, deterministic_sampling=False,
        temperature=1.5, top_k=8,
    )
    dfa = make_dfa(vocab, "(cat|dog)( (cat|dog)){0,2}")
    for seed in range(4):
      out = s(
          ["ab"], total_generation_steps=16, rng=jax.random.PRNGKey(seed),
          constraint=dfa,
      )
      text, stopped = generated_text(vocab, out)
      if stopped:
        assert dfa.allows_text(text), text
      else:
        assert dfa.is_live_prefix(text), text

  def test_echo_constrains_only_generation(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params,
                            bucket_prompt_lengths=False)
    dfa = make_dfa(vocab, "[cd]{2}")
    prompt = "ab ab"
    out = s([prompt], total_generation_steps=6, echo=True, constraint=dfa)
    ids = [int(t) for t in np.asarray(out.tokens[0])]
    prompt_len = len(vocab.EncodeAsIds(prompt)) + 1  # + BOS
    gen = ids[prompt_len:]
    gen = gen[: gen.index(vocab.eos_id())] if vocab.eos_id() in gen else gen
    assert re.fullmatch("[cd]{2}", vocab.DecodeIds(gen))

  def test_chunked_prefill_path(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(
        model, vocab, params, prefill_chunk_size=4,
        bucket_prompt_lengths=False,
    )
    dfa = make_dfa(vocab, "[ab]{2,4}")
    out = s(
        ["ab cd ab cd ab cd"], total_generation_steps=10, constraint=dfa
    )
    text, stopped = generated_text(vocab, out)
    assert stopped and re.fullmatch("[ab]{2,4}", text), text

  def test_prefix_continuation(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    prefix = s.prefill_prefix("ab cd")
    dfa = make_dfa(vocab, "[ab]{2,4}")
    out = s(
        ["cd"], total_generation_steps=10, prefix_state=prefix,
        constraint=dfa,
    )
    text, stopped = generated_text(vocab, out)
    assert stopped and re.fullmatch("[ab]{2,4}", text), text

  def test_repetition_penalty_composes(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params, repetition_penalty=1.3)
    dfa = make_dfa(vocab, "[abcd]{3,6}")
    out = s(["ab"], total_generation_steps=10, constraint=dfa)
    text, stopped = generated_text(vocab, out)
    assert stopped and re.fullmatch("[abcd]{3,6}", text), text

  def test_vocab_mismatch_raises(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    wrong = constrain.TokenDFA("[ab]+", ["", "", "", "a", "b"], eos_id=2)
    with pytest.raises(ValueError, match="vocabulary"):
      s(["ab"], total_generation_steps=4, constraint=wrong)

  def test_returned_logits_are_unmasked(self, setup):
    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, "[ab]{2,4}")
    out = s(
        ["ab cd"], total_generation_steps=4, constraint=dfa,
        return_logits=True,
    )
    assert np.isfinite(np.asarray(out.logits[0], np.float32)).all()


class TestJsonGrammar:

  def test_json_regex_accepts_and_rejects(self):
    chars = sorted(set('{}[]:,"abc0123456789 .eE+-truefalsnl\n\t'))
    dfa_src = constrain.json_regex(max_depth=2)
    dfa = constrain.compile_regex(dfa_src, chars)
    for good in (
        "1",
        "-0.5e+2",
        "true",
        "null",
        '"ab"',
        '{"a": 1, "b": [true, null]}',
        "[1, 2, 3]",
        "[]",
        '{"a": {"b": 1}}',
    ):
      assert dfa.accepts(good), good
    for bad in (
        "",
        "01",
        "tru",
        '{"a": }',
        "[1, ]",
        '{"a" 1}',
        "{{}}",
    ):
      assert not dfa.accepts(bad), bad

  def test_json_mode_end_to_end(self):
    pieces = list('{}[]:,"') + ["ab", "a", "b", "0", "1", "9", "true",
                                "false", "null", " ", "-", ".", "e"]
    vocab = CharVocab(pieces)
    config = common.GriffinConfig(
        vocab_size=vocab.GetPieceSize(),
        width=16,
        mlp_expanded_width=32,
        num_heads=2,
        block_types=(common.TemporalBlockType.RECURRENT,),
        embeddings_scale_by_sqrt_dim=True,
        attention_window_size=8,
        logits_soft_cap=30.0,
        lru_width=16,
        scan_type=common.ScanType.LINEAR_NATIVE,
    )
    model = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False,
    )
    params = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32),
        jnp.arange(4)[None],
    )["params"]
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, constrain.json_regex(max_depth=1, compact=True))
    out = s(["ab a b"], total_generation_steps=24, constraint=dfa)
    text, stopped = generated_text(vocab, out)
    if stopped:
      json.loads(text)  # must parse
    else:
      assert dfa.is_live_prefix(text), text


class TestSchemaRegex:
  """JSON-Schema (strict subset) → regex → DFA."""

  CHARS = sorted(set('{}[]:,"abcdefghijklmnopqrstuvwxyz0123456789 .eE+-_'))

  def compile(self, schema, **kw):
    return constrain.compile_regex(
        constrain.schema_regex(schema, **kw), self.CHARS
    )

  def test_object_fixed_order(self):
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    dfa = self.compile(schema)
    assert dfa.accepts('{"name":"bob","age":42}')
    assert not dfa.accepts('{"age":42,"name":"bob"}')  # fixed order
    assert not dfa.accepts('{"name":"bob"}')           # missing required
    assert not dfa.accepts('{"name":"bob","age":4.2}')  # not an integer

  def test_enum_const_anyof_and_type_list(self):
    schema = {
        "type": "object",
        "properties": {
            "kind": {"enum": ["cat", "dog"]},
            "tag": {"const": 7},
            "x": {"anyOf": [{"type": "integer"}, {"type": "null"}]},
            "y": {"type": ["boolean", "null"]},
        },
        "required": ["kind", "tag", "x", "y"],
    }
    dfa = self.compile(schema)
    assert dfa.accepts('{"kind":"cat","tag":7,"x":3,"y":true}')
    assert dfa.accepts('{"kind":"dog","tag":7,"x":null,"y":null}')
    assert not dfa.accepts('{"kind":"fox","tag":7,"x":3,"y":true}')
    assert not dfa.accepts('{"kind":"cat","tag":8,"x":3,"y":true}')

  def test_array_bounds(self):
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 3}
    dfa = self.compile(schema)
    assert not dfa.accepts("[]")
    assert dfa.accepts("[1]") and dfa.accepts("[1,2,3]")
    assert not dfa.accepts("[1,2,3,4]")
    empty_ok = self.compile({"type": "array", "items": {"type": "null"}})
    assert empty_ok.accepts("[]") and empty_ok.accepts("[null,null]")

  def test_nested_objects(self):
    schema = {
        "type": "object",
        "properties": {
            "user": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"],
            },
            "tags": {"type": "array", "items": {"type": "string"},
                     "maxItems": 2},
        },
        "required": ["user", "tags"],
    }
    dfa = self.compile(schema)
    assert dfa.accepts('{"user":{"id":1},"tags":["a","b"]}')
    assert not dfa.accepts('{"user":{},"tags":[]}')

  def test_whitespace_mode(self):
    schema = {"type": "object", "properties": {"a": {"type": "null"}},
              "required": ["a"]}
    loose = self.compile(schema, compact=False)
    assert loose.accepts('{ "a" : null }')
    strict = self.compile(schema)
    assert not strict.accepts('{ "a" : null }')
    assert strict.accepts('{"a":null}')

  def test_strictness_validation(self):
    with pytest.raises(ValueError, match="require every property"):
      constrain.schema_regex({
          "type": "object", "properties": {"a": {"type": "null"}},
          "required": [],
      })
    with pytest.raises(ValueError, match="additionalProperties"):
      constrain.schema_regex({
          "type": "object", "properties": {"a": {"type": "null"}},
          "required": ["a"], "additionalProperties": True,
      })
    with pytest.raises(ValueError, match="unsupported schema type"):
      constrain.schema_regex({"type": "frobnicate"})
    with pytest.raises(ValueError, match="empty enum"):
      constrain.schema_regex({"enum": []})

  def test_tool_call_schema_envelope(self):
    tools = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object",
                           "properties": {"city": {"type": "string"}},
                           "required": ["city"]}}},
        {"type": "function", "function": {"name": "ping"}},  # no params
    ]
    dfa = self.compile(constrain.tool_call_schema(tools))
    assert dfa.accepts('{"name":"get_weather","arguments":{"city":"oslo"}}')
    assert dfa.accepts('{"name":"ping","arguments":{}}')
    # Arguments must match the NAMED tool's schema, not any tool's.
    assert not dfa.accepts('{"name":"ping","arguments":{"city":"oslo"}}')
    assert not dfa.accepts('{"name":"get_weather","arguments":{}}')
    assert not dfa.accepts('{"name":"other","arguments":{}}')
    assert not dfa.accepts('hello')

  def test_tool_call_schema_named_restriction(self):
    tools = [
        {"type": "function", "function": {"name": "a"}},
        {"type": "function", "function": {"name": "b"}},
    ]
    dfa = self.compile(constrain.tool_call_schema(tools, tool_name="b"))
    assert dfa.accepts('{"name":"b","arguments":{}}')
    assert not dfa.accepts('{"name":"a","arguments":{}}')

  def test_tool_call_schema_validation(self):
    fn = {"type": "function", "function": {"name": "a"}}
    with pytest.raises(ValueError, match="non-empty"):
      constrain.tool_call_schema([])
    with pytest.raises(ValueError, match="duplicate"):
      constrain.tool_call_schema([fn, fn])
    with pytest.raises(ValueError, match="not in tools"):
      constrain.tool_call_schema([fn], tool_name="zzz")
    with pytest.raises(ValueError, match="function"):
      constrain.tool_call_schema([{"type": "retrieval"}])
    with pytest.raises(ValueError, match="name"):
      constrain.tool_call_schema([{"type": "function", "function": {}}])

  def test_end_to_end_schema_sampling(self):
    import json as json_mod

    pieces = list('{}[]:,"0123456789') + [
        "name", "age", "a", "b", "-", ".", "true", "false", "null",
    ]
    vocab = CharVocab(pieces)
    config = common.GriffinConfig(
        vocab_size=vocab.GetPieceSize(),
        width=16, mlp_expanded_width=32, num_heads=2,
        block_types=(common.TemporalBlockType.RECURRENT,),
        embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
        logits_soft_cap=30.0, lru_width=16,
        scan_type=common.ScanType.LINEAR_NATIVE,
    )
    model = griffin.Griffin(config, dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            gradient_checkpointing=False)
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.arange(4)[None])["params"]
    s = sampler_lib.Sampler(model, vocab, params)
    schema = {
        "type": "object",
        "properties": {"name": {"enum": ["ab", "ba"]},
                       "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    dfa = constrain.schema_dfa(schema, vocab, vocab.GetPieceSize())
    out = s(["a b"], total_generation_steps=40, constraint=dfa)
    text, stopped = generated_text(vocab, out)
    if stopped:
      doc = json_mod.loads(text)
      assert doc["name"] in ("ab", "ba")
      assert isinstance(doc["age"], int)
    else:
      assert dfa.is_live_prefix(text), text


class TestBatcherConstraints:
  """Per-request grammars through the continuous batcher."""

  def make_batcher(self, setup, dfas, **kw):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    return s, serving_lib.ContinuousBatcher(
        s, num_slots=3, max_steps_default=12, constraints=dfas, **kw
    )

  def trimmed(self, vocab, tokens):
    ids = []
    for t in tokens:
      if t == vocab.eos_id():
        break
      ids.append(int(t))
    return vocab.DecodeIds(ids)

  def test_mixed_grammars_and_free_requests(self, setup):
    _, vocab, _ = setup
    dfa_ab = make_dfa(vocab, "[ab]{2,4}")
    dfa_choice = make_dfa(vocab, constrain.choice_regex(["cat", "dog"]))
    sampler, batcher = self.make_batcher(setup, [dfa_ab, dfa_choice])

    rid_ab = batcher.add_request("ab cd", max_steps=10, constraint=0)
    rid_free = batcher.add_request("ab cd", max_steps=10)
    batcher.step(2)  # the constrained pair starts before this one joins
    rid_choice = batcher.add_request("d a", max_steps=10, constraint=1)
    results = {rid: (toks, text)
               for rid, toks, text
               in batcher.run_until_drained(step_size=4)}

    assert re.fullmatch(
        "[ab]{2,4}", self.trimmed(vocab, results[rid_ab][0])
    )
    assert self.trimmed(vocab, results[rid_choice][0]) in ("cat", "dog")
    # The free request is bit-identical to a solo run (the batcher's
    # correctness bar) — the neighbors' grammars must not leak into it.
    solo = sampler(["ab cd"], total_generation_steps=10)
    np.testing.assert_array_equal(
        np.asarray(results[rid_free][0]),
        np.asarray(solo.tokens[0])[: len(results[rid_free][0])],
    )

  def test_constrained_equals_solo_constrained(self, setup):
    _, vocab, _ = setup
    dfa = make_dfa(vocab, "[ab]{2,4}")
    sampler, batcher = self.make_batcher(setup, [dfa])
    rid = batcher.add_request("ab cd", max_steps=10, constraint=0)
    (got_rid, toks, _), = batcher.run_until_drained(step_size=4)
    assert got_rid == rid
    solo = sampler(["ab cd"], total_generation_steps=10, constraint=dfa)
    np.testing.assert_array_equal(
        np.asarray(toks), np.asarray(solo.tokens[0])[: len(toks)]
    )

  def test_slot_reuse_resets_grammar(self, setup):
    _, vocab, _ = setup
    dfa = make_dfa(vocab, constrain.choice_regex(["cat", "dog"]))
    _, batcher = self.make_batcher(setup, [dfa])
    first = batcher.add_request("a", max_steps=8, constraint=0)
    (got, _, _), = batcher.run_until_drained(step_size=4)
    assert got == first
    # The freed slot's next occupant is unconstrained; stale grammar
    # state in the slot must not survive the insert.
    free = batcher.add_request("ab cd", max_steps=6)
    (rid, toks, _), = batcher.run_until_drained(step_size=4)
    assert rid == free and len(toks) > 0

  def test_validation(self, setup):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, "[ab]+")
    # Constraints COMPOSE with draft_len (grammar-aware verify).
    serving_lib.ContinuousBatcher(
        s, num_slots=2, constraints=[dfa], draft_len=2
    )
    batcher = serving_lib.ContinuousBatcher(s, num_slots=2)
    with pytest.raises(ValueError, match="constraints"):
      batcher.add_request("ab", constraint=0)
    batcher2 = serving_lib.ContinuousBatcher(
        s, num_slots=2, constraints=[dfa]
    )
    with pytest.raises(ValueError, match="registered"):
      batcher2.add_request("ab", constraint=1)


class TestDynamicGrammarSlots:
  """Runtime grammar registration (per-request schemas) in the batcher."""

  def make_batcher(self, setup, slots=2, **kw):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    return s, serving_lib.ContinuousBatcher(
        s, num_slots=3, max_steps_default=10,
        dynamic_grammar_slots=slots,
        dynamic_grammar_budget=(64, 16, 4), **kw
    )

  def trimmed(self, vocab, tokens):
    ids = []
    for t in tokens:
      if t == vocab.eos_id():
        break
      ids.append(int(t))
    return vocab.DecodeIds(ids)

  def test_dynamic_constraint_applies_and_free_is_exact(self, setup):
    _, vocab, _ = setup
    sampler, batcher = self.make_batcher(setup)
    dfa = make_dfa(vocab, "[ab]{2,4}")
    rid_c = batcher.add_request("ab cd", max_steps=10, constraint=dfa)
    rid_f = batcher.add_request("ab cd", max_steps=10)
    results = {r: t for r, t, _ in batcher.run_until_drained(4)}
    assert re.fullmatch("[ab]{2,4}", self.trimmed(vocab, results[rid_c]))
    solo = sampler(["ab cd"], total_generation_steps=10)
    np.testing.assert_array_equal(
        np.asarray(results[rid_f]),
        np.asarray(solo.tokens[0])[: len(results[rid_f])],
    )

  def test_slot_reuse_and_lru_eviction(self, setup):
    _, vocab, _ = setup
    _, batcher = self.make_batcher(setup, slots=2)
    grammars = ["[ab]{2,4}", constrain.choice_regex(["cat", "dog"]),
                "[cd]{1,3}"]
    for i, pattern in enumerate(grammars):  # 3 grammars through 2 slots
      dfa = make_dfa(vocab, pattern)
      rid = batcher.add_request("ab", max_steps=10, constraint=dfa)
      results = {r: t for r, t, _ in batcher.run_until_drained(4)}
      text = self.trimmed(vocab, results[rid])
      assert dfa.allows_text(text), (pattern, text)
    assert len(batcher._dynamic_by_key) == 2  # LRU capped at the slots

  def test_same_grammar_shares_a_slot(self, setup):
    _, vocab, _ = setup
    _, batcher = self.make_batcher(setup, slots=1)
    dfa = make_dfa(vocab, "[ab]{2,4}")
    dfa2 = make_dfa(vocab, "[ab]{2,4}")  # equal pattern, new object
    r1 = batcher.add_request("ab", max_steps=8, constraint=dfa)
    r2 = batcher.add_request("cd", max_steps=8, constraint=dfa2)
    assert len(batcher._dynamic_by_key) == 1
    results = {r: t for r, t, _ in batcher.run_until_drained(4)}
    for rid in (r1, r2):
      assert re.fullmatch(
          "[ab]{2,4}", self.trimmed(vocab, results[rid])
      )

  def test_exhaustion_raises_while_slots_are_live(self, setup):
    _, vocab, _ = setup
    _, batcher = self.make_batcher(setup, slots=1)
    batcher.add_request(
        "ab", max_steps=10, constraint=make_dfa(vocab, "[ab]{2,4}")
    )
    with pytest.raises(RuntimeError, match="dynamic grammar slots"):
      batcher.add_request(
          "cd", max_steps=10,
          constraint=make_dfa(vocab, "[cd]{1,2}"),
      )
    batcher.run_until_drained(4)
    # After the holder finishes, the slot is evictable again.
    rid = batcher.add_request(
        "cd", max_steps=10, constraint=make_dfa(vocab, "[cd]{1,2}")
    )
    results = {r: t for r, t, _ in batcher.run_until_drained(4)}
    assert re.fullmatch("[cd]{1,2}", self.trimmed(vocab, results[rid]))

  def test_budget_exceeded_raises(self, setup):
    _, vocab, _ = setup
    _, batcher = self.make_batcher(setup, slots=1)
    big = make_dfa(vocab, "(cat|dog){1,41}")  # counting: ~3 states/rep
    assert big.n_states > 64
    with pytest.raises(ValueError, match="budget"):
      batcher.add_request("ab", max_steps=4, constraint=big)

  def test_cancel_releases_the_slot(self, setup):
    _, vocab, _ = setup
    _, batcher = self.make_batcher(setup, slots=1)
    rid = batcher.add_request(
        "ab", max_steps=10, constraint=make_dfa(vocab, "[ab]{2,4}")
    )
    assert batcher.cancel(rid)
    rid2 = batcher.add_request(
        "cd", max_steps=10, constraint=make_dfa(vocab, "[cd]{1,2}")
    )
    results = {r: t for r, t, _ in batcher.run_until_drained(4)}
    assert re.fullmatch("[cd]{1,2}", self.trimmed(vocab, results[rid2]))


class TestPerRequestSampling:
  """Each slot decodes under its own sampling parameters."""

  def make(self, setup, deterministic=True, **sampler_kw):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(
        model, vocab, params, deterministic_sampling=deterministic,
        **sampler_kw,
    )
    b = serving_lib.ContinuousBatcher(
        s, num_slots=3, max_steps_default=10, per_request_sampling=True
    )
    return model, vocab, params, s, b

  def test_categorical_overrides_match_solo(self, setup):
    model, vocab, params, _, b = self.make(setup, deterministic=False)
    key_a, key_b = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    rid_a = b.add_request("ab cd", rng=key_a, temperature=0.6,
                          top_k=5, top_p=0.85)
    rid_b = b.add_request("cd ab", rng=key_b)  # sampler defaults
    res = {r: t for r, t, _ in b.run_until_drained(4)}
    solo_a = sampler_lib.Sampler(
        model, vocab, params, deterministic_sampling=False,
        temperature=0.6, top_k=5, top_p=0.85,
    )(["ab cd"], total_generation_steps=10, rng=key_a)
    solo_b = sampler_lib.Sampler(
        model, vocab, params, deterministic_sampling=False
    )(["cd ab"], total_generation_steps=10, rng=key_b)
    for rid, solo in ((rid_a, solo_a), (rid_b, solo_b)):
      want = [int(t) for t in np.asarray(solo.tokens[0])]
      assert res[rid] == want[: len(res[rid])], (res[rid], want)

  def test_min_tokens_suppresses_stops(self, setup):
    model, vocab, params, s, b = self.make(setup)
    # Pick the greedy continuation's own first token as a stop: without
    # min_tokens the request would stop immediately.
    probe = s(["ab cd"], total_generation_steps=2)
    first = int(np.asarray(probe.tokens[0])[0])
    rid = b.add_request(
        "ab cd", max_steps=8, min_tokens=3, stop_token_ids=[first]
    )
    res = {r: t for r, t, _ in b.run_until_drained(4)}
    toks = res[rid]
    assert len(toks) >= 3, toks
    assert first not in toks[:2], toks  # suppressed incl. the seed

  def test_per_request_stop_token(self, setup):
    model, vocab, params, s, b = self.make(setup)
    free = s(["ab cd"], total_generation_steps=10)
    free_toks = [int(t) for t in np.asarray(free.tokens[0])]
    stop = free_toks[2]
    rid = b.add_request("ab cd", max_steps=10, stop_token_ids=[stop])
    res = {r: t for r, t, _ in b.run_until_drained(4)}
    # Identical stream, halted at (and including) the FIRST occurrence
    # of the per-request stop (which may be the seed token).
    upto = free_toks.index(stop) + 1
    assert res[rid] == free_toks[:upto], (res[rid], free_toks)

  def test_per_request_repetition_penalty_matches_solo(self, setup):
    model, vocab, params, _, b = self.make(setup)
    rid = b.add_request("ab cd", max_steps=10, repetition_penalty=1.4)
    rid_free = b.add_request("ab cd", max_steps=10)
    res = {r: t for r, t, _ in b.run_until_drained(4)}
    solo_pen = sampler_lib.Sampler(
        model, vocab, params, repetition_penalty=1.4
    )(["ab cd"], total_generation_steps=10)
    want = [int(t) for t in np.asarray(solo_pen.tokens[0])]
    assert res[rid] == want[: len(res[rid])]
    solo_free = sampler_lib.Sampler(model, vocab, params)(
        ["ab cd"], total_generation_steps=10
    )
    want_free = [int(t) for t in np.asarray(solo_free.tokens[0])]
    assert res[rid_free] == want_free[: len(res[rid_free])]

  def test_validation(self, setup):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    plain = serving_lib.ContinuousBatcher(s, num_slots=2)
    with pytest.raises(ValueError, match="per_request_sampling"):
      plain.add_request("ab", temperature=0.5)
    _, _, _, _, b = self.make(setup, deterministic=True)
    with pytest.raises(ValueError, match="greedy"):
      b.add_request("ab", temperature=0.5)
    with pytest.raises(ValueError, match="top_p"):
      b2 = self.make(setup, deterministic=False)[4]
      b2.add_request("ab", rng=jax.random.PRNGKey(0), top_p=1.5)
    with pytest.raises(ValueError, match="stop tokens"):
      b.add_request("ab", stop_token_ids=[4, 5, 6, 7, 8])

  def test_constraint_composes_with_min_tokens(self, setup):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, "[ab]{1,4}")
    b = serving_lib.ContinuousBatcher(
        s, num_slots=2, max_steps_default=10, constraints=[dfa],
        per_request_sampling=True,
    )
    rid = b.add_request("ab cd", max_steps=10, constraint=0,
                        min_tokens=3)
    res = {r: t for r, t, _ in b.run_until_drained(4)}
    text = "".join(
        vocab.DecodeIds([t]) for t in res[rid] if t != vocab.eos_id()
    )
    assert re.fullmatch("[ab]{3,4}", text), (res[rid], text)


class TestSpeculativeConstraints:
  """Grammar constraints compose with speculative decoding."""

  def trimmed(self, vocab, tokens):
    ids = []
    for t in np.asarray(tokens):
      if int(t) == vocab.eos_id():
        break
      if int(t) == vocab.pad_id():
        break
      ids.append(int(t))
    return ids

  def test_solo_spec_matches_constrained_plain_greedy(self, setup):
    from cadence_gemma_tpu.inference import speculative

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, "[abcd]{3,6}")
    plain = s(["ab cd"], total_generation_steps=10, constraint=dfa)
    spec = speculative.SpeculativeSampler(s, draft_len=3, ngram=2)
    out = spec(["ab cd"], total_generation_steps=10, constraint=dfa)
    assert self.trimmed(vocab, out.tokens[0]) == self.trimmed(
        vocab, plain.tokens[0]
    )
    text = vocab.DecodeIds(self.trimmed(vocab, out.tokens[0]))
    assert re.fullmatch("[abcd]{3,6}", text), text

  def test_speculative_batcher_with_grammars(self, setup):
    from cadence_gemma_tpu.inference import serving as serving_lib

    model, vocab, params = setup
    s = sampler_lib.Sampler(model, vocab, params)
    dfa = make_dfa(vocab, "[ab]{2,4}")
    b = serving_lib.ContinuousBatcher(
        s, num_slots=2, max_steps_default=10, draft_len=2, ngram=2,
        constraints=[dfa],
    )
    rid_c = b.add_request("ab cd", max_steps=10, constraint=0)
    rid_f = b.add_request("cd ab", max_steps=10)
    res = {r: t for r, t, _ in b.run_until_drained(4)}
    want_c = s(["ab cd"], total_generation_steps=10, constraint=dfa)
    assert self.trimmed(vocab, res[rid_c]) == self.trimmed(
        vocab, want_c.tokens[0]
    )
    want_f = s(["cd ab"], total_generation_steps=10)
    assert res[rid_f] == [
        int(t) for t in np.asarray(want_f.tokens[0])
    ][: len(res[rid_f])]

  def test_categorical_spec_stays_in_grammar(self, setup):
    from cadence_gemma_tpu.inference import speculative

    model, vocab, params = setup
    s = sampler_lib.Sampler(
        model, vocab, params, deterministic_sampling=False,
        temperature=1.3,
    )
    dfa = make_dfa(vocab, "(cat|dog)(cat|dog)?")
    spec = speculative.SpeculativeSampler(s, draft_len=3, ngram=2)
    for seed in range(3):
      out = spec(["ab"], total_generation_steps=14,
                 rng=jax.random.PRNGKey(seed), constraint=dfa)
      ids = self.trimmed(vocab, out.tokens[0])
      text = vocab.DecodeIds(ids)
      stopped = any(
          int(t) == vocab.eos_id() for t in np.asarray(out.tokens[0])
      )
      if stopped:
        assert dfa.allows_text(text), text
      else:
        assert dfa.is_live_prefix(text), text


class TestTokenStringsFromVocab:

  def test_simple_vocab_fallback(self):
    from cadence_gemma_tpu.tokenizers import SimpleVocab

    vocab = SimpleVocab(["hello", "world"])
    strings = constrain.token_strings_from_vocab(
        vocab, vocab.GetPieceSize()
    )
    assert strings[: 3] == ["", "", ""]
    assert strings[4] == "hello" and strings[5] == "world"

  def test_byte_fallback_and_control_pieces(self):
    class SPVocab(CharVocab):
      """Mimics the real Gemma tokenizer's piece classes."""

      def IdToPiece(self, i):  # noqa: N802
        return ["", "", "", "", "▁hi", "<0x0A>", "<start_of_turn>",
                "<0xE2>"][i]

      def IsControl(self, i):  # noqa: N802
        return i == 6

      def IsByte(self, i):  # noqa: N802
        return i in (5, 7)

    vocab = SPVocab(["x"] * 4)  # pieces list only sizes GetPieceSize
    strings = constrain.token_strings_from_vocab(vocab, 8)
    assert strings[4] == " hi"
    assert strings[5] == "\n"            # byte token emits its byte
    assert strings[6] == ""              # control: forbidden
    assert strings[7] == "\xe2"          # non-ASCII byte: latin-1 stand-in
    # A grammar over ASCII + newline treats the byte token correctly.
    dfa = constrain.TokenDFA("( hi)+\n?", strings, eos_id=2)
    start = dfa.char_dfa.start
    after_hi = dfa.token_advance(start, 4)
    assert dfa.token_allowed(after_hi, 5)   # newline byte fits
    assert not dfa.token_allowed(after_hi, 7)  # 0xE2 is dead

  def test_sentencepiece_piece_mapping(self):
    class PieceVocab(CharVocab):

      def IdToPiece(self, i):  # noqa: N802
        if i < 4:
          return ""
        return "▁" + self.pieces[i - 4]

    vocab = PieceVocab(["cat", "dog"])
    strings = constrain.token_strings_from_vocab(
        vocab, vocab.GetPieceSize()
    )
    assert strings[4] == " cat" and strings[5] == " dog"
