"""HTTP serving front end + request cancellation.

The serving invariant is inherited from tests/test_serving.py: whatever
path a request takes (frontend queue, HTTP, streaming, neighbors joining
or cancelling), its tokens match a solo Sampler run bit-for-bit.
"""

import json
import re
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_gemma_tpu import common
from cadence_gemma_tpu.inference import sampler as sampler_lib
from cadence_gemma_tpu.inference import server as server_lib
from cadence_gemma_tpu.inference import serving
from cadence_gemma_tpu.models import griffin
from cadence_gemma_tpu.tokenizers import SimpleVocab

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def setup():
  vocab = SimpleVocab(WORDS)
  config = common.GriffinConfig(
      vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
      num_heads=2,
      block_types=(
          common.TemporalBlockType.RECURRENT,
          common.TemporalBlockType.ATTENTION,
      ),
      embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
      logits_soft_cap=30.0, lru_width=16,
      scan_type=common.ScanType.LINEAR_NATIVE,
  )
  model = griffin.Griffin(
      config, dtype=jnp.float32, param_dtype=jnp.float32,
      gradient_checkpointing=False,
  )
  params = model.init(
      jax.random.PRNGKey(11), jnp.ones((1, 4), jnp.int32),
      jnp.arange(4)[None],
  )["params"]
  sampler = sampler_lib.Sampler(model, vocab, params)
  return sampler, vocab


def _solo(sampler, prompt, steps):
  return list(
      np.asarray(sampler([prompt], total_generation_steps=steps).tokens[0])
  )


def _check(got, solo_tokens, steps, eos_id):
  assert got == solo_tokens[: len(got)], (got, solo_tokens)
  assert len(got) == steps or got[-1] == eos_id, (got, steps)


class TestCancel:

  def test_cancel_running_leaves_neighbor_exact(self, setup):
    sampler, vocab = setup
    steps = 10
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=steps)
    victim = batcher.add_request("alpha beta")
    keeper = batcher.add_request("gamma delta eps")
    batcher.step(3)
    assert batcher.cancel(victim)
    assert not batcher.cancel(victim)      # already gone
    assert not batcher.cancel(12345)       # unknown id
    res = {r: t for r, t, _ in batcher.run_until_drained(2)}
    assert victim not in res
    _check(res[keeper], _solo(sampler, "gamma delta eps", steps),
           steps, vocab.eos_id())

  def test_cancel_pending_and_slot_reuse(self, setup):
    sampler, vocab = setup
    steps = 6
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=steps)
    first = batcher.add_request("alpha beta")
    assert batcher.cancel(first)           # still pending: never prefills
    rid = batcher.add_request("gamma delta")
    res = {r: t for r, t, _ in batcher.run_until_drained(2)}
    _check(res[rid], _solo(sampler, "gamma delta", steps), steps,
           vocab.eos_id())


class TestFrontend:

  def test_results_match_solo_with_queueing(self, setup):
    sampler, vocab = setup
    steps = 8
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=steps)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      prompts = ["alpha beta", "gamma delta eps", "zeta eta"]  # 3 > slots
      subs = [fe.submit(p) for p in prompts]
      for p, sub in zip(prompts, subs):
        tokens, text = sub.result(timeout=120)
        _check(tokens, _solo(sampler, p, steps), steps, vocab.eos_id())
        assert text == sampler.vocab.DecodeIds(tokens)
    finally:
      fe.close()

  def test_streaming_deltas_cover_all_tokens(self, setup):
    sampler, vocab = setup
    steps = 9
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=steps)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      sub = fe.submit("alpha beta gamma")
      assembled, final = [], None
      while final is None:
        kind, payload = sub.events.get(timeout=120)
        if kind == "tokens":
          assembled.extend(payload)
        elif kind == "done":
          final = payload[0]
        else:
          raise AssertionError(payload)
      assert assembled == final
      _check(final, _solo(sampler, "alpha beta gamma", steps), steps,
             vocab.eos_id())
    finally:
      fe.close()

  def test_cancel_mid_stream(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=512)
    fe = server_lib.ServingFrontend(batcher, step_size=1)
    try:
      sub = fe.submit("alpha beta")
      kind, _ = sub.events.get(timeout=120)   # wait for the first delta
      assert kind == "tokens"
      assert fe.cancel(sub.request_id)
      with pytest.raises(RuntimeError, match="cancelled"):
        sub.result(timeout=120)
      # The slot frees for the next request.
      nxt = fe.submit("gamma delta", max_tokens=6)
      tokens, _ = nxt.result(timeout=120)
      _check(tokens, _solo(sampler, "gamma delta", 6), 6, vocab.eos_id())
    finally:
      fe.close()

  def test_submit_error_reports_not_hangs(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=4)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      sub = fe.submit("alpha", image_path="/nonexistent.jpg")
      with pytest.raises(RuntimeError, match="generation failed"):
        sub.result(timeout=120)
    finally:
      fe.close()


class TestHTTP:

  @pytest.fixture(scope="class")
  def httpd(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, sampler, vocab
    srv.close()

  def _post(self, port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def test_generate_and_health(self, httpd):
    srv, sampler, vocab = httpd
    status, out = self._post(srv.port, "/v1/generate",
                             {"prompt": "alpha beta"})
    assert status == 200
    _check(out["tokens"], _solo(sampler, "alpha beta", 8), 8,
           vocab.eos_id())
    assert out["text"] == sampler.vocab.DecodeIds(out["tokens"])
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/v1/health", timeout=30
    ) as resp:
      health = json.loads(resp.read())
    assert health["ok"] and health["slots"] == 2

  def test_streaming_assembles_to_nonstream(self, httpd):
    srv, sampler, vocab = httpd
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/generate",
        data=json.dumps({"prompt": "gamma delta", "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    assembled, final = [], None
    with urllib.request.urlopen(req, timeout=120) as resp:
      for line in resp:
        evt = json.loads(line)
        assembled.extend(evt.get("tokens", []))
        if evt.get("done"):
          final = evt
    assert final and "text" in final
    _check(assembled, _solo(sampler, "gamma delta", 8), 8, vocab.eos_id())
    assert final["text"] == sampler.vocab.DecodeIds(assembled)

  def test_concurrent_requests_isolated(self, httpd):
    """Two handler threads posting at once; each gets its own answer."""
    srv, sampler, vocab = httpd
    results = {}

    def go(prompt):
      results[prompt] = self._post(srv.port, "/v1/generate",
                                   {"prompt": prompt})[1]

    threads = [threading.Thread(target=go, args=(p,))
               for p in ("alpha beta", "zeta eta theta")]
    for t in threads:
      t.start()
    for t in threads:
      t.join(timeout=180)
    for p, out in results.items():
      _check(out["tokens"], _solo(sampler, p, 8), 8, vocab.eos_id())

  def test_bad_requests(self, httpd):
    srv, _, _ = httpd
    try:
      self._post(srv.port, "/v1/generate", {"prompt": ""})
      raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
      assert e.code == 400
    try:
      self._post(srv.port, "/v1/nope", {})
      raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
      assert e.code == 404


class TestChatSessions:
  """HTTP-level multi-turn chat: turns chain through PrefixStates."""

  @pytest.fixture(scope="class")
  def chat_httpd(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=6, preserve_states=True
    )
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, sampler, vocab
    srv.close()

  def _post(self, port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def test_session_turns_match_solo_chat(self, chat_httpd):
    srv, sampler, vocab = chat_httpd
    steps = 6
    solo1 = sampler(["alpha beta"], total_generation_steps=steps,
                    return_state=True)
    solo2 = sampler(["gamma"], total_generation_steps=steps,
                    prefix_state=solo1.state)
    _, out1 = self._post(srv.port, "/v1/generate",
                         {"prompt": "alpha beta", "session": "u1"})
    _check(out1["tokens"], list(np.asarray(solo1.tokens[0])), steps,
           vocab.eos_id())
    _, out2 = self._post(srv.port, "/v1/generate",
                         {"prompt": "gamma", "session": "u1"})
    _check(out2["tokens"], list(np.asarray(solo2.tokens[0])), steps,
           vocab.eos_id())

  def test_sessions_isolated_and_resettable(self, chat_httpd):
    srv, sampler, vocab = chat_httpd
    steps = 6
    # A fresh session is unaffected by other sessions' history.
    _, fresh = self._post(srv.port, "/v1/generate",
                          {"prompt": "delta eps", "session": "u2"})
    _check(fresh["tokens"], _solo(sampler, "delta eps", steps), steps,
           vocab.eos_id())
    # Reset: the next turn starts from scratch again.
    _, r = self._post(srv.port, "/v1/reset", {"session": "u2"})
    assert r["reset"] is True
    _, again = self._post(srv.port, "/v1/generate",
                          {"prompt": "delta eps", "session": "u2"})
    assert again["tokens"] == fresh["tokens"]
    _, r2 = self._post(srv.port, "/v1/reset", {"session": "nope"})
    assert r2["reset"] is False

  def test_busy_session_409(self, chat_httpd):
    srv, _, _ = chat_httpd
    fe = srv.frontend
    sub = fe.submit("alpha beta gamma", max_tokens=64, session="busy1")
    try:
      self._post(srv.port, "/v1/generate",
                 {"prompt": "x", "session": "busy1"})
      raise AssertionError("expected 409")
    except urllib.error.HTTPError as e:
      assert e.code == 409
    finally:
      sub.result(timeout=120)

  def test_session_requires_preserve_states(self, setup):
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=4)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      with pytest.raises(ValueError, match="preserve_states"):
        fe.submit("alpha", session="s")
    finally:
      fe.close()


class TestReviewHardening:
  """Regression tests for the production-hardening review findings."""

  def test_driver_death_fails_inflight_and_health(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=64)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      boom = RuntimeError("synthetic device OOM")

      def dying_step(n):
        raise boom

      batcher.step = dying_step
      sub = fe.submit("alpha beta")
      with pytest.raises(RuntimeError, match="driver died"):
        sub.result(timeout=120)
      assert fe.stats["ok"] is False
      assert "synthetic device OOM" in fe.stats["error"]
      with pytest.raises(server_lib.FrontendDead):
        fe.submit("gamma")
    finally:
      fe.close()

  def test_reset_mid_turn_is_epoch_fenced(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=1, max_steps_default=6, preserve_states=True
    )
    fe = server_lib.ServingFrontend(batcher, step_size=1)
    try:
      sub = fe.submit("alpha beta", session="u")
      fe.reset_session("u")       # lands while the turn is in flight
      sub.result(timeout=120)
      # The finished turn's state must NOT have been re-installed.
      nxt = fe.submit("gamma delta", session="u")
      tokens, _ = nxt.result(timeout=120)
      _check(tokens, _solo(sampler, "gamma delta", 6), 6, vocab.eos_id())
    finally:
      fe.close()

  def test_max_tokens_zero_is_an_error_not_default(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      sub = fe.submit("alpha", max_tokens=0)
      with pytest.raises(RuntimeError, match="max_steps must be >= 1"):
        sub.result(timeout=120)
    finally:
      fe.close()

  def test_default_prefix_applies_and_chains_into_sessions(self, setup):
    sampler, vocab = setup
    steps = 6
    prefix = sampler.prefill_prefix("alpha beta gamma")
    solo1 = sampler(["delta"], total_generation_steps=steps,
                    prefix_state=prefix, return_state=True)
    solo2 = sampler(["eps"], total_generation_steps=steps,
                    prefix_state=solo1.state)
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=steps,
        preserve_states=True,
    )
    fe = server_lib.ServingFrontend(
        batcher, step_size=2, default_prefix_state=prefix
    )
    try:
      t1, _ = fe.submit("delta", session="u").result(timeout=120)
      _check(t1, list(np.asarray(solo1.tokens[0])), steps, vocab.eos_id())
      t2, _ = fe.submit("eps", session="u").result(timeout=120)
      _check(t2, list(np.asarray(solo2.tokens[0])), steps, vocab.eos_id())
      # Plain (session-less) requests also get the shared prefix.
      t3, _ = fe.submit("delta").result(timeout=120)
      _check(t3, list(np.asarray(solo1.tokens[0])), steps, vocab.eos_id())
    finally:
      fe.close()

  def test_adapter_resolver_serves_per_request_lora(self, setup):
    from cadence_gemma_tpu.training import lora

    _, vocab = setup
    config = common.GriffinConfig(
        vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
        num_heads=2,
        block_types=(
            common.TemporalBlockType.RECURRENT,
            common.TemporalBlockType.ATTENTION,
        ),
        embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
        logits_soft_cap=30.0, lru_width=16,
        scan_type=common.ScanType.LINEAR_NATIVE,
    )
    model = griffin.Griffin(
        config, dtype=jnp.float32, param_dtype=jnp.float32,
        gradient_checkpointing=False, lora_rank=4,
    )
    params = model.init(
        jax.random.PRNGKey(11), jnp.ones((1, 4), jnp.int32),
        jnp.arange(4)[None],
    )["params"]
    adapters0, _ = lora.split_lora(params)
    leaves, td = jax.tree_util.tree_flatten(adapters0)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    tuned = jax.tree_util.tree_unflatten(
        td, [0.5 * jax.random.normal(k, l.shape, l.dtype)
             for k, l in zip(keys, leaves)]
    )
    sampler = sampler_lib.Sampler(model, vocab, params)
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=6, multi_lora=True
    )
    fe = server_lib.ServingFrontend(
        batcher, step_size=2,
        adapter_resolver=lambda i: [tuned][int(i)],
    )
    try:
      got, _ = fe.submit("alpha beta", adapter=0).result(timeout=120)
      solo = sampler_lib.Sampler(
          model, vocab, lora.merge_params(params, tuned)
      )
      want = list(np.asarray(
          solo(["alpha beta"], total_generation_steps=6).tokens[0]
      ))
      _check(got, want, 6, vocab.eos_id())
      plain, _ = fe.submit("gamma delta").result(timeout=120)
      _check(plain, _solo(sampler, "gamma delta", 6), 6, vocab.eos_id())
    finally:
      fe.close()

  def test_adapter_without_resolver_rejected(self, setup):
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=4)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      with pytest.raises(ValueError, match="adapter_resolver"):
        fe.submit("alpha", adapter=0)
    finally:
      fe.close()


class TestMetrics:

  def test_counters_and_latency_percentiles(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=6)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      subs = [fe.submit(p) for p in
              ("alpha beta", "gamma delta", "zeta eta")]
      for sub in subs:
        sub.result(timeout=120)
        m = sub.metrics
        assert 0 <= m["ttft_s"] <= m["wall_s"]
      stats = fe.stats
      assert stats["completed"] == 3
      assert stats["cancelled"] == 0 and stats["errors"] == 0
      assert stats["tokens_out"] >= 3
      assert 0 <= stats["ttft_s_p50"] <= stats["wall_s_p90"]
      # A cancelled and an errored request hit their own counters.
      long = fe.submit("alpha beta gamma", max_tokens=512)
      long.events.get(timeout=120)        # admitted and decoding
      fe.cancel(long.request_id)
      with pytest.raises(RuntimeError):
        long.result(timeout=120)
      bad = fe.submit("alpha", max_tokens=0)
      with pytest.raises(RuntimeError):
        bad.result(timeout=120)
      stats = fe.stats
      assert stats["cancelled"] == 1 and stats["errors"] == 1
      assert stats["completed"] == 3
    finally:
      fe.close()


class TestSessionLRU:

  def test_eviction_is_least_recently_used(self, setup):
    sampler, vocab = setup
    steps = 5
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=1, max_steps_default=steps,
        preserve_states=True,
    )
    fe = server_lib.ServingFrontend(batcher, step_size=2, max_sessions=2)
    try:
      for name in ("a", "b", "c"):   # third store evicts session "a"
        fe.submit("alpha beta", session=name).result(timeout=120)
      assert fe.stats["sessions"] == 2
      assert set(fe._sessions) == {"b", "c"}
      # Touching "b" refreshes it, so the next store evicts "c".
      fe.submit("gamma", session="b").result(timeout=120)
      fe.submit("alpha beta", session="d").result(timeout=120)
      assert set(fe._sessions) == {"b", "d"}
      # An evicted session still serves — it just restarts from scratch.
      tokens, _ = fe.submit("delta eps", session="c").result(timeout=120)
      _check(tokens, _solo(sampler, "delta eps", steps), steps,
             vocab.eos_id())
    finally:
      fe.close()


class TestRenderChatMessages:
  """OpenAI messages[] → one submit()-able prompt string."""

  def test_it_multiturn_matches_canonical_template(self):
    msgs = [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "bye"},
    ]
    prompt, img = server_lib.render_chat_messages(msgs, is_it_model=True)
    assert img is None
    # The sampler's apply_it_formatter wrap of the rendered interior must
    # equal the canonical alternating multi-turn template.
    assert common.apply_it_formatter(prompt) == (
        f"{common.IT_USER_OPEN}hi{common.IT_TURN_CLOSE}"
        f"{common.IT_MODEL_OPEN}hello{common.IT_TURN_CLOSE}"
        f"{common.IT_USER_OPEN}bye{common.IT_TURN_CLOSE}"
        f"{common.IT_MODEL_OPEN}"
    )

  def test_system_folds_into_first_user_turn(self):
    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ]
    prompt, _ = server_lib.render_chat_messages(msgs, is_it_model=True)
    assert prompt == "be brief\n\nhi"

  def test_content_parts_and_data_url_image(self):
    msgs = [{
        "role": "user",
        "content": [
            {"type": "text", "text": "what is"},
            {"type": "image_url",
             "image_url": {"url": "data:image/jpeg;base64,QUJD"}},
            {"type": "text", "text": "this"},
        ],
    }]
    prompt, img = server_lib.render_chat_messages(msgs, is_it_model=False)
    assert prompt == "what is\nthis"
    assert img == "QUJD"

  @pytest.mark.parametrize("msgs,err", [
      ([], "non-empty"),
      ([{"role": "assistant", "content": "x"}], "start with a user"),
      ([{"role": "user", "content": "a"},
        {"role": "assistant", "content": "b"}], "end with a user"),
      ([{"role": "user", "content": "a"},
        {"role": "user", "content": "b"}], "alternate"),
      ([{"role": "user", "content": "a"},
        {"role": "system", "content": "late"}], "precede"),
      ([{"role": "tool", "content": "x"}],
       "without a preceding assistant"),
      ([{"role": "robot", "content": "x"}], "unsupported role"),
      ([{"role": "user", "content": [
          {"type": "image_url",
           "image_url": {"url": "http://example.com/x.jpg"}}]}], "data:"),
  ])
  def test_invalid_conversations_rejected(self, msgs, err):
    with pytest.raises(ValueError, match=err):
      server_lib.render_chat_messages(msgs, is_it_model=True)


class TestOpenAICompat:
  """OpenAI-compatible endpoints over the same frontend."""

  @pytest.fixture()
  def httpd(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0, model_name="test-2b")
    yield srv, sampler, vocab
    srv.close()

  def _post(self, port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def _sse_events(self, port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    events, done = [], False
    with urllib.request.urlopen(req, timeout=120) as resp:
      assert resp.headers["Content-Type"] == "text/event-stream"
      for line in resp:
        line = line.decode().strip()
        if not line.startswith("data: "):
          continue
        payload = line[len("data: "):]
        if payload == "[DONE]":
          done = True
          break
        events.append(json.loads(payload))
    assert done, "stream must terminate with data: [DONE]"
    return events

  def test_models_route(self, httpd):
    srv, _, _ = httpd
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/v1/models", timeout=30
    ) as resp:
      out = json.loads(resp.read())
    assert out["object"] == "list"
    assert out["data"][0]["id"] == "test-2b"

  def test_completions_matches_solo(self, httpd):
    srv, sampler, vocab = httpd
    status, out = self._post(srv.port, "/v1/completions",
                             {"prompt": "alpha beta", "max_tokens": 8})
    assert status == 200
    assert out["object"] == "text_completion"
    assert out["model"] == "test-2b"
    choice = out["choices"][0]
    solo = _solo(sampler, "alpha beta", 8)
    assert choice["text"] == vocab.DecodeIds(solo)
    assert choice["finish_reason"] in ("stop", "length")
    usage = out["usage"]
    assert usage["prompt_tokens"] == 1 + len(vocab.EncodeAsIds("alpha beta"))
    assert usage["total_tokens"] == (
        usage["prompt_tokens"] + usage["completion_tokens"]
    )

  def test_completions_stream_assembles_to_nonstream(self, httpd):
    srv, sampler, vocab = httpd
    events = self._sse_events(srv.port, "/v1/completions",
                              {"prompt": "gamma delta", "stream": True})
    text = "".join(e["choices"][0]["text"] for e in events)
    assert text == vocab.DecodeIds(_solo(sampler, "gamma delta", 8))
    assert events[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    assert all(e["object"] == "text_completion.chunk" for e in events)

  def test_chat_completions_multiturn_matches_solo_it(self, setup):
    """A stateless chat request tokenizes exactly like the solo IT
    sampler on the rendered conversation."""
    sampler, vocab = setup
    it_sampler = sampler_lib.Sampler(
        sampler.model, vocab, sampler.params, is_it_model=True,
        bucket_prompt_lengths=False,
    )
    batcher = serving.ContinuousBatcher(it_sampler, num_slots=2,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0, model_name="test-it")
    try:
      msgs = [
          {"role": "user", "content": "alpha beta"},
          {"role": "assistant", "content": "gamma"},
          {"role": "user", "content": "delta eps"},
      ]
      status, out = self._post(srv.port, "/v1/chat/completions",
                               {"messages": msgs, "max_tokens": 8})
      assert status == 200
      assert out["object"] == "chat.completion"
      msg = out["choices"][0]["message"]
      assert msg["role"] == "assistant"
      rendered, _ = server_lib.render_chat_messages(msgs, is_it_model=True)
      want = _solo(it_sampler, rendered, 8)
      assert msg["content"] == vocab.DecodeIds(want)
    finally:
      srv.close()

  def test_chat_stream_roles_and_content(self, httpd):
    srv, sampler, vocab = httpd
    events = self._sse_events(
        srv.port, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "zeta eta"}],
         "stream": True},
    )
    assert events[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(
        e["choices"][0]["delta"].get("content", "") for e in events
    )
    assert text == vocab.DecodeIds(_solo(sampler, "zeta eta", 8))
    assert events[-1]["choices"][0]["finish_reason"] in ("stop", "length")

  def test_unsupported_shapes_rejected(self, httpd):
    srv, _, _ = httpd
    for body in (
        {"prompt": "alpha", "n": 0},
        {"prompt": "alpha", "echo": True},
        {"prompt": "alpha", "logprobs": 1},
        {"prompt": ["a", "b"]},
    ):
      try:
        self._post(srv.port, "/v1/completions", body)
        raise AssertionError(f"expected 400 for {body}")
      except urllib.error.HTTPError as e:
        assert e.code == 400
        err = json.loads(e.read())["error"]
        assert err["type"] == "invalid_request_error"

  def test_ignored_sampling_knobs_do_not_change_tokens(self, httpd):
    """Clients send temperature/top_p/stop unconditionally; they are
    documented as sampler-level config and must not 400 or alter
    output."""
    srv, sampler, vocab = httpd
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 8, "temperature": 0.2,
         "top_p": 0.9, "stop": ["###"], "presence_penalty": 0.5},
    )
    assert out["choices"][0]["text"] == vocab.DecodeIds(
        _solo(sampler, "alpha beta", 8)
    )


class TestConstrainedServing:
  """Named grammars through the frontend and the OpenAI response_format."""

  @pytest.fixture()
  def httpd(self, setup):
    from cadence_gemma_tpu.inference import constrain

    sampler, vocab = setup
    dfa = constrain.TokenDFA(
        constrain.choice_regex(["alpha", "beta"]),
        constrain.token_strings_from_vocab(vocab, vocab.GetPieceSize()),
        eos_id=vocab.eos_id(),
    )
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=8, constraints=[dfa]
    )
    # "json_object" intentionally maps to the same grammar: these tests
    # exercise the response_format ROUTING; the grammar itself is covered
    # by tests/test_constrain.py.
    fe = server_lib.ServingFrontend(
        batcher, step_size=2,
        constraint_names={"choice": 0, "json_object": 0},
    )
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, sampler, vocab
    srv.close()

  def _post(self, port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def test_generate_with_named_constraint(self, httpd):
    srv, _, _ = httpd
    status, out = self._post(
        srv.port, "/v1/generate",
        {"prompt": "gamma delta", "constraint": "choice"},
    )
    assert status == 200
    assert out["text"] in ("alpha", "beta"), out

  def test_unknown_constraint_is_400(self, httpd):
    srv, _, _ = httpd
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(srv.port, "/v1/generate",
                 {"prompt": "gamma", "constraint": "nope"})
    assert e.value.code == 400
    assert "unknown constraint" in json.loads(e.value.read())["error"]

  def test_response_format_json_object_routes_to_grammar(self, httpd):
    srv, _, _ = httpd
    status, out = self._post(
        srv.port, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "gamma delta"}],
         "response_format": {"type": "json_object"}},
    )
    assert status == 200
    content = out["choices"][0]["message"]["content"]
    assert content in ("alpha", "beta"), out

  def test_response_format_text_is_free(self, httpd):
    srv, sampler, vocab = httpd
    status, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "gamma delta", "max_tokens": 8,
         "response_format": {"type": "text"}},
    )
    assert status == 200
    assert out["choices"][0]["text"] == vocab.DecodeIds(
        _solo(sampler, "gamma delta", 8)
    )

  def test_unsupported_response_format_rejected(self, httpd):
    srv, _, _ = httpd
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(
          srv.port, "/v1/completions",
          {"prompt": "gamma", "response_format": {"type": "json_schema"}},
      )
    assert e.value.code == 400

  @pytest.fixture()
  def schema_httpd(self):
    """A JSON-capable character vocab + dynamic grammar slots."""
    from tests.test_constrain import CharVocab

    pieces = list('{}[]:,"0123456789') + ["name", "a", "b", "-",
                                          "true", "false", "null"]
    vocab = CharVocab(pieces)
    config = common.GriffinConfig(
        vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
        num_heads=2,
        block_types=(common.TemporalBlockType.RECURRENT,),
        embeddings_scale_by_sqrt_dim=True, attention_window_size=8,
        logits_soft_cap=30.0, lru_width=16,
        scan_type=common.ScanType.LINEAR_NATIVE,
    )
    model = griffin.Griffin(config, dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            gradient_checkpointing=False)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.arange(4)[None])["params"]
    sampler = sampler_lib.Sampler(model, vocab, params)
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=48,
        dynamic_grammar_slots=2, dynamic_grammar_budget=(128, 24, 6),
    )
    fe = server_lib.ServingFrontend(batcher, step_size=4)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, sampler, vocab
    srv.close()

  def test_response_format_json_schema_end_to_end(self, schema_httpd):
    import re as re_mod

    srv, _, vocab = schema_httpd
    # Property names must be spellable from the vocab pieces ("name",
    # "b") — a grammar demanding unspellable text sticks and fails open.
    schema = {
        "type": "object",
        "properties": {"name": {"enum": ["a", "b"]},
                       "b": {"type": "integer"}},
        "required": ["name", "b"],
    }
    status, out = self._post(
        srv.port, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "a b"}],
         "max_tokens": 48,
         "response_format": {"type": "json_schema",
                             "json_schema": {"name": "row",
                                             "schema": schema}}},
    )
    assert status == 200
    content = out["choices"][0]["message"]["content"]
    if out["choices"][0]["finish_reason"] == "stop":
      doc = json.loads(content)
      assert doc["name"] in ("a", "b") and isinstance(doc["b"], int)
    else:
      # Budget-truncated: still a live prefix of the schema grammar.
      assert re_mod.match(r'\{"name":"[ab]"', content), content

  def test_json_schema_without_dynamic_slots_rejected(self, httpd):
    srv, _, _ = httpd
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(
          srv.port, "/v1/completions",
          {"prompt": "gamma",
           "response_format": {
               "type": "json_schema",
               "json_schema": {"schema": {"type": "integer"}}}},
      )
    assert e.value.code == 400
    assert "dynamic" in str(json.loads(e.value.read())["error"]).lower()

  def test_bad_json_schema_rejected(self, schema_httpd):
    srv, _, _ = schema_httpd
    for rf in (
        {"type": "json_schema"},  # no schema
        {"type": "json_schema",
         "json_schema": {"schema": {"type": "object",
                                    "properties": {"a": {"type": "null"}},
                                    "required": []}}},  # not strict
    ):
      with pytest.raises(urllib.error.HTTPError) as e:
        self._post(srv.port, "/v1/completions",
                   {"prompt": "a", "response_format": rf})
      assert e.value.code == 400

  def test_json_object_without_registry_rejected(self, setup):
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=4)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    try:
      with pytest.raises(urllib.error.HTTPError) as e:
        self._post(
            srv.port, "/v1/completions",
            {"prompt": "gamma",
             "response_format": {"type": "json_object"}},
        )
      assert e.value.code == 400
      assert "JSON grammar" in str(json.loads(e.value.read())["error"])
    finally:
      srv.close()

  def test_constraint_names_need_registered_grammars(self, setup):
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1)
    with pytest.raises(ValueError, match="registered no grammars"):
      server_lib.ServingFrontend(
          batcher, constraint_names={"json_object": 0}
      )
    batcher.stream_callback = None  # detach for reuse


class TestStopSequences:
  """OpenAI multi-token stop sequences: host-side match on ANY batcher."""

  _sse_events = TestOpenAICompat._sse_events
  _post = TestOpenAICompat._post

  @pytest.fixture()
  def httpd(self, setup):
    sampler, vocab = setup  # plain greedy batcher: no per_request_sampling
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, vocab
    srv.close()

  def test_gate_incremental_never_over_emits(self):
    gate = server_lib.StopStringGate(["XY"])
    text = "aXbXYc"
    out = ""
    stopped = False
    for i in range(1, len(text) + 1):
      chunk, stopped = gate.feed(text[:i])
      out += chunk
      if stopped:
        break
    assert stopped and out == "aXb"  # the match and trailing text trimmed

  def test_gate_holds_back_ambiguous_suffix(self):
    gate = server_lib.StopStringGate(["END"])
    assert gate.feed("fooE") == ("foo", False)   # "E" could grow into END
    assert gate.feed("fooEN") == ("", False)
    assert gate.feed("fooENx") == ("ENx", False)  # disambiguated: flush
    assert gate.finish("fooENx") == ("", False)

  def test_gate_finish_flushes_tail(self):
    gate = server_lib.StopStringGate(["ZZ"])
    assert gate.feed("abZ") == ("ab", False)
    assert gate.finish("abZ") == ("Z", False)  # stream ended: real text
    assert server_lib.StopStringGate(["b", "c"]).truncate("abc") == (
        "a", True)  # earliest of several stops wins

  def test_stop_truncates_nonstreaming(self, httpd):
    srv, vocab = httpd
    _, free = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 8},
    )
    full = free["choices"][0]["text"]
    words = full.split()
    assert len(words) >= 2, full
    stop = words[1]
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 8, "stop": stop},
    )
    choice = out["choices"][0]
    assert choice["text"] == full[: full.find(stop)]
    assert stop not in choice["text"]
    assert choice["finish_reason"] == "stop"

  def test_stop_streaming_matches_nonstreaming(self, httpd):
    srv, vocab = httpd
    _, free = self._post(
        srv.port, "/v1/completions",
        {"prompt": "gamma delta", "max_tokens": 8},
    )
    words = free["choices"][0]["text"].split()
    assert len(words) >= 2
    body = {"prompt": "gamma delta", "max_tokens": 8, "stop": [words[1]]}
    _, solo = self._post(srv.port, "/v1/completions", body)
    events = self._sse_events(srv.port, "/v1/completions",
                              {**body, "stream": True})
    text = "".join(e["choices"][0]["text"] for e in events
                   if e["choices"][0].get("text"))
    finishes = [e["choices"][0]["finish_reason"] for e in events
                if e["choices"][0]["finish_reason"]]
    assert text == solo["choices"][0]["text"]
    assert finishes == ["stop"]

  def test_stop_absent_leaves_output_unchanged(self, httpd):
    srv, vocab = httpd
    _, free = self._post(
        srv.port, "/v1/completions",
        {"prompt": "eps zeta", "max_tokens": 6},
    )
    _, stopped = self._post(
        srv.port, "/v1/completions",
        {"prompt": "eps zeta", "max_tokens": 6,
         "stop": ["<never-matches>"]},
    )
    assert stopped["choices"][0]["text"] == free["choices"][0]["text"]
    assert stopped["choices"][0]["finish_reason"] in ("stop", "length")


class TestHonoredSamplingKnobs:
  """OpenAI sampling knobs are honored on per_request_sampling batchers."""

  _sse_events = TestOpenAICompat._sse_events

  @pytest.fixture()
  def httpd(self, setup):
    base, vocab = setup
    sampler = sampler_lib.Sampler(
        base.model, vocab, base.params, deterministic_sampling=False
    )
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=8,
        per_request_sampling=True,
    )
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, base, vocab
    srv.close()

  def _post(self, port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def test_temperature_top_p_seed_match_solo(self, httpd):
    srv, base, vocab = httpd
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 8, "seed": 5,
         "temperature": 0.7, "top_p": 0.9},
    )
    solo = sampler_lib.Sampler(
        base.model, vocab, base.params, deterministic_sampling=False,
        temperature=0.7, top_p=0.9,
    )(["alpha beta"], total_generation_steps=8,
      rng=jax.random.PRNGKey(5))
    assert out["choices"][0]["text"] == vocab.DecodeIds(
        [int(t) for t in np.asarray(solo.tokens[0])]
    )

  def test_temperature_zero_is_deterministic(self, httpd):
    srv, base, vocab = httpd
    texts = set()
    for seed in (1, 2, 3):
      _, out = self._post(
          srv.port, "/v1/completions",
          {"prompt": "gamma delta", "max_tokens": 6, "seed": seed,
           "temperature": 0},
      )
      texts.add(out["choices"][0]["text"])
    assert len(texts) == 1  # argmax: seed-independent
    greedy = sampler_lib.Sampler(base.model, vocab, base.params)(
        ["gamma delta"], total_generation_steps=6
    )
    assert texts == {vocab.DecodeIds(
        [int(t) for t in np.asarray(greedy.tokens[0])]
    )}

  def test_n_parallel_samples(self, httpd):
    srv, base, vocab = httpd
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 6, "seed": 11, "n": 3},
    )
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    # Seeds are seed+i: each choice matches its own solo run.
    for i, choice in enumerate(out["choices"]):
      solo = sampler_lib.Sampler(
          base.model, vocab, base.params, deterministic_sampling=False
      )(["alpha beta"], total_generation_steps=6,
        rng=jax.random.PRNGKey(11 + i))
      assert choice["text"] == vocab.DecodeIds(
          [int(t) for t in np.asarray(solo.tokens[0])]
      )
    usage = out["usage"]
    assert usage["completion_tokens"] > 0
    assert usage["total_tokens"] == (
        usage["prompt_tokens"] + usage["completion_tokens"]
    )

  def test_n_parallel_samples_streaming(self, httpd):
    # n > 1 + stream: chunks carry their choice index; reassembling per
    # index yields exactly the non-streaming n-sample texts.
    srv, base, vocab = httpd
    body = {"prompt": "alpha beta", "max_tokens": 6, "seed": 11, "n": 3}
    _, solo = self._post(srv.port, "/v1/completions", body)
    want = {c["index"]: c["text"] for c in solo["choices"]}
    events = self._sse_events(srv.port, "/v1/completions",
                              {**body, "stream": True})
    got: dict[int, str] = {}
    finishes: dict[int, str] = {}
    for e in events:
      (choice,) = e["choices"]
      got[choice["index"]] = got.get(choice["index"], "") + choice["text"]
      if choice["finish_reason"]:
        finishes[choice["index"]] = choice["finish_reason"]
    assert got == want
    assert set(finishes) == {0, 1, 2}

  def test_logit_bias_forces_a_token(self, httpd):
    # OpenAI wire shape: {"<token id>": bias}. +100 dominates the
    # soft-capped logits, so every emitted token (seed included) is it.
    srv, base, vocab = httpd
    tok = vocab.EncodeAsIds("zeta")[0]
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 5, "seed": 3,
         "logit_bias": {str(tok): 100}},
    )
    assert out["choices"][0]["text"] == vocab.DecodeIds([tok] * 5)

  def test_logit_bias_bans_a_token(self, httpd):
    srv, base, vocab = httpd
    _, free = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 6, "seed": 7,
         "temperature": 0},
    )
    banned = vocab.EncodeAsIds(free["choices"][0]["text"])[0]
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 6, "seed": 7,
         "temperature": 0, "logit_bias": {str(banned): -100}},
    )
    assert banned not in vocab.EncodeAsIds(out["choices"][0]["text"])

  def test_logit_bias_rejects_bad_input(self, httpd):
    srv, _, vocab = httpd
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(
          srv.port, "/v1/completions",
          {"prompt": "alpha", "max_tokens": 2,
           "logit_bias": {"zeta": "much"}},
      )
    assert e.value.code == 400
    assert "logit_bias" in json.loads(e.value.read())["error"]["message"]
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(
          srv.port, "/v1/completions",
          {"prompt": "alpha", "max_tokens": 2,
           "logit_bias": {str(vocab.GetPieceSize() + 5): 1}},
      )
    assert e.value.code == 400
    assert "vocabulary" in json.loads(e.value.read())["error"]["message"]

  def test_stream_options_include_usage(self, httpd):
    srv, _, _ = httpd
    body = {"prompt": "alpha beta", "max_tokens": 5, "seed": 1,
            "stream": True, "stream_options": {"include_usage": True}}
    events = self._sse_events(srv.port, "/v1/completions", body)
    usage_chunks = [e for e in events if "usage" in e]
    (final,) = usage_chunks
    assert final is events[-1] and final["choices"] == []
    n_tokens = sum(1 for e in events
                   if e["choices"] and e["choices"][0]["text"])
    assert final["usage"]["completion_tokens"] >= max(1, n_tokens)
    assert final["usage"]["total_tokens"] == (
        final["usage"]["prompt_tokens"]
        + final["usage"]["completion_tokens"])
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(srv.port, "/v1/completions",
                 {"prompt": "alpha",
                  "stream_options": {"include_usage": True}})
    assert e.value.code == 400  # stream_options without stream

  def test_seedless_categorical_auto_seeds(self, httpd):
    srv, _, _ = httpd
    status, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "gamma delta", "max_tokens": 4},
    )
    assert status == 200
    assert isinstance(out["choices"][0]["text"], str)

  def test_stop_string_halts_generation(self, httpd):
    srv, base, vocab = httpd
    greedy = sampler_lib.Sampler(base.model, vocab, base.params)(
        ["alpha beta"], total_generation_steps=8
    )
    toks = [int(t) for t in np.asarray(greedy.tokens[0])]
    stop_word = vocab.DecodeIds([toks[0]])
    assert vocab.EncodeAsIds(stop_word) == [toks[0]]  # single token
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 8, "seed": 1,
         "temperature": 0, "stop": stop_word},
    )
    got = out["choices"][0]["text"]
    # Halted at the first stop occurrence; OpenAI semantics return the
    # text BEFORE the match (the stop sequence itself is trimmed). The
    # single-token stop here is the first generated token, so nothing
    # precedes it.
    assert got == ""
    assert out["choices"][0]["finish_reason"] == "stop"


class TestLogprobs:
  """record_logprobs batchers expose OpenAI logprobs."""

  @pytest.fixture()
  def httpd(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=6, record_logprobs=3
    )
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, sampler, vocab
    srv.close()

  def _post(self, port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def test_batcher_logprobs_match_solo_distribution(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=6, record_logprobs=3
    )
    rid = batcher.add_request("alpha beta", max_steps=6)
    results = {r: t for r, t, _ in batcher.run_until_drained(2)}
    record = batcher.take_logprobs(rid)
    tokens = results[rid]
    assert len(record["token_logprobs"]) == len(tokens)
    solo = sampler(["alpha beta"], total_generation_steps=6,
                   return_logits=True)
    solo_lp = jax.nn.log_softmax(
        jnp.asarray(solo.logits[0], jnp.float32), axis=-1
    )
    for i, tok in enumerate(tokens):
      np.testing.assert_allclose(
          record["token_logprobs"][i], float(solo_lp[i, tok]), atol=1e-4
      )
      want_ids = np.argsort(-np.asarray(solo_lp[i]))[:3]
      assert record["top_ids"][i] == want_ids.tolist()
    with pytest.raises(KeyError):
      batcher.take_logprobs(rid)  # handed over once

  def test_completions_legacy_logprobs_shape(self, httpd):
    srv, _, vocab = httpd
    _, out = self._post(
        srv.port, "/v1/completions",
        {"prompt": "alpha beta", "max_tokens": 5, "logprobs": 2},
    )
    lp = out["choices"][0]["logprobs"]
    assert set(lp) == {"tokens", "token_logprobs", "top_logprobs",
                       "text_offset"}
    assert len(lp["tokens"]) == len(lp["token_logprobs"])
    assert all(len(d) <= 2 for d in lp["top_logprobs"])
    # Offsets are the cumulative piece lengths.
    assert lp["text_offset"][0] == 0
    assert lp["text_offset"] == [
        sum(len(t) for t in lp["tokens"][:i])
        for i in range(len(lp["tokens"]))
    ]

  def test_chat_logprobs_shape(self, httpd):
    srv, _, _ = httpd
    _, out = self._post(
        srv.port, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "gamma delta"}],
         "max_tokens": 4, "logprobs": True, "top_logprobs": 2},
    )
    content = out["choices"][0]["logprobs"]["content"]
    assert len(content) >= 1
    for entry in content:
      assert {"token", "logprob", "top_logprobs"} <= set(entry)
      assert len(entry["top_logprobs"]) == 2

  def test_streaming_logprobs_final_chunk(self, httpd):
    # Streaming + logprobs: content streams as usual; the full logprobs
    # record arrives on the choice's final chunk (device fetch happens
    # at finish), so accumulating clients see the complete per-token
    # record the non-streaming response carries.
    srv, _, _ = httpd
    body = {"messages": [{"role": "user", "content": "gamma delta"}],
            "max_tokens": 4, "logprobs": True, "top_logprobs": 2}
    _, solo = self._post(srv.port, "/v1/chat/completions", body)
    events = TestOpenAICompat._sse_events(
        self, srv.port, "/v1/chat/completions", {**body, "stream": True})
    with_lp = [e for e in events if e["choices"][0].get("logprobs")]
    (final,) = with_lp  # exactly one chunk carries the record
    assert final["choices"][0]["finish_reason"] in ("stop", "length")
    assert (final["choices"][0]["logprobs"]
            == solo["choices"][0]["logprobs"])

  def test_logprob_rejections(self, httpd, setup):
    srv, _, _ = httpd
    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(srv.port, "/v1/completions",
                 {"prompt": "alpha", "logprobs": 5})  # > recorded k
    assert e.value.code == 400
    sampler, _ = setup
    plain = serving.ContinuousBatcher(sampler, num_slots=1)
    fe = server_lib.ServingFrontend(plain, step_size=2)
    srv2 = server_lib.ServingHTTPServer(fe, port=0)
    try:
      with pytest.raises(urllib.error.HTTPError) as e:
        self._post(srv2.port, "/v1/completions",
                   {"prompt": "alpha", "logprobs": 1})
      assert e.value.code == 400
    finally:
      srv2.close()


class TestProductionHardening:
  """Backpressure, Prometheus metrics, graceful drain."""

  @staticmethod
  def _block_slots(fe, n, prompt="theta zeta", steps=100_000):
    """Occupies all ``n`` slots with long-running requests and waits until
    they are admitted (the inbox is then deterministically stuck)."""
    import time as time_lib
    blockers = [fe.submit(prompt, max_tokens=steps) for _ in range(n)]
    deadline = time_lib.monotonic() + 120
    while fe.batcher.active_count < n:
      assert time_lib.monotonic() < deadline, "blockers never admitted"
      time_lib.sleep(0.02)
    return blockers

  def test_queue_full_backpressure(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2, max_queue=2)
    try:
      blockers = self._block_slots(fe, 1)
      queued = [fe.submit("alpha beta") for _ in range(2)]
      with pytest.raises(server_lib.QueueFull):
        fe.submit("gamma")
      fe.cancel(blockers[0].request_id)
      for sub in queued:
        tokens, _ = sub.result(timeout=120)
        _check(tokens, _solo(sampler, "alpha beta", 8), 8, vocab.eos_id())
      # Queue drained → admission reopens.
      tokens, _ = fe.submit("gamma").result(timeout=120)
      _check(tokens, _solo(sampler, "gamma", 8), 8, vocab.eos_id())
    finally:
      fe.close()

  def test_http_429_and_metrics_endpoint(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2, max_queue=1)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    try:
      blockers = self._block_slots(fe, 1)
      fe.submit("alpha beta")  # fills the queue
      body = json.dumps({"prompt": "gamma", "max_tokens": 4}).encode()
      for path in ("/v1/generate", "/v1/completions"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
          urllib.request.urlopen(req, timeout=30)
          raise AssertionError("expected 429")
        except urllib.error.HTTPError as e:
          assert e.code == 429
          err = json.loads(e.read())["error"]
          if path == "/v1/completions":
            assert err["type"] == "overloaded_error"
      fe._wake.set()
      while fe.stats["completed"] < 1:
        import time as time_lib
        time_lib.sleep(0.05)
      with urllib.request.urlopen(
          f"http://127.0.0.1:{srv.port}/metrics", timeout=30
      ) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
      assert "cadence_up 1" in text
      # >=1, not ==1: the blocker requests may also complete between the
      # stats poll and the scrape (seen under heavy CPU load).
      m = re.search(r"cadence_completed_total (\d+)", text)
      assert m is not None and int(m.group(1)) >= 1, text
      assert "# TYPE cadence_tokens_out_total counter" in text
      assert 'cadence_ttft_seconds{quantile="0.5"}' in text
    finally:
      srv.close()

  def test_close_drain_finishes_inflight(self, setup):
    sampler, vocab = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=8)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    subs = [fe.submit(p) for p in ("alpha beta", "gamma delta", "eps")]
    fe.close(drain=True)
    for sub, prompt in zip(subs, ("alpha beta", "gamma delta", "eps")):
      tokens, _ = sub.result(timeout=5)  # already delivered
      _check(tokens, _solo(sampler, prompt, 8), 8, vocab.eos_id())

  def test_close_without_drain_cancels_inflight(self, setup):
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=200)
    fe = server_lib.ServingFrontend(batcher, step_size=1)
    sub = fe.submit("alpha beta gamma delta")
    fe.close()
    with pytest.raises(RuntimeError, match="cancelled"):
      sub.result(timeout=30)


class TestToolCalling:
  """OpenAI tools/tool_choice through the grammar-constrained path.

  With tool_choice required (or a named function), the completion is
  CONSTRAINED to constrain.tool_call_schema(tools): whatever the model
  wants to say, the response is a well-formed call whose arguments match
  the declared parameters schema. "auto" stays unconstrained and
  recognizes envelope output post-hoc.
  """

  TOOLS = [
      {"type": "function", "function": {
          "name": "f",
          "description": "eff",
          "parameters": {"type": "object",
                         "properties": {"x": {"type": "integer"}},
                         "required": ["x"]}}},
      {"type": "function", "function": {"name": "g"}},  # no arguments
  ]

  @pytest.fixture(scope="class")
  def tool_httpd(self):
    from tests.test_constrain import CharVocab

    pieces = list('{}:,"0123456789-') + ["name", "argu", "ment", "s",
                                         "f", "g", "x"]
    vocab = CharVocab(pieces)
    config = common.GriffinConfig(
        vocab_size=vocab.GetPieceSize(), width=16, mlp_expanded_width=32,
        num_heads=2,
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
    sampler = sampler_lib.Sampler(model, vocab, params)
    batcher = serving.ContinuousBatcher(
        sampler, num_slots=2, max_steps_default=64,
        dynamic_grammar_slots=2, dynamic_grammar_budget=(320, 48, 8),
    )
    fe = server_lib.ServingFrontend(batcher, step_size=4)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    yield srv, vocab
    srv.close()

  def _post(self, port, obj, path="/v1/chat/completions", timeout=180):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return resp.status, json.loads(resp.read())

  def _post_error(self, port, obj):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
      self._post(port, obj)
    assert e.value.code == 400
    return json.loads(e.value.read())["error"]["message"]

  def test_tool_choice_required_yields_valid_call(self, tool_httpd):
    srv, _ = tool_httpd
    status, out = self._post(srv.port, {
        "messages": [{"role": "user", "content": "x"}],
        "tools": self.TOOLS, "tool_choice": "required",
        "max_tokens": 64,
    })
    assert status == 200
    choice = out["choices"][0]
    if choice["finish_reason"] == "tool_calls":
      assert choice["message"]["content"] is None
      (call,) = choice["message"]["tool_calls"]
      assert call["type"] == "function"
      fn = call["function"]
      args = json.loads(fn["arguments"])
      if fn["name"] == "f":
        assert isinstance(args["x"], int)
      else:
        assert fn["name"] == "g" and args == {}
    else:
      # Budget truncation: still a live prefix of the envelope grammar.
      assert choice["finish_reason"] == "length"
      assert choice["message"]["content"].startswith('{"name":"')

  def test_named_tool_choice_forces_that_tool(self, tool_httpd):
    srv, _ = tool_httpd
    status, out = self._post(srv.port, {
        "messages": [{"role": "user", "content": "x"}],
        "tools": self.TOOLS,
        "tool_choice": {"type": "function", "function": {"name": "g"}},
        "max_tokens": 64,
    })
    assert status == 200
    choice = out["choices"][0]
    if choice["finish_reason"] == "tool_calls":
      (call,) = choice["message"]["tool_calls"]
      assert call["function"]["name"] == "g"
      assert json.loads(call["function"]["arguments"]) == {}
    else:
      assert choice["message"]["content"].startswith('{"name":"g"')

  def test_tool_choice_auto_free_text_is_content(self, setup):
    # A word-vocab model can't spell the envelope; auto must pass its
    # free text through as ordinary content.
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=6)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    try:
      status, out = self._post(srv.port, {
          "messages": [{"role": "user", "content": "alpha beta"}],
          "tools": self.TOOLS,  # tool_choice defaults to auto
      })
      assert status == 200
      choice = out["choices"][0]
      assert "tool_calls" not in choice["message"]
      assert isinstance(choice["message"]["content"], str)
      assert choice["finish_reason"] in ("stop", "length")
    finally:
      srv.close()

  def test_tool_choice_none_matches_tool_free_request(self, setup):
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=1,
                                        max_steps_default=6)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    try:
      msgs = [{"role": "user", "content": "alpha beta"}]
      _, with_none = self._post(srv.port, {
          "messages": msgs, "tools": self.TOOLS, "tool_choice": "none",
      })
      _, without = self._post(srv.port, {"messages": msgs})
      assert (with_none["choices"][0]["message"]
              == without["choices"][0]["message"])
    finally:
      srv.close()

  def test_bad_tools_and_modes_rejected(self, tool_httpd):
    srv, _ = tool_httpd
    msgs = [{"role": "user", "content": "x"}]
    assert "function" in self._post_error(
        srv.port, {"messages": msgs, "tools": [{"type": "retrieval"}]})
    assert "not in tools" in self._post_error(
        srv.port, {"messages": msgs, "tools": self.TOOLS,
                    "tool_choice": {"type": "function",
                                    "function": {"name": "zzz"}}})
    assert "tool_choice" in self._post_error(
        srv.port, {"messages": msgs, "tools": self.TOOLS,
                    "tool_choice": "frobnicate"})
    assert "response_format" in self._post_error(
        srv.port, {"messages": msgs, "tools": self.TOOLS,
                    "tool_choice": "required",
                    "response_format": {
                        "type": "json_schema",
                        "json_schema": {"schema": {"type": "integer"}}}})

  def _sse_events(self, port, obj):
    return TestOpenAICompat._sse_events(
        self, port, "/v1/chat/completions", obj)

  def test_streaming_forced_tool_call(self, tool_httpd):
    srv, _ = tool_httpd
    events = self._sse_events(srv.port, {
        "messages": [{"role": "user", "content": "x"}],
        "tools": self.TOOLS,
        "tool_choice": {"type": "function", "function": {"name": "f"}},
        "max_tokens": 64, "stream": True,
    })
    finish = events[-1]["choices"][0]["finish_reason"]
    headers = [e for e in events
               if e["choices"][0]["delta"].get("tool_calls")
               and "id" in e["choices"][0]["delta"]["tool_calls"][0]]
    if finish == "tool_calls":
      # Exactly one header chunk naming the forced tool, then argument
      # fragments that concatenate to arguments valid under f's schema.
      (header,) = headers
      call = header["choices"][0]["delta"]["tool_calls"][0]
      assert call["type"] == "function"
      assert call["function"] == {"name": "f", "arguments": ""}
      assert call["id"].startswith("call_")
      args = "".join(
          tc["function"].get("arguments", "")
          for e in events
          for tc in e["choices"][0]["delta"].get("tool_calls", []))
      parsed = json.loads(args)
      assert isinstance(parsed["x"], int), parsed
      # No content deltas mixed into a tool-call stream.
      assert not any(e["choices"][0]["delta"].get("content")
                     for e in events)
    else:
      # Budget truncation: either the envelope never reached the
      # arguments (live prefix surfaces as content) or it was cut
      # mid-arguments (header + partial fragments, finish "length").
      assert finish == "length"
      assert len(headers) <= 1

  def test_streaming_auto_free_text_matches_plain(self, setup):
    # A word-vocab model can't spell the envelope: auto + stream must
    # deliver the identical content deltas a tool-free stream does.
    sampler, _ = setup
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=6)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    srv = server_lib.ServingHTTPServer(fe, port=0)
    try:
      def collect(extra):
        events = self._sse_events(srv.port, {
            "messages": [{"role": "user", "content": "alpha beta"}],
            "stream": True, **extra,
        })
        text = "".join(e["choices"][0]["delta"].get("content", "")
                       for e in events)
        return text, events[-1]["choices"][0]["finish_reason"]

      with_tools = collect({"tools": self.TOOLS})
      without = collect({})
      assert with_tools == without
      assert with_tools[0]  # non-empty streamed text
      assert not any("tool_calls" in e["choices"][0]["delta"]
                     for e in self._sse_events(srv.port, {
                         "messages": [{"role": "user",
                                       "content": "alpha beta"}],
                         "tools": self.TOOLS, "stream": True}))
    finally:
      srv.close()


class TestToolStreamGate:
  """Unit tests of the incremental envelope classifier (no server)."""

  NAMES = {"f", "get_weather"}

  def _drive(self, text, forced=False, chunk=1):
    """Feeds text in `chunk`-char cumulative slices; returns
    (events, complete)."""
    gate = server_lib.ToolStreamGate(self.NAMES, forced)
    events = []
    for i in range(chunk, len(text) + 1, chunk):
      events.extend(gate.feed(text[:i]))
    fin, complete = gate.finish(text)
    return events + fin, complete

  def _reassemble(self, events):
    name = next((p for k, p in events if k == "header"), None)
    args = "".join(p for k, p in events if k == "args")
    content = "".join(p for k, p in events if k == "content")
    return name, args, content

  @pytest.mark.parametrize("chunk", [1, 3, 1000])
  def test_compact_envelope_streams_incrementally(self, chunk):
    text = '{"name":"get_weather","arguments":{"city":"Oslo","n":3}}'
    events, complete = self._drive(text, forced=True, chunk=chunk)
    assert complete
    name, args, content = self._reassemble(events)
    assert name == "get_weather" and content == ""
    assert json.loads(args) == {"city": "Oslo", "n": 3}
    if chunk == 1:
      # Genuinely incremental: fragments arrive before finish().
      kinds = [k for k, _ in events]
      assert kinds.count("args") > 1

  def test_whitespace_tolerant_envelope(self):
    text = '{ "name" : "f" ,\n "arguments" : { "x" : 1 } }'
    events, complete = self._drive(text, chunk=2)
    assert complete
    name, args, _ = self._reassemble(events)
    assert name == "f" and json.loads(args) == {"x": 1}

  def test_plain_text_flushes_as_content_immediately(self):
    gate = server_lib.ToolStreamGate(self.NAMES, forced=False)
    assert gate.feed("hi") == [("content", "hi")]
    assert gate.feed("hi there") == [("content", " there")]
    fin, complete = gate.finish("hi there!")
    assert fin == [("content", "!")] and not complete

  def test_undeclared_name_becomes_content(self):
    text = '{"name":"zzz","arguments":{}}'
    events, complete = self._drive(text)
    assert not complete
    name, args, content = self._reassemble(events)
    assert name is None and args == "" and content == text

  def test_non_object_arguments_become_content(self):
    text = '{"name":"f","arguments":5}'
    events, complete = self._drive(text)
    assert not complete
    assert self._reassemble(events)[2] == text

  def test_trailing_text_after_envelope_is_content(self):
    # Auto mode classifies via parse_tool_call at finish — EXACTLY the
    # non-streaming recognition, which refuses trailing text.
    text = '{"name":"f","arguments":{"x":1}} and then some'
    events, complete = self._drive(text)
    assert not complete
    assert self._reassemble(events)[2] == text

  def test_auto_malformed_arguments_become_content(self):
    # Invalid JSON inside an envelope-plausible lead: auto mode never
    # commits incrementally, so no broken tool_calls reach the client —
    # the text surfaces as content, like the non-streaming path.
    text = '{"name":"f","arguments":{oops:1}}'
    events, complete = self._drive(text)
    assert not complete
    name, args, content = self._reassemble(events)
    assert name is None and args == "" and content == text

  def test_auto_buffers_until_finish(self):
    # A valid envelope in auto mode produces NO events while streaming
    # (classification is finish-only); forced mode is the incremental
    # path.
    text = '{"name":"f","arguments":{"x":1}}'
    gate = server_lib.ToolStreamGate(self.NAMES, forced=False)
    live = []
    for i in range(1, len(text) + 1):
      live.extend(gate.feed(text[:i]))
    assert live == []
    fin, complete = gate.finish(text)
    assert complete
    name = next(p for k, p in fin if k == "header")
    args = "".join(p for k, p in fin if k == "args")
    assert name == "f" and json.loads(args) == {"x": 1}

  def test_forced_missing_outer_brace_is_incomplete(self):
    # Arguments value closed but the envelope's outer "}" never came
    # (budget truncation): fragments stream, but the call is not
    # complete — finish_reason stays "length", as in non-streaming.
    text = '{"name":"f","arguments":{"x":1}'
    events, complete = self._drive(text, forced=True)
    assert not complete
    _, args, _ = self._reassemble(events)
    assert json.loads(args) == {"x": 1}  # fragments still exact

  def test_flush_content_surfaces_buffer_on_dead_stream(self):
    gate = server_lib.ToolStreamGate(self.NAMES, forced=False)
    assert gate.feed('{"name": "f"') == []  # plausible lead: buffered
    assert gate.flush_content() == [("content", '{"name": "f"')]
    assert gate.flush_content() == []  # idempotent
    # After a flush the gate behaves as content mode.
    assert gate.feed('{"name": "f" oops') == [("content", " oops")]

  def test_truncated_before_arguments_surfaces_prefix(self):
    text = '{"name":"f","argu'
    events, complete = self._drive(text, forced=True)
    assert not complete
    assert self._reassemble(events)[2] == text

  def test_truncated_mid_arguments_stops_cleanly(self):
    text = '{"name":"f","arguments":{"x":'
    events, complete = self._drive(text, forced=True)
    assert not complete
    name, args, content = self._reassemble(events)
    assert name == "f" and content == ""
    # Whatever fragments streamed are a prefix of the raw value.
    assert '{"x":'.startswith(args)

  def test_nested_braces_in_arguments(self):
    text = '{"name":"f","arguments":{"a":{"b":[1,{"c":2}]},"s":"}"}}'
    events, complete = self._drive(text, forced=True, chunk=1)
    assert complete
    _, args, _ = self._reassemble(events)
    assert json.loads(args) == {"a": {"b": [1, {"c": 2}]}, "s": "}"}


class TestToolRendering:
  """Pure rendering/parsing: no server needed."""

  TOOLS = TestToolCalling.TOOLS

  def test_preamble_and_history_render(self):
    messages = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "weather?"},
        {"role": "assistant", "tool_calls": [{
            "id": "call_1", "type": "function",
            "function": {"name": "f", "arguments": '{"x": 3}'}}]},
        {"role": "tool", "tool_call_id": "call_1",
         "content": '{"temp": 9}'},
    ]
    prompt, img = server_lib.render_chat_messages(
        messages, is_it_model=True, tools=self.TOOLS
    )
    assert img is None
    assert "Available functions:" in prompt
    assert '"name": "f"' in prompt          # declaration
    assert '{"name": "f", "arguments": {"x": 3}}' in prompt  # the call
    # Tool result renders on the user side with the resolved name and
    # structured payload passed through un-double-quoted.
    assert '{"name": "f", "response": {"temp": 9}}' in prompt
    # Model turn then user turn: the template transitions are present.
    assert common.IT_MODEL_OPEN in prompt and common.IT_USER_OPEN in prompt
    # The conversation ends user-side: prompt ends with the tool result.
    assert prompt.endswith('{"temp": 9}}')

  def test_consecutive_tool_results_merge(self):
    messages = [
        {"role": "user", "content": "go"},
        {"role": "assistant", "tool_calls": [
            {"id": "a", "type": "function",
             "function": {"name": "f", "arguments": "{}"}},
            {"id": "b", "type": "function",
             "function": {"name": "g", "arguments": "{}"}},
        ]},
        {"role": "tool", "tool_call_id": "a", "content": "1"},
        {"role": "tool", "tool_call_id": "b", "content": "2"},
    ]
    prompt, _ = server_lib.render_chat_messages(messages, is_it_model=True)
    # One user turn holding both results (no double transition).
    assert prompt.count(common.IT_USER_OPEN) == 1
    assert '{"name": "f", "response": 1}\n{"name": "g", "response": 2}' \
        in prompt

  def test_parse_tool_call(self):
    names = {"f", "g"}
    ok = server_lib.parse_tool_call('{"name":"f","arguments":{"x":1}}',
                                    names)
    assert ok == {"name": "f", "arguments": '{"x": 1}'}
    assert server_lib.parse_tool_call("hello", names) is None
    assert server_lib.parse_tool_call('{"name":"zzz","arguments":{}}',
                                      names) is None
    assert server_lib.parse_tool_call('{"name":"f","arguments":3}',
                                      names) is None
    assert server_lib.parse_tool_call('{"name":"f"}', names) is None


class TestShardedFrontend:

  def test_frontend_over_tp_batcher_matches_solo(self, setup):
    """The threaded frontend drives a TP-mesh batcher: results exact.

    Completes the multi-chip serving stack (sampler → batcher →
    frontend) on the virtual mesh — the driver's ``dryrun_multichip``
    runs the same configuration headless."""
    from cadence_gemma_tpu.parallel import sharding as sh

    solo_sampler, vocab = setup
    steps = 8
    mesh = sh.make_mesh((1, 2), ("data", "model"), jax.devices()[:2])
    tp_sampler = sampler_lib.Sampler(
        solo_sampler.model, vocab, solo_sampler.params, mesh=mesh
    )
    batcher = serving.ContinuousBatcher(tp_sampler, num_slots=2,
                                        max_steps_default=steps)
    fe = server_lib.ServingFrontend(batcher, step_size=2)
    try:
      prompts = ["alpha beta", "gamma delta eps", "zeta eta"]  # 3 > slots
      subs = [fe.submit(p) for p in prompts]
      for p, sub in zip(prompts, subs):
        tokens, text = sub.result(timeout=240)
        _check(tokens, _solo(solo_sampler, p, steps), steps,
               vocab.eos_id())
    finally:
      fe.close()


class TestIdleStepSize:

  def test_idle_boost_matches_solo(self, setup):
    """step_size_idle ticks must not perturb results — only tick size.

    With an empty inbox the driver runs the larger program; arrivals
    mid-run still admit and complete exactly as solo.
    """
    sampler, vocab = setup
    steps = 8
    batcher = serving.ContinuousBatcher(sampler, num_slots=2,
                                        max_steps_default=steps)
    fe = server_lib.ServingFrontend(batcher, step_size=2,
                                    step_size_idle=8)
    try:
      prompts = ["alpha beta", "gamma delta eps", "zeta eta"]
      subs = [fe.submit(p) for p in prompts]
      for p, sub in zip(prompts, subs):
        tokens, _ = sub.result(timeout=120)
        _check(tokens, _solo(sampler, p, steps), steps, vocab.eos_id())
    finally:
      fe.close()
