"""Continuous-batching engine tests: engine output must equal naive greedy
decoding with full forward passes (the e2e-generation analog of reference
tests/test_generation.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.serving import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    qparams = L.quantize_params_4bit(params)
    return cfg, qparams


def naive_greedy(params, cfg, prompt, n_new):
    ids = list(prompt)
    for _ in range(n_new):
        logits, _ = L.forward(params, jnp.asarray([ids], jnp.int32), cfg)
        ids.append(int(jnp.argmax(logits[0, -1])))
    return ids[len(prompt):]


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_engine_matches_naive_greedy(setup, kv_dtype):
    cfg, qparams = setup
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42]]
    n_new = 6
    eng = ContinuousBatchingEngine(
        qparams, cfg, max_batch=4, max_len=64, kv_dtype=kv_dtype
    )
    results = eng.generate(prompts, max_new_tokens=n_new)
    assert len(results) == len(prompts)
    for r, p in zip(results, prompts):
        expect = naive_greedy(qparams, cfg, p, n_new)
        if kv_dtype == "bf16":
            assert r.tokens == expect, (r.tokens, expect)
        else:
            # int8 KV perturbs logits slightly; most greedy tokens agree
            agree = sum(a == b for a, b in zip(r.tokens, expect))
            assert agree >= n_new - 2, (r.tokens, expect)


def test_continuous_admission(setup):
    """More requests than slots: the engine drains the queue as slots free."""
    cfg, qparams = setup
    eng = ContinuousBatchingEngine(qparams, cfg, max_batch=2, max_len=64)
    prompts = [[i + 1] for i in range(5)]
    results = eng.generate(prompts, max_new_tokens=3)
    assert len(results) == 5
    assert all(len(r.tokens) == 3 for r in results)
    assert [r.request_id for r in results] == list(range(5))


def test_eos_stops(setup):
    cfg, qparams = setup
    probe = ContinuousBatchingEngine(qparams, cfg, max_batch=1, max_len=64)
    [r0] = probe.generate([[5, 6]], max_new_tokens=4)
    eos = r0.tokens[1]  # pretend the 2nd generated token is EOS
    eng = ContinuousBatchingEngine(qparams, cfg, max_batch=1, max_len=64, eos_id=eos)
    [r] = eng.generate([[5, 6]], max_new_tokens=10)
    assert r.finished_reason == "eos"
    assert r.tokens == r0.tokens[:2]
