"""Speculative decoding: the spec stream must EQUAL plain greedy exactly.

Verification replays argmax over the same logits the plain path computes,
so any divergence is a bug (cache rollback, draft indexing, history)."""
import numpy as np
import pytest

from gemma_tpu.gguf import GGMLType, GGUFReader
from gemma_tpu.models import load_params
from gemma_tpu.runtime import Engine, EngineConfig
from gemma_tpu.runtime.speculative import SpecDecoder
from gemma_tpu.testing import TINY_CONFIG, make_gguf


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("spec") / "m.gguf"
    make_gguf(path, TINY_CONFIG, weight_type=GGMLType.F32, seed=11)
    cfg, params = load_params(GGUFReader(path), mode="dequant")
    return Engine(cfg, params, EngineConfig(max_seq_len=256, donate_cache=False))


PROMPTS = [
    # repetitive: high draft acceptance
    [1, 7, 9, 7, 9, 7, 9, 7, 9, 7, 9, 7, 9],
    # structured repeat with a twist
    [1, 4, 5, 6, 4, 5, 6, 4, 5, 6, 4, 5],
    # non-repetitive: zero acceptance path
    [1, 33, 402, 17, 250, 96, 311, 42],
    # short prompt
    [1, 5],
]


@pytest.mark.parametrize("pi", range(len(PROMPTS)), ids=lambda i: f"p{i}")
@pytest.mark.parametrize("k,block", [(4, 2), (8, 4)])
def test_spec_equals_greedy(engine, pi, k, block):
    prompt = PROMPTS[pi]
    n = 40
    ref = engine.generate_fused([prompt], max_new_tokens=n)[0].tolist()
    spec = SpecDecoder(engine, k=k, block=block)
    got = spec.generate(prompt, n)
    assert got == ref, (got, ref)
    assert spec.steps >= 1


def test_spec_accepts_on_repetitive_input(engine):
    """On a cyclic prompt the model need not continue the cycle, but the
    machinery must emit more tokens than verify forwards when it does;
    at minimum the bookkeeping (steps * block forwards, exact stream)
    holds for a long generation."""
    prompt = [1] + [7, 9, 11] * 8
    n = 60
    ref = engine.generate_fused([prompt], max_new_tokens=n)[0].tolist()
    spec = SpecDecoder(engine, k=6, block=4)
    got = spec.generate(prompt, n)
    assert got == ref


def test_spec_acceptance_actually_exercised(engine):
    """Regression: a vector write_index dropped draft KV rows, so accepted
    drafts attended garbage — undetectable by tests whose model never
    accepts. This test FINDS a prompt whose plain-greedy continuation
    cycles (random tiny models fall into cycles), requires the spec stream
    to match, AND requires fewer verify forwards than emitted tokens —
    i.e. acceptance > 0 really happened through the verified-KV path."""
    n = 48
    for seed_prompt in ([1, 7], [1, 44, 260], [1, 5, 311], [1, 400, 17], [2, 9]):
        ref = engine.generate_fused([seed_prompt], max_new_tokens=n)[0].tolist()
        tail = ref[-16:]
        cyclic = any(tail.count(t) >= 4 for t in set(tail))
        if not cyclic:
            continue
        spec = SpecDecoder(engine, k=7, block=2)
        got = spec.generate(seed_prompt, n)
        assert got == ref, (seed_prompt, got, ref)
        forwards = spec.steps
        emitted = len(got)
        assert emitted > forwards, (
            f"no draft was ever accepted (forwards={forwards}, "
            f"emitted={emitted}) — acceptance path not exercised"
        )
        return
    pytest.skip("no cyclic greedy continuation found on this model")


def test_spec_capacity_guard(engine):
    spec = SpecDecoder(engine, k=8, block=4)
    with pytest.raises(ValueError, match="exceeds max_seq_len"):
        spec.generate(list(range(1, 200)), 60)


def test_spec_int8_kv(engine):
    """Verify forwards write quantized KV through the chunk path; the spec
    stream must still equal the int8-KV engine's own greedy stream."""
    eng8 = Engine(
        engine.cfg, engine.params,
        EngineConfig(max_seq_len=256, donate_cache=False, kv_quantized=True),
    )
    prompt = [1, 7, 9, 7, 9, 7, 9]
    ref = eng8.generate_fused([prompt], max_new_tokens=24)[0].tolist()
    got = SpecDecoder(eng8, k=4, block=2).generate(prompt, 24)
    assert got == ref


def test_spec_gemma2_softcaps(tmp_path):
    """Gemma-2 (sandwich norms + logit softcaps + sliding windows) through
    the speculative path: argmax goes through the softcap, so a mismatch
    in the verify forward's math would break stream equality."""
    from gemma_tpu.testing import TINY_GEMMA2_CONFIG, make_gguf

    path = make_gguf(tmp_path / "g2.gguf", TINY_GEMMA2_CONFIG,
                     weight_type=GGMLType.F32, seed=5, arch="gemma2")
    cfg, params = load_params(GGUFReader(path), mode="dequant")
    eng = Engine(cfg, params, EngineConfig(max_seq_len=256, donate_cache=False))
    prompt = [1, 5, 11, 5, 11, 5]
    ref = eng.generate_fused([prompt], max_new_tokens=24)[0].tolist()
    got = SpecDecoder(eng, k=4, block=2).generate(prompt, 24)
    assert got == ref


def test_spec_scheduler_equals_plain(engine):
    """Batched speculative continuous batching: every request's stream
    must equal the plain greedy scheduler's, across slot reuse, staggered
    finishes, and more requests than slots."""
    from gemma_tpu.runtime.scheduler import Request, Scheduler

    prompts = {
        "a": [1, 7, 9, 7, 9, 7],
        "b": [1, 44, 260, 9, 77],
        "c": [1, 5, 311, 42],
        "d": [1, 33],
        "e": [1, 400, 17, 9, 8, 260],
    }

    def run(spec):
        s = Scheduler(engine, speculative=spec)
        for rid, p in prompts.items():
            s.submit(Request(rid, p, max_new_tokens=8 + (len(p) % 3)))
        s.run()
        return {r.id: r.tokens for r in s.finished}

    got, ref = run(True), run(False)
    assert got == ref


def test_spec_adaptive_lo_mode_streams_exact(engine):
    """Adaptive speculation: with the controller pinned into backoff
    (acceptance 'collapsed'), the k=1 decoder serves most blocks and a
    periodic k=7 probe still runs — and every stream stays exactly equal
    to the plain greedy scheduler's."""
    from gemma_tpu.runtime.scheduler import Request, Scheduler

    prompts = {
        "a": [1, 7, 9, 7, 9, 7],
        "b": [1, 44, 260, 9, 77],
        "c": [1, 5, 311, 42],
    }

    def run(spec, collapse=False):
        s = Scheduler(engine, speculative=spec)
        if spec:
            assert s._spec_lo is not None  # adaptive decoder built
            if collapse:
                s._accept_ema = 0.0
                s._spec_min_accept = 100.0  # unreachable: lo except probes
        for rid, p in prompts.items():
            s.submit(Request(rid, p, max_new_tokens=10))
        s.run()
        return {r.id: r.tokens for r in s.finished}

    ref = run(False)
    assert run(True, collapse=True) == ref
    # pinning off (spec_min_accept<=1) must not build the lo decoder
    s = Scheduler(engine, speculative=True, spec_min_accept=0.0)
    assert s._spec_lo is None


def test_spec_scheduler_eos(engine):
    from gemma_tpu.runtime.scheduler import Request, Scheduler

    prompt = [1, 7, 300]
    first = engine.generate_fused([prompt], max_new_tokens=1)[0].tolist()[0]
    s = Scheduler(engine, speculative=True)
    s.submit(Request("a", prompt, max_new_tokens=10, eos_id=first))
    s.run()
    assert s.finished[0].tokens == [first]


def test_spec_scheduler_stats_report_forwards(engine):
    from gemma_tpu.runtime.scheduler import Request, Scheduler

    s = Scheduler(engine, speculative=True)
    s.submit(Request("a", [1, 7, 9, 7, 9], max_new_tokens=12))
    s.run()
    st = s.stats()
    assert st["spec_forwards"] >= 1
    assert st["total_tokens"] == 12


def test_spec_rejects_paged(engine):
    paged = Engine(
        engine.cfg, engine.params,
        EngineConfig(max_seq_len=128, donate_cache=False, paged=True, page_size=16),
    )
    with pytest.raises(ValueError, match="dense"):
        SpecDecoder(paged)
