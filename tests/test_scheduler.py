"""Continuous batching scheduler: correctness vs standalone generation."""
import numpy as np
import pytest

from gemma_tpu.gguf import GGMLType, GGUFReader
from gemma_tpu.models import load_params
from gemma_tpu.runtime import Engine, EngineConfig
from gemma_tpu.runtime.scheduler import Request, Scheduler
from gemma_tpu.testing import TINY_CONFIG, make_gguf


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("s") / "m.gguf"
    make_gguf(path, TINY_CONFIG, weight_type=GGMLType.F32, seed=3)
    cfg, params = load_params(GGUFReader(path), mode="dequant")
    return Engine(cfg, params, EngineConfig(max_seq_len=64, max_batch=3, donate_cache=False))


PROMPTS = {
    "a": [1, 7, 300],
    "b": [1, 44, 260, 9, 77],
    "c": [1, 5, 311, 42],
    "d": [1, 33],
    "e": [1, 400, 17, 9, 8, 260],
}


def golden(engine, prompt, n):
    single = Engine(engine.cfg, engine.params, EngineConfig(max_seq_len=64, donate_cache=False))
    return single.generate([prompt], max_new_tokens=n)[0]


def test_more_requests_than_slots(engine):
    sched = Scheduler(engine)
    for rid, p in PROMPTS.items():
        sched.submit(Request(rid, p, max_new_tokens=6))
    finished = sched.run()
    assert len(finished) == len(PROMPTS)
    for req in finished:
        assert req.tokens == golden(engine, PROMPTS[req.id], 6), req.id
        assert req.ttft is not None and req.ttft >= 0


def test_late_arrival_joins_running_batch(engine):
    sched = Scheduler(engine)
    sched.submit(Request("a", PROMPTS["a"], max_new_tokens=8))
    for _ in range(3):
        sched.step()  # a is mid-decode
    sched.submit(Request("b", PROMPTS["b"], max_new_tokens=4))
    sched.run()
    by_id = {r.id: r for r in sched.finished}
    assert by_id["a"].tokens == golden(engine, PROMPTS["a"], 8)
    assert by_id["b"].tokens == golden(engine, PROMPTS["b"], 4)


def test_slot_reuse_after_finish(engine):
    sched = Scheduler(engine)
    sched.submit(Request("short", PROMPTS["d"], max_new_tokens=2))
    sched.run()
    sched.submit(Request("next", PROMPTS["c"], max_new_tokens=5))
    sched.run()
    by_id = {r.id: r for r in sched.finished}
    assert by_id["short"].tokens == golden(engine, PROMPTS["d"], 2)
    assert by_id["next"].tokens == golden(engine, PROMPTS["c"], 5)


def test_eos_stops_request(engine):
    # pick eos = the first greedily generated token so it stops at 1 token
    first = golden(engine, PROMPTS["a"], 1)[0]
    sched = Scheduler(engine)
    sched.submit(Request("a", PROMPTS["a"], max_new_tokens=10, eos_id=first))
    sched.run()
    assert sched.finished[0].tokens == [first]


def test_oversized_prompt_rejected(engine):
    sched = Scheduler(engine)
    sched.submit(Request("big", list(range(2, 2 + 70)), max_new_tokens=4))
    finished = sched.run()
    assert finished[0].tokens == []


def test_blocked_stepping_matches_per_token(engine):
    """step_block(n) emits the same tokens as per-token stepping; extra
    mid-block tokens after EOS/max_new are discarded, and freed slots are
    re-admitted cleanly on the next block boundary."""
    def run(block):
        sched = Scheduler(engine)
        for rid, p in PROMPTS.items():
            # staggered lengths so finishes land mid-block
            sched.submit(Request(rid, p, max_new_tokens=5 + (len(p) % 3)))
        sched.run(block=block)
        return {r.id: r.tokens for r in sched.finished}

    assert run(4) == run(1)


def test_blocked_stepping_paged(engine):
    paged = Engine(
        engine.cfg, engine.params,
        EngineConfig(max_seq_len=64, max_batch=3, donate_cache=False,
                     paged=True, page_size=16),
    )
    def run(eng, block):
        sched = Scheduler(eng)
        for rid, p in PROMPTS.items():
            sched.submit(Request(rid, p, max_new_tokens=6))
        sched.run(block=block)
        return {r.id: r.tokens for r in sched.finished}

    assert run(paged, 4) == run(engine, 1)


def test_paged_short_prompt_admission(engine):
    """Regression (ADVICE r3): page_size > prefill bucket used to make the
    paged insert reshape fail (n_pages = T // page_size = 0) for short
    prompts; the standalone prefill bucket must round up to a page."""
    paged = Engine(
        engine.cfg, engine.params,
        EngineConfig(max_seq_len=64, max_batch=2, donate_cache=False,
                     paged=True, page_size=32),
    )
    sched = Scheduler(paged)
    sched.submit(Request("short", PROMPTS["d"], max_new_tokens=4))  # 2 tokens
    sched.run()
    assert sched.finished[0].tokens == golden(engine, PROMPTS["d"], 4)


def test_disaggregated_prefill_engine(engine):
    """Prefill/decode disaggregation end-to-end (VERDICT r3 missing #3):
    the scheduler runs admission prefills on a DISTINCT engine with
    different bucket/chunk geometry and inserts across into a paged decode
    cache — the KV handoff crosses bucket shapes and page boundaries."""
    cfg, params = engine.cfg, engine.params
    decode = Engine(cfg, params, EngineConfig(max_seq_len=64, max_batch=2,
                                              donate_cache=False,
                                              paged=True, page_size=32))
    pref = Engine(cfg, params, EngineConfig(max_seq_len=128, max_batch=1,
                                            donate_cache=False,
                                            prefill_bucket_min=8,
                                            prefill_chunk=16))
    sched = Scheduler(decode, prefill_engine=pref)
    long_prompt = list(range(1, 41))  # 40 tokens -> 3 chunks, crosses a page
    sched.submit(Request("long", long_prompt, max_new_tokens=5))
    for rid in ("a", "d"):
        sched.submit(Request(rid, PROMPTS[rid], max_new_tokens=4))
    sched.run()
    by_id = {r.id: r.tokens for r in sched.finished}
    assert by_id["long"] == golden(engine, long_prompt, 5)
    assert by_id["a"] == golden(engine, PROMPTS["a"], 4)
    assert by_id["d"] == golden(engine, PROMPTS["d"], 4)


def test_disaggregated_kv_format_mismatch_rejected(engine):
    """int8-KV prefill into a bf16 decode cache must fail fast, not corrupt."""
    cfg, params = engine.cfg, engine.params
    decode = Engine(cfg, params, EngineConfig(max_seq_len=64, max_batch=2,
                                              donate_cache=False))
    pref = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False,
                                            kv_quantized=True))
    with pytest.raises(ValueError, match="KV format"):
        Scheduler(decode, prefill_engine=pref)


def test_stats(engine):
    sched = Scheduler(engine)
    for rid in ("a", "b"):
        sched.submit(Request(rid, PROMPTS[rid], max_new_tokens=3))
    sched.run()
    st = sched.stats()
    assert st["requests"] == 2
    assert st["total_tokens"] == 6
    assert st["p50_ttft_s"] is not None


def test_admission_chunked_prefill(engine):
    """Long prompts admit through chunked standalone prefill (bounded
    compile shapes) and decode identically to the unchunked path."""
    cfg, params = engine.cfg, engine.params
    from gemma_tpu.runtime.scheduler import Request, Scheduler

    prompt = list(range(1, 45))
    base = Engine(cfg, params, EngineConfig(max_seq_len=128, max_batch=2,
                                            donate_cache=False))
    chunked = Engine(cfg, params, EngineConfig(max_seq_len=128, max_batch=2,
                                               donate_cache=False,
                                               prefill_chunk=16))
    outs = {}
    for name, eng in (("base", base), ("chunked", chunked)):
        s = Scheduler(eng)
        s.submit(Request("a", prompt, max_new_tokens=5))
        s.run()
        outs[name] = s.finished[0].tokens
    assert outs["chunked"] == outs["base"] and len(outs["base"]) == 5


def test_overlapped_admission_interleaves_decode(engine):
    """A long prompt arriving while another request decodes admits one
    chunk per tick (overlapped admission): the running request keeps
    emitting tokens during the admission, and both outputs match the
    synchronous path exactly."""
    cfg, params = engine.cfg, engine.params
    long_prompt = list(range(1, 49))  # 48 tokens = 3 x chunk 16
    eng = Engine(cfg, params, EngineConfig(max_seq_len=128, max_batch=2,
                                           donate_cache=False,
                                           prefill_chunk=16))

    def run(overlap):
        s = Scheduler(eng, overlap_admission=overlap)
        s.submit(Request("short", PROMPTS["a"], max_new_tokens=10))
        for _ in range(2):
            s.step()  # short is mid-decode
        s.submit(Request("long", long_prompt, max_new_tokens=4))
        emitted_during = []
        for _ in range(3):  # 3 admission chunks run inside these ticks
            emitted_during += [rid for rid, _ in s.step()]
        s.run()
        assert not s._admitting and not s._admit_order
        return {r.id: r.tokens for r in s.finished}, emitted_during

    ov, during = run(True)
    sync, _ = run(False)
    assert ov == sync
    # the already-running request kept decoding while "long" was admitting
    assert during.count("short") == 3
