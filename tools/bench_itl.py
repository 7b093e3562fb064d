#!/usr/bin/env python
"""Inter-token-latency probe: what overlapped admission actually buys.

A running request decodes steadily; a LONG prompt arrives mid-stream.
Synchronous admission stalls the running request's token stream for the
full prompt prefill; overlapped admission bounds the stall to ~one chunk
per tick. This probe measures the running request's max inter-emission gap
around the admission, overlap off vs on. (Offline full-backlog throughput
prefers synchronous batched admission — measured in bench_serving.py — so
the scheduler only routes prompts > 2 chunks through the overlap path;
this probe is the ONLINE-serving case that path exists for.)

    python tools/bench_itl.py [--prompt-len 2048] [--chunk 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()


def run_case(eng, overlap: bool, long_prompt, block: int):
    from gemma_tpu.runtime.scheduler import Request, Scheduler

    emissions: list[float] = []

    def on_token(req, tok):
        if req.id == "steady":
            emissions.append(time.monotonic())

    sched = Scheduler(eng, overlap_admission=overlap, on_token=on_token)
    sched.submit(Request("steady", [2 + i for i in range(32)], max_new_tokens=200))
    for _ in range(6):  # steady is mid-decode, warm
        sched.step_block(block)
    emissions.clear()
    for _ in range(4):  # baseline gap sample
        sched.step_block(block)
    sched.submit(Request("late", long_prompt, max_new_tokens=8))
    while not all(r.done for r in sched.finished) or sched.active or sched.pending or sched._admitting:
        sched.step_block(block)
        if len(sched.finished) == 2:
            break
    gaps = [b - a for a, b in zip(emissions, emissions[1:])]
    return max(gaps) * 1e3 if gaps else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=4096)
    args = ap.parse_args()

    from gemma_tpu.models import GEMMA_2B
    from gemma_tpu.runtime import Engine, EngineConfig
    from gemma_tpu.testing import make_params
    import numpy as np

    params = jax.device_put(make_params(GEMMA_2B, fmt="q4_0", fill="zeros"))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[:1])
    eng = Engine(
        GEMMA_2B, params,
        EngineConfig(max_seq_len=args.max_seq_len, max_batch=2,
                     prefill_chunk=args.chunk),
    )
    long_prompt = [2 + i % 1000 for i in range(args.prompt_len)]
    # warm both admission paths' compiles
    run_case(eng, True, long_prompt, args.block)
    run_case(eng, False, long_prompt, args.block)

    res = {}
    for name, overlap in (("sync", False), ("overlap", True)):
        gaps = [run_case(eng, overlap, long_prompt, args.block) for _ in range(3)]
        res[f"max_itl_ms_{name}"] = round(min(gaps), 1)
    print(json.dumps({
        "metric": "admission_stall_max_itl_ms",
        **res,
        "prompt_len": args.prompt_len, "chunk": args.chunk,
        "block": args.block,
    }))


if __name__ == "__main__":
    main()
