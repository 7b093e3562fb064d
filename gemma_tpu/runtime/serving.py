"""serve(): the composed serving entry point.

Wires the pieces VERDICT r2 flagged as disconnected into one driver:
`parallel.multihost` request routing (cross-host batching) + `HostRoles`
(prefill/decode disaggregation) + `runtime.Scheduler` (continuous batching)
+ either `runtime.Engine` (single chip) or `parallel.shard_decode.TPEngine`
(explicit-collectives tensor parallelism) — config 5 of BASELINE.json,
drivable end-to-end. The reference serves exactly one hardcoded prompt per
process (/root/reference/src/gemma_model.cpp:548-575); this is its
generalization to a multi-request, multi-host serving loop.

Multi-controller model: every process calls `serve()` with the SAME request
list; each admits only its hash-routed subset (`multihost.local_requests`),
so the global batch is spread across hosts with zero cross-host traffic per
decode step (the data axis only exists across requests). With `roles`
disaggregated, prefill-role processes run admission prefills on
`prefill_engine` and decode-role processes run the decode loop — the KV
handoff is `Scheduler`'s existing prefill→insert path.
"""
from __future__ import annotations

from typing import Sequence

import jax

from .sampler import SamplingParams
from .scheduler import Request, Scheduler


def serve(
    engine,
    requests: Sequence[Request],
    *,
    sampling: SamplingParams = SamplingParams(),
    block: int = 1,
    max_steps: int | None = None,
    seed: int = 0,
    roles=None,
    prefill_engine=None,
    transport=None,
    route_across_hosts: bool = True,
    on_token=None,
    speculative: bool = False,
    spec_k: int = 7,
    spec_block: int = 4,
) -> Scheduler:
    """Drive `requests` to completion; returns the finished Scheduler
    (results in `.finished`, metrics in `.stats()`).

    engine: runtime.Engine or parallel.shard_decode.TPEngine.
    block: decode tokens per dispatched program (Scheduler.step_block).
    roles: multihost.HostRoles for prefill/decode disaggregation; None =
        every host does both.
    prefill_engine: engine used for admission prefills (defaults to
        `engine`; with disaggregated roles in ONE process, pass the prefill
        engine here).
    transport: cross-PROCESS disaggregation address ((host, port) TCP or an
        AF_UNIX path — runtime.kv_transfer). A prefill-role process serves
        prefill requests at this address until its decode peer disconnects;
        a decode-role process fetches admission prefills from it (each KV
        chunk crosses the process boundary via the byte-exact serialized
        tuple).
    speculative/spec_k/spec_block: batched prompt-lookup speculation
        (greedy + dense cache; adaptive-k — see Scheduler).
    """
    reqs = list(requests)
    if route_across_hosts and jax.process_count() > 1:
        from ..parallel.multihost import local_requests

        reqs = local_requests(reqs)
    if roles is not None and not roles.is_decode():
        if transport is not None:
            # pure prefill host WITH a transport: serve prefill requests
            # over the wire until the decode peer disconnects
            from .kv_transfer import serve_prefill_host

            serve_prefill_host(engine, transport)
        # without a transport the prefill engine must live in the decode
        # process (passed there as prefill_engine=); nothing to run here
        return Scheduler(engine, sampling=sampling, seed=seed)
    owned_client = None
    if prefill_engine is None and transport is not None:
        from .kv_transfer import RemotePrefillClient

        prefill_engine = owned_client = RemotePrefillClient(transport)
    try:
        sched = Scheduler(
            engine, sampling=sampling, seed=seed, on_token=on_token,
            prefill_engine=prefill_engine,
            speculative=speculative, spec_k=spec_k, spec_block=spec_block,
        )
        for r in reqs:
            sched.submit(r)
        sched.run(max_steps=max_steps, block=block)
    finally:
        if owned_client is not None:
            # disconnect releases the prefill host's serve loop
            owned_client.close()
    return sched
