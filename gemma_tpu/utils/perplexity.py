"""Perplexity evaluation — the Δppl quality gate.

BASELINE.md requires Δperplexity ≤ 0.05 vs the ggml Q4_0/Q8_0 baselines.
The reference has no evaluator at all (greedy generation only); this one
scores any token stream with the engine's own prefill graph: windows of
`ctx` tokens, teacher-forced, mean negative log-likelihood over predicted
positions.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PerplexityResult:
    nll: float
    ppl: float
    n_tokens: int

    def delta(self, other: "PerplexityResult") -> float:
        return self.ppl - other.ppl


def _window_nll(params, cfg, tokens: jax.Array, cache) -> tuple[jax.Array, jax.Array]:
    """NLL of tokens[1:] given tokens[:-1] in one forward. tokens [T]."""
    from ..models import gemma

    T = tokens.shape[0]
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    logits, _ = gemma.forward(
        params, cfg, tokens[None], positions, cache,
        write_index=jnp.asarray(0, jnp.int32),
        kv_limit=jnp.full((1,), T, jnp.int32),
    )
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[1:, None], axis=-1)[:, 0]
    return nll.sum(), jnp.asarray(T - 1)


def evaluate(
    params,
    cfg,
    tokens: list[int] | np.ndarray,
    ctx: int = 512,
    stride: int | None = None,
) -> PerplexityResult:
    """Sliding-window perplexity (non-overlapping windows by default)."""
    from ..runtime.kv_cache import KVCache

    tokens = np.asarray(tokens, np.int32)
    stride = stride or ctx
    fn = jax.jit(lambda p, t, c: _window_nll(p, cfg, t, c))
    total_nll = 0.0
    total_n = 0
    for start in range(0, max(1, len(tokens) - 1), stride):
        window = tokens[start : start + ctx]
        if len(window) < 2:
            break
        if len(window) < ctx:  # pad to keep one compiled shape
            window = np.pad(window, (0, ctx - len(window)))
            real = len(tokens[start : start + ctx]) - 1
        else:
            real = ctx - 1
        cache = KVCache.create(cfg, 1, ctx)
        nll_sum, _ = fn(params, jnp.asarray(window), cache)
        # padded positions contribute garbage; recompute cheaply by masking:
        # only count `real` positions
        if real < ctx - 1:
            # re-run precise accounting on the unpadded slice (rare tail)
            nll_arr = _eager_nll(params, cfg, tokens[start : start + ctx])
            total_nll += float(nll_arr.sum())
            total_n += int(nll_arr.shape[0])
        else:
            total_nll += float(nll_sum)
            total_n += real
    nll = total_nll / max(total_n, 1)
    return PerplexityResult(nll=nll, ppl=math.exp(nll), n_tokens=total_n)


def _eager_nll(params, cfg, tokens: np.ndarray) -> np.ndarray:
    from ..runtime.kv_cache import KVCache

    T = len(tokens)
    cache = KVCache.create(cfg, 1, T)
    t = jnp.asarray(tokens, jnp.int32)
    nll_sum, n = _window_nll(params, cfg, t, cache)
    # per-token breakdown not needed; return a vector summing to nll_sum
    return np.full(int(n), float(nll_sum) / max(int(n), 1), np.float32)
