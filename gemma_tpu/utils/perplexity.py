"""Perplexity evaluation — the Δppl quality gate.

BASELINE.md requires Δperplexity ≤ 0.05 vs the ggml Q4_0/Q8_0 baselines.
The reference has no evaluator at all (greedy generation only); this one
scores any token stream with the engine's own prefill graph: windows of
`ctx` tokens, teacher-forced, mean negative log-likelihood over predicted
positions. Windows are padded to one compiled shape; padded positions are
masked out of the NLL inside the jitted forward (no separate tail path).
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


def _window_nll(params, cfg, tokens: jax.Array, real: jax.Array, cache) -> jax.Array:
    """Sum of NLL of tokens[1:real] given their prefixes. tokens [T] padded,
    `real` = number of valid tokens in the window (scalar i32)."""
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
    mask = jnp.arange(T - 1) < real - 1  # predicted positions 1..real-1
    return jnp.where(mask, nll, 0.0).sum()


def evaluate(
    params,
    cfg,
    tokens: list[int] | np.ndarray,
    ctx: int = 512,
    stride: int | None = None,
    precision: str = "float32",
) -> PerplexityResult:
    """Sliding-window perplexity (non-overlapping windows by default).

    `precision` sets the activation dtype: float32 (default) matches
    ggml's f32 evaluation arithmetic for the Δppl gate; "bfloat16" scores
    with the serving path's numerics."""
    import dataclasses as _dc

    from ..runtime.kv_cache import KVCache

    if precision != cfg.activation_dtype:
        cfg = _dc.replace(cfg, activation_dtype=precision)
    tokens = np.asarray(tokens, np.int32)
    stride = stride or ctx
    fn = jax.jit(lambda p, t, r, c: _window_nll(p, cfg, t, r, c))
    total_nll = 0.0
    total_n = 0
    for start in range(0, max(1, len(tokens) - 1), stride):
        window = tokens[start : start + ctx]
        real = len(window)
        if real < 2:
            break
        if real < ctx:  # pad to keep one compiled shape
            window = np.pad(window, (0, ctx - real))
        cache = KVCache.create(cfg, 1, ctx, dtype=cfg.act_dtype)
        nll_sum = fn(params, jnp.asarray(window), jnp.asarray(real, jnp.int32), cache)
        total_nll += float(nll_sum)
        total_n += real - 1
    nll = total_nll / max(total_n, 1)
    return PerplexityResult(nll=nll, ppl=math.exp(nll), n_tokens=total_n)
