"""Token samplers.

The reference implements greedy argmax only (`greedy_sample`,
`/root/reference/src/gemma_model.cpp:532-546`). Served here: greedy,
temperature, top-k, top-p — all shape-static and jit-compatible, operating
on a [B, vocab] logits batch.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1 => disabled

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


def sample(
    logits: jax.Array,  # [B, vocab] f32
    params: SamplingParams,
    key: jax.Array | None = None,
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    if params.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert key is not None, "non-greedy sampling needs a PRNG key"
    logits = logits / params.temperature

    if params.top_k > 0 and params.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p (always
        # keeping the most-probable token)
        keep = cum - probs < params.top_p
        threshold = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
