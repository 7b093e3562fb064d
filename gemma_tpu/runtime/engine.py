"""Inference engine: jitted prefill/decode graphs + generation loops.

TPU-native replacement for the reference's `begin_one_round_inference` /
`inference` driver (`/root/reference/src/gemma_model.cpp:231-286,548-575`).
Where the reference rebuilds and re-executes a ggml graph per token with a
single-threaded executor, this engine:

* traces ONE prefill graph per (batch, bucketed-length) and ONE decode graph
  per batch size; XLA compiles and caches them;
* donates the KV-cache through jit, so decode updates happen in-place in
  device HBM with no host round-trip besides the sampled token;
* runs a fully device-side `lax.while_loop` generation path (`generate_fused`)
  for throughput, and a host-streamed token-by-token path (`generate`) for
  interactive use;
* supports greedy/temperature/top-k/top-p sampling and per-sequence EOS.

Prompt lengths are bucketed to powers of two to bound recompilation
(SURVEY.md §7 hard part (d)).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gemma
from ..models.config import GemmaConfig
from .kv_cache import KVCache
from .sampler import SamplingParams, sample


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class EngineConfig:
    max_seq_len: int = 512
    max_batch: int = 1
    kv_dtype: Any = jnp.bfloat16
    kv_quantized: bool = False
    prefill_bucket_min: int = 16
    donate_cache: bool = True


class Engine:
    """Owns compiled step functions for one model + one cache geometry."""

    def __init__(self, cfg: GemmaConfig, params, engine_cfg: EngineConfig | None = None):
        self.cfg = cfg
        self.params = params
        self.ecfg = engine_cfg or EngineConfig()

        donate = self.ecfg.donate_cache
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(3,) if donate else ())
        self._decode = jax.jit(self._decode_impl, donate_argnums=(2,) if donate else ())

    # -- cache -------------------------------------------------------------
    def new_cache(self, batch: int | None = None) -> KVCache:
        return KVCache.create(
            self.cfg,
            batch or self.ecfg.max_batch,
            self.ecfg.max_seq_len,
            dtype=self.ecfg.kv_dtype,
            quantized=self.ecfg.kv_quantized,
        )

    # -- raw steps ---------------------------------------------------------
    def _prefill_impl(self, params, tokens, lengths, cache: KVCache):
        """tokens [B, T] (right-padded), lengths [B] true lengths.

        Returns (logits_at_last [B, vocab], cache)."""
        B, T = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        logits, cache = gemma.forward(
            params, self.cfg, tokens, positions, cache,
            write_index=jnp.asarray(0, jnp.int32), kv_limit=lengths,
        )
        cache = dataclasses.replace(cache, length=lengths)
        last = jnp.take_along_axis(logits, (lengths - 1)[:, None, None], axis=1)
        return last[:, 0], cache

    def _decode_impl(self, params, tokens, cache: KVCache):
        """tokens [B] current tokens; appends one position per sequence."""
        B = tokens.shape[0]
        positions = cache.length[:, None]  # [B, 1] absolute position of new token
        logits, cache = gemma.forward(
            params, self.cfg, tokens[:, None], positions, cache,
            write_index=cache.length, kv_limit=cache.length + 1,
        )
        cache = cache.advance(1)
        return logits[:, 0], cache

    # -- public API --------------------------------------------------------
    def prefill(self, prompts: list[list[int]], cache: KVCache | None = None):
        """Pad a batch of prompts to a bucket and run the prefill graph."""
        B = len(prompts)
        lengths = np.array([len(p) for p in prompts], np.int32)
        T = _bucket(int(lengths.max()), self.ecfg.prefill_bucket_min)
        toks = np.zeros((B, T), np.int32)
        for i, p in enumerate(prompts):
            toks[i, : len(p)] = p
        cache = cache if cache is not None else self.new_cache(B)
        return self._prefill(self.params, jnp.asarray(toks), jnp.asarray(lengths), cache)

    def decode_step(self, tokens: jax.Array, cache: KVCache):
        return self._decode(self.params, tokens, cache)

    def generate(
        self,
        prompts: list[list[int]],
        max_new_tokens: int,
        sampling: SamplingParams = SamplingParams(),
        eos_id: int | None = None,
        seed: int = 0,
        on_token: Callable[[int, list[int]], None] | None = None,
    ) -> list[list[int]]:
        """Host-loop generation (streams tokens; per-sequence EOS stop)."""
        B = len(prompts)
        logits, cache = self.prefill(prompts)
        key = jax.random.PRNGKey(seed)
        out: list[list[int]] = [[] for _ in range(B)]
        done = np.zeros(B, bool)
        tok = None
        for step in range(max_new_tokens):
            key, sub = jax.random.split(key)
            tok = sample(logits, sampling, sub)
            tok_np = np.asarray(tok)
            for b in range(B):
                if not done[b]:
                    out[b].append(int(tok_np[b]))
                    if eos_id is not None and tok_np[b] == eos_id:
                        done[b] = True
            if on_token is not None:
                on_token(step, [int(t) for t in tok_np])
            if done.all() or step == max_new_tokens - 1:
                break
            if int(np.asarray(cache.length).max()) >= self.ecfg.max_seq_len:
                break
            logits, cache = self.decode_step(tok, cache)
        return out

    def generate_fused(
        self,
        prompts: list[list[int]],
        max_new_tokens: int,
        sampling: SamplingParams = SamplingParams(),
        eos_id: int | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Fully device-side generation via lax.while_loop; returns
        [B, max_new_tokens] token ids (post-EOS positions hold EOS/garbage).

        This is the throughput path: one dispatch for the whole decode, no
        per-token host sync."""
        logits, cache = self.prefill(prompts)
        fn = self._fused_loop(max_new_tokens, sampling, eos_id)
        toks = fn(self.params, logits, cache, jax.random.PRNGKey(seed))
        return np.asarray(toks)

    @functools.lru_cache(maxsize=8)
    def _fused_loop(self, max_new_tokens: int, sampling: SamplingParams, eos_id: int | None):
        decode = self._decode_impl

        def run(params, logits0, cache0, key0):
            B = logits0.shape[0]
            toks0 = jnp.zeros((B, max_new_tokens), jnp.int32)
            done0 = jnp.zeros((B,), bool)

            def cond(state):
                i, _, _, done, _, _ = state
                return (i < max_new_tokens) & ~jnp.all(done)

            def body(state):
                i, logits, cache, done, toks, key = state
                key, sub = jax.random.split(key)
                t = sample(logits, sampling, sub)
                toks = toks.at[:, i].set(jnp.where(done, toks[:, i], t))
                if eos_id is not None:
                    done = done | (t == eos_id)
                can_continue = (i + 1 < max_new_tokens) & (
                    cache.length.max() < cache.max_len
                )
                logits, cache = jax.lax.cond(
                    can_continue,
                    lambda args: decode(*args),
                    lambda args: (logits, cache),
                    (params, t, cache),
                )
                return (i + 1, logits, cache, done, toks, key)

            state = (jnp.asarray(0), logits0, cache0, done0, toks0, key0)
            state = jax.lax.while_loop(cond, body, state)
            return state[4]

        return jax.jit(run, donate_argnums=(2,))
