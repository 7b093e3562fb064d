"""KV-cache: fixed-capacity, jit-carried, optionally int8-quantized.

TPU-native replacement for the reference's per-layer ggml cache tensors +
head/n bookkeeping (`/root/reference/src/gemma_model.h:75-97`,
`gemma_model.cpp:361-401,428-436`). Differences by design:

* one stacked array per K/V across all layers — a single pytree leaf,
  donated through jit so decode updates are in-place in HBM;
* layout is **[L, B, H_kv, S, D]**: the sequence dim sits second-to-last so
  Pallas attention kernels tile (bs, D) blocks directly (Mosaic requires
  the last two block dims to be tileable) and the flash launcher needs no
  per-step transpose of the cache;
* per-sequence valid lengths (`length[b]`) instead of a single global
  `head`/`n` — multiple independent sequences batch together (the
  reference's `cells`/seq-id machinery is dead code; here it's real);
* writes are `dynamic_update_slice` / scatter under jit, not graph-rebuilt
  views (`gemma_model.cpp:499-518`);
* optional int8 per-(token, head) quantization halving HBM traffic.

The paged variant lives in runtime/paged_kv.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..models.config import GemmaConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Dense cache: k/v of shape [L, B, H_kv, S, D]; length[b] = #valid."""

    k: Any
    v: Any
    length: jax.Array  # i32 [B]
    # int8 mode: per-(layer, batch, head, position) scales, [L, B, H_kv, S]
    k_scale: Any = None
    v_scale: Any = None

    def tree_flatten(self):
        return (self.k, self.v, self.length, self.k_scale, self.v_scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction ------------------------------------------------------
    @classmethod
    def create(
        cls,
        config: GemmaConfig,
        batch: int,
        max_len: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "KVCache":
        shape = (config.n_layers, batch, config.n_kv_heads, max_len, config.head_dim)
        if quantized:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros(batch, jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros(batch, jnp.int32),
        )

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    # -- quantization helpers ---------------------------------------------
    @staticmethod
    def _quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Per-(token, head) symmetric int8: x [B, T, H, D]."""
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = amax / 127.0
        inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
        q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
        return q, scale

    def gather_layer(self, layer: int) -> tuple[jax.Array, jax.Array]:
        """Dequantized [B, H, S, D] views of layer `layer`."""
        k, v = self.k[layer], self.v[layer]
        if self.quantized:
            k = k.astype(jnp.bfloat16) * self.k_scale[layer][..., None].astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16) * self.v_scale[layer][..., None].astype(jnp.bfloat16)
        return k, v

    # -- writes ------------------------------------------------------------
    def write_chunk(self, layer: int, start: jax.Array, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Write a [B, T, H, D] chunk at uniform offset `start` (prefill)."""
        def upd(buf, val):  # val [B, T, H, D] -> [B, H, T, D]
            return jax.lax.dynamic_update_slice(
                buf, val.transpose(0, 2, 1, 3)[None], (layer, 0, 0, start, 0)
            )

        if self.quantized:
            qk, sk = self._quantize(k_new)
            qv, sv = self._quantize(v_new)

            def upd_s(buf, s):  # s [B, T, H] -> [B, H, T]
                return jax.lax.dynamic_update_slice(
                    buf, s.transpose(0, 2, 1)[None], (layer, 0, 0, start)
                )

            changes = dict(
                k=upd(self.k, qk),
                v=upd(self.v, qv),
                k_scale=upd_s(self.k_scale, sk),
                v_scale=upd_s(self.v_scale, sv),
            )
        else:
            changes = dict(
                k=upd(self.k, k_new.astype(self.k.dtype)),
                v=upd(self.v, v_new.astype(self.v.dtype)),
            )
        return dataclasses.replace(self, **changes)

    def write_chunk_per_seq(
        self, layer: int, starts: jax.Array, k_new: jax.Array, v_new: jax.Array
    ) -> "KVCache":
        """Write a [B, T, H, D] chunk at a DIFFERENT offset per sequence
        (batched speculative verification: every slot's k+1 draft rows land
        at its own length). Unrolled per-seq dynamic_update_slice — B tiny
        in-place updates instead of a B*T-row scatter. Starts are clamped
        in-bounds (callers guarantee ACTIVE slots never need the clamp;
        inactive serving slots may drift past capacity and their rows are
        rewritten on re-admission)."""
        B, T = k_new.shape[0], k_new.shape[1]
        S = self.max_len
        starts = jnp.clip(starts, 0, S - T)
        if self.quantized:
            qk, sk = self._quantize(k_new)
            qv, sv = self._quantize(v_new)
        else:
            qk, qv = k_new.astype(self.k.dtype), v_new.astype(self.v.dtype)
            sk = sv = None
        k, v = self.k, self.v
        ks, vs = self.k_scale, self.v_scale
        for b in range(B):  # static unroll; each DUS is [1,1,H,T,D]
            loc = (layer, b, 0, starts[b], 0)
            k = jax.lax.dynamic_update_slice(
                k, qk[b].transpose(1, 0, 2)[None, None], loc
            )
            v = jax.lax.dynamic_update_slice(
                v, qv[b].transpose(1, 0, 2)[None, None], loc
            )
            if self.quantized:
                ks = jax.lax.dynamic_update_slice(
                    ks, sk[b].T[None, None], (layer, b, 0, starts[b])
                )
                vs = jax.lax.dynamic_update_slice(
                    vs, sv[b].T[None, None], (layer, b, 0, starts[b])
                )
        changes = dict(k=k, v=v)
        if self.quantized:
            changes.update(k_scale=ks, v_scale=vs)
        return dataclasses.replace(self, **changes)

    def write_token(self, layer: int, index: jax.Array, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Scatter a single token per sequence: k_new [B, 1, H, D] written at
        per-batch position index[b] (decode)."""
        B, H = self.k.shape[1], self.k.shape[2]
        b = jnp.arange(B)[:, None]
        h = jnp.arange(H)[None, :]
        idx = index[:, None]
        if self.quantized:
            qk, sk = self._quantize(k_new)
            qv, sv = self._quantize(v_new)
            return dataclasses.replace(
                self,
                k=self.k.at[layer, b, h, idx].set(qk[:, 0]),
                v=self.v.at[layer, b, h, idx].set(qv[:, 0]),
                k_scale=self.k_scale.at[layer, b, h, idx].set(sk[:, 0]),
                v_scale=self.v_scale.at[layer, b, h, idx].set(sv[:, 0]),
            )
        return dataclasses.replace(
            self,
            k=self.k.at[layer, b, h, idx].set(k_new[:, 0].astype(self.k.dtype)),
            v=self.v.at[layer, b, h, idx].set(v_new[:, 0].astype(self.v.dtype)),
        )

    def advance(self, n: jax.Array) -> "KVCache":
        return dataclasses.replace(self, length=self.length + n)

    def insert_sequence(
        self,
        slot: jax.Array,  # scalar i32
        k_seq: jax.Array,  # [L, H, T, D] (already quantized if cache is)
        v_seq: jax.Array,
        length: jax.Array,  # scalar i32 true length (<= T)
        k_scale: jax.Array | None = None,  # [L, H, T] when quantized
        v_scale: jax.Array | None = None,
    ) -> "KVCache":
        """Insert a prefilled sequence's K/V into batch row `slot` (the
        prefill->insert->decode handoff of continuous batching). Slots are
        independent; the insert is a dynamic_update_slice on the batch dim."""
        def upd(buf, val):
            return jax.lax.dynamic_update_slice(
                buf, val[:, None], (0, slot, 0, 0, 0)
            )

        changes = dict(
            k=upd(self.k, k_seq.astype(self.k.dtype)),
            v=upd(self.v, v_seq.astype(self.v.dtype)),
            length=self.length.at[slot].set(length),
        )
        if self.quantized:
            changes["k_scale"] = jax.lax.dynamic_update_slice(
                self.k_scale, k_scale[:, None], (0, slot, 0, 0)
            )
            changes["v_scale"] = jax.lax.dynamic_update_slice(
                self.v_scale, v_scale[:, None], (0, slot, 0, 0)
            )
        return dataclasses.replace(self, **changes)
