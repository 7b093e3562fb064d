"""QTensor — block-quantized tensors in TPU-native device layout.

The reference keeps ggml's interleaved block bytes in host memory and decodes
them scalar-by-scalar inside `vec_dot` (`/root/reference/src/hpc.cpp:33-37`,
`/root/reference/src/kernals.cl:48-156`). On TPU, sub-byte interleaved structs
are hostile to the (8,128) vector-lane layout, so checkpoints are re-laid-out
**once at load time** into a K-major structure-of-arrays form chosen for the
fused Pallas matmul (ops/quant_matmul.py):

* all arrays are **[K-granule, N]** — K (reduction/in-features) on the
  sublane axis, N (out-features) on the lane axis. Tiles of every array are
  then (8k-row, 128-col)-aligned, K-stepping never needs lane-dim dynamic
  slices, and the kernel's dot is the MXU-native ``x @ W`` (no transposed
  contraction);
* 4-bit payloads are stored as **K-paired signed nibbles**: byte[k', n]
  packs elements 2k' (low nibble) and 2k'+1 (high), two's-complement, with
  the ggml zero-point already folded (q4_0/q4_k store q-8). In-kernel,
  ``pltpu.bitcast(u8[bk/2, bn], int4)`` reinterprets the tile as int4
  [bk, bn] in natural K-order — dequant is ONE convert + ONE scale
  multiply per weight, no nibble shifts, no plane reordering (the round-1
  f32 extraction chain cost ~5 VPU ops/weight and capped decode at 37 % of
  the HBM roofline);
* per-group metadata is flattened to one effective scale per 32-group
  (per-16 for q6_k), stored as **f32** — the exact widening of ggml's f16
  values (no precision change; for K-quants the one f16 rounding of d*sc
  products is <= 2^-11 relative, three orders below the 4-bit quantization
  noise). f32 costs ~11 % more HBM bytes than raw f16 bits but removes the
  10-integer-op in-kernel f16 decode Mosaic would otherwise need (it has no
  f16 vector type) — measured net win at every decode shape
  (tools/bench_qmm_variants.py: ffn_down 38.0 -> 31.5 us). q4_k
  additionally stores the per-group affine offset ``offs = 8*sc - min``
  (rank-reduced in the kernel to one xsum dot).

Device formats (logical tensor is [N, K] = [out, in], ggml row-major):

====== ============================================================ ======
fmt    arrays                                                        bpw
====== ============================================================ ======
q4_0   qs u8 [K/2, N] (signed q-8 pairs), scales f32 [K/32, N]       5.0
q8_0   qs i8 [K, N],   scales f32 [K/32, N]                          9.0
q4_k   qs u8 [K/2, N] (signed q-8 pairs), scales f32 [K/32, N],
       offs f32 [K/32, N]                                            6.0
q6_k   qs i8 [K, N] (q-32 in [-32, 31]), scales f32 [K/16, N]        9.0
====== ============================================================ ======

(q6_k rides the q8_0 kernel — int8 payload, one convert per weight; the
round-2 two-int4-plane form was 10.0 bpw and needed two bitcasts + an
8a+b recombine per weight.)
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from . import numpy_ref

QGROUP = 32  # fine-grain scale group (ggml QK4_0/QK8_0 block size)
# Scales are ggml f16 values widened exactly to f32 at load (see module
# docstring for the bytes-vs-VPU tradeoff).
SCALE_DTYPE = np.float32


def store_f16(x: np.ndarray) -> np.ndarray:
    """Round to ggml's f16 scale grid, store as exact f32."""
    return np.ascontiguousarray(x.astype(np.float16).astype(np.float32))


# payload array + K-rows-per-payload-row, per format (shape derivation)
_PAYLOAD = {"q4_0": ("qs", 2), "q8_0": ("qs", 1), "q4_k": ("qs", 2), "q6_k": ("qs", 1)}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A logical [N, K] = [out, in] quantized matrix in device layout."""

    fmt: str  # static: 'q4_0' | 'q8_0' | 'q4_k' | 'q6_k'
    arrays: dict[str, Any]  # device arrays, all [K-granule, N]

    @property
    def shape(self) -> tuple[int, int]:
        """Logical (N, K), derived from the payload array so it stays
        correct for shard-local views inside shard_map (static aux data
        would go stale when the leaves are sliced)."""
        key, mult = _PAYLOAD[self.fmt]
        a = self.arrays[key]
        return (int(a.shape[1]), int(a.shape[0]) * mult)

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (self.fmt, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        fmt, keys = aux
        return cls(fmt, dict(zip(keys, children)))

    @property
    def dtype(self):  # logical dtype after dequant
        return jnp.bfloat16

    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in self.arrays.values())


# ---------------------------------------------------------------------------
# Host-side conversion: ggml payload -> device layout (numpy)
# ---------------------------------------------------------------------------

def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _pack_signed_pairs(vals: np.ndarray) -> np.ndarray:
    """[K, N] int values in [-8, 7] -> u8 [K/2, N] nibble pairs (element 2k'
    in the low nibble). ``pltpu.bitcast(u8, int4)`` restores K-order."""
    v = vals.astype(np.int8) & 0xF
    return (v[0::2] | (v[1::2] << 4)).astype(np.uint8)


def pack_q4_0(raw, shape) -> dict[str, np.ndarray]:
    rows, cols = shape  # (N, K)
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, cols // 32, 18)
    scales = b[:, :, :2].copy().view("<f2").reshape(rows, cols // 32)
    nib = b[:, :, 2:]  # ggml order: element j<16 = lo nibble of byte j, else hi
    q = np.concatenate([nib & 0x0F, nib >> 4], axis=2).reshape(rows, cols)
    q = q.astype(np.int8) - 8  # zero-point folded into the signed payload
    return {"qs": _pack_signed_pairs(_t(q)), "scales": store_f16(_t(scales))}


def pack_q8_0(raw, shape) -> dict[str, np.ndarray]:
    rows, cols = shape
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, cols // 32, 34)
    scales = b[:, :, :2].copy().view("<f2").reshape(rows, cols // 32)
    qs = b[:, :, 2:].view(np.int8).reshape(rows, cols)
    return {"qs": _t(qs), "scales": store_f16(_t(scales))}


def pack_q4_k(raw, shape) -> dict[str, np.ndarray]:
    rows, cols = shape
    nsb = cols // 256
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, nsb, 144)
    d = b[:, :, 0:2].copy().view("<f2").astype(np.float32).reshape(rows, nsb)
    dmin = b[:, :, 2:4].copy().view("<f2").astype(np.float32).reshape(rows, nsb)
    sc6, mn6 = numpy_ref._unpack_scale_min_k4(b[:, :, 4:16].reshape(-1, 12))
    sc6 = sc6.reshape(rows, nsb, 8).astype(np.float32)
    mn6 = mn6.reshape(rows, nsb, 8).astype(np.float32)
    # effective per-32 scale (f16, matching what the kernel multiplies by)
    # and affine offset: w = sc*q - mn = sc*(q-8) + (8*sc - mn)
    sc_f16 = (d[:, :, None] * sc6).astype(np.float16)
    mn_f16 = (dmin[:, :, None] * mn6).astype(np.float16)
    offs = (
        8.0 * sc_f16.astype(np.float32) - mn_f16.astype(np.float32)
    ).reshape(rows, cols // 32)
    eff_sc = sc_f16.reshape(rows, cols // 32).astype(np.float32)
    # ggml Q4_K nibble order: qs chunk c (32B) holds sub-block 2c in lo
    # nibbles (elements 64c..64c+31) and sub-block 2c+1 in hi nibbles.
    qs = b[:, :, 16:144].reshape(rows, nsb, 4, 32)
    lo = qs & 0x0F
    hi = qs >> 4
    q = np.stack([lo, hi], axis=3).reshape(rows, cols).astype(np.int8) - 8
    return {
        "qs": _pack_signed_pairs(_t(q)),
        "scales": store_f16(_t(eff_sc)),
        "offs": store_f16(_t(offs)),
    }


def pack_q6_k(raw, shape) -> dict[str, np.ndarray]:
    # device format v3: plain int8 payload (q-32) + per-16 scales — 9.0 bpw
    # and the q8_0 kernel (one convert/weight) instead of the old two-int4-
    # plane form (10.0 bpw, two bitcasts + a*8+b recombine).
    rows, cols = shape
    nsb = cols // 256
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, nsb, 210)
    ql = b[:, :, 0:128]
    qh = b[:, :, 128:192]
    sc8 = b[:, :, 192:208].view(np.int8).astype(np.float32).reshape(rows, nsb, 16)
    d = b[:, :, 208:210].copy().view("<f2").astype(np.float32).reshape(rows, nsb)
    eff_sc = (d[:, :, None] * sc8).reshape(rows, cols // 16)  # per-16 scales
    # Decode ggml's interleaved (ql, qh) into plain 6-bit values first.
    q = np.empty((rows, nsb, 256), dtype=np.uint8)
    for n in range(2):
        lq = ql[:, :, n * 64 : n * 64 + 64]
        hq = qh[:, :, n * 32 : n * 32 + 32]
        base = n * 128
        q[:, :, base : base + 32] = (lq[:, :, :32] & 0x0F) | (((hq >> 0) & 3) << 4)
        q[:, :, base + 32 : base + 64] = (lq[:, :, 32:] & 0x0F) | (((hq >> 2) & 3) << 4)
        q[:, :, base + 64 : base + 96] = (lq[:, :, :32] >> 4) | (((hq >> 4) & 3) << 4)
        q[:, :, base + 96 : base + 128] = (lq[:, :, 32:] >> 4) | (((hq >> 6) & 3) << 4)
    qp = (q.reshape(rows, cols).astype(np.int16) - 32).astype(np.int8)  # [-32, 31]
    return {"qs": _t(qp), "scales": store_f16(_t(eff_sc))}


_PACKERS = {
    "q4_0": (GGMLType.Q4_0, pack_q4_0),
    "q8_0": (GGMLType.Q8_0, pack_q8_0),
    "q4_k": (GGMLType.Q4_K, pack_q4_k),
    "q6_k": (GGMLType.Q6_K, pack_q6_k),
}

GGML_TO_FMT = {
    GGMLType.Q4_0: "q4_0",
    GGMLType.Q8_0: "q8_0",
    GGMLType.Q4_K: "q4_k",
    GGMLType.Q6_K: "q6_k",
}


def from_ggml(raw, ggml_type: GGMLType, shape: tuple[int, int]) -> QTensor:
    """Convert a ggml-format payload into a device-layout QTensor (host side;
    arrays stay numpy until device_put). Uses the native (C++) parallel
    repacker when available; numpy otherwise (bit-identical layouts)."""
    fmt = GGML_TO_FMT[ggml_type]
    from .. import native

    arrays = native.repack(raw, ggml_type, shape)
    if arrays is None:
        arrays = _PACKERS[fmt][1](raw, shape)
    return QTensor(fmt, arrays)


def quantize_array(x: np.ndarray, fmt: str) -> QTensor:
    """Quantize a float [rows, cols] matrix directly into device layout."""
    ggml_type = _PACKERS[fmt][0]
    raw = numpy_ref.quantize(np.asarray(x, np.float32), ggml_type)
    return from_ggml(raw, ggml_type, tuple(x.shape))


# ---------------------------------------------------------------------------
# Device-side dequantization (XLA; Pallas kernels fuse this into the matmul)
# ---------------------------------------------------------------------------

def _unpack_signed_pairs(qs: jax.Array) -> jax.Array:
    """u8 [K/2, N] nibble pairs -> int32 [K, N] signed values (XLA path;
    the Pallas kernels bitcast to int4 instead)."""
    lo = (qs & 0x0F).astype(jnp.int32)
    hi = (qs >> 4).astype(jnp.int32)
    lo = lo - 16 * (lo >= 8)
    hi = hi - 16 * (hi >= 8)
    Kh, N = qs.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * Kh, N)


def dequant_t(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize to the K-major [K, N] matrix (y = x @ dequant_t(w))."""
    N, K = qt.shape
    a = qt.arrays
    if qt.fmt == "q8_0":
        q = a["qs"].astype(jnp.float32).reshape(K // 32, 32, N)
        sc = a["scales"]
        x = (q * sc[:, None, :]).reshape(K, N)
    elif qt.fmt in ("q4_0", "q4_k"):
        q = _unpack_signed_pairs(a["qs"]).astype(jnp.float32)
        sc = a["scales"]  # f32 [K/32, N]
        x = (q.reshape(K // 32, 32, N) * sc[:, None, :]).reshape(K, N)
        if qt.fmt == "q4_k":
            off = a["offs"]
            x = (x.reshape(K // 32, 32, N) + off[:, None, :]).reshape(K, N)
    elif qt.fmt == "q6_k":
        q = a["qs"].astype(jnp.float32)
        sc = a["scales"]  # f32 [K/16, N]
        x = (q.reshape(K // 16, 16, N) * sc[:, None, :]).reshape(K, N)
    else:
        raise NotImplementedError(qt.fmt)
    return x.astype(dtype)


def dequant(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize to the logical [N, K] matrix (tests / golden reference)."""
    return dequant_t(qt, dtype).T


def concat_rows(qts: list["QTensor"]) -> "QTensor":
    """Concatenate QTensors along the logical row (out-feature / N) axis.

    Used to fuse per-layer projections (q|k|v, gate|up) into one matmul —
    fewer kernel launches and bigger tiles. All inputs must share fmt and K.
    Device arrays are [K-granule, N], so this is an axis-1 concat."""
    fmt = qts[0].fmt
    K = qts[0].shape[1]
    if any(q.fmt != fmt or q.shape[1] != K for q in qts):
        raise ValueError("concat_rows requires matching fmt and in-features")
    xp = jnp if any(isinstance(a, jax.Array) for a in qts[0].arrays.values()) else np
    arrays = {
        k: xp.concatenate([q.arrays[k] for q in qts], axis=1) for k in qts[0].arrays
    }
    return QTensor(fmt, arrays)


def pad_rows(qt: QTensor, n_new: int) -> QTensor:
    """Zero-pad the logical row (out-feature / N) axis to `n_new` rows.

    Used to pad the vocab dim of the embedding/head to a 2048 multiple: the
    raw Gemma vocab (256128) only tiles at bn=128, which makes the lm_head
    matmul stream 128-byte strided chunks (measured 320 GB/s vs 666 GB/s at
    bn=2048 — tools/bench_shapes.py). Zero scales dequantize to exact zero
    rows; callers slice the logits back to the true vocab."""
    N, K = qt.shape
    if n_new == N:
        return qt
    if n_new < N:
        raise ValueError(f"pad_rows: {n_new} < current rows {N}")
    xp = jnp if any(isinstance(a, jax.Array) for a in qt.arrays.values()) else np
    arrays = {
        k: xp.pad(a, ((0, 0), (0, n_new - N))) for k, a in qt.arrays.items()
    }
    return QTensor(qt.fmt, arrays)


def gather_dequant(qt: QTensor, indices: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Gather logical rows (out-features / vocab entries) `indices` of a
    quantized [N, K] matrix and dequantize only those rows -> [..., K].

    Embedding lookup without materializing the table; rows are the lane
    (N) axis of the device arrays."""
    flat = indices.reshape(-1)
    arrays = {k: jnp.take(a, flat, axis=1) for k, a in qt.arrays.items()}
    sub = QTensor(qt.fmt, arrays)
    return dequant(sub, dtype).reshape(*indices.shape, qt.shape[1])
