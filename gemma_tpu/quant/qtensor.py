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
* per-group metadata is flattened to one effective f16 scale (and min) per
  32-group (per-16 for q6_k): exact for q4_0/q8_0 (ggml stores d as f16);
  for K-quants the f16 rounding of d*sc products is <= 2^-11 relative —
  three orders below the 4-bit quantization noise itself.

Device formats (logical tensor is [N, K] = [out, in], ggml row-major):

====== ============================================================ ======
fmt    arrays                                                        bpw
====== ============================================================ ======
q4_0   qs u8 [K/2, N], scales f16 [K/32, N]                          4.5
q8_0   qs i8 [K, N],   scales f16 [K/32, N]                          8.5
q4_k   qs u8 [K/2, N], scales f16 [K/32, N], mins f16 [K/32, N]      5.0
q6_k   ql u8 [K/2, N], qh u8 [K/4, N], scales f16 [K/16, N]          7.0
====== ============================================================ ======

Nibble packing (4-bit formats): within each 32-element K-group, packed row
``j`` (j in 0..15) holds element ``32g+j`` in its low nibble and element
``32g+16+j`` in its high nibble — ggml's Q4_0 intra-block order, so
importing ggml payloads never re-shuffles nibbles, and unpacking is two
plane-wise ops plus one coarse concat along the sublane axis.
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
# Scales are ggml f16 values stored as raw bits in uint16: Mosaic has no f16
# vector type, so kernels decode f16->f32 with integer ops (exact); the XLA
# path uses lax.bitcast_convert_type.
SCALE_DTYPE = np.uint16


def store_f16(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.astype(np.float16).view(np.uint16))


def f16_bits_to_f32(u16: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A logical [N, K] = [out, in] quantized matrix in device layout."""

    fmt: str  # static: 'q4_0' | 'q8_0' | 'q4_k' | 'q6_k'
    shape: tuple[int, ...]  # static logical shape (N, K)
    arrays: dict[str, Any]  # device arrays, all [K-granule, N]

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (self.fmt, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        fmt, shape, keys = aux
        return cls(fmt, shape, dict(zip(keys, children)))

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


def pack_q4_0(raw, shape) -> dict[str, np.ndarray]:
    rows, cols = shape  # (N, K)
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, cols // 32, 18)
    scales = b[:, :, :2].copy().view("<f2").reshape(rows, cols // 32)
    qs = b[:, :, 2:].reshape(rows, cols // 2)
    return {"qs": _t(qs), "scales": store_f16(_t(scales))}


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
    eff_sc = (d[:, :, None] * sc6).reshape(rows, cols // 32)
    eff_mn = (dmin[:, :, None] * mn6).reshape(rows, cols // 32)
    # ggml Q4_K nibble order: qs chunk c (32B) holds sub-block 2c in lo
    # nibbles (elements 64c..64c+31) and sub-block 2c+1 in hi nibbles.
    # Re-group to the uniform per-32 (j, j+16) convention:
    qs = b[:, :, 16:144].reshape(rows, nsb, 4, 32)
    lo = qs & 0x0F  # sub-block 2c, elements 0..31 in order
    hi = qs >> 4    # sub-block 2c+1
    subs = np.stack([lo, hi], axis=3).reshape(rows, nsb * 8, 32)  # [r, n32, 32]
    packed = (subs[:, :, :16] | (subs[:, :, 16:] << 4)).reshape(rows, cols // 2)
    return {
        "qs": _t(packed),
        "scales": store_f16(_t(eff_sc)),
        "mins": store_f16(_t(eff_mn)),
    }


def pack_q6_k(raw, shape) -> dict[str, np.ndarray]:
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
    q = q.reshape(rows, cols)
    # Split into a nibble plane with the uniform (j, j+16) per-32 packing and
    # a 2-bit plane: byte j of a 32-group holds the top bits of elements
    # j, j+8, j+16, j+24 at shifts 0/2/4/6.
    g = q.reshape(rows, cols // 32, 32)
    lo4 = g & 0x0F
    hi2 = g >> 4
    nib = (lo4[:, :, :16] | (lo4[:, :, 16:] << 4)).reshape(rows, cols // 2)
    hq = (
        hi2[:, :, 0:8]
        | (hi2[:, :, 8:16] << 2)
        | (hi2[:, :, 16:24] << 4)
        | (hi2[:, :, 24:32] << 6)
    ).reshape(rows, cols // 4)
    return {
        "ql": _t(nib),
        "qh": _t(hq),
        "scales": store_f16(_t(eff_sc)),
    }


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
    return QTensor(fmt, tuple(shape), arrays)


def quantize_array(x: np.ndarray, fmt: str) -> QTensor:
    """Quantize a float [rows, cols] matrix directly into device layout."""
    ggml_type = _PACKERS[fmt][0]
    raw = numpy_ref.quantize(np.asarray(x, np.float32), ggml_type)
    return from_ggml(raw, ggml_type, tuple(x.shape))


# ---------------------------------------------------------------------------
# Device-side dequantization (XLA; Pallas kernels fuse this into the matmul)
# ---------------------------------------------------------------------------

def _unpack_nibble_planes(qs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[K/2, N] packed -> (lo, hi) planes, each [K/2, N] uint8.

    Plane row c (= 16g+j) holds element 32g+j (lo) / 32g+16+j (hi)."""
    return qs & 0x0F, qs >> 4


def _interleave_planes(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(lo, hi) [K/2, N] -> [K, N] in natural element order."""
    Kh, N = lo.shape
    lo3 = lo.reshape(Kh // 16, 16, N)
    hi3 = hi.reshape(Kh // 16, 16, N)
    return jnp.concatenate([lo3, hi3], axis=1).reshape(2 * Kh, N)


def dequant_t(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize to the K-major [K, N] matrix (y = x @ dequant_t(w))."""
    N, K = qt.shape
    a = qt.arrays
    if qt.fmt == "q8_0":
        q = a["qs"].astype(jnp.float32).reshape(K // 32, 32, N)
        sc = f16_bits_to_f32(a["scales"])
        x = (q * sc[:, None, :]).reshape(K, N)
    elif qt.fmt in ("q4_0", "q4_k"):
        lo, hi = _unpack_nibble_planes(a["qs"])
        sc16 = jnp.repeat(f16_bits_to_f32(a["scales"]), 16, axis=0)  # [K/2, N]
        if qt.fmt == "q4_0":
            lo_v = (lo.astype(jnp.int8) - 8).astype(jnp.float32) * sc16
            hi_v = (hi.astype(jnp.int8) - 8).astype(jnp.float32) * sc16
        else:
            mn16 = jnp.repeat(f16_bits_to_f32(a["mins"]), 16, axis=0)
            lo_v = lo.astype(jnp.float32) * sc16 - mn16
            hi_v = hi.astype(jnp.float32) * sc16 - mn16
        x = _interleave_planes(lo_v, hi_v)
    elif qt.fmt == "q6_k":
        lo, hi = _unpack_nibble_planes(a["ql"])
        qh = a["qh"]
        h = [(qh >> s) & 3 for s in (0, 2, 4, 6)]  # rows 8g+j -> elems 32g+j(+8/16/24)
        n32 = K // 32
        def merge8(a8, b8):
            return jnp.concatenate(
                [a8.reshape(n32, 8, N), b8.reshape(n32, 8, N)], axis=1
            ).reshape(K // 2, N)
        hi_for_lo = merge8(h[0], h[1])  # rows 16g+jj -> elems 32g+jj
        hi_for_hi = merge8(h[2], h[3])
        lo_q = ((lo | (hi_for_lo << 4)).astype(jnp.int8) - 32).astype(jnp.float32)
        hi_q = ((hi | (hi_for_hi << 4)).astype(jnp.int8) - 32).astype(jnp.float32)
        # per-16 scales: group g lo-half uses sc[2g], hi-half sc[2g+1]
        sc = f16_bits_to_f32(a["scales"]).reshape(n32, 2, N)
        sc_lo = jnp.repeat(sc[:, 0, :].reshape(n32, 1, N), 16, axis=1).reshape(K // 2, N)
        sc_hi = jnp.repeat(sc[:, 1, :].reshape(n32, 1, N), 16, axis=1).reshape(K // 2, N)
        x = _interleave_planes(lo_q * sc_lo, hi_q * sc_hi)
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
    return QTensor(fmt, (sum(q.shape[0] for q in qts), K), arrays)


def gather_dequant(qt: QTensor, indices: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Gather logical rows (out-features / vocab entries) `indices` of a
    quantized [N, K] matrix and dequantize only those rows -> [..., K].

    Embedding lookup without materializing the table; rows are the lane
    (N) axis of the device arrays."""
    flat = indices.reshape(-1)
    arrays = {k: jnp.take(a, flat, axis=1) for k, a in qt.arrays.items()}
    sub = QTensor(qt.fmt, (int(flat.shape[0]), qt.shape[1]), arrays)
    return dequant(sub, dtype).reshape(*indices.shape, qt.shape[1])
