"""QTensor — block-quantized tensors in TPU-native device layout.

The reference keeps ggml's interleaved block bytes in host memory and decodes
them scalar-by-scalar inside `vec_dot` (`/root/reference/src/hpc.cpp:33-37`,
`/root/reference/src/kernals.cl:48-156`). On TPU, sub-byte interleaved structs
are hostile to the (8,128) vector-lane layout, so checkpoints are re-laid-out
**once at load time** into a structure-of-arrays form:

* ``qs``     — packed quantized values, uint8/int8, last dim = in-features
* ``scales`` (+ ``mins`` / ``d``/``dmin`` hierarchy) — per-group metadata as
  separate dense arrays aligned with the group grid

Values are numerically identical to ggml dequantization (scale arithmetic is
kept in f32, grouping mirrors the ggml block structure). Supported device
formats:

====== ====================================================== ==========
fmt    device arrays                                           bits/wt
====== ====================================================== ==========
q4_0   qs u8 [r, c/2], scales f32 [r, c/32]                    5.0
q8_0   qs i8 [r, c],   scales f32 [r, c/32]                    9.0
q4_k   qs u8 [r, c/2], sc/mn u8 [r, c/32], d/dmin f32 [r,c/256] 4.75+
q6_k   ql u8 [r, c/2], qh u8 [r, c/4], sc i8 [r, c/16], d f32   6.75+
====== ====================================================== ==========

(bits/wt counts f32 group scales; swap to bf16 scales for bandwidth-critical
deployments via ``scale_dtype``.)

Nibble packing convention (all 4-bit formats): within each 32-element group,
byte ``j`` holds element ``j`` in its low nibble and element ``j+16`` in its
high nibble — ggml's Q4_0 order — so unpacking is
``concat([qs & 15, qs >> 4], axis=-1)`` on a ``[..., ngroup, 16]`` view with
no cross-lane shuffles, and importing ggml payloads never re-shuffles nibbles.
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A [rows, cols] quantized matrix in device layout.

    Logical semantics: ``dequant(qt)`` is a float32/bf16 [rows, cols] matrix.
    Weight matrices follow the ggml convention rows=out-features,
    cols=in-features (matmul is ``x @ w.T``).
    """

    fmt: str  # static: 'q4_0' | 'q8_0' | 'q4_k' | 'q6_k'
    shape: tuple[int, ...]  # static logical shape
    arrays: dict[str, Any]  # device arrays; keys depend on fmt

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

def _pad_rows_to(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    pad = np.zeros((rows - x.shape[0],) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


def pack_q4_0(raw: bytes | np.ndarray, shape: tuple[int, int], scale_dtype=np.float32) -> dict[str, np.ndarray]:
    rows, cols = shape
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, cols // 32, 18)
    scales = b[:, :, :2].copy().view("<f2").astype(scale_dtype).reshape(rows, cols // 32)
    qs = b[:, :, 2:].reshape(rows, cols // 2)
    return {"qs": np.ascontiguousarray(qs), "scales": scales}


def pack_q8_0(raw, shape, scale_dtype=np.float32) -> dict[str, np.ndarray]:
    rows, cols = shape
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, cols // 32, 34)
    scales = b[:, :, :2].copy().view("<f2").astype(scale_dtype).reshape(rows, cols // 32)
    qs = b[:, :, 2:].view(np.int8).reshape(rows, cols)
    return {"qs": np.ascontiguousarray(qs), "scales": scales}


def pack_q4_k(raw, shape, scale_dtype=np.float32) -> dict[str, np.ndarray]:
    rows, cols = shape
    nsb = cols // 256
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, nsb, 144)
    d = b[:, :, 0:2].copy().view("<f2").astype(scale_dtype).reshape(rows, nsb)
    dmin = b[:, :, 2:4].copy().view("<f2").astype(scale_dtype).reshape(rows, nsb)
    sc6, mn6 = numpy_ref._unpack_scale_min_k4(b[:, :, 4:16].reshape(-1, 12))
    sc6 = sc6.reshape(rows, nsb * 8)  # per-32 6-bit scale, [r, cols/32]
    mn6 = mn6.reshape(rows, nsb * 8)
    # ggml Q4_K nibble order: qs chunk c (32B) holds sub-block 2c in lo
    # nibbles (elements 64c..64c+31) and sub-block 2c+1 in hi nibbles.
    # Re-group to the uniform per-32 (j, j+16) convention:
    qs = b[:, :, 16:144].reshape(rows, nsb, 4, 32)
    lo = qs & 0x0F  # sub-block 2c, elements 0..31 in order
    hi = qs >> 4    # sub-block 2c+1
    subs = np.stack([lo, hi], axis=3).reshape(rows, nsb * 8, 32)  # [r, n32, 32]
    packed = (subs[:, :, :16] | (subs[:, :, 16:] << 4)).reshape(rows, cols // 2)
    return {
        "qs": np.ascontiguousarray(packed),
        "sc": np.ascontiguousarray(sc6),
        "mn": np.ascontiguousarray(mn6),
        "d": d,
        "dmin": dmin,
    }


def pack_q6_k(raw, shape, scale_dtype=np.float32) -> dict[str, np.ndarray]:
    rows, cols = shape
    nsb = cols // 256
    b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(rows, nsb, 210)
    # Decode ggml's interleaved (ql, qh) into plain 6-bit values first.
    ql = b[:, :, 0:128]
    qh = b[:, :, 128:192]
    sc = b[:, :, 192:208].view(np.int8).reshape(rows, nsb * 16)  # per-16 scales
    d = b[:, :, 208:210].copy().view("<f2").astype(scale_dtype).reshape(rows, nsb)
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
    # Split 6-bit values into a nibble plane (uniform (j, j+16) packing per
    # 32-group) and a 2-bit plane (byte j of a 32-group holds the top bits of
    # elements j, j+8, j+16, j+24 at shifts 0/2/4/6).
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
        "ql": np.ascontiguousarray(nib),
        "qh": np.ascontiguousarray(hq),
        "sc": np.ascontiguousarray(sc),
        "d": d,
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


def from_ggml(raw, ggml_type: GGMLType, shape: tuple[int, int], scale_dtype=np.float32) -> QTensor:
    """Convert a ggml-format payload into a device-layout QTensor (host side;
    arrays stay numpy until device_put)."""
    fmt = GGML_TO_FMT[ggml_type]
    arrays = _PACKERS[fmt][1](raw, shape, scale_dtype)
    return QTensor(fmt, tuple(shape), arrays)


def quantize_array(x: np.ndarray, fmt: str) -> QTensor:
    """Quantize a float [rows, cols] matrix directly into device layout."""
    ggml_type = _PACKERS[fmt][0]
    raw = numpy_ref.quantize(np.asarray(x, np.float32), ggml_type)
    return from_ggml(raw, ggml_type, tuple(x.shape))


# ---------------------------------------------------------------------------
# Device-side dequantization (XLA; Pallas kernels fuse this into the matmul)
# ---------------------------------------------------------------------------

def _unpack_nibbles(qs: jax.Array, cols: int) -> jax.Array:
    """[..., cols/2] uint8 -> [..., cols] uint8 per the (j, j+16) convention."""
    g = qs.reshape(*qs.shape[:-1], cols // 32, 16)
    return jnp.concatenate([g & 0x0F, g >> 4], axis=-1).reshape(*qs.shape[:-1], cols)


def gather_dequant(qt: QTensor, indices: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Gather rows `indices` of a quantized [rows, cols] matrix and dequantize
    only those rows (embedding lookup without materializing the table)."""
    flat = indices.reshape(-1)
    arrays = {k: jnp.take(a, flat, axis=0) for k, a in qt.arrays.items()}
    sub = QTensor(qt.fmt, (int(flat.shape[0]), qt.shape[1]), arrays)
    return dequant(sub, dtype).reshape(*indices.shape, qt.shape[1])


def dequant(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize a QTensor to a dense matrix (reference/fallback path)."""
    rows, cols = qt.shape
    a = qt.arrays
    if qt.fmt == "q8_0":
        q = a["qs"].astype(jnp.float32).reshape(rows, cols // 32, 32)
        x = q * a["scales"].astype(jnp.float32)[..., None]
    elif qt.fmt == "q4_0":
        q = _unpack_nibbles(a["qs"], cols).astype(jnp.int8) - 8
        x = q.reshape(rows, cols // 32, 32).astype(jnp.float32) * a["scales"].astype(jnp.float32)[..., None]
    elif qt.fmt == "q4_k":
        q = _unpack_nibbles(a["qs"], cols).reshape(rows, cols // 32, 32).astype(jnp.float32)
        d32 = (
            a["d"].astype(jnp.float32).reshape(rows, cols // 256, 1)
            * a["sc"].astype(jnp.float32).reshape(rows, cols // 256, 8)
        ).reshape(rows, cols // 32)
        m32 = (
            a["dmin"].astype(jnp.float32).reshape(rows, cols // 256, 1)
            * a["mn"].astype(jnp.float32).reshape(rows, cols // 256, 8)
        ).reshape(rows, cols // 32)
        x = q * d32[..., None] - m32[..., None]
    elif qt.fmt == "q6_k":
        lo = _unpack_nibbles(a["ql"], cols).reshape(rows, cols // 32, 32)
        h = a["qh"].reshape(rows, cols // 32, 8)
        hi = jnp.concatenate([h & 3, (h >> 2) & 3, (h >> 4) & 3, (h >> 6) & 3], axis=-1)
        q = (lo | (hi << 4)).astype(jnp.int8) - 32
        d16 = (
            a["d"].astype(jnp.float32).reshape(rows, cols // 256, 1)
            * a["sc"].astype(jnp.float32).reshape(rows, cols // 256, 16)
        ).reshape(rows, cols // 16)
        x = q.reshape(rows, cols // 16, 16).astype(jnp.float32) * d16[..., None]
    else:
        raise NotImplementedError(qt.fmt)
    return x.reshape(rows, cols).astype(dtype)
