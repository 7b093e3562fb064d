"""Fused dequant+matmul Pallas kernels.

The hot op of the whole framework — the reference spends 99.49 % of its
runtime in the equivalent `hpc.cpp:216 mul_mat` + `kernals.cl` vec-dot
kernels (BASELINE.md). Design (SURVEY.md §7 step 4):

* weights stay block-quantized in HBM in the K-major QTensor layout
  (quant/qtensor.py); tiles are dequantized **in VMEM** inside the matmul
  and fed straight to the MXU — dense bf16 weights are never materialized
  in HBM (the XLA fallback in ops/linear.py pays that ~3x traffic);
* grid is (M/bm, N/bn, K/bk), K sequential with an f32 VMEM accumulator —
  the standard Pallas tiled-matmul shape, Pallas double-buffers the HBM
  streams;
* the K-major layout makes every tile (sublane, lane)-aligned: payload
  tiles are [bk/2, bn] (or [bk/4, bn]) and per-32-group f16 scales are
  [bk/32, bn] — no lane-dim dynamic slices, no transposed MXU contraction;
* 4-bit formats never re-order nibbles in-kernel: the (j, j+16) plane
  packing means unpack = two masked ops; the matching element permutation
  is applied to the small activation tile instead (the contraction is
  order-invariant, so the result is exact);
* Q4_K's per-group minimum enters as a rank-reduced correction
  ``y -= xsum_groups @ mins`` (one extra tiny dot) instead of a full
  [bk, bn] min matrix.

Dispatch: gemma_tpu.ops.linear routes QTensor matmuls here when shapes are
tile-compatible; otherwise it falls back to XLA dequant+dot. On CPU the
kernels run in Pallas interpret mode (tests only).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QTensor
from .linear import register_kernel as _register_kernel

MIN_SUBLANE = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decode_f16(u16: jax.Array) -> jax.Array:
    """Exact f16-bits (uint16) -> f32 decode with integer ops.

    Mosaic has no f16 vector type, so ggml's f16 scales travel as raw bits
    and are rebiased here: normals get exponent+112 and mantissa<<13;
    subnormals are mant * 2^-24. inf/nan never occur in valid scales."""
    u = u16.astype(jnp.int32)
    sign = jnp.where((u >> 15) & 1 == 1, -1.0, 1.0).astype(jnp.float32)
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    normal = pltpu.bitcast(((exp + 112) << 23) | (mant << 13), jnp.float32)
    sub = mant.astype(jnp.float32) * jnp.float32(2.0**-24)
    return sign * jnp.where(exp == 0, sub, normal)


def _f32(x: jax.Array) -> jax.Array:
    """Narrow-int -> f32 via i32 (Mosaic has no direct u8/i8 -> f32 cast)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _byte_f32(x: jax.Array, mask: int | None = 0x0F):
    """uint8 payload -> (full value f32, masked-low f32).

    Mosaic does not legalize shifts on sub-32-bit integer vectors, so all
    nibble/bit-field extraction is done arithmetically in f32 (exact for
    values < 2^24). Only the & mask runs in the integer domain."""
    xf = x.astype(jnp.int32).astype(jnp.float32)
    if mask is None:
        return xf, None
    lof = (x.astype(jnp.int32) & mask).astype(jnp.float32)
    return xf, lof


def _permute_x_groups(x: jax.Array, bk: int) -> jax.Array:
    """[M, K] -> [M, K] with each bk-sized K-window reordered to
    [lo-half elems | hi-half elems] of its 32-groups, interleaved at
    16-element granularity to match the nibble-plane row order within a
    weight tile (plane row 16g+j <-> element 32g+j / 32g+16+j).

    Runs in XLA *outside* the kernel (Mosaic can't lane-split reshape);
    cost is negligible: x is [<=256, K]."""
    m, K = x.shape
    g = x.reshape(m, K // bk, bk // 32, 32)
    lo = g[..., :16].reshape(m, K // bk, bk // 2)
    hi = g[..., 16:].reshape(m, K // bk, bk // 2)
    return jnp.concatenate([lo, hi], axis=-1).reshape(m, K)


def _acc_step(acc_ref, x, w, nsteps, o_ref):
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == nsteps - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _acc_two_plane(acc_ref, x, lo, hi, nsteps, o_ref):
    """Accumulate x_lo @ lo + x_hi @ hi without materializing the [bk, bn]
    concat: the big dequantized-weight copy was ~25% of kernel time; two
    half-K MXU dots do the same MACs on the planes in place (x arrives in
    plane order from the launcher's _permute_x_groups)."""
    khalf = lo.shape[0]
    acc_ref[...] += jax.lax.dot_general(
        x[:, :khalf], lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[...] += jax.lax.dot_general(
        x[:, khalf:], hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == nsteps - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _expand16(sc: jax.Array) -> jax.Array:
    """[G, bn] per-group scalars -> [16G, bn] rows via broadcast+reshape
    (sublane-replicating jnp.repeat lowers to a slow gather in Mosaic)."""
    G, bn = sc.shape
    return jnp.broadcast_to(sc[:, None, :], (G, 16, bn)).reshape(16 * G, bn)


def _init_acc(acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)


# ---------------------------------------------------------------------------
# Kernels — all weight refs are K-major tiles
# ---------------------------------------------------------------------------

def _q4_0_kernel(x_ref, xs_ref, qs_ref, sc_ref, o_ref, acc_ref, *, nsteps):
    # x arrives pre-permuted into nibble-plane order (launcher).
    # Zero-point folding: w = (q - 8)·sc, so y = x@(q·sc) - 8·(xsum32 @ sc)
    # — the offset leaves the per-element path (2 VPU subs per weight pair)
    # and becomes one [bm, bk/32] x [bk/32, bn] MXU dot on the group sums.
    _init_acc(acc_ref)
    scf = _decode_f16(sc_ref[...])  # [bk/32, bn]
    sc16 = _expand16(scf)  # [bk/2, bn]
    qf, lof = _byte_f32(qs_ref[...])
    hif = (qf - lof) * 0.0625  # == qs >> 4, exactly, in f32
    lo = (lof * sc16).astype(jnp.bfloat16)
    hi = (hif * sc16).astype(jnp.bfloat16)
    acc_ref[...] -= 8.0 * jax.lax.dot_general(
        xs_ref[...], scf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _acc_two_plane(acc_ref, x_ref[...].astype(jnp.bfloat16), lo, hi, nsteps, o_ref)


def _q8_0_kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref, *, nsteps):
    _init_acc(acc_ref)
    bk, bn = qs_ref.shape
    q = _f32(qs_ref[...]).reshape(bk // 32, 32, bn)
    w = (q * _decode_f16(sc_ref[...])[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    _acc_step(acc_ref, x_ref[...].astype(jnp.bfloat16), w, nsteps, o_ref)


def _q4_k_kernel(x_ref, xs_ref, qs_ref, sc_ref, mn_ref, o_ref, acc_ref, *, nsteps):
    # w = sc*q - mn with per-32-group mins: the min term is rank-reduced to
    # y -= xsum32 @ mn (one small MXU dot) instead of a [bk, bn] expansion
    # + subtract in the weight tile.
    _init_acc(acc_ref)
    sc16 = _expand16(_decode_f16(sc_ref[...]))
    mnf = _decode_f16(mn_ref[...])  # [bk/32, bn]
    qf, lof = _byte_f32(qs_ref[...])
    hif = (qf - lof) * 0.0625
    lo = (lof * sc16).astype(jnp.bfloat16)
    hi = (hif * sc16).astype(jnp.bfloat16)
    acc_ref[...] -= jax.lax.dot_general(
        xs_ref[...], mnf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _acc_two_plane(acc_ref, x_ref[...].astype(jnp.bfloat16), lo, hi, nsteps, o_ref)


def _q6_k_kernel(x_ref, xs_ref, ql_ref, qh_ref, sc_ref, o_ref, acc_ref, *, nsteps):
    """Q6_K: w = sc16 * (q6 - 32); q6 = lo4 | (hi2 << 4).

    qh row 8g+j holds the hi-2 bits of elements 32g+{j, j+8, j+16, j+24}
    at shifts 0/2/4/6; scales are per-16 (group g lo-half -> sc[2g]).
    The -32 offset folds into y -= 32·(xsum16 @ sc) like the q4 formats."""
    _init_acc(acc_ref)
    bk = x_ref.shape[-1]
    bn = ql_ref.shape[-1]
    n32 = bk // 32
    qlf, ql_lo = _byte_f32(ql_ref[...])
    ql_hi = (qlf - ql_lo) * 0.0625
    qhf, _ = _byte_f32(qh_ref[...], mask=None)
    # peel 2-bit fields from the byte value arithmetically (exact in f32)
    h = []
    rem = qhf
    for mul in (1.0, 0.25, 0.0625, 0.015625):
        v = rem * mul
        frac = v - jnp.floor(v * 0.25) * 4.0  # v mod 4
        h.append(jnp.floor(frac))
    # h[s] = (qh >> 2s) & 3 as floats

    def merge8(a8, b8):  # rows 8g+j x2 -> rows 16g+jj
        return jnp.concatenate(
            [a8.reshape(n32, 8, bn), b8.reshape(n32, 8, bn)], axis=1
        ).reshape(bk // 2, bn)

    hi_for_lo = merge8(h[0], h[1])
    hi_for_hi = merge8(h[2], h[3])
    lo_q = ql_lo + 16.0 * hi_for_lo
    hi_q = ql_hi + 16.0 * hi_for_hi

    scf = _decode_f16(sc_ref[...])  # [bk/16, bn] per-16 scales
    sc = scf.reshape(n32, 2, bn)
    sc_lo = jnp.broadcast_to(sc[:, :1, :], (n32, 16, bn)).reshape(bk // 2, bn)
    sc_hi = jnp.broadcast_to(sc[:, 1:, :], (n32, 16, bn)).reshape(bk // 2, bn)
    lo = (lo_q * sc_lo).astype(jnp.bfloat16)
    hi = (hi_q * sc_hi).astype(jnp.bfloat16)
    acc_ref[...] -= 32.0 * jax.lax.dot_general(
        xs_ref[...], scf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _acc_two_plane(acc_ref, x_ref[...].astype(jnp.bfloat16), lo, hi, nsteps, o_ref)


# ---------------------------------------------------------------------------
# Launchers
# ---------------------------------------------------------------------------

_FMT_ARRAYS = {
    "q4_0": ("qs", "scales"),
    "q8_0": ("qs", "scales"),
    "q4_k": ("qs", "scales", "mins"),
    "q6_k": ("ql", "qh", "scales"),
}
_FMT_KERNELS = {
    "q4_0": _q4_0_kernel,
    "q8_0": _q8_0_kernel,
    "q4_k": _q4_k_kernel,
    "q6_k": _q6_k_kernel,
}
# Minimum K-tile: every array's sublane tile (qs: bk/2, qh: bk/4 rows,
# scales: bk/32) must be >= 8 rows; q6_k per-16 scales want bk/16 >= 8.
_FMT_MIN_BK = {"q4_0": 256, "q8_0": 256, "q4_k": 256, "q6_k": 256}
# zero-point fold: group size of the xsum side input (None = no fold)
_FMT_XSUM_GROUP = {"q4_0": 32, "q8_0": None, "q4_k": 32, "q6_k": 16}


def _pick_bk(K: int, fmt: str) -> int | None:
    # 512 first: smaller K-tiles double-buffer better (measured ~15% on the
    # d_ff-K ffn_down matmul vs bk=1024)
    for bk in (512, 1024, 256):
        if bk >= _FMT_MIN_BK[fmt] and K % bk == 0:
            return bk
    return None


def _pick_bn(N: int) -> int | None:
    # Wide-N matmuls (gate_up, the 256k-vocab head) amortize per-grid-step
    # overhead with wider tiles; VMEM stays in budget via vmem_limit_bytes.
    if N >= 16384 and N % 2048 == 0:
        return 2048
    if N >= 8192 and N % 1024 == 0:
        return 1024
    for bn in (512, 256, 128):
        if N % bn == 0:
            return bn
    return None


def supports(x_shape: tuple[int, ...], qt: QTensor) -> bool:
    N, K = qt.shape
    return (
        qt.fmt in _FMT_MIN_BK
        and _pick_bk(K, qt.fmt) is not None
        and _pick_bn(N) is not None
    )


@functools.partial(jax.jit, static_argnames=("fmt", "shape", "keys", "interpret"))
def _qmm_call(x2d, xs, arrays, fmt, shape, keys, interpret):
    N, K = shape
    M = x2d.shape[0]
    bm = M  # caller already padded/bucketed M
    bk = _pick_bk(K, fmt)
    bn = _pick_bn(N)
    nsteps = K // bk
    grid = (M // bm, N // bn, nsteps)

    # every array is [K*frac, N]: tile rows by the same K fraction, cols by bn
    def wspec(arr):
        rows = arr.shape[0]
        tile_r = rows * bk // K
        return pl.BlockSpec((tile_r, bn), lambda m, n, k: (k, n))

    in_specs = [pl.BlockSpec((bm, bk), lambda m, n, k: (m, k))]
    inputs = [x2d]
    if xs is not None:
        # per-group activation sums for the zero-point/min fold, stored
        # transposed [K/g, M]: the K-tiled block (bk/g, M) then satisfies
        # Mosaic's (8, 128-or-full) tiling rule for any decode/prefill M
        g = K // xs.shape[0]
        in_specs.append(pl.BlockSpec((bk // g, M), lambda m, n, k: (k, m)))
        inputs.append(xs)
    in_specs += [wspec(arrays[k]) for k in keys]
    inputs += [arrays[k] for k in keys]

    flops = 2 * M * N * K
    bytes_accessed = sum(int(arrays[k].size) * arrays[k].dtype.itemsize for k in keys)
    kernel = functools.partial(_FMT_KERNELS[fmt], nsteps=nsteps)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*inputs)
    return out


def quant_matmul(x: jax.Array, qt: QTensor) -> jax.Array:
    """y = x @ dequant(qt).T ; x [..., K] -> y [..., N] (f32)."""
    N, K = qt.shape
    *lead, _ = x.shape
    M = 1
    for d in lead:
        M *= d
    x2d = x.reshape(M, K)
    # bucket M to a tile-friendly size
    bm = MIN_SUBLANE
    while bm < M:
        bm *= 2
    bm = min(bm, 256)
    Mp = ((M + bm - 1) // bm) * bm
    if Mp != M:
        x2d = jnp.pad(x2d, ((0, Mp - M), (0, 0)))
    g = _FMT_XSUM_GROUP[qt.fmt]
    xs = (
        x2d.astype(jnp.float32).reshape(Mp, K // g, g).sum(-1).T
        if g is not None
        else None
    )
    if qt.fmt in ("q4_0", "q4_k", "q6_k"):  # nibble-plane element order
        x2d = _permute_x_groups(x2d, _pick_bk(K, qt.fmt))
    keys = _FMT_ARRAYS[qt.fmt]
    out = _qmm_call(x2d, xs, qt.arrays, qt.fmt, qt.shape, keys, _interpret())
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N)


def register_all() -> None:
    """Install the fused kernels as the QTensor matmul path (with per-call
    shape gating; incompatible shapes fall back inside ops.linear)."""

    def make(fmt):
        def fn(x, qt):
            # On non-TPU backends interpret-mode kernels are orders of
            # magnitude slower than the XLA fallback; only kernel tests opt
            # in via GEMMA_TPU_INTERPRET_KERNELS=1.
            use_interpret = os.environ.get("GEMMA_TPU_INTERPRET_KERNELS") == "1"
            if (_interpret() and not use_interpret) or not supports(x.shape, qt):
                from ..quant.qtensor import dequant_t

                return jnp.dot(
                    x, dequant_t(qt, jnp.bfloat16), preferred_element_type=jnp.float32
                )
            return quant_matmul(x, qt)

        return fn

    for fmt in _FMT_KERNELS:
        _register_kernel(fmt, make(fmt))


register_all()
