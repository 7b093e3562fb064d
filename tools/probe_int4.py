#!/usr/bin/env python
"""Probe: does Mosaic support int4 input refs + astype in a Pallas kernel on
this TPU? Determines the round-2 quant_matmul redesign (int4-native payload
instead of the f32 nibble-extraction chain)."""
import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_traceback_in_locations_limit", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    # 1. host->device int4 array
    rng = np.random.default_rng(0)
    vals = rng.integers(-8, 8, size=(512, 256), dtype=np.int8)
    try:
        x4 = jnp.asarray(vals, dtype=jnp.int4)
        print("int4 device array OK:", x4.shape, x4.dtype)
    except Exception as e:
        print("int4 device array FAIL:", e)
        return

    # 2. XLA astype
    try:
        back = np.asarray(x4.astype(jnp.int8))
        assert (back == vals).all()
        print("XLA int4->int8 roundtrip OK")
    except Exception as e:
        print("XLA astype FAIL:", e)

    # 3. Pallas kernel: int4 ref -> bf16 -> scale-mul -> dot
    def kernel(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16)
        G = s_ref.shape[0]
        bk, bn = w.shape
        sc = s_ref[...]
        sc16 = jnp.broadcast_to(sc[:, None, :], (G, bk // G, bn)).reshape(bk, bn)
        wf = w * sc16.astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], wf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    M, K, N = 8, 512, 256
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w4 = jnp.asarray(vals, dtype=jnp.int4)  # [K, N]
    sc = jnp.asarray(rng.standard_normal((K // 32, N)).astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w4, sc)
        out = np.asarray(out)
        # reference
        sc16 = np.repeat(np.asarray(sc), 32, axis=0)
        wf = (vals.astype(np.float32) * sc16).astype(np.float32)
        ref = np.asarray(x, np.float32) @ wf
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"Pallas int4 kernel OK, rel err {err:.2e}")
    except Exception as e:
        print("Pallas int4 kernel FAIL:", repr(e)[:500])

    # 4. Pallas int4 with grid/BlockSpec tiling (the shape we actually need)
    def kernel2(x_ref, w_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        w = w_ref[...].astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    K2, N2, bk, bn = 2048, 512, 512, 256
    vals2 = rng.integers(-8, 8, size=(K2, N2), dtype=np.int8)
    w42 = jnp.asarray(vals2, dtype=jnp.int4)
    x2 = jnp.asarray(rng.standard_normal((M, K2)), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel2,
            grid=(1, N2 // bn, K2 // bk),
            in_specs=[
                pl.BlockSpec((M, bk), lambda m, n, k: (m, k)),
                pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x2, w42)
        ref = np.asarray(x2, np.float32) @ vals2.astype(np.float32)
        err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"Pallas tiled int4 OK, rel err {err:.2e}")
    except Exception as e:
        print("Pallas tiled int4 FAIL:", repr(e)[:500])

    # 5. int4 x int8 MXU dot in integer domain?
    def kernel3(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    xi8 = jnp.asarray(rng.integers(-100, 100, size=(M, K)), jnp.int8)
    try:
        out = pl.pallas_call(
            kernel3,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xi8, w4)
        ref = np.asarray(xi8, np.int32) @ vals.astype(np.int32)
        ok = (np.asarray(out) == ref).all()
        print(f"Pallas int8 x int4 -> int32 dot: {'OK' if ok else 'WRONG'}")
    except Exception as e:
        print("Pallas int8 x int4 dot FAIL:", repr(e)[:300])


if __name__ == "__main__":
    main()
