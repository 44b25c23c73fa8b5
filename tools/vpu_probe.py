"""VPU microbenchmarks that decide MSM kernel design parameters.

Measures, inside Pallas kernels shaped like the MSM prefix-scan
(G-lane u32 vectors, K grid steps):

  1. u32 multiply vs u32 add throughput  -> montmul radix choice
     (16-bit split-products minimize muls; 12-bit raw-column
     accumulation minimizes total ops but issues ~2x the muls)
  2. current 16-bit montmul rate (lane-montmuls/s)
  3. the full madd slot rate (13 montmuls + adds)

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/vpu_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 1024
K = 4096


def _bench(call, x, label, ops_per_step, iters=20):
    y = jax.block_until_ready(call(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = call(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    total = ops_per_step * K
    print(f"{label}: {dt*1e3:.2f} ms, {total/dt/1e9:.2f} G lane-units/s "
          f"({total*G/dt/1e12:.2f} T scalar-units/s)")
    return total / dt


def make_oploop(op, n_ops):
    """Kernel: per grid step, n_ops dependent-ish u32 ops on (8, G) vregs."""

    def kernel(x_ref, o_ref, acc):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc[...] = x_ref[...]

        a = acc[...]
        b = x_ref[...]
        # 4 independent chains to hide latency
        c0, c1, c2, c3 = a, b, a + b, a ^ b
        for i in range(n_ops // 4):
            if op == "mul":
                c0 = c0 * b
                c1 = c1 * a
                c2 = c2 * b
                c3 = c3 * a
            elif op == "add":
                c0 = c0 + b
                c1 = c1 + a
                c2 = c2 + b
                c3 = c3 + a
            elif op == "mixed":  # 1 mul : 2 add, the radix-12 montmul mix
                if i % 3 == 0:
                    c0 = c0 * b
                    c1 = c1 * a
                    c2 = c2 * b
                    c3 = c3 * a
                else:
                    c0 = c0 + b
                    c1 = c1 + a
                    c2 = c2 + b
                    c3 = c3 + a
        acc[...] = c0 + c1 + c2 + c3
        o_ref[...] = acc[...]

    call = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[pl.BlockSpec((8, G), lambda k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, G), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, G), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((8, G), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return call


def make_montloop(curve_name, n_mm):
    """Kernel: per grid step, n_mm dependent montmuls on G-lane values."""
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.math.bigint import _split16
    from icicle_tpu.pallas.msm_kernel import _ListField

    eng = get_curve(curve_name).fq.engine
    f = _ListField(eng)
    nl = eng.nlimbs

    def kernel(x_ref, o_ref, acc):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc[...] = x_ref[...]

        a = [acc[i, :] for i in range(nl)]
        b = [x_ref[i, :] for i in range(nl)]
        for _ in range(n_mm):
            a = f.mul_mont(a, b)
        for i in range(nl):
            acc[i, :] = a[i]
        o_ref[...] = acc[...]

    call = pl.pallas_call(
        kernel,
        grid=(K // 8,),
        in_specs=[pl.BlockSpec((nl, G), lambda k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nl, G), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, G), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl, G), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return call, nl


def make_montloop_r12(curve_name, n_mm):
    """Kernel: per grid step, n_mm dependent radix-12 montmuls (lazy-1 x
    norm operand mix, as in the mixed-add) on G-lane values."""
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.math.radix12 import Radix12
    from icicle_tpu.pallas.msm_scan_r12 import _R12Field, _BVal

    eng = Radix12(get_curve(curve_name).fq.modulus)
    f = _R12Field(eng)
    nw = eng.nw
    nl = get_curve(curve_name).fq.nlimbs

    def kernel(x_ref, o_ref, acc):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            for i in range(nw):
                acc[i, :] = x_ref[i, :]

        a = _BVal([acc[i, :] for i in range(nw)], 2 * f.NORM)
        b = _BVal([x_ref[i, :] for i in range(nw)], f.NORM)
        for _ in range(n_mm):
            a = f.mul(a, b)
        for i in range(nw):
            acc[i, :] = a.w[i]
            o_ref[i, :] = a.w[i]

    call = pl.pallas_call(
        kernel,
        grid=(K // 8,),
        in_specs=[pl.BlockSpec((nw, G), lambda k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nw, G), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, G), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nw, G), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return call, nw


def main():
    print("devices:", jax.devices())
    x = jnp.asarray(
        np.random.default_rng(0).integers(1, 2**31, (8, G)).astype(np.uint32))

    n_ops = 512
    for op in ("add", "mul", "mixed"):
        _bench(make_oploop(op, n_ops), x, f"u32 {op} x{n_ops}", n_ops)

    for curve in ("bn254",):
        n_mm = 4
        call, nl = make_montloop(curve, n_mm)
        xm = jnp.asarray(np.random.default_rng(1).integers(
            1, 2**31, (nl, G)).astype(np.uint32))
        y = jax.block_until_ready(call(xm))
        t0 = time.perf_counter()
        for _ in range(10):
            y = call(xm)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 10
        mm = n_mm * (K // 8) * G
        print(f"{curve} montmul16: {dt*1e3:.2f} ms, "
              f"{mm/dt/1e9:.3f} G lane-montmuls/s")

        call12, nw = make_montloop_r12(curve, n_mm)
        x12 = jnp.asarray(np.random.default_rng(2).integers(
            0, 1 << 12, (nw, G)).astype(np.int32))
        y = jax.block_until_ready(call12(x12))
        t0 = time.perf_counter()
        for _ in range(10):
            y = call12(x12)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 10
        print(f"{curve} montmul12: {dt*1e3:.2f} ms, "
              f"{mm/dt/1e9:.3f} G lane-montmuls/s")


if __name__ == "__main__":
    main()
