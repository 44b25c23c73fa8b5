"""Multi-chip MSM over a jax.sharding.Mesh.

The reference has NO inter-device MSM (its multi-GPU story is one host thread
per device, docs/start/architecture/multi-device.md:47-66); this is new design
space mandated by the scaling targets. Decomposition: shard (scalars, points)
across devices, run the full window/bucket pipeline per shard inside
shard_map, all_gather the per-device *window sums* (a few KB) over ICI, and
tree-combine them on every device — comms are O(W * L * D) bytes, so scaling
efficiency approaches 1 by construction.

Window sums are combined across devices on-device; the final Horner over
windows happens on host (ops/msm_tpu semantics).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group, Projective
from icicle_tpu.curves.host_ec import ec_add, ec_dbl, INF
from icicle_tpu.ops.msm import _auto_c
from icicle_tpu.parallel.mesh import SHARD_AXIS


def _combine_axis0(group, pts: Projective) -> Projective:
    """Tree-combine (D, ...) points along axis 0 (log D add instances)."""
    d = pts.x.shape[0]
    while d > 1:
        half = d // 2
        rest = jax.tree_util.tree_map(lambda a: a[2 * half:], pts)
        pts = group.add(jax.tree_util.tree_map(lambda a: a[:half], pts),
                        jax.tree_util.tree_map(lambda a: a[half:2 * half], pts))
        if rest.x.shape[0]:
            pts = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), pts, rest)
        d = pts.x.shape[0]
    return pts


def _host_horner(fq, n_windows: int, c: int, wsum_x, wsum_y, wsum_z):
    """Montgomery-projective per-window sums -> canonical affine ints."""
    p = fq.modulus
    rinv = pow(1 << (32 * fq.nlimbs), -1, p)

    def limb_int(a) -> int:
        v = 0
        for i, w in enumerate(np.asarray(a, dtype=np.uint32)):
            v |= int(w) << (32 * i)
        return v

    pts = []
    for w in range(n_windows):
        z = limb_int(np.asarray(wsum_z)[w]) * rinv % p
        if z == 0:
            pts.append(INF)
            continue
        zi = pow(z, -1, p)
        pts.append((limb_int(np.asarray(wsum_x)[w]) * rinv % p * zi % p,
                    limb_int(np.asarray(wsum_y)[w]) * rinv % p * zi % p))

    acc = pts[-1]
    for w in range(n_windows - 2, -1, -1):
        for _ in range(c):
            acc = ec_dbl(acc, p)
        acc = ec_add(acc, pts[w], p)
    return acc if acc is not INF else (0, 0)


def msm_sharded3(curve_name: str, scalars, points_x, points_y, mesh: Mesh,
                 c: int | None = None, T: int | None = None,
                 backend: str = "xla", engine: str = "u32",
                 wg: int | None = None, bitsize: int | None = None):
    """Sharded v3 (prefix-scan) MSM: each shard runs the full msm_tpu3
    pipeline (sort -> MXU permute -> Pallas prefix scan -> MXU extraction ->
    window sums), then the (W, 3, L) per-shard window sums — a few KB — are
    all_gathered over ICI and tree-combined on every device. Same
    decomposition as msm_sharded (new design space vs the reference's
    thread-per-device story, multi-device.md:47-66) but over the fast v3
    engine; backend="pallas" on real TPU meshes, "xla" twin on CPU meshes.

    bitsize: known scalar bit bound (reference MSMConfig.bitsize,
    msm.h:23-34); fewer windows when scalars are short — also the lever
    the CI dryrun uses to keep the xla twin's SPMD compile small.
    """
    from icicle_tpu.ops.msm_tpu3 import (_plan3, _prep_fn3, _jitted_pipeline3)

    curve = get_curve(curve_name)
    group = get_group(curve_name)
    fq, fr = curve.fq, curve.fr
    n = scalars.shape[0]
    d = mesh.devices.size
    assert n % d == 0, "global size must divide the mesh"
    shard_n = n // d
    nbits = bitsize or fr.modulus.bit_length()
    c, M, T, tiles, n_windows, wg = _plan3(shard_n, c, nbits, T, wg)
    shard_pad = tiles * T
    nls = scalars.shape[1]

    # host-side per-shard zero-padding (zero scalars/points ride the
    # never-extracted tail of each tile, exactly as in single-chip msm_tpu3)
    def pad_shards(a, width):
        arr = np.asarray(a).reshape(d, shard_n, width)
        out = np.zeros((d, shard_pad, width), dtype=np.uint32)
        out[:, :shard_n] = arr
        # limb-major global layout: (width, d*shard_pad), contiguous blocks
        return np.ascontiguousarray(
            out.reshape(d * shard_pad, width).T)

    # scalars stay row-major (rows, Ls): the pipeline transposes on device
    scal_r = np.zeros((d * shard_pad, nls), dtype=np.uint32)
    scal_r.reshape(d, shard_pad, nls)[:, :shard_n] = \
        np.asarray(scalars).reshape(d, shard_n, nls)
    px_t = pad_shards(points_x, fq.nlimbs)
    py_t = pad_shards(points_y, fq.nlimbs)

    prep = _prep_fn3(curve_name, shard_pad, tiles, T, engine)
    run = _jitted_pipeline3(curve_name, c, nbits, shard_pad, T, tiles, wg,
                            backend, engine, 1, shard_pad)

    def local(st, pxt, pyt):
        wsum = run(st, prep(pxt, pyt))                    # (W, 3, L)
        gathered = jax.lax.all_gather(wsum, SHARD_AXIS)   # (D, W, 3, L)
        pts = Projective(gathered[..., 0, :], gathered[..., 1, :],
                         gathered[..., 2, :])
        comb = _combine_axis0(group, pts)                 # (1, W, L) x3
        return jnp.stack([comb.x, comb.y, comb.z], axis=-2)  # (1, W, 3, L)

    spec = P(None, SHARD_AXIS)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(SHARD_AXIS, None), spec, spec),
                   out_specs=P(),
                   check_vma=False)  # same rationale as msm_sharded below
    wsums = np.asarray(jax.jit(fn)(scal_r, px_t, py_t))[0]  # (W, 3, L)
    return _host_horner(fq, n_windows, c, wsums[:, 0], wsums[:, 1],
                        wsums[:, 2])


def msm_sharded(curve_name: str, scalars, points_x, points_y, mesh: Mesh,
                c: int | None = None, backend: str = "xla",
                lanes: int | None = None):
    """Sharded MSM. Inputs are canonical global arrays (N divisible by mesh
    size); returns canonical affine (x, y) python ints."""
    from icicle_tpu.ops.msm_tpu import _jitted_pipeline, _plan

    curve = get_curve(curve_name)
    group = get_group(curve_name)
    fq, fr = curve.fq, curve.fr
    n = scalars.shape[0]
    d = mesh.devices.size
    assert n % d == 0
    shard_n = n // d
    nbits = fr.modulus.bit_length()
    lanes = lanes or min(1024, max(8, shard_n // 8))
    c, n_windows, k_steps, lanes = _plan(shard_n, c, nbits, lanes)

    pipeline = _jitted_pipeline(curve_name, c, nbits, shard_n, lanes, backend, None)

    def local(scal, px, py):
        wsum = pipeline(scal, fq.to_mont(px), fq.to_mont(py))  # (W, L) x3
        # gather every device's window sums and combine: result replicated
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, SHARD_AXIS), wsum)  # (D, W, L)
        return _combine_axis0(group, gathered)

    spec = P(SHARD_AXIS)
    # check_vma off: scan carries inside the per-shard pipeline mix shard-
    # varying data with unvarying twiddle/constant tables
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec),
                   out_specs=Projective(P(), P(), P()),
                   check_vma=False)
    wsum = jax.jit(fn)(scalars, points_x, points_y)
    wsum = jax.tree_util.tree_map(lambda a: a[0], wsum)  # drop combine axis
    return _host_horner(fq, n_windows, c, wsum.x, wsum.y, wsum.z)
