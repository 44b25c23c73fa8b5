"""Two-level (DCN hosts x ICI chips) sharding: multi-host layouts.

The reference has no inter-device story at all (multi-device.md:47-66:
one host thread per GPU); single-level sharding (ntt_sharded/msm_sharded)
covers one ICI-connected slice. This module adds the multi-host tier the
scaling targets demand (BASELINE: >=80% scaling to 4 hosts): a 2-axis mesh
("dcn" outer, "ici" inner) with hierarchy-aware collectives that keep the
slow DCN hops to per-host aggregates.

  * MSM: each chip runs the full v3 prefix-scan pipeline on its shard; the
    (W, 3, L) window sums are all_gathered WITHIN each host over ICI and
    tree-combined to one per-host partial, and only those per-host partials
    — hosts x W x 3 x L, a few KB — cross DCN. DCN bytes are 1/chips of the
    naive all-device gather.
  * Merkle: per-chip subtrees -> ICI gather + host-cap -> per-host digests
    cross DCN -> global cap replicated everywhere. DCN carries hosts x
    digest bytes.
  * NTT: four-step transpose over the flattened ("dcn", "ici") axis pair —
    the collective is inherently global, but the dcn-major layout means
    rows that stay within a host move over ICI only; 1/hosts of the data
    crosses DCN (the unavoidable minimum for a global transpose).

Validated on virtual CPU meshes (tests/test_two_level.py, 2x4 layout) —
real DCN hardware is not required for layout/collective correctness.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group, Projective
from icicle_tpu.fields.field import Field
from icicle_tpu.ops.merkle import MerkleTree
from icicle_tpu.runtime.config import NTTDir, MerkleTreeConfig
from icicle_tpu.runtime.errors import IcicleError, check

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def make_mesh2(hosts: int, chips: int) -> Mesh:
    """(hosts, chips) mesh: outer axis = DCN (slow), inner = ICI (fast).
    On real multi-host topologies jax.devices() orders devices host-major,
    so the reshape puts each host's chips on one DCN row."""
    devs = np.array(jax.devices()[:hosts * chips]).reshape(hosts, chips)
    return Mesh(devs, (DCN_AXIS, ICI_AXIS))


def _combine_axis0(group, pts: Projective) -> Projective:
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


def msm_sharded3_2level(curve_name: str, scalars, points_x, points_y,
                        mesh: Mesh, c: int | None = None,
                        T: int | None = None, backend: str = "xla",
                        engine: str = "u32", wg: int | None = None):
    """Hierarchical v3 MSM over a (dcn, ici) mesh.

    Same per-shard pipeline as parallel.msm_sharded.msm_sharded3; the
    combine is two-tier: ICI all_gather + tree-combine per host, then a DCN
    all_gather of the per-host partials only."""
    from icicle_tpu.ops.msm_tpu3 import _plan3, _prep_fn3, _jitted_pipeline3
    from icicle_tpu.parallel.msm_sharded import _host_horner

    curve = get_curve(curve_name)
    group = get_group(curve_name)
    fq, fr = curve.fq, curve.fr
    n = scalars.shape[0]
    hosts = mesh.shape[DCN_AXIS]
    chips = mesh.shape[ICI_AXIS]
    d = hosts * chips
    check(n % d == 0, IcicleError.INVALID_ARGUMENT,
          "global size must divide the mesh")
    shard_n = n // d
    nbits = fr.modulus.bit_length()
    c, M, T, tiles, n_windows, wg = _plan3(shard_n, c, nbits, T, wg)
    shard_pad = tiles * T
    nl = fq.nlimbs

    def pad_shards(a, width):
        arr = np.asarray(a).reshape(d, shard_n, width)
        out = np.zeros((d, shard_pad, width), dtype=np.uint32)
        out[:, :shard_n] = arr
        return np.ascontiguousarray(out.reshape(d * shard_pad, width).T)

    # scalars stay row-major (rows, Ls): the pipeline transposes on device
    nls = scalars.shape[1]
    scal_r = np.zeros((d * shard_pad, nls), dtype=np.uint32)
    scal_r.reshape(d, shard_pad, nls)[:, :shard_n] = \
        np.asarray(scalars).reshape(d, shard_n, nls)
    px_t = pad_shards(points_x, nl)
    py_t = pad_shards(points_y, nl)

    prep = _prep_fn3(curve_name, shard_pad, tiles, T, engine)
    run = _jitted_pipeline3(curve_name, c, nbits, shard_pad, T, tiles, wg,
                            backend, engine, 1, shard_pad)

    def local(st, pxt, pyt):
        wsum = run(st, prep(pxt, pyt))                      # (W, 3, L)
        # tier 1: ICI — gather this host's chips, combine to one partial
        g_ici = jax.lax.all_gather(wsum, ICI_AXIS)          # (chips, W, 3, L)
        part = _combine_axis0(group, Projective(
            g_ici[..., 0, :], g_ici[..., 1, :], g_ici[..., 2, :]))
        part = jnp.stack([part.x, part.y, part.z], axis=-2)  # (1, W, 3, L)
        # tier 2: DCN — only per-host partials cross hosts
        g_dcn = jax.lax.all_gather(part[0], DCN_AXIS)       # (hosts, W, 3, L)
        tot = _combine_axis0(group, Projective(
            g_dcn[..., 0, :], g_dcn[..., 1, :], g_dcn[..., 2, :]))
        return jnp.stack([tot.x, tot.y, tot.z], axis=-2)    # (1, W, 3, L)

    spec = P(None, (DCN_AXIS, ICI_AXIS))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P((DCN_AXIS, ICI_AXIS), None), spec, spec),
                   out_specs=P(), check_vma=False)
    wsums = np.asarray(jax.jit(fn)(scal_r, px_t, py_t))[0]
    return _host_horner(fq, n_windows, c, wsums[:, 0], wsums[:, 1],
                        wsums[:, 2])


def ntt_sharded_2level(f: Field, x, mesh: Mesh,
                       dir: NTTDir = NTTDir.FORWARD, normalize: bool = True):
    """Four-step NTT over the flattened (dcn, ici) device axis.

    Identical math to parallel.ntt_sharded over hosts*chips devices; the
    transpose all_to_all runs over the axis PAIR, dcn-major, so intra-host
    blocks ride ICI and only the inter-host fraction crosses DCN."""
    from icicle_tpu.parallel.ntt_sharded import _local_ntt, _twiddle_matrix

    hosts = mesh.shape[DCN_AXIS]
    chips = mesh.shape[ICI_AXIS]
    d = hosts * chips
    n = x.shape[0]
    logn = n.bit_length() - 1
    assert (1 << logn) == n
    log_n1 = logn // 2
    n1, n2 = 1 << log_n1, 1 << (logn - log_n1)
    assert n1 % d == 0 and n2 % d == 0

    lim = f.limb_shape
    nl = len(lim)
    tw = _twiddle_matrix(f, n1, n2, dir)
    # pre-warm local domains outside shard_map (see ntt_sharded + ops/ntt.py
    # _mesh_tainted: tables built under a manual mesh can't be cached)
    from icicle_tpu.ops import ntt as ntt_mod
    ntt_mod.get_domain(f, log_n1)
    ntt_mod.get_domain(f, logn - log_n1)
    both = (DCN_AXIS, ICI_AXIS)
    col_spec = P(*((None, both) + (None,) * nl))
    row_spec = P(*((both, None) + (None,) * nl))
    xm = jax.device_put(x.reshape((n1, n2) + lim), NamedSharding(mesh, col_spec))
    twm = jax.device_put(tw, NamedSharding(mesh, col_spec))

    def step(local, tw_local):
        y = _local_ntt(f, local, axis=0, dir=dir)
        y = f.mul_mont(y, tw_local)
        y = jax.lax.all_to_all(y, both, split_axis=0, concat_axis=1,
                               tiled=True)
        return _local_ntt(f, y, axis=1, dir=dir)

    fn = shard_map(step, mesh=mesh, in_specs=(col_spec, col_spec),
                   out_specs=row_spec)
    y = fn(xm, twm)
    if not normalize:
        return y
    yt = jnp.swapaxes(y, 0, 1)
    yt = jax.lax.with_sharding_constraint(yt, NamedSharding(mesh, row_spec))
    return yt.reshape((n,) + lim)


def merkle_build_sharded_2level(tree: MerkleTree, leaves, mesh: Mesh,
                                cfg: MerkleTreeConfig = MerkleTreeConfig()):
    """Hierarchical Merkle build over a (dcn, ici) mesh.

    Per-chip subtrees, an ICI gather closing each host's section, then one
    DCN gather of per-host digests for the global cap (replicated). Layer
    contents match the single-device builder bit-for-bit."""
    from icicle_tpu.parallel.merkle_sharded import _split_layer

    hosts = mesh.shape[DCN_AXIS]
    chips = mesh.shape[ICI_AXIS]
    d = hosts * chips
    x = jnp.asarray(leaves, dtype=jnp.uint32)
    if x.ndim == 1:
        check(x.size % tree.leaf_words == 0, IcicleError.INVALID_ARGUMENT,
              "flat leaves not a multiple of leaf size")
        x = x.reshape(-1, tree.leaf_words)
    want = tree.expected_leaves()
    check(x.shape[0] == want, IcicleError.INVALID_ARGUMENT,
          "2-level builder requires exact leaf count")

    # chip boundary: shardable over all d devices; host boundary: over hosts
    split_chip = _split_layer(tree, d)
    split_host = _split_layer(tree, hosts)
    hashers, arities = tree.hashers, tree.arities

    def local(xs):
        subs, cur = [], xs
        for i in range(split_chip):
            n_out = cur.shape[0] // arities[i]
            cur = hashers[i].hash_words(
                cur.reshape(n_out, arities[i] * cur.shape[1]))
            subs.append(cur)
        # tier 1: close each host's section over ICI
        g = jax.lax.all_gather(cur, ICI_AXIS)
        cur = g.reshape(chips * cur.shape[0], cur.shape[1])
        mids = []
        for i in range(split_chip, split_host):
            n_out = cur.shape[0] // arities[i]
            cur = hashers[i].hash_words(
                cur.reshape(n_out, arities[i] * cur.shape[1]))
            mids.append(cur)
        # tier 2: per-host digests cross DCN once
        g = jax.lax.all_gather(cur, DCN_AXIS)
        cur = g.reshape(hosts * cur.shape[0], cur.shape[1])
        caps = []
        for i in range(split_host, len(hashers)):
            n_out = cur.shape[0] // arities[i]
            cur = hashers[i].hash_words(
                cur.reshape(n_out, arities[i] * cur.shape[1]))
            caps.append(cur)
        return tuple(subs), tuple(mids), tuple(caps)

    both = (DCN_AXIS, ICI_AXIS)
    fn = shard_map(
        local, mesh=mesh, in_specs=P(both),
        out_specs=(tuple(P(both) for _ in range(split_chip)),
                   tuple(P(DCN_AXIS) for _ in range(split_host - split_chip)),
                   tuple(P() for _ in range(len(hashers) - split_host))),
        check_vma=False)
    subs, mids, caps = jax.jit(fn)(x)
    tree._nof_leaves = want
    tree.layers = [x, *subs, *mids, *caps]
    for j in range(1, tree.min_store_layer + 1):
        if j < len(tree.layers) - 1:
            tree.layers[j] = None
    return tree.get_root()
