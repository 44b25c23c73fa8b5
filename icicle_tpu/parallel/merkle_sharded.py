"""Multi-chip Merkle tree builder: subtree partition + cap merge.

Reference semantics: the CPU backend builds the tree layer by layer with
segment tasks feeding parent layers (backend/cpu/src/hash/
cpu_merkle_tree.cpp:55-80). Its multi-device story is one host thread per
device with NO cross-device tree (docs multi-device.md:47-66); this module is
the new design space the TPU mesh enables:

  * leaves are sharded across devices along the batch axis;
  * every device hashes its OWN subtree bottom-up (pure per-row batched
    hashing — no comms, perfectly balanced because layer hashing is
    embarrassingly parallel across rows);
  * at the "cap" boundary (the first layer whose global row count is no
    longer divisible by the device count) the per-device subtree digests —
    a few KB — are all_gathered once over ICI;
  * the cap layers are finished replicated on every device (identical
    redundant work, zero further comms, every chip ends holding the root).

Comms total = one all_gather of (global_rows_at_cap x digest_words) u32,
so scaling efficiency approaches leaves/D by construction.

Build output is bit-identical to the single-device ops/merkle.py build:
same hashers, same layer order, same padding policy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icicle_tpu.ops.merkle import MerkleTree
from icicle_tpu.parallel.mesh import SHARD_AXIS
from icicle_tpu.runtime.config import MerkleTreeConfig
from icicle_tpu.runtime.errors import IcicleError, check


def _split_layer(tree: MerkleTree, d: int) -> int:
    """First layer index whose output rows stop being shardable over d
    devices: layers [0, split) run per-shard, layers [split, L) replicated."""
    rows = tree.expected_leaves()
    check(rows % d == 0, IcicleError.INVALID_ARGUMENT,
          f"{rows} leaves not divisible by {d} devices")
    split = 0
    for a in tree.arities:
        if rows % (a * d) != 0 or rows // a < d:
            break
        rows //= a
        split += 1
    return split


def merkle_build_sharded(tree: MerkleTree, leaves, mesh: Mesh,
                         cfg: MerkleTreeConfig = MerkleTreeConfig()):
    """Build `tree` from `leaves` sharded over `mesh`; returns the root.

    Populates tree.layers exactly like MerkleTree.build (so get_root /
    get_merkle_proof / verify work unchanged): sub-cap layers stay sharded
    jax arrays, cap layers are replicated.
    """
    d = mesh.devices.size
    x = jnp.asarray(leaves, dtype=jnp.uint32)
    if x.ndim == 1:
        check(x.size % tree.leaf_words == 0, IcicleError.INVALID_ARGUMENT,
              "flat leaves not a multiple of leaf size")
        x = x.reshape(-1, tree.leaf_words)
    want = tree.expected_leaves()
    if x.shape[0] != want:
        check(x.shape[0] <= want, IcicleError.INVALID_ARGUMENT, "too many leaves")
        if cfg.padding_policy == "zero":
            pad = jnp.zeros((want - x.shape[0], tree.leaf_words), jnp.uint32)
        elif cfg.padding_policy == "last_value":
            pad = jnp.broadcast_to(x[-1], (want - x.shape[0], tree.leaf_words))
        else:
            check(False, IcicleError.INVALID_ARGUMENT,
                  f"{x.shape[0]} leaves != {want} and no padding policy")
        x = jnp.concatenate([x, pad], axis=0)

    split = _split_layer(tree, d)
    hashers = tree.hashers
    arities = tree.arities

    def local(xs):                       # xs: (want//d, leaf_words) per shard
        subs = []
        cur = xs
        for i in range(split):
            n_out = cur.shape[0] // arities[i]
            cur = hashers[i].hash_words(
                cur.reshape(n_out, arities[i] * cur.shape[1]))
            subs.append(cur)
        # one ICI gather of the per-device subtree digests
        gathered = jax.lax.all_gather(cur, SHARD_AXIS)          # (d, rows, w)
        cur = gathered.reshape(d * cur.shape[0], cur.shape[1])
        caps = []
        for i in range(split, len(hashers)):
            n_out = cur.shape[0] // arities[i]
            cur = hashers[i].hash_words(
                cur.reshape(n_out, arities[i] * cur.shape[1]))
            caps.append(cur)
        return tuple(subs), tuple(caps)

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(SHARD_AXIS),
                   out_specs=(tuple(P(SHARD_AXIS) for _ in range(split)),
                              tuple(P() for _ in range(len(hashers) - split))),
                   check_vma=False)
    subs, caps = jax.jit(fn)(x)
    tree._nof_leaves = want
    tree.layers = [x, *subs, *caps]
    for j in range(1, tree.min_store_layer + 1):
        if j < len(tree.layers) - 1:
            tree.layers[j] = None
    return tree.get_root()
