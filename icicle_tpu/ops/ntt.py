"""Number-theoretic transform (reference F3: include/icicle/ntt.h + CPU
backend ntt_cpu.h / cpu_ntt_domain.h).

TPU-native design:
  * Domain = per-(field, logn) cache of stage twiddles **in Montgomery form**
    (one REDC per butterfly multiply), built on-device by repeated doubling —
    the analog of CpuNttDomain's precomputed tables (cpu_ntt_domain.h).
  * "xla" backend: radix-2 Cooley–Tukey decimation-in-time over bit-reversed
    input, written as reshape/slice/concat stages — compiler-friendly, no
    gathers inside the stage loop. This is the bit-exactness reference.
  * "pallas" backend (icicle_tpu.pallas.ntt_kernel): fused VMEM-resident stage
    groups in the four-step (transpose) decomposition, mirroring the role of
    the reference's hierarchical layers_sub_logn blocking (ntt_data.h:8-60).

Orderings follow ntt.h Ordering: N = natural, R = bit-reversed, M =
digit-reversed w.r.t. the four-step radix split (kNM/kMN are what the
reference's fast mixed-radix path emits; our M digit pair is (n1, n2) of the
four-step decomposition).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field, get_field
from icicle_tpu.runtime.config import NTTConfig, NTTDir, Ordering
from icicle_tpu.runtime import dispatcher
from icicle_tpu.ops.vec_ops import bit_reverse_indices

_DEFAULT = NTTConfig()


# ---------------------------------------------------------------------------
# Twiddle domain
# ---------------------------------------------------------------------------

class NttDomain:
    """Cached twiddle tables for one (field, logn): w^0..w^(n/2-1) (Montgomery
    form) for forward and inverse, plus n^-1. Reference: CpuNttDomain singleton
    (backend/cpu/include/cpu_ntt_domain.h)."""

    def __init__(self, f: Field, logn: int):
        self.field = f
        self.logn = logn
        w = f.params.omega(logn)
        w_inv = pow(w, -1, f.modulus)
        self.w_int = w
        self.w_inv_int = w_inv
        self.n_inv_int = pow(1 << logn, -1, f.modulus)
        self.twiddles = _powers_mont(f, w, 1 << max(logn - 1, 0))
        self.twiddles_inv = _powers_mont(f, w_inv, 1 << max(logn - 1, 0))
        self.n_inv_mont = f.to_mont(f.from_ints(self.n_inv_int))


def _powers_mont(f: Field, base: int, count: int):
    """[base^0, ..., base^(count-1)] in Montgomery form, built by doubling:
    log2(count) vectorized multiplies on device."""
    out = f.to_mont(f.from_ints([1]))
    cur_pow = f.to_mont(f.from_ints([base]))  # base^len(out) in mont form
    while out.shape[0] < count:
        # mul_mont(xR, yR) = xyR: mont form is closed under mul_mont
        ext = f.mul_mont(out, cur_pow)
        out = jnp.concatenate([out, ext], axis=0)
        cur_pow = f.mul_mont(cur_pow, cur_pow)
    return out[:count]


_domains: dict[tuple[str, int], NttDomain] = {}


def _mesh_tainted(x) -> bool:
    """True if x was materialized inside a manual-mesh (shard_map) trace.

    ensure_compile_time_eval inside shard_map yields a CONCRETE array whose
    aval still carries the Manual AbstractMesh; caching it would pin that
    mesh and break reuse under any other mesh (jax raises "context mesh
    should match the aval mesh" at the next gather/slice). Such arrays are
    correct within their own trace — they just must not enter cross-mesh
    caches."""
    try:
        mesh = x.aval.sharding.mesh
        if mesh.empty:
            return False
        # Only MANUAL meshes taint: auto meshes (use_mesh contexts) yield
        # normally-reusable arrays, and treating them as tainted would
        # silently rebuild the domain on every call (advisor r4).
        from jax.sharding import AxisType
        return any(t == AxisType.Manual
                   for t in getattr(mesh, "axis_types", ()))
    except (AttributeError, ImportError):
        return False


def ntt_init_domain(f: Field, logn: int) -> NttDomain:
    """Build/refresh the domain cache up to size 2^logn (reference
    ntt_init_domain, src/ntt.cpp:24-36)."""
    key = (f.name, logn)
    if key not in _domains:
        # domains are cached across calls: force eager (compile-time) eval so
        # tables built inside a jit trace don't become leaked tracers
        with jax.ensure_compile_time_eval():
            dom = NttDomain(f, logn)
        if _mesh_tainted(dom.twiddles):
            return dom  # usable in this trace only; keep the cache clean
        _domains[key] = dom
    return _domains[key]


def ntt_release_domain(f: Field) -> None:
    for key in [k for k in _domains if k[0] == f.name]:
        del _domains[key]


def get_root_of_unity(f: Field, max_size: int) -> int:
    """Smallest-order omega covering max_size (reference get_root_of_unity)."""
    logn = (max_size - 1).bit_length()
    return f.params.omega(logn)


def get_domain(f: Field, logn: int) -> NttDomain:
    key = (f.name, logn)
    if key in _domains:
        return _domains[key]
    # find a larger cached domain and subsample it
    for (name, cached_logn), dom in list(_domains.items()):
        if name == f.name and cached_logn > logn:
            stride = 1 << (cached_logn - logn)
            sub = NttDomain.__new__(NttDomain)
            sub.field = f
            sub.logn = logn
            sub.w_int = pow(dom.w_int, stride, f.modulus)
            sub.w_inv_int = pow(dom.w_inv_int, stride, f.modulus)
            sub.n_inv_int = pow(1 << logn, -1, f.modulus)
            with jax.ensure_compile_time_eval():
                sub.twiddles = dom.twiddles[::stride][: 1 << max(logn - 1, 0)]
                sub.twiddles_inv = dom.twiddles_inv[::stride][: 1 << max(logn - 1, 0)]
                sub.n_inv_mont = f.to_mont(f.from_ints(sub.n_inv_int))
            if not _mesh_tainted(sub.twiddles):
                _domains[(f.name, logn)] = sub
            return sub
    return ntt_init_domain(f, logn)


# ---------------------------------------------------------------------------
# XLA radix-2 backend
# ---------------------------------------------------------------------------

def _vec_axis(f: Field, x) -> int:
    return x.ndim - 1 - len(f.limb_shape)


def _take_vec(f: Field, x, idx):
    return jnp.take(x, idx, axis=_vec_axis(f, x))


def _ct_stages(f: Field, x, twiddles, logn: int):
    """DIT butterflies over bit-reversed input -> natural output.

    Stage s merges blocks of size m=2^s; twiddle for j in [0,m) is
    w^(j * n/(2m)), a stride-sliced view of the master table.
    """
    n = 1 << logn
    lim = f.limb_shape
    batch = x.shape[: x.ndim - 1 - len(lim)]
    for s in range(logn):
        m = 1 << s
        stride = n // (2 * m)
        tw = twiddles[::stride][:m]  # (m,) + lim, Montgomery form
        xr = x.reshape(batch + (n // (2 * m), 2, m) + lim)
        even = xr[..., 0, :, :] if lim else xr[..., 0, :]
        odd = xr[..., 1, :, :] if lim else xr[..., 1, :]
        t = f.mul_mont(odd, tw)  # canonical * mont-constant -> canonical
        x = jnp.concatenate([f.add(even, t), f.sub(even, t)], axis=len(batch) + 1)
        x = x.reshape(batch + (n,) + lim)
    return x


def _ct_stages_vecfirst(f: Field, x, twiddles, logn: int):
    """DIT butterflies with the vector axis FIRST: x is (n, batch...)+lim.

    The batch sits in the minor dims, so every butterfly op runs with full
    128-lane tiles regardless of the stage's block size m — the layout that
    makes large NTTs HBM-bound instead of lane-starved.
    """
    n = 1 << logn
    lim = f.limb_shape
    rest = x.shape[1:]
    for s in range(logn):
        m = 1 << s
        stride = n // (2 * m)
        tw = twiddles[::stride][:m]                      # (m,)+lim
        # broadcast twiddles over block axis (0) and batch dims
        tw = tw.reshape((1, m) + (1,) * (len(rest) - len(lim)) + lim)
        xr = x.reshape((n // (2 * m), 2, m) + rest)
        even = xr[:, 0]
        odd = xr[:, 1]
        t = f.mul_mont(odd, tw)
        x = jnp.stack([f.add(even, t), f.sub(even, t)], axis=1)
        x = x.reshape((n,) + rest)
    return x


def _ntt_vecfirst(f: Field, x, dir: NTTDir, logn: int):
    """Full natural->natural NTT along axis 0 of (n, batch...)+lim, including
    the bit-reversal row gather and inverse 1/n scaling."""
    dom = get_domain(f, logn)
    rev = jnp.asarray(bit_reverse_indices(1 << logn))
    x = jnp.take(x, rev, axis=0)
    tw = dom.twiddles if dir == NTTDir.FORWARD else dom.twiddles_inv
    y = _ct_stages_vecfirst(f, x, tw, logn)
    if dir == NTTDir.INVERSE:
        y = f.mul_mont(y, dom.n_inv_mont)
    return y


_FOUR_STEP_MIN_LOGN = 16


def _ntt_four_step(f: Field, x, dir: NTTDir, logn: int, tw=None):
    """Single-chip four-step NTT for large vectors: n = n1*n2 viewed as an
    (n1, n2) matrix — column NTTs, w^(k1*j2) twiddles, one transpose, row
    NTTs. Both passes run vector-major with >= 2^(logn/2) lanes of batch
    (the single-chip analog of parallel/ntt_sharded.py; reference hierarchy-1
    split, backend/cpu/include/ntt_cpu.h:79-100).

    `tw` is the (n1, n2) twiddle matrix; jitted callers MUST pass it as a
    runtime argument (as a closure constant it gets serialized into the HLO —
    256MB at 2^26 — which remote compilers reject)."""
    from icicle_tpu.parallel import ntt_sharded as _ns
    lim = f.limb_shape
    log_n1 = logn // 2
    n1, n2 = 1 << log_n1, 1 << (logn - log_n1)
    if tw is None:
        tw = _ns._twiddle_matrix(f, n1, n2, dir)         # (n1, n2)+lim
    xm = x.reshape((n1, n2) + lim)
    y = _ntt_vecfirst(f, xm, dir, log_n1)                # columns (axis 0)
    y = f.mul_mont(y, tw)
    y = jnp.swapaxes(y, 0, 1)                            # (n2, n1)+lim
    y = _ntt_vecfirst(f, y, dir, logn - log_n1)          # rows (now axis 0)
    # y[k2, k1] = X[k1 + n1*k2] -> flat natural order
    return y.reshape((1 << logn,) + lim)


def digit_reverse_indices(logn: int) -> np.ndarray:
    """The kNM/kMN "mixed" digit permutation (reference ntt.h Ordering
    kNM/kMN; ntt.h:32-43). The M order is backend-defined in the reference
    (each backend's radix hierarchy); ours is the four-step (n1, n2) digit
    pair with n1 = 2^(logn//2):

        vM[k1*n2 + k2] = v[k1 + n1*k2]

    Returns idx with vM = take(v, idx)."""
    log_n1 = logn // 2
    n1, n2 = 1 << log_n1, 1 << (logn - log_n1)
    p = np.arange(n1 * n2)
    return (p // n2 + n1 * (p % n2)).astype(np.int32)


def digit_reverse_indices_inv(logn: int) -> np.ndarray:
    """Inverse of digit_reverse_indices: v = take(vM, idx)."""
    log_n1 = logn // 2
    n1 = 1 << log_n1
    q = np.arange(1 << logn)
    return ((q % n1) * (1 << (logn - log_n1)) + q // n1).astype(np.int32)


def _ntt_xla(f: Field, x, dir: NTTDir, cfg: NTTConfig, fs_tw=None):
    axis = _vec_axis(f, x)
    n = x.shape[axis]
    logn = n.bit_length() - 1
    assert 1 << logn == n, "NTT size must be a power of two"
    dom = get_domain(f, logn)

    # move vector axis to the canonical position (just before limbs)
    rev = jnp.asarray(bit_reverse_indices(n))

    input_rev = cfg.ordering in (Ordering.RN, Ordering.RR)
    output_rev = cfg.ordering in (Ordering.NR, Ordering.RR)

    if cfg.ordering is Ordering.MN:
        # digit-reversed input -> natural, then proceed as NN
        x = _take_vec(f, x, jnp.asarray(digit_reverse_indices_inv(logn)))

    if dir == NTTDir.FORWARD and cfg.coset_gen is not None:
        shifts = _powers_mont(f, cfg.coset_gen, n)
        if input_rev:  # input arrives bit-reversed: permute the shift table
            shifts = jnp.take(shifts, rev, axis=0)
        x = f.mul_mont(x, shifts)

    # Core transform: pick a layout by shape. Natural input + large n with no
    # batch -> four-step; batched -> vector-major; else classic DIT.
    lim = f.limb_shape
    batch_dims = x.shape[:_vec_axis(f, x)]
    bsz = int(np.prod(batch_dims)) if batch_dims else 1
    scaled = False
    if not input_rev and bsz == 1 and logn >= _FOUR_STEP_MIN_LOGN:
        flat = x.reshape((n,) + lim)
        y = _ntt_four_step(f, flat, dir, logn, tw=fs_tw).reshape(x.shape)
        scaled = True
    elif not input_rev and bsz >= 64:
        xv = jnp.moveaxis(x, _vec_axis(f, x), 0)
        yv = _ntt_vecfirst(f, xv, dir, logn)
        y = jnp.moveaxis(yv, 0, _vec_axis(f, x))
        scaled = True
    else:
        if not input_rev:
            x = _take_vec(f, x, rev)
        tw = dom.twiddles if dir == NTTDir.FORWARD else dom.twiddles_inv
        y = _ct_stages(f, x, tw, logn)
    # y is natural-ordered now
    if dir == NTTDir.INVERSE:
        if not scaled:
            y = f.mul_mont(y, dom.n_inv_mont)
        if cfg.coset_gen is not None:
            inv_gen = pow(cfg.coset_gen, -1, f.modulus)
            shifts = _powers_mont(f, inv_gen, n)
            y = f.mul_mont(y, shifts)
    if output_rev:
        y = _take_vec(f, y, rev)
    if cfg.ordering is Ordering.NM:
        y = _take_vec(f, y, jnp.asarray(digit_reverse_indices(logn)))
    return y


dispatcher.register_impl("ntt", "xla", _ntt_xla)


def _ntt_pallas(f: Field, x, dir: NTTDir, cfg: NTTConfig, fs_tw=None):
    """Pallas backend: fused VMEM stage-group four-step kernel
    (icicle_tpu/pallas/ntt_kernel.py) for large single-vector transforms
    over single-limb fields; everything else falls back to the XLA path
    (reference analog: per-device backend registration, ntt_backend.h)."""
    axis = _vec_axis(f, x)
    n = x.shape[axis]
    logn = n.bit_length() - 1
    batch_dims = x.shape[:axis]
    bsz = int(np.prod(batch_dims)) if batch_dims else 1
    eligible = (f.limb_shape == () and bsz == 1
                and logn >= _FOUR_STEP_MIN_LOGN
                and cfg.ordering is Ordering.NN)
    if not eligible:
        return _ntt_xla(f, x, dir, cfg, fs_tw=fs_tw)
    from icicle_tpu.pallas.ntt_kernel import ntt_four_step_pallas
    y = x.reshape(n)
    if dir == NTTDir.FORWARD and cfg.coset_gen is not None:
        y = f.mul_mont(y, _powers_mont(f, cfg.coset_gen, n))
    y = ntt_four_step_pallas(f, y, dir, fs_tw=fs_tw)
    if dir == NTTDir.INVERSE and cfg.coset_gen is not None:
        inv_gen = pow(cfg.coset_gen, -1, f.modulus)
        y = f.mul_mont(y, _powers_mont(f, inv_gen, n))
    return y.reshape(x.shape)


dispatcher.register_impl("ntt", "pallas", _ntt_pallas)


def ntt(f: Field, x, dir: NTTDir = NTTDir.FORWARD, cfg: NTTConfig = _DEFAULT):
    """Forward/inverse NTT along the vector axis (reference ntt(), ntt.h)."""
    return dispatcher.dispatch("ntt", cfg.backend)(f, x, dir, cfg)


@functools.lru_cache(maxsize=None)
def _jitted_ntt(field_name: str, direction: str, ordering: str, coset_gen, backend):
    f = get_field(field_name)
    cfg = NTTConfig(coset_gen=coset_gen, ordering=Ordering(ordering), backend=backend)

    @jax.jit
    def run(x, fs_tw):
        return dispatcher.dispatch("ntt", backend)(
            f, x, NTTDir(direction), cfg, fs_tw=fs_tw)

    @jax.jit
    def run_plain(x):
        return dispatcher.dispatch("ntt", backend)(f, x, NTTDir(direction), cfg)

    return run, run_plain


def _uses_four_step(f: Field, x, cfg: NTTConfig) -> int | None:
    axis = _vec_axis(f, x)
    n = x.shape[axis]
    logn = n.bit_length() - 1
    batch = x.shape[:axis]
    bsz = int(np.prod(batch)) if batch else 1
    input_rev = cfg.ordering in (Ordering.RN, Ordering.RR)
    if cfg.backend in (None, "xla", "auto", "pallas") and not input_rev \
            and bsz == 1 and logn >= _FOUR_STEP_MIN_LOGN:
        return logn
    return None


def ntt_jit(f: Field, x, dir: NTTDir = NTTDir.FORWARD, cfg: NTTConfig = _DEFAULT):
    """jit-cached entry point (one compile per field/ordering/size).

    Large single-vector transforms pass the four-step twiddle matrix as a
    runtime argument (a closure constant would serialize ~n words of HLO)."""
    run, run_plain = _jitted_ntt(f.name, dir.value, cfg.ordering.value,
                                 cfg.coset_gen, cfg.backend)
    logn = _uses_four_step(f, x, cfg)
    if logn is not None:
        from icicle_tpu.parallel import ntt_sharded as _ns
        log_n1 = logn // 2
        tw = _ns._twiddle_matrix(f, 1 << log_n1, 1 << (logn - log_n1), dir)
        return run(x, tw)
    return run_plain(x)


# ---------------------------------------------------------------------------
# Extension-field and RNS-domain NTTs
# ---------------------------------------------------------------------------
# Reference registration points: backend/cpu/src/field/cpu_ntt.cpp:41
# (EXT_FIELD) and :45-48 (RING_RNS). Both reuse the scalar-field twiddle
# domain: the NTT is linear over the base field, so an extension-field NTT is
# a component-wise base-field NTT, and an RNS-ring NTT transforms each
# residue plane with the ring root-of-unity's residue in that plane.


def ntt_ext(ef, x, dir: NTTDir = NTTDir.FORWARD, cfg: NTTConfig = _DEFAULT):
    """NTT over extension-field elements (babybear4 etc. — reference
    EXT_FIELD ntt, cpu_ntt.cpp:41).

    x: (batch..., n, D) with D the extension degree over a flat base field
    (or (batch..., n, D*W) limb-grouped for multi-limb bases). Twiddles come
    from the BASE field domain; components transform independently.
    """
    base = ef.base
    assert base.limb_shape == (), "ext-field NTT supports flat base fields"
    xt = jnp.moveaxis(x, -1, 0)            # (D, batch..., n)
    yt = ntt_jit(base, xt, dir, cfg)
    return jnp.moveaxis(yt, 0, -1)


def ntt_rns(x, dir: NTTDir = NTTDir.FORWARD, cfg: NTTConfig = _DEFAULT):
    """NTT over babykoala Z_q in RNS form (reference RING_RNS ntt,
    cpu_ntt.cpp:45-48).

    x: (batch..., n, 2) canonical residues (x mod P_bb, x mod P_kb). Each
    plane uses the residue of the RING's root of unity (babykoala.h
    zq_config::rou), so results CRT-match the direct-domain Zq NTT.
    """
    f_bb, f_kb = _rns_plane_fields()
    yb = ntt_jit(f_bb, x[..., 0], dir, cfg)
    yk = ntt_jit(f_kb, x[..., 1], dir, cfg)
    return jnp.stack([yb, yk], axis=-1)


@functools.lru_cache(maxsize=None)
def _rns_plane_fields():
    from icicle_tpu.math.params import FieldParams
    from icicle_tpu.fields.field import register_field_object
    from icicle_tpu.rings.babykoala import P_BB, P_KB, ROU, OMEGAS_COUNT

    planes = []
    for name, p in (("babykoala_rns_bb", P_BB), ("babykoala_rns_kb", P_KB)):
        params = FieldParams(name=name, modulus=p, rou=ROU % p,
                             two_adicity_override=OMEGAS_COUNT)
        f = Field(params)
        register_field_object(f)
        planes.append(f)
    return tuple(planes)
