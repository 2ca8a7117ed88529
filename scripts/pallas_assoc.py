"""ARCHIVED Pallas TPU kernel: fused stencil k-NN association.

Status (round 4 decision, measured): the production association engine is
the pure-XLA path (voxelmap.query_candidates_dense + fused moment
reductions) — it beat this kernel end-to-end on v5e at flagship shapes
(121.7 vs 117.3 scans/sec/chip, r3 BASELINE.md), and the earlier
manual-DMA variant was 2x slower still.  The kernel family is therefore
archived here, out of the package: the estimator no longer dispatches to
it, the dual-tier variant is deleted, and one interpret-mode equivalence
test (tests/test_pallas_assoc.py) keeps the remaining single-tier kernel
honest as a reference implementation of the fused-association idea.  See
PARITY.md "Association engine" for the decision record.

Original rationale: at flagship shapes the XLA association pipeline
(`voxelmap.query_candidates` -> `select_k_smallest` -> moment reductions ->
`linalg3` fits) materializes ~300 MB of HBM intermediates per step — a
(B, M, 8, 128) row gather, a layout-changing copy of it, five (B, M, 8, 32)
candidate blocks feeding a 256-wide `top_k` sort, and the masked moment
reductions — together the largest block of the step profile after the
inserts were moved to Pallas.

The split that measured fastest on hardware (r3): XLA performs the row
GATHER (`cells[slot]`, ~10 ns/row — scripts/gather_bench.py), and one
Pallas kernel fuses everything downstream — candidate distances, the
exact k-th-smallest threshold selection, masked first/second moments,
the closed-form 3x3 eigen-analysis (the `ops/linalg3.py` formulas), and
all acceptance gates — writing 16 floats per point.  HBM traffic per
point drops from ~64 KB of XLA intermediates to 4 KB of gather read +
4 KB write + 4 KB kernel read + 64 B of output.  (A manual per-row-DMA
variant that skipped the gather intermediate entirely was measured
2x SLOWER than the XLA path: its 2 x 8 x GP scalar DMA issue/wait loop
iterations per grid step dominated the runtime.)

Semantics are identical to the XLA path (asserted by
tests/test_pallas_assoc.py):

  * candidate validity: epoch-key match + count > 0 + fine-stencil bounds
    (`voxelmap.query_candidates`, Map_Manager.cpp:125-286 eviction);
  * selection: k-th smallest valid distance, ties all selected
    (`voxelmap.select_k_smallest`);
  * plane mode: total-LS normal = smallest eigenvector of the centered
    scatter, planarity gate = every selected candidate within 0.2 m of the
    plane (Estimator.cpp:617-696), scatter eigenvalues exported for the
    rank gate;
  * line mode: PCA direction = principal eigenvector of the covariance
    (Estimator.cpp:189-277).

Output per point (16 lanes):
  [0:3]  mu        centroid - query (selected candidates)
  [3:6]  vec       plane normal (mode=0) / line direction (mode=1)
  [6:9]  evals     ascending eigenvalues (scatter for planes, cov for lines)
  [9]    t_k       k-th smallest sq-distance (inf if < k candidates)
  [10]   n         number of selected candidates
  [11]   planar    1.0 if every selected candidate within 0.2 m (plane mode)
  [12:16] pad
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmloam_tpu.ops import voxelmap

_META_MOD = voxelmap._META_MOD
GP = 128            # points per grid step
_EPS = 1e-12


def prepare_queries(pw, mask, cfg):
    """Per-point stencil addressing, computed once in XLA.

    pw: (M, 3) world-frame query points, mask: (M,).  Returns
    (slot (M, 8) int32, meta_q (M, 8, 8) f32) where meta_q packs per row
    [base(3), ov(3), key(1), pad] — the world-frame row origin relative to
    the query, the row origin's fine-voxel offset from the query voxel
    (for the exact-stencil bounds), and the expected epoch key (-1 for
    masked points, matching no stored key).
    """
    px, py, pz = voxelmap._pack(cfg)
    nbx, nby, nbz = voxelmap._super_window(cfg)
    assert nbx * nby * nbz == 8, "kernel assumes the 8-superrow window"
    assert voxelmap._cpr(cfg) == 32, "kernel assumes 32 cells per row"
    dtype = pw.dtype

    v = voxelmap._voxel_coords(pw, cfg)                       # (M,3)
    sx0 = (v[:, 0] - cfg.stencil_x) // px
    sy0 = (v[:, 1] - cfg.stencil_y) // py
    sz0 = (v[:, 2] - cfg.stencil_z) // pz
    ox, oy, oz = jnp.meshgrid(jnp.arange(nbx), jnp.arange(nby),
                              jnp.arange(nbz), indexing="ij")
    sv = jnp.stack([sx0[:, None] + ox.ravel()[None, :],
                    sy0[:, None] + oy.ravel()[None, :],
                    sz0[:, None] + oz.ravel()[None, :]], axis=-1)  # (M,8,3)
    slot, key = voxelmap._super_decompose(sv, cfg)            # (M,8)
    packs = jnp.array([px, py, pz], jnp.int32)
    base = (sv * packs).astype(dtype) * cfg.voxel_size - pw[:, None, :]
    ov = (sv * packs - v[:, None, :]).astype(dtype)           # (M,8,3)
    keyq = jnp.where(mask[:, None], key, -1.0).astype(dtype)  # (M,8)
    meta_q = jnp.concatenate(
        [base, ov, keyq[:, :, None], jnp.zeros_like(keyq)[:, :, None]],
        axis=-1)                                              # (M,8,8)
    return slot.astype(jnp.int32), meta_q


def _sum12(x):
    """sum over axes (1, 2), sequentially.

    Mosaic/jellyfish in this image ABORTS (layout.h implicit_dim check)
    on any single multi-axis reduction of a rank-3 value; two chained
    single-axis reductions lower fine (measured, scripts/bisect_mosaic2).
    """
    return jnp.sum(jnp.sum(x, axis=2), axis=1)


def _sum12_keep(x):
    return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _min12_keep(x):
    return jnp.min(jnp.min(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _cos_third_acos(r):
    """t = cos(acos(r)/3) for r in [-1, 1], trig-free.

    Mosaic's TensorCore lowering has no acos/cos primitives, so the
    eigenvalue angle is recovered as the root of the triple-angle cubic
    4t^3 - 3t = r on [1/2, 1] (unique there; at r = -1 it degenerates to
    the double root of (t+1)(2t-1)^2).  Seed 0.5 + 0.5*sqrt((r+1)/2) is
    exact at both endpoints and within 0.013 everywhere; four Newton
    steps polish it to f32 round-off in the simple-root region and to
    <1% relative in the vanishing-discriminant limit (where the
    eigenvalue separation itself -> 0, so the absolute error does too).
    """
    t = 0.5 + 0.5 * jnp.sqrt(jnp.maximum(0.5 * (r + 1.0), 0.0))
    for _ in range(4):
        g = (4.0 * t * t - 3.0) * t - r
        gp = 12.0 * t * t - 3.0
        t = t - g / jnp.maximum(gp, 1e-6)
        t = jnp.clip(t, 0.5, 1.0)
    return t


def _eigvalsh3_lanes(a00, a01, a02, a11, a12, a22):
    """Closed-form ascending eigenvalues of symmetric 3x3, lane math.

    Port of linalg3.eigvalsh3 operating on (...,) component arrays, with
    the trig triple-angle evaluation replaced by `_cos_third_acos` (no
    acos/cos in the Mosaic TC lowering).
    """
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    pin = 1.0 / jnp.maximum(p, 1e-20)
    # det(B)/2 with B = (A - qI)
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detb * 0.5 * pin * pin * pin, -1.0, 1.0)
    # cos(phi), sin(phi) with phi = acos(r)/3 in [0, pi/3];
    # cos(phi + 2pi/3) = -cos(phi)/2 - (sqrt(3)/2) sin(phi)
    ct = _cos_third_acos(r)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    e_hi = q + 2.0 * p * ct
    e_lo = q + 2.0 * p * (-0.5 * ct - 0.8660254037844386 * st)
    e_mid = 3.0 * q - e_hi - e_lo
    diag = p2 < _EPS
    return (jnp.where(diag, q, e_lo), jnp.where(diag, q, e_mid),
            jnp.where(diag, q, e_hi))


def _eigvec_lanes(a00, a01, a02, a11, a12, a22, l_a, l_b, fallback):
    """Unit eigenvector via Cayley-Hamilton: columns of (A-l_a I)(A-l_b I)
    span the remaining eigenspace; largest column picked branchlessly."""
    m = [[a00 - l_a, a01, a02], [a01, a11 - l_a, a12], [a02, a12, a22 - l_a]]
    n_ = [[a00 - l_b, a01, a02], [a01, a11 - l_b, a12], [a02, a12, a22 - l_b]]
    c = [[m[i][0] * n_[0][j] + m[i][1] * n_[1][j] + m[i][2] * n_[2][j]
          for j in range(3)] for i in range(3)]
    norms = [c[0][j] * c[0][j] + c[1][j] * c[1][j] + c[2][j] * c[2][j]
             for j in range(3)]
    best01 = norms[0] >= norms[1]
    n01 = jnp.where(best01, norms[0], norms[1])
    use2 = norms[2] > n01
    vx = jnp.where(use2, c[0][2], jnp.where(best01, c[0][0], c[0][1]))
    vy = jnp.where(use2, c[1][2], jnp.where(best01, c[1][0], c[1][1]))
    vz = jnp.where(use2, c[2][2], jnp.where(best01, c[2][0], c[2][1]))
    nv = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    ok = nv > 1e-9
    inv = 1.0 / jnp.maximum(nv, 1e-9)
    return (jnp.where(ok, vx * inv, fallback[0]),
            jnp.where(ok, vy * inv, fallback[1]),
            jnp.where(ok, vz * inv, fallback[2]))


def _fit_rows(rows, mq, *, k, mode, packs, voxel, stencil,
              scatter_ratio=0.0):
    """Candidate math for one tier from fetched rows: validity, exact
    k-th-smallest selection, moments, closed-form fit, and the full
    per-point acceptance gate.  rows: (GP, 8, 128); mq: (GP, 8, 8).

    Returns (mux, muy, muz, vx, vy, vz, t_k, n, fit_ok) — fit_ok is the
    THRESHOLD-FREE part of validity (selection count, fit-shape gates,
    association-error floor); callers AND it with (t_k < thres_dist).
    """
    px, py, pz = packs
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)
    scz = (lane % pz).astype(jnp.float32)
    scy = ((lane // pz) % py).astype(jnp.float32)
    scx = (lane // (py * pz)).astype(jnp.float32)
    smx, smy, smz = scx * voxel, scy * voxel, scz * voxel
    stx, sty, stz = stencil
    GPn = rows.shape[0]

    sx = rows[:, :, 0:32]
    sy = rows[:, :, 32:64]
    sz = rows[:, :, 64:96]
    meta = rows[:, :, 96:128]
    base_x = mq[:, :, 0:1]
    base_y = mq[:, :, 1:2]
    base_z = mq[:, :, 2:3]
    ov_x = mq[:, :, 3:4]
    ov_y = mq[:, :, 4:5]
    ov_z = mq[:, :, 5:6]
    keyq = mq[:, :, 6:7]

    key_st = jnp.floor(meta * (1.0 / _META_MOD))
    cnt = meta - key_st * _META_MOD
    okf = ((key_st == keyq) & (cnt > 0.0)).astype(jnp.float32)
    okf = okf * (jnp.abs(ov_x + scx) <= stx)
    okf = okf * (jnp.abs(ov_y + scy) <= sty)
    okf = okf * (jnp.abs(ov_z + scz) <= stz)

    inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
    dx = base_x + smx + sx * inv_cnt
    dy = base_y + smy + sy * inv_cnt
    dz = base_z + smz + sz * inv_cnt
    d2 = dx * dx + dy * dy + dz * dz
    big = jnp.float32(3.0e38)
    d2m = jnp.where(okf > 0.0, d2, big)

    t = jnp.full((GPn, 1, 1), big)
    nsel = jnp.zeros((GPn, 1, 1), jnp.float32)
    done = jnp.zeros((GPn, 1, 1), jnp.float32)
    cur = d2m
    for _ in range(k):
        m = _min12_keep(cur)
        c = _sum12_keep((cur <= m).astype(jnp.float32))
        fin = (m < big).astype(jnp.float32)
        take = (1.0 - done) * fin
        t = jnp.where(take > 0.0, m, t)
        nsel = nsel + take * c
        done = jnp.maximum(done, (nsel >= k).astype(jnp.float32))
        done = jnp.maximum(done, 1.0 - fin)
        cur = jnp.where(cur <= m, big, cur)

    w = ((okf > 0.0) & (d2 <= t)).astype(jnp.float32)
    n = _sum12(w)
    nf = jnp.maximum(n, 1.0)

    s1x = _sum12(dx * w)
    s1y = _sum12(dy * w)
    s1z = _sum12(dz * w)
    sxx = _sum12(dx * dx * w)
    syy = _sum12(dy * dy * w)
    szz = _sum12(dz * dz * w)
    sxy = _sum12(dx * dy * w)
    sxz = _sum12(dx * dz * w)
    syz = _sum12(dy * dz * w)
    mux, muy, muz = s1x / nf, s1y / nf, s1z / nf

    if mode == 0:
        a00 = sxx - nf * mux * mux
        a11 = syy - nf * muy * muy
        a22 = szz - nf * muz * muz
        a01 = sxy - nf * mux * muy
        a02 = sxz - nf * mux * muz
        a12 = syz - nf * muy * muz
        e_lo, e_mid, e_hi = _eigvalsh3_lanes(a00, a01, a02, a11, a12, a22)
        vx, vy, vz = _eigvec_lanes(a00, a01, a02, a11, a12, a22,
                                   e_mid, e_hi, (0.0, 0.0, 1.0))
        dev = ((dx - mux[:, None, None]) * vx[:, None, None]
               + (dy - muy[:, None, None]) * vy[:, None, None]
               + (dz - muz[:, None, None]) * vz[:, None, None])
        bad = _sum12(((w > 0.0) & (jnp.abs(dev) > 0.2))
                     .astype(jnp.float32))
        shape_ok = bad == 0.0
        if scatter_ratio > 0.0:
            shape_ok = shape_ok & (e_mid > scatter_ratio * e_hi)
        err0 = jnp.abs(mux * vx + muy * vy + muz * vz)
    else:
        a00 = sxx / nf - mux * mux
        a11 = syy / nf - muy * muy
        a22 = szz / nf - muz * muz
        a01 = sxy / nf - mux * muy
        a02 = sxz / nf - mux * muz
        a12 = syz / nf - muy * muz
        e_lo, e_mid, e_hi = _eigvalsh3_lanes(a00, a01, a02, a11, a12, a22)
        vx, vy, vz = _eigvec_lanes(a00, a01, a02, a11, a12, a22,
                                   e_mid, e_lo, (1.0, 0.0, 0.0))
        shape_ok = e_hi > 3.0 * e_mid
        # err0 = |(-mu) x u|
        cxl = (-muy) * vz - (-muz) * vy
        cyl = (-muz) * vx - (-mux) * vz
        czl = (-mux) * vy - (-muy) * vx
        err0 = jnp.sqrt(cxl * cxl + cyl * cyl + czl * czl)

    t_out = jnp.where(t[:, 0, 0] >= big, jnp.float32(jnp.inf), t[:, 0, 0])
    fit_ok = ((n >= k) & shape_ok & (err0 > 1e-5)).astype(jnp.float32)
    # the planarity/eigenvalue exports keep the single-tier path's contract
    return (mux, muy, muz, vx, vy, vz, e_lo, e_mid, e_hi, t_out, n,
            fit_ok)


def _assoc_kernel(meta_ref, thres_ref, rows_ref, out_ref, *, k, mode,
                  params, scatter_ratio):
    """One grid step: select + fit + gate GP points from PRE-GATHERED rows.

    meta_ref: (1, GP, 8, 8) VMEM; thres_ref: (B, 1) SMEM f32 (traced
    member-schedule distance gate per batch element, indexed by
    program_id(0); 2D because Mosaic requires rank >= 2 SMEM layouts);
    rows_ref: (1, GP, 8, 128) VMEM — the stencil superrows, gathered by
    XLA (`cells[slot]`) before the launch; out_ref: (1, GP, 16) VMEM.

    No manual DMA: the first TPU measurement of the DMA-gather variant
    (scripts/pallas_assoc_test.py, r3) showed its 2 x GP x 8 scalar
    issue/wait loop iterations dominating at ~270 us per grid step —
    2x SLOWER than the whole XLA association path — while XLA row
    gathers cost ~10 ns/row (CLAUDE.md, scripts/gather_bench.py).  The
    kernel now fuses everything DOWNSTREAM of the gather (the k-th
    smallest selection, masked moments, closed-form eigen fits, gates),
    which is where the XLA path burns its time (top_k sort + layout
    copies + 300 MB of HBM intermediates at flagship shapes); block
    fetches are auto-pipelined against compute by the Pallas grid.
    Output lanes: [mu(3), vec(3), valid(1), t_k(1), n(1), pad(7)].
    """
    bq = pl.program_id(0)
    thres = thres_ref[bq, 0]
    rows = rows_ref[0]
    (mux, muy, muz, vx, vy, vz, _, _, _, t_out, n, fit_ok) = _fit_rows(
        rows, meta_ref[0], k=k, mode=mode, scatter_ratio=scatter_ratio,
        **params)
    valid = ((fit_ok > 0.0) & (t_out < thres)).astype(jnp.float32)
    z = jnp.zeros_like(n)
    out_ref[0] = jnp.stack([mux, muy, muz, vx, vy, vz, valid, t_out, n,
                            z, z, z, z, z, z, z], axis=-1)


# --------------------------------------------------------------------------
# vmap folding: the kernels carry a NATIVE batch grid axis and a
# custom_vmap rule folds any outer vmap axes into it (one launch per
# nesting level instead of per lane).  The row gather happens in XLA
# before the launch, so map sharing/batching under vmap needs no special
# handling here.
# --------------------------------------------------------------------------

def _fold(x, batched, axis_size):
    """Merge a custom_vmap outer axis (at dim 0 when `batched`) into the
    kernel's leading batch axis."""
    if batched:
        return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
    return jnp.broadcast_to(x[None], (axis_size,) + x.shape).reshape(
        (axis_size * x.shape[0],) + x.shape[1:])


def _gather_rows(cells, slot):
    """cells (B, Cs, 128), slot (B, M, 8) -> (B, M, 8, 128) full-row
    gather (the ~10 ns/row pattern: widest rows, no minor-dim reshape)."""
    return jax.vmap(lambda c, s: c[s])(cells, slot)


def _assoc_pallas(rows, meta_q, thres, *, k, mode, params, scatter_ratio,
                  interpret):
    """Raw batched launch: rows (B, M, 8, 128), meta_q (B, M, 8, 8),
    thres (B,).  Returns (B, M, 16)."""
    B, M = rows.shape[:2]
    dtype = jnp.float32
    kern = functools.partial(_assoc_kernel, k=k, mode=mode, params=params,
                             scatter_ratio=scatter_ratio)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, M, 16), dtype),
        grid=(B, M // GP),
        in_specs=[
            pl.BlockSpec((1, GP, 8, 8), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, GP, 8, 128), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GP, 16), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(meta_q, thres.astype(dtype).reshape(B, 1), rows)
    return out


def _single_call(k, mode, params, scatter_ratio, interpret):
    """custom_vmap-wrapped single-tier launch (statics closed over)."""

    @custom_batching.custom_vmap
    def call(rows, meta_q, thres):
        return _assoc_pallas(rows, meta_q, thres, k=k, mode=mode,
                             params=params, scatter_ratio=scatter_ratio,
                             interpret=interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, rows, meta_q, thres):
        rb, mb, tb = in_batched
        B0 = rows.shape[1] if rb else rows.shape[0]
        out = call(_fold(rows, rb, axis_size), _fold(meta_q, mb, axis_size),
                   _fold(thres, tb, axis_size))
        return out.reshape((axis_size, B0) + out.shape[1:]), True

    return call


# --------------------------------------------------------------------------
# Lowering probes: Mosaic rejections (e.g. an unsupported SMEM store) only
# surface at TPU compile time, which interpret-mode tests cannot catch.  The
# dispatch layer (estimator/factors.py) calls these once per static shape
# signature before selecting the kernel path; a failed probe warns and sends
# the step program down the XLA association path instead of crashing it.
# --------------------------------------------------------------------------

_PROBE_CACHE: dict = {}


def _probe(key, lower_fn):
    """Memoized compile probe: True iff `lower_fn()` (an AOT
    lower+compile of a kernel launch) succeeds on the default backend."""
    full_key = (jax.default_backend(), key)
    if full_key not in _PROBE_CACHE:
        try:
            lower_fn()
            _PROBE_CACHE[full_key] = True
        except Exception as e:
            warnings.warn(
                f"pallas association kernel failed to compile on "
                f"{jax.default_backend()} ({key[0]}); dispatching the XLA "
                f"association path instead: {type(e).__name__}: {e}")
            _PROBE_CACHE[full_key] = False
    return _PROBE_CACHE[full_key]


def single_lowers(cells_shape, m, cfg, mode, k=5, scatter_ratio=0.0):
    """True iff the single-tier kernel compiles for these static shapes.
    On CPU the interpret path always runs — no probe needed."""
    if jax.default_backend() == "cpu":
        return True
    cs = tuple(cells_shape[-2:])
    key = ("single", cs, m, cfg, mode, k, float(scatter_ratio))
    f32 = jnp.float32
    args = (jax.ShapeDtypeStruct((1,) + cs, f32),
            jax.ShapeDtypeStruct((1, m, 3), f32),
            jax.ShapeDtypeStruct((1, m), jnp.bool_),
            jax.ShapeDtypeStruct((), f32))
    return _probe(key, lambda: assoc_batched.lower(
        *args, cfg=cfg, mode=mode, k=k,
        scatter_ratio=scatter_ratio).compile())


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mode", "k", "scatter_ratio",
                                    "interpret"))
def assoc_batched(cells, pw, mask, thres, cfg, mode, k=5,
                  scatter_ratio=0.0, interpret=None):
    """Batched fused association: cells (B, Cs, 128), pw (B, M, 3),
    mask (B, M), thres traced squared-distance gate — scalar or (B,)
    per-batch-element (broadcast to (B,) and read per grid row in the
    kernel).  mode 0 = plane (surf maps), 1 = line (corner maps).
    vmap-safe: outer vmap axes fold into the kernel's batch grid (see
    `_single_call`).

    Returns (mu (B,M,3), vec (B,M,3), valid (B,M) bool, t_k (B,M),
    n (B,M)): the fit plus the FULL acceptance gate (selection count,
    thres, planarity + scatter rank / line-likeness, association-error
    floor) — exactly what `factors._plane_fit` / `_line_fit` derive from
    `voxelmap.query_candidates` + `select_k_smallest` + the moment
    reductions (equivalence asserted by tests/test_pallas_assoc.py).
    """
    if interpret is None:
        # the kernel only lowers on TPU; on CPU (tests forcing the kernel
        # path) fall back to the Pallas interpreter automatically
        interpret = jax.default_backend() == "cpu"
    B, M = pw.shape[:2]
    assert M % GP == 0, (M, GP)
    slot, meta_q = jax.vmap(lambda p, m: prepare_queries(p, m, cfg))(pw, mask)
    stencil = (float(cfg.stencil_x), float(cfg.stencil_y),
               float(cfg.stencil_z))
    call = _single_call(
        k, mode,
        dict(packs=voxelmap._pack(cfg), voxel=float(cfg.voxel_size),
             stencil=stencil),
        float(scatter_ratio), interpret)
    out = call(_gather_rows(cells, slot), meta_q,
               jnp.broadcast_to(jnp.asarray(thres, jnp.float32), (B,)))
    return (out[..., 0:3], out[..., 3:6], out[..., 6] > 0.5,
            out[..., 7], out[..., 8])
