"""Torus voxel-grid map: fixed-shape scatter insert + stencil k-NN gather.

TPU-native replacement for the reference's global map (Map_Manager.cpp):
a 21x11x21 grid of 50 m cubes, each holding a point cloud that is
voxel-grid downsampled past 300 points and indexed by a per-cube KD-tree
(Map_Manager.h:117-120, Map_Manager.cpp:125-286), with `MapMove` scrolling
the grid to keep the pose away from the edge (:288-581) and `nearestKSearch`
5-NN queries during factor building (Estimator.cpp:160,380,585).

Design here (no trees, no scrolling copies):
  * One cell per `voxel_size` leaf — equivalent to the reference's
    VoxelGrid-downsampled map at the same leaf, since a downsampled cloud
    has exactly one point (the centroid) per leaf.
  * Cells are addressed modulo the grid dims (a 3-D torus).  Two voxels
    collide only when they are `dim * voxel_size` apart (~100 m at the
    defaults), far beyond matching range; each cell stores its true voxel
    coordinate's per-axis period quotient, so stale cells from a previous
    pass of the torus are detected at query time and overwritten at insert
    time.  This reproduces `MapMove`'s drop-far-cubes semantics with zero
    data movement.
  * **Superrow packing** (the TPU-critical layout choice): cells are
    stored 32-to-a-row as one (Cs, 128) f32 table — a (pack_x, pack_y,
    pack_z) = (4,4,2) block of fine cells per 512-byte row.  Measured on
    v5e, XLA row gathers cost ~10 ns/row nearly independent of row size up
    to 512 B, so the k-NN stencil read costs per GATHERED ROW, not per
    cell: a (+-2,+-2,+-1) fine stencil needs only 2x2x2 = 8 superrow
    gathers per query instead of 75 cell gathers — ~9x fewer rows for a
    strictly larger candidate coverage.
  * Within a row the four cell fields are stored struct-of-arrays —
    [sum_x(32) | sum_y(32) | sum_z(32) | meta(32)] — so unpacking a
    gathered (M, S, 128) block is four LANE SLICES, never a minor-dim
    reshape (which the TPU tiled layout turns into a real transpose).
  * Cell payload: sums relative to the fine-voxel corner (keeps f32 exact
    regardless of world coords) and meta = key*128 + count (key < 2^15,
    count <= 127 => meta < 2^22, exact in f32).  count == 0 means empty;
    a stale cell keeps its old key and fails the query-time key check.
    Counts saturate at cfg.count_cap by rescaling the sums (running mean
    with bounded inertia — the reference instead re-runs VoxelGrid over
    the whole cube past 300 points, Map_Manager.cpp:226).

The reference's triple-buffered map snapshots (Map_Manager.cpp:132-146,
Estimator.cpp:1170-1184) existed to let matching run against a consistent
map while a background thread appends; a pure-functional map value makes
that machinery unnecessary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NF = 4            # fields per cell [sum_x, sum_y, sum_z, meta]
_META_MOD = 128.0  # meta = key * 128 + count


def _pack(cfg):
    return cfg.pack_x, cfg.pack_y, cfg.pack_z


def _sdims(cfg):
    px, py, pz = _pack(cfg)
    assert cfg.dim_x % px == 0 and cfg.dim_y % py == 0 and cfg.dim_z % pz == 0
    return cfg.dim_x // px, cfg.dim_y // py, cfg.dim_z // pz


def _cpr(cfg):
    px, py, pz = _pack(cfg)
    return px * py * pz


class VoxelMap(NamedTuple):
    """One feature class's map (corner, surf, or non-feature).

    cells: (Cs, cpr * 4) f32 — packed superrows, fields struct-of-arrays:
    columns [0:cpr] sum_x, [cpr:2cpr] sum_y, [2cpr:3cpr] sum_z,
    [3cpr:4cpr] meta.
    """

    cells: jnp.ndarray

    # ---- flat per-cell views (tests / export) ----
    def _field(self, i):
        cpr = self.cells.shape[1] // _NF
        return self.cells[:, i * cpr:(i + 1) * cpr].reshape(-1)

    @property
    def sum_rel(self):
        return jnp.stack([self._field(0), self._field(1), self._field(2)],
                         axis=-1)

    @property
    def meta(self):
        return self._field(3)

    @property
    def count(self):
        m = self.meta
        return m - jnp.floor(m / _META_MOD) * _META_MOD

    @property
    def key(self):
        return jnp.floor(self.meta / _META_MOD)


def empty_map(cfg) -> VoxelMap:
    sdx, sdy, sdz = _sdims(cfg)
    return VoxelMap(cells=jnp.zeros((sdx * sdy * sdz, _cpr(cfg) * _NF),
                                    jnp.float32))


def _voxel_coords(pts, cfg):
    """Integer fine-voxel coordinates (floor) of points."""
    return jnp.floor(pts / cfg.voxel_size).astype(jnp.int32)


def _super_decompose(sv, cfg):
    """Torus slot index and epoch key for SUPER voxel coords sv (..., 3).

    The key packs the per-axis torus period quotients (5 bits each, biased
    +16: coverage +-16 periods ~ +-1.6 km at the full-map defaults) so one
    f32 compare detects stale cells from a previous torus pass.
    """
    sdx, sdy, sdz = _sdims(cfg)
    mx, my, mz = sv[..., 0] % sdx, sv[..., 1] % sdy, sv[..., 2] % sdz
    slot = (mx * sdy + my) * sdz + mz
    qx = jnp.clip((sv[..., 0] - mx) // sdx + 16, 0, 31)
    qy = jnp.clip((sv[..., 1] - my) // sdy + 16, 0, 31)
    qz = jnp.clip((sv[..., 2] - mz) // sdz + 16, 0, 31)
    key = ((qx << 10) | (qy << 5) | qz).astype(jnp.float32)
    return slot, key


def _cell_addr(v, cfg):
    """(superrow slot, sub-cell index, epoch key) for fine voxel coords v."""
    px, py, pz = _pack(cfg)
    sv = jnp.stack([v[..., 0] // px, v[..., 1] // py, v[..., 2] // pz],
                   axis=-1)
    slot, key = _super_decompose(sv, cfg)
    sub = ((v[..., 0] % px) * py + v[..., 1] % py) * pz + v[..., 2] % pz
    return slot, sub, key


def insert(vm: VoxelMap, pts, mask, cfg) -> VoxelMap:
    """Masked scatter of world-frame points into the map.

    Cells whose stored key differs from the incoming one (stale aliases
    from a previous torus pass, or empty) are reset before accumulation —
    the MapMove-equivalent eviction.  Within one batch all points hitting
    a cell share a key (they would have to be a torus period apart to
    differ, beyond lidar range), so every repair scatter is idempotent
    under duplicate indices; only the sum/count accumulation relies on
    scatter-add.

    Works on the flattened (Cs * cpr * 4,) view: each point touches its
    cell's four field slots [slot*4cpr + f*cpr + sub].
    """
    cpr = _cpr(cfg)
    row_f = cpr * _NF
    flat = vm.cells.reshape(-1)
    n_flat = flat.shape[0]
    dtype = flat.dtype
    pts = pts.astype(dtype)
    N = pts.shape[0]

    v = _voxel_coords(pts, cfg)
    slot, sub, key = _cell_addr(v, cfg)
    base = slot * row_f + sub                     # field 0 (sum_x) slot
    fidx = jnp.stack([base, base + cpr, base + 2 * cpr, base + 3 * cpr],
                     axis=-1)                     # (N,4)
    fidx = jnp.where(mask[:, None], fidx, n_flat)  # masked -> dropped
    maskf = mask.astype(dtype)

    meta0 = flat.at[fidx[:, 3]].get(mode="fill", fill_value=0.0)
    key0 = jnp.floor(meta0 / _META_MOD)
    cnt0 = meta0 - key0 * _META_MOD
    fresh = ((key0 != key) | (cnt0 == 0)) & mask   # stale or empty

    # 1. reset stale/empty target cells and stamp the new epoch key
    ridx = jnp.where(fresh[:, None], fidx, n_flat)
    stamp = jnp.concatenate(
        [jnp.zeros((N, 3), dtype), (key * _META_MOD)[:, None]], axis=-1)
    flat = flat.at[ridx.reshape(-1)].set(stamp.reshape(-1), mode="drop")

    # 2. accumulate corner-relative sums and counts (meta += 1 per point)
    rel = pts - v.astype(dtype) * cfg.voxel_size
    payload = jnp.concatenate([rel * maskf[:, None], maskf[:, None]], axis=-1)
    flat = flat.at[fidx.reshape(-1)].add(payload.reshape(-1), mode="drop")

    # 3. saturate counts at count_cap by rescaling sums (bounded-inertia
    # running mean; also keeps count within meta's 7-bit field).  The true
    # count is decoded with the PER-POINT incoming key, not floor(meta/128):
    # a cell receiving >127-cnt0 points within one batch pushes the count
    # into the key bits, and floor-decoding would read back a corrupted
    # small count, skip the rewrite, and leave the cell with key+1 (it then
    # reads as stale forever).  meta = key*128 + cnt_true stays exact in
    # f32 while key*128 + cnt_true < 2^23 (key < 2^15 => cnt_true may reach
    # ~4e6 before the decode itself degrades — far beyond any batch size).
    vals = flat.at[fidx.reshape(-1)].get(mode="fill", fill_value=0.0)
    vals = vals.reshape(N, _NF)
    meta1 = vals[:, 3]
    cnt1 = meta1 - key * _META_MOD          # exact true count (see above)
    cap = jnp.asarray(cfg.count_cap, dtype)
    scale = jnp.minimum(1.0, cap / jnp.maximum(cnt1, 1.0))
    fixed = jnp.concatenate(
        [vals[:, 0:3] * scale[:, None],
         (key * _META_MOD + jnp.minimum(cnt1, cap))[:, None]], axis=-1)
    oidx = jnp.where((cnt1 > cap)[:, None], fidx, n_flat)
    flat = flat.at[oidx.reshape(-1)].set(fixed.reshape(-1), mode="drop")

    return VoxelMap(cells=flat.reshape(vm.cells.shape))


def insert_guard(pts, center, cfg):
    """Mask of points safe to insert: within half a torus period of
    `center` on every axis.  Inserting beyond would alias onto (and evict)
    valid cells near the robot — the reference's scrolling grid drops
    far cubes the same way (MapMove keeps the pose >=8 cubes from the edge,
    Map_Manager.cpp:288-581)."""
    lim = jnp.asarray([cfg.dim_x, cfg.dim_y, cfg.dim_z],
                      pts.dtype) * (0.48 * cfg.voxel_size)
    return jnp.all(jnp.abs(pts - center[None, :]) < lim[None, :], axis=-1)


def _super_window(cfg):
    """Static superrow-window shape covering the fine stencil.

    A window of 2s+1 consecutive fine cells spans at most
    (2s + p - 1)//p + 1 superrows of pack p per axis.
    """
    px, py, pz = _pack(cfg)
    nbx = (2 * cfg.stencil_x + px - 1) // px + 1
    nby = (2 * cfg.stencil_y + py - 1) // py + 1
    nbz = (2 * cfg.stencil_z + pz - 1) // pz + 1
    return nbx, nby, nbz


def _dedup_gather_rows(cells, slot, capacity):
    """Two-level superrow gather: fetch each UNIQUE row once.

    `cells` (n_super, R), `slot` (M, S) int32 row ids.  Row-gather issue
    cost on this TPU scales with TABLE size (~9.3 ns/row from the 64 MB
    map vs ~3.5 ns/row from a ~1 MB table — measured,
    scripts/gather_dedup_bench.py), and clustered queries touch only ~5%
    unique rows (BASELINE.md r5).  So: sort the M*S ids, rank the runs,
    gather the <= `capacity` unique rows from the big table into a
    compact one, and serve the (M, S) expansion from it.

    GATHER-FREE index plumbing (this is what makes it pay — the first
    version lost 2x end-to-end to per-element argsort/x[order] gathers
    at ~10 ns/element): every reorder is a multi-operand `lax.sort`
    whose payload columns ride the bitonic network — (1) ids with
    original positions, (2) run-start ids keyed by their rank to build
    the unique table, (3) ranks keyed by position to invert the
    permutation.  The only gathers left are the two ROW gathers the
    scheme exists for.

    Returns (rows (M, S, R), valid (M, S)); positions whose unique rank
    overflowed `capacity` get valid=False (candidates dropped — the same
    bounded-capacity behavior as the feature stacks), never wrong data:
    for rank < capacity, uid[rank] == id by construction.
    """
    M, S = slot.shape
    n_super = cells.shape[0]
    cap32 = jnp.int32(capacity)
    flat = slot.reshape(-1)
    iota = jnp.arange(M * S, dtype=jnp.int32)
    s_ids, pos = jax.lax.sort((flat, iota), num_keys=1)
    newrun = jnp.concatenate(
        [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    rank = (jnp.cumsum(newrun) - 1).astype(jnp.int32)  # sorted, 0-based
    # unique-id table: run-start ids sorted by their rank land at the
    # front in rank order; non-starts (key = capacity) and overflow
    # starts (rank >= capacity) sort behind and are never referenced
    k_uid = jnp.where(newrun, rank, cap32)
    _, uid_full = jax.lax.sort((k_uid, s_ids), num_keys=1)
    uid = uid_full[:capacity]
    # inverse permutation: rank back in original position order
    _, inv_flat = jax.lax.sort((pos, rank), num_keys=1)
    inv = inv_flat.reshape(M, S)
    compact = cells[jnp.clip(uid, 0, n_super - 1)]    # (capacity, R)
    rows = compact[jnp.minimum(inv, capacity - 1)]
    return rows, inv < capacity


def query_candidates(vm: VoxelMap, q, mask, cfg):
    """Stencil candidate block for each query point — no selection.

    q: (M, 3) world-frame queries, mask: (M,) validity.  Returns
    (dx, dy, dz, d2, ok), all (M, S, cpr): per-candidate centroid offsets
    FROM THE QUERY (centroid - q, per component), squared distances
    (inf where invalid), and validity.  Consumers reduce over the
    candidate axes (masked moment sums, k-smallest selection) without any
    further gathers — the whole block stays inside one fusion.
    """
    px, py, pz = _pack(cfg)
    nbx, nby, nbz = _super_window(cfg)
    cpr = _cpr(cfg)
    S = nbx * nby * nbz
    dtype = q.dtype
    M = q.shape[0]

    v = _voxel_coords(q, cfg)                               # (M,3)
    sx0 = (v[:, 0] - cfg.stencil_x) // px
    sy0 = (v[:, 1] - cfg.stencil_y) // py
    sz0 = (v[:, 2] - cfg.stencil_z) // pz
    ox, oy, oz = jnp.meshgrid(jnp.arange(nbx), jnp.arange(nby),
                              jnp.arange(nbz), indexing="ij")
    sv = jnp.stack([sx0[:, None] + ox.ravel()[None, :],
                    sy0[:, None] + oy.ravel()[None, :],
                    sz0[:, None] + oz.ravel()[None, :]], axis=-1)  # (M,S,3)
    slot, key = _super_decompose(sv, cfg)                   # (M,S)

    if getattr(cfg, "dedup_gather", False):
        rows, dedup_ok = _dedup_gather_rows(
            vm.cells, slot, int(cfg.dedup_capacity) * M)
    else:
        rows = vm.cells[slot]                               # (M,S,4cpr) gather
        dedup_ok = None
    # field unpack = lane slices (no minor-dim reshape/transpose)
    sum_x = rows[..., 0:cpr]
    sum_y = rows[..., cpr:2 * cpr]
    sum_z = rows[..., 2 * cpr:3 * cpr]
    meta = rows[..., 3 * cpr:4 * cpr]
    key_st = jnp.floor(meta / _META_MOD)
    cnt = meta - key_st * _META_MOD
    ok = (key_st == key[..., None]) & (cnt > 0) & mask[:, None, None]
    if dedup_ok is not None:
        ok = ok & dedup_ok[..., None]

    # restrict candidates to the EXACT fine stencil: the superrow window
    # overshoots by up to pack-1 cells per axis, and that extra reach
    # measurably degrades ATE (sparse far-flung 5-NN sets pass the fit
    # gates during warmup); candidate fine coord minus query voxel must lie
    # within +-stencil per axis
    subg = jnp.meshgrid(jnp.arange(px), jnp.arange(py), jnp.arange(pz),
                        indexing="ij")
    for ax, (sub_i, p_i, s_i) in enumerate(
            [(subg[0], px, cfg.stencil_x), (subg[1], py, cfg.stencil_y),
             (subg[2], pz, cfg.stencil_z)]):
        off = (sv[..., ax:ax + 1] * p_i + sub_i.ravel()[None, None, :]
               - v[:, None, ax:ax + 1])
        ok = ok & (jnp.abs(off) <= s_i)
    inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)

    # candidate centroid relative to the QUERY point, per component:
    #   centroid - q = (superrow base + sub-cell offset) * leaf + sum/cnt - q
    subx, suby, subz = jnp.meshgrid(jnp.arange(px), jnp.arange(py),
                                    jnp.arange(pz), indexing="ij")
    sub_x = (subx.ravel().astype(dtype) * cfg.voxel_size)[None, None, :]
    sub_y = (suby.ravel().astype(dtype) * cfg.voxel_size)[None, None, :]
    sub_z = (subz.ravel().astype(dtype) * cfg.voxel_size)[None, None, :]
    bx = sv[..., 0:1].astype(dtype) * (px * cfg.voxel_size) - q[:, None, 0:1]
    by = sv[..., 1:2].astype(dtype) * (py * cfg.voxel_size) - q[:, None, 1:2]
    bz = sv[..., 2:3].astype(dtype) * (pz * cfg.voxel_size) - q[:, None, 2:3]
    dx = bx + sub_x + sum_x * inv_cnt                       # (M,S,cpr)
    dy = by + sub_y + sum_y * inv_cnt
    dz = bz + sub_z + sum_z * inv_cnt
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(ok, d2, jnp.inf)
    return dx, dy, dz, d2, ok


def query_candidates_dense(vm: VoxelMap, q, mask, cfg):
    """`query_candidates`, materialized as DENSE (M, C) blocks in ONE pass.

    The candidate arrays come out of the superrow unpack as 32-of-128-lane
    padded tiles ((M, S, cpr) slices of the gathered rows), so every HBM
    pass over them reads 4x their logical bytes — and XLA rematerializes
    the unpack (re-reading the whole padded block) into EVERY consumer
    fusion that wants a dense layout.  Measured at flagship shapes the
    selection + moment pipeline paid that relayout 4-5 times (~3.8 ms of
    a 6.1 ms association call).  This entry point pays it ONCE: a single
    multi-output fusion reads the gathered rows and writes all four dense
    blocks; the optimization_barrier pins them (and keeps the row gather
    out of downstream fusions).

    Returns (dxd, dyd, dzd, d2d), each (M, S*cpr); d2d is +inf at invalid
    candidates (key mismatch / empty cell / masked query / outside the
    exact stencil), which downstream selection uses as the validity
    carrier.  dx/dy/dz at invalid lanes are finite garbage (or NaN for
    poisoned masked queries) — consumers must select via d2d.
    """
    dx, dy, dz, d2, ok = query_candidates(vm, q, mask, cfg)
    M = q.shape[0]
    C = d2.shape[1] * d2.shape[2]
    if getattr(cfg, "dense_bf16", False):
        # bf16 blocks halve the HBM traffic of every downstream pass
        # (selection re-reads d2d ~6x); +inf survives the cast, so the
        # validity carrier is intact.  Consumers upcast in-register.
        r = lambda a: a.reshape(M, C).astype(jnp.bfloat16)
    else:
        r = lambda a: a.reshape(M, C)
    return jax.lax.optimization_barrier((r(dx), r(dy), r(dz), r(d2)))


def shift_dense_blocks(dense, delta, cfg):
    """Re-express cached dense candidate blocks at a moved query position.

    `dense` = (dxd, dyd, dzd, d2d) from `query_candidates_dense` taken at
    query positions q0; `delta` (M, 3) f32 = q_new - q0.  The candidate
    CENTROIDS are fixed map data, so the new offsets are exactly
    (centroid - q_new) = (centroid - q0) - delta, and the new squared
    distances follow — no row gather, no superrow unpack.  Validity is
    carried over from d2d (= +inf at invalid lanes, `query_candidates`).

    This is what makes re-association across the estimator's outer rounds
    gather-free: within one scan the map is immutable and poses move
    millimeters between rounds (the reference FREEZES associations across
    its iterOpt rounds entirely, Estimator.cpp:160-170 — re-selecting
    from rows gathered at the round-0 pose is strictly fresher).  The one
    approximation vs a fresh gather: the stencil window stays centered on
    the round-0 voxel, so a query whose pose correction crosses a voxel
    boundary sees its reach displaced by that correction (bounded by the
    outer-round pose delta; candidates remain genuine map centroids with
    exact offsets, so fits and gates stay exact).

    Returns (dxd, dyd, dzd, d2d) in the same storage dtype, barriered like
    `query_candidates_dense`.
    """
    dxd, dyd, dzd, d2d = dense
    f32 = delta.dtype
    ok = jnp.isfinite(d2d.astype(f32))
    dx = dxd.astype(f32) - delta[:, 0:1]
    dy = dyd.astype(f32) - delta[:, 1:2]
    dz = dzd.astype(f32) - delta[:, 2:3]
    d2 = jnp.where(ok, dx * dx + dy * dy + dz * dz, jnp.inf)
    out_dtype = d2d.dtype
    r = lambda a: a.astype(out_dtype)
    return jax.lax.optimization_barrier((r(dx), r(dy), r(dz), r(d2)))


def kth_smallest_dense(d2d, k: int):
    """k-th smallest entry of a dense (M, C) block (inf-padded invalid).

    Returns t (M,): inf when fewer than k finite entries exist.  Exact
    f32 ties are handled with tie-INCLUSIVE semantics: t is the smallest
    distinct value whose cumulative count reaches k (consumers select
    `d2 <= t`, which may pick more than k candidates; they divide by the
    true count, so moments stay correct — the kd-tree this replaces
    breaks such ties arbitrarily).

    Implementation: k sequential distinct-min extractions, then one
    counting pass.  Measured on v5e at flagship shapes this is ~4x
    cheaper than `lax.top_k` (a full bitonic sort of the (M, 256) block)
    and ~2x cheaper than `lax.approx_min_k` + exact refine.
    """
    ms = []
    t = jnp.full((d2d.shape[0],), -jnp.inf, d2d.dtype)
    for _ in range(k):
        t = jnp.min(jnp.where(d2d > t[:, None], d2d, jnp.inf), axis=1)
        ms.append(t)
    mstack = jnp.stack(ms, axis=1)                       # (M,k) ascending
    # tie-inclusive cumulative counts of all k thresholds in ONE pass
    cnts = jnp.sum((d2d[:, :, None] <= mstack[:, None, :]), axis=1)
    return jnp.min(jnp.where(cnts >= k, mstack, jnp.inf), axis=1)


def kth_smallest(d2, ok, k: int):
    """k-th smallest valid squared distance per query (threshold only).

    Returns t (M,): the k-th smallest valid entry of d2 (inf when fewer
    than k valid candidates exist).  See `kth_smallest_dense` for the
    tie semantics; this wrapper densifies the padded (M, S, cpr) block
    first (the optimization_barrier pins it in HBM so XLA cannot
    rematerialize the candidate computation — and its row gathers! —
    into each reduction fusion).
    """
    M = d2.shape[0]
    C = d2.shape[1] * d2.shape[2]
    cur = jnp.where(ok, d2, jnp.inf).reshape(M, C)
    return kth_smallest_dense(jax.lax.optimization_barrier(cur), k)


def select_k_smallest(d2, ok, k: int):
    """Value-threshold k-smallest selection over the candidate axes.

    Returns (t_k (M,), n (M,), w (M,S,cpr)): the k-th smallest valid
    distance (see `kth_smallest` for the tie semantics), the selected
    count, and the selection mask.  (The estimator's hot path uses
    `kth_smallest` + a fused masked-moment matmul instead — the explicit
    (M, S, cpr) mask lives in 32-of-128-lane padded tiles, and every
    pass over it costs 4x its logical size; this entry point serves
    calibration and tests.)
    """
    t = kth_smallest(d2, ok, k)
    w = ok & (d2 <= t[:, None, None])
    n = jnp.sum(w, axis=(1, 2))
    return t, n, w


def query_knn(vm: VoxelMap, q, mask, cfg):
    """k nearest map centroids for each query point.

    q: (M, 3) world-frame queries, mask: (M,) validity.
    Returns (neighbors (M,K,3), valid (M,K) bool, dist2 (M,K)) with
    neighbors sorted by ascending distance; invalid entries have dist2=inf.
    Replaces `nearestKSearch(5)` over the matched cube's KD-tree.

    The candidate set is every cell in the superrows covering the fine
    stencil; the k-NN are exact nearest-by-centroid within the candidates.
    (The estimator's association path uses query_candidates + masked
    moment reductions instead — explicit neighbor materialization via
    top_k measured ~12 ms/scan; this entry point serves calibration and
    tooling.)
    """
    cpr = _cpr(cfg)
    M = q.shape[0]
    dx, dy, dz, d2, ok = query_candidates(vm, q, mask, cfg)
    S = d2.shape[1]
    C = S * cpr
    neg, idx = jax.lax.top_k(-d2.reshape(M, C), cfg.knn)    # (M,K)
    take = lambda a: jnp.take_along_axis(a.reshape(M, C), idx, axis=1)
    nbr = jnp.stack([take(dx), take(dy), take(dz)], axis=-1) + q[:, None, :]
    valid = take(ok)
    return nbr, valid, -neg


def cell_centroids(vm: VoxelMap, cfg):
    """All valid cell centroids — for map export / visualization.

    Returns (C,3) centroids and a (C,) validity mask; the fine-voxel corner
    is reconstructed from the cell's flat index and its epoch key.
    """
    px, py, pz = _pack(cfg)
    sdx, sdy, sdz = _sdims(cfg)
    cpr = _cpr(cfg)
    n = sdx * sdy * sdz * cpr
    idx = jnp.arange(n, dtype=jnp.int32)
    slot = idx // cpr
    sub = idx % cpr
    mz = slot % sdz
    my = (slot // sdz) % sdy
    mx = slot // (sdz * sdy)
    keyi = jnp.floor(vm.meta / _META_MOD).astype(jnp.int32)
    qz = (keyi & 31) - 16
    qy = ((keyi >> 5) & 31) - 16
    qx = ((keyi >> 10) & 31) - 16
    sux = sub // (py * pz)
    suy = (sub // pz) % py
    suz = sub % pz
    v = jnp.stack([(qx * sdx + mx) * px + sux,
                   (qy * sdy + my) * py + suy,
                   (qz * sdz + mz) * pz + suz], axis=-1)
    cnt = vm.count
    valid = cnt > 0
    centroid = (v.astype(jnp.float32) * cfg.voxel_size
                + vm.sum_rel / jnp.maximum(cnt, 1.0)[:, None])
    return centroid, valid
