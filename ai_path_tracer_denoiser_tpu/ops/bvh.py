"""Host-side mesh acceleration structure build — a shallow wide "cluster BVH".

The reference intersects meshes by brute force: every ray tests every
triangle, gated only by one whole-mesh AABB (pathtrace.cu:258-281,
intersections.h:159-172).  That caps practical scenes at a few thousand
faces; the reference nevertheless ships bunny/dragon-class OBJ scenes
(scene.cpp:259-318, scenes/Scenes/cornell_mesh_dragon.txt), so matching it
needs an acceleration structure.

A classic pointer-chasing BVH is wrong for a TPU: per-ray divergent
traversal needs per-lane gathers, which the VPU cannot do.  Instead the
structure is a **fixed-shape 3-level cluster hierarchy** tuned to what the
hardware *can* do cheaply:

  faces   -> Morton-ordered, grouped into clusters of ``CLUSTER`` (32)
  clusters-> groups of ``FANOUT`` (8) per supercluster
  supers  -> groups of ``FANOUT`` (8) per hypercluster

Every level is a dense array of conservative AABBs; "traversal" is a pair
of nested ``fori_loop``s over these arrays with scalar ``pl.when`` gates
(render/mesh_kernel.py).  A visited cluster is tested as one full-width
(32, lanes) Moller-Trumbore block — the exact formulation of the brute
scan (ops/intersect.py:mesh_intersect_v), so results are bitwise equal.

Faces are **reordered in place** (the MeshData arrays themselves), so the
brute-force path and the BVH path share one face order and one tie-break.

AABBs are widened by a small relative epsilon so the f32 slab test can
never round a true hit out of its cluster; the widening only ever makes
culling more conservative (extra work, never a wrong image).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

# Faces per cluster (one MT block per visit).  Bigger clusters halve the
# per-visit fixed cost (DMA issue + predicate staging + loop trip) at the
# price of more MT arithmetic per visit; results are bitwise-identical
# for any value (the block one-hot + cross-cluster merge reproduce the
# dense scan's total order).  Env override is a measurement lever.
CLUSTER = int(_os.environ.get("APTD_BVH_CLUSTER", "32"))
FANOUT = 8        # clusters per super, supers per hyper

# Relative AABB widening: covers worst-case f32 rounding in the slab test.
_WIDEN_REL = 1e-5
_WIDEN_ABS = 1e-6

# Fill values for min/max REDUCTIONS over partially-padded groups: +big for
# the min side, -big for the max side, so padding children never widen a
# real parent's box.
_PAD_LB = np.float32(3e38)
_PAD_UB = np.float32(-3e38)

# Padding bounds ROW: a box that is genuinely DEAD under the kernels' slab
# test.  NOTE an "inverted" box (lb=+big, ub=-big) is NOT dead there: the
# slab test takes min/max of the two plane distances per axis, which
# neutralizes inversion — an inverted universe box tests as the universe,
# so padding nodes were descended, walking out-of-bounds children and
# issuing out-of-bounds face DMAs (the real root cause of round 3/4's
# small-mesh FAILED_PRECONDITION faults: any mesh whose level sizes need
# padding rows faulted; the statue — exactly 2560/320/40, zero padding —
# never did).  This row gives each axis a POINT interval at +3e38 (x),
# -3e38 (y), 0 (z): for every direction-sign combination the per-axis
# t-intervals are disjoint (tmax < tmin) or meet only at +/-inf where the
# strict entry < t_run cull kills them — fuzz-checked over 2e5 rays
# including zero-component directions.
_DEAD_ROW = np.array([3e38, -3e38, 0.0, 3e38, -3e38, 0.0, 0.0, 0.0],
                     np.float32)


@dataclasses.dataclass
class MeshBVH:
    """Kernel-ready mesh + hierarchy tables (all Morton face order).

    ``faces_packed`` is one (F, 19) f32 row per face — [v0 v1 v2 | n0 n1 n2
    | material_id] — kept in **HBM** by the kernel (a lane-padded VMEM copy
    would waste 128/19ths of the budget) and DMA'd per visited cluster as a
    contiguous (CLUSTER, 128) slab (rows padded to the 128-lane DMA
    alignment; cols 0-18 carry data).  Material ids ride as f32 (exact for
    ids < 2^24).  Bounds rows are [lbx lby lbz ubx uby ubz 0 0]; padding
    rows carry the _DEAD_ROW box, which can never pass the slab test.
    """

    faces_packed: jnp.ndarray    # (Fp, 128) f32 (cols 0-18 used)
    cluster_bounds: jnp.ndarray  # (Kp, 8) f32
    super_bounds: jnp.ndarray    # (Sp, 8) f32
    hyper_bounds: jnp.ndarray    # (Hp, 8) f32
    num_faces: int = 0           # static: true face count
    cluster: int = CLUSTER       # static: faces/cluster THIS bvh was
                                 # built with (r4 advisor: a serialized
                                 # bvh reused under a different
                                 # APTD_BVH_CLUSTER would otherwise
                                 # corrupt traversal silently)

    @property
    def padded_faces(self) -> int:
        return self.faces_packed.shape[0]

    @property
    def n_clusters(self) -> int:
        return self.cluster_bounds.shape[0]

    @property
    def n_supers(self) -> int:
        return self.super_bounds.shape[0]

    @property
    def n_hypers(self) -> int:
        return self.hyper_bounds.shape[0]

    # Real (unpadded) node counts, derivable statically from num_faces.
    # Rows past these are DEAD padding (never live in the slab test).
    @property
    def n_clusters_real(self) -> int:
        return max(1, -(-self.num_faces // self.cluster))

    @property
    def n_supers_real(self) -> int:
        return -(-self.n_clusters_real // FANOUT)

    @property
    def n_hypers_real(self) -> int:
        return -(-self.n_supers_real // FANOUT)


jax.tree_util.register_dataclass(
    MeshBVH,
    ["faces_packed", "cluster_bounds", "super_bounds", "hyper_bounds"],
    ["num_faces", "cluster"],
)


def morton_order(vertices: np.ndarray) -> np.ndarray:
    """Sort faces by the 30-bit Morton code of their centroid.

    Stable sort: faces with identical quantized centroids keep their input
    order, so rebuilding is deterministic.
    """
    c = vertices.astype(np.float64).mean(axis=1)            # (F, 3)
    lo = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.minimum((1023.0 * (c - lo) / ext), 1023.0).astype(np.uint64)

    def spread(x):
        x &= 0x3FF
        x = (x | (x << 16)) & np.uint64(0x30000FF)
        x = (x | (x << 8)) & np.uint64(0x300F00F)
        x = (x | (x << 4)) & np.uint64(0x30C30C3)
        x = (x | (x << 2)) & np.uint64(0x9249249)
        return x

    code = (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) \
        | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def _bounds_rows(vmin: np.ndarray, vmax: np.ndarray, pad_to: int) -> np.ndarray:
    """Stack (n,3) min/max into widened (pad_to, 8) rows."""
    n = vmin.shape[0]
    widen = _WIDEN_REL * np.maximum(np.abs(vmin), np.abs(vmax)) + _WIDEN_ABS
    rows = np.tile(_DEAD_ROW, (pad_to, 1))
    rows[:n, 0:3] = (vmin - widen).astype(np.float32)
    rows[:n, 3:6] = (vmax + widen).astype(np.float32)
    rows[:n, 6:8] = 0.0
    return rows


def _group_bounds(lb: np.ndarray, ub: np.ndarray, group: int,
                  pad_mult: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Min/max-reduce (n,3) child bounds into ceil(n/group) parent bounds.

    Row tables keep a 2*FANOUT minimum (see build_mesh_bvh padding note).
    """
    n = lb.shape[0]
    m = -(-n // group)
    pl_ = np.full((m * group, 3), _PAD_LB, lb.dtype)
    pu = np.full((m * group, 3), _PAD_UB, ub.dtype)
    pl_[:n] = lb
    pu[:n] = ub
    glb = pl_.reshape(m, group, 3).min(axis=1)
    gub = pu.reshape(m, group, 3).max(axis=1)
    pad = max(-(-m // pad_mult) * pad_mult, 2 * FANOUT)
    return glb, gub, _bounds_rows(glb, gub, pad)


MIN_PACKED_ROWS = 0   # no floor needed: padding rows are dead-row encoded


def build_mesh_bvh(vertices: np.ndarray, normals: np.ndarray,
                   material_id: np.ndarray,
                   reorder: bool = True,
                   min_packed_rows: int = MIN_PACKED_ROWS
                   ) -> Tuple[MeshBVH, np.ndarray]:
    """Build the hierarchy from (F,3,3) world-space faces.

    Returns (bvh, order) where ``order`` is the Morton permutation applied —
    the caller must apply the same permutation to its own face arrays so the
    brute-force path shares the BVH's face order (and tie-breaks).

    ``min_packed_rows``: optional lower bound on the packed face table's
    row count.  Default 0 — no floor.  History: rounds 3/4 chased
    "small-mesh" FAILED_PRECONDITION faults and briefly shipped a 4 MiB
    floor here on a mistaken HBM-placement theory; the actual root cause
    was the padding-row encoding (see _DEAD_ROW above): "inverted" padding
    boxes pass the orderless slab test, so any mesh whose level sizes
    required padding rows descended out-of-bounds children and issued
    out-of-bounds face DMAs.  With dead-row padding, 512-face soups and
    the 5,120-face blob run and match the dense scan bitwise on hardware
    with no floor (tools/hw_bvh_check.py, r4).
    """
    vertices = np.asarray(vertices, np.float32)
    normals = np.asarray(normals, np.float32)
    material_id = np.asarray(material_id, np.int32)
    f = vertices.shape[0]
    order = morton_order(vertices) if (reorder and f > 1) \
        else np.arange(f, dtype=np.int64)
    v = vertices[order]
    nrm = normals[order]
    mid = material_id[order]

    # Pad the face axis to a whole number of clusters AND clusters to a
    # whole number of supers, so every k in [0, Kp) indexes a full 32-face
    # block (padding clusters carry inverted AABBs and are never visited).
    # Every bounds level keeps a MINIMUM of 2*FANOUT rows: the v3 traversal
    # kernel reads 8-row batches at dynamic offsets, and tables of exactly
    # one batch faulted at runtime on hardware — the slack rows are
    # inverted can't-hit boxes, never descended by either kernel.
    k = max(1, -(-f // CLUSTER))
    kp = max(-(-k // FANOUT) * FANOUT, 2 * FANOUT)
    fp = kp * CLUSTER
    rows = max(fp, int(min_packed_rows))
    packed = np.zeros((rows, 128), np.float32)  # row padded to 128 lanes (DMA alignment)
    packed[:, 18] = -1.0
    packed[:f, 0:9] = v.reshape(f, 9)
    packed[:f, 9:18] = nrm.reshape(f, 9)
    packed[:f, 18] = mid.astype(np.float32)

    # cluster bounds from real faces only (padding faces are degenerate but
    # excluding them keeps boxes tight)
    fmin = np.full((fp, 3), _PAD_LB, np.float32)
    fmax = np.full((fp, 3), _PAD_UB, np.float32)
    fmin[:f] = v.min(axis=1)
    fmax[:f] = v.max(axis=1)
    clb = fmin.reshape(kp, CLUSTER, 3).min(axis=1)[:k]
    cub = fmax.reshape(kp, CLUSTER, 3).max(axis=1)[:k]
    cluster_rows = _bounds_rows(clb, cub, kp)

    slb, sub_, super_rows_unpadded = _group_bounds(clb, cub, FANOUT, FANOUT)
    sp = super_rows_unpadded.shape[0]
    # hyper level over supers; padded to a multiple of FANOUT because the
    # v3 kernel tests hypers in vectorized batches of FANOUT rows
    _, _, hyper_rows = _group_bounds(slb, sub_, FANOUT, FANOUT)

    bvh = MeshBVH(
        faces_packed=jnp.asarray(packed),
        cluster_bounds=jnp.asarray(cluster_rows),
        super_bounds=jnp.asarray(super_rows_unpadded),
        hyper_bounds=jnp.asarray(hyper_rows),
        num_faces=int(f),
        cluster=CLUSTER,
    )
    assert bvh.n_supers * FANOUT >= bvh.n_clusters
    assert bvh.n_hypers * FANOUT >= bvh.n_supers, (bvh.n_hypers, sp)
    return bvh, order
