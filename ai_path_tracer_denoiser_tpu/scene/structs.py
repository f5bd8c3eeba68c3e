"""Scene data model as JAX pytrees (struct-of-arrays).

The reference keeps POD structs shared host/device (sceneStructs.h:10-97) and
uploads arrays-of-structs with cudaMemcpy (pathtrace.cu:96-129).  On TPU the
natural layout is struct-of-arrays: every field is a dense ``(N, ...)`` array
so intersection/shading vectorize over the geometry axis and XLA keeps
everything in registers/VMEM.  Static metadata (counts, resolution) lives in
``meta_fields`` so the pytrees are jit-stable.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Geometry type ids — match the reference enum order (sceneStructs.h:10-13).
SPHERE = 0
CUBE = 1


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(cls, list(data_fields), list(meta_fields))
    return cls


@dataclasses.dataclass
class Geoms:
    """SoA of analytic primitives (reference ``Geom``, sceneStructs.h:20-30)."""

    type: jnp.ndarray          # (G,) int32, SPHERE/CUBE
    material_id: jnp.ndarray   # (G,) int32
    translation: jnp.ndarray   # (G, 3) f32
    rotation: jnp.ndarray      # (G, 3) f32 — degrees, XYZ order
    scale: jnp.ndarray         # (G, 3) f32
    vel: jnp.ndarray           # (G, 3) f32 — motion-blur velocity
    transform: jnp.ndarray           # (G, 4, 4) f32
    inverse_transform: jnp.ndarray   # (G, 4, 4) f32
    inv_transpose: jnp.ndarray       # (G, 4, 4) f32
    # Static mirror of ``type`` (hashable, jit-stable): lets the SoA
    # intersector unroll one test per geom instead of computing both the box
    # and the sphere test and selecting by a traced type id.
    type_tuple: Tuple[int, ...] = ()

    @property
    def count(self) -> int:
        return self.type.shape[0]


_register(Geoms,
          [f.name for f in dataclasses.fields(Geoms) if f.name != "type_tuple"],
          ["type_tuple"])


@dataclasses.dataclass
class Materials:
    """SoA material table (reference ``Material``, sceneStructs.h:46-56)."""

    color: jnp.ndarray              # (M, 3)
    specular_exponent: jnp.ndarray  # (M,)
    specular_color: jnp.ndarray     # (M, 3)
    has_reflective: jnp.ndarray     # (M,)
    has_refractive: jnp.ndarray     # (M,)
    index_of_refraction: jnp.ndarray  # (M,)
    emittance: jnp.ndarray          # (M,)

    @property
    def count(self) -> int:
        return self.color.shape[0]


_register(Materials, [f.name for f in dataclasses.fields(Materials)])


@dataclasses.dataclass
class MeshData:
    """SoA triangle soup (reference ``Face``, sceneStructs.h:40-44).

    Faces are padded to a lane-friendly multiple; ``valid`` masks the padding.
    ``num_faces`` is the true (unpadded) count and is static metadata.

    ``bvh`` optionally holds the cluster hierarchy (ops/bvh.py) built at
    load time for meshes past the brute-force knee; when present, the face
    arrays here are already in the BVH's Morton order so the scan path and
    the kernel path share one face order (and tie-breaking).
    """

    vertices: jnp.ndarray     # (F, 3, 3) f32 — world-space, pre-transformed
    normals: jnp.ndarray      # (F, 3, 3) f32 — unit, per-vertex
    material_id: jnp.ndarray  # (F,) int32
    valid: jnp.ndarray        # (F,) bool
    aabb_lb: jnp.ndarray      # (3,) f32  (reference MeshBoundingBox, sceneStructs.h:84-87)
    aabb_ub: jnp.ndarray      # (3,) f32
    bvh: object = None        # Optional[ops.bvh.MeshBVH]
    num_faces: int = 0        # static

    @property
    def padded_count(self) -> int:
        return self.vertices.shape[0]


_register(
    MeshData,
    ["vertices", "normals", "material_id", "valid", "aabb_lb", "aabb_ub",
     "bvh"],
    ["num_faces"],
)


@dataclasses.dataclass
class Camera:
    """Pinhole camera (reference ``Camera``, sceneStructs.h:58-67).

    ``resolution`` is static ((width, height)); vector quantities are arrays
    so camera motion does not recompile the tracer.
    """

    position: jnp.ndarray      # (3,)
    look_at: jnp.ndarray       # (3,)
    view: jnp.ndarray          # (3,)
    up: jnp.ndarray            # (3,)
    right: jnp.ndarray         # (3,)
    fov: jnp.ndarray           # (2,) degrees (fovx, fovy)
    pixel_length: jnp.ndarray  # (2,)
    resolution: Tuple[int, int] = (800, 800)  # static (width, height)


_register(
    Camera,
    ["position", "look_at", "view", "up", "right", "fov", "pixel_length"],
    ["resolution"],
)


@dataclasses.dataclass
class Scene:
    """Full scene: geometry + materials + mesh + camera + render state.

    ``iterations``/``trace_depth``/``image_name`` mirror the reference
    ``RenderState`` (sceneStructs.h:69-75); they are static metadata.
    """

    geoms: Geoms
    materials: Materials
    mesh: MeshData
    camera: Camera
    iterations: int = 5000
    trace_depth: int = 8
    image_name: str = "render"


_register(Scene, ["geoms", "materials", "mesh", "camera"],
          ["iterations", "trace_depth", "image_name"])


# ---------------------------------------------------------------------------
# Transform construction
# ---------------------------------------------------------------------------

def build_transformation_matrix(translation, rotation, scale) -> np.ndarray:
    """T * Rx * Ry * Rz * S with rotations in degrees.

    Matches utilityCore::buildTransformationMatrix (utilities.cpp:44-51):
    column-major glm composition translate @ rotX @ rotY @ rotZ @ scale,
    expressed here as standard row-vector-on-the-right 4x4 matrices.
    """
    t = np.asarray(translation, np.float64)
    r = np.radians(np.asarray(rotation, np.float64))
    s = np.asarray(scale, np.float64)

    def rot_x(a):
        c, si = math.cos(a), math.sin(a)
        return np.array([[1, 0, 0, 0], [0, c, -si, 0], [0, si, c, 0], [0, 0, 0, 1]], np.float64)

    def rot_y(a):
        c, si = math.cos(a), math.sin(a)
        return np.array([[c, 0, si, 0], [0, 1, 0, 0], [-si, 0, c, 0], [0, 0, 0, 1]], np.float64)

    def rot_z(a):
        c, si = math.cos(a), math.sin(a)
        return np.array([[c, -si, 0, 0], [si, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)

    tm = np.eye(4, dtype=np.float64)
    tm[:3, 3] = t
    sm = np.diag(np.concatenate([s, [1.0]]).astype(np.float64))
    m = tm @ rot_x(r[0]) @ rot_y(r[1]) @ rot_z(r[2]) @ sm
    return m.astype(np.float32)


def geom_matrices(translation, rotation, scale):
    """(transform, inverse, inverse-transpose) triplet for one geom."""
    m = build_transformation_matrix(translation, rotation, scale).astype(np.float64)
    inv = np.linalg.inv(m)
    return (m.astype(np.float32), inv.astype(np.float32),
            inv.T.copy().astype(np.float32))


# ---------------------------------------------------------------------------
# Construction helpers
# ---------------------------------------------------------------------------

def make_geoms(records) -> Geoms:
    """Build a ``Geoms`` SoA from a list of dict records."""
    if not records:
        z3 = np.zeros((0, 3), np.float32)
        z44 = np.zeros((0, 4, 4), np.float32)
        zi = np.zeros((0,), np.int32)
        return Geoms(jnp.asarray(zi), jnp.asarray(zi), jnp.asarray(z3),
                     jnp.asarray(z3), jnp.asarray(z3), jnp.asarray(z3),
                     jnp.asarray(z44), jnp.asarray(z44), jnp.asarray(z44),
                     type_tuple=())
    mats = [geom_matrices(r["translation"], r["rotation"], r["scale"]) for r in records]
    return Geoms(
        type_tuple=tuple(int(r["type"]) for r in records),
        type=jnp.asarray(np.array([r["type"] for r in records], np.int32)),
        material_id=jnp.asarray(np.array([r["material_id"] for r in records], np.int32)),
        translation=jnp.asarray(np.array([r["translation"] for r in records], np.float32)),
        rotation=jnp.asarray(np.array([r["rotation"] for r in records], np.float32)),
        scale=jnp.asarray(np.array([r["scale"] for r in records], np.float32)),
        vel=jnp.asarray(np.array([r.get("vel", (0, 0, 0)) for r in records], np.float32)),
        transform=jnp.asarray(np.stack([m[0] for m in mats])),
        inverse_transform=jnp.asarray(np.stack([m[1] for m in mats])),
        inv_transpose=jnp.asarray(np.stack([m[2] for m in mats])),
    )


def make_materials(records) -> Materials:
    def arr(key, default, width=None):
        vals = [r.get(key, default) for r in records]
        a = np.array(vals, np.float32)
        if width and a.ndim == 1:
            a = np.tile(a[:, None], (1, width))
        return jnp.asarray(a)

    return Materials(
        color=arr("color", (0, 0, 0)),
        specular_exponent=arr("specular_exponent", 0.0),
        specular_color=arr("specular_color", (0, 0, 0)),
        has_reflective=arr("has_reflective", 0.0),
        has_refractive=arr("has_refractive", 0.0),
        index_of_refraction=arr("index_of_refraction", 0.0),
        emittance=arr("emittance", 0.0),
    )


def pad_faces(vertices: np.ndarray, normals: np.ndarray, material_id: np.ndarray,
              multiple: int = 128):
    """Pad the face axis to a lane-friendly multiple with invalid faces."""
    f = vertices.shape[0]
    f_pad = max(multiple, ((f + multiple - 1) // multiple) * multiple)
    pad = f_pad - f
    if pad:
        vertices = np.concatenate([vertices, np.zeros((pad, 3, 3), np.float32)])
        normals = np.concatenate([normals, np.zeros((pad, 3, 3), np.float32)])
        material_id = np.concatenate([material_id, np.full((pad,), -1, np.int32)])
    valid = np.arange(f_pad) < f
    return vertices, normals, material_id, valid


# Meshes past this face count get a cluster BVH at load time (ops/bvh.py);
# below it, brute force is cheaper than traversal and the Pallas megakernel
# can bake the mesh (pallas_backend.MESH_BAKE_MAX_FACES).
BVH_MIN_FACES = 65


def make_mesh(vertices: np.ndarray, normals: np.ndarray, material_id: np.ndarray,
              multiple: int = 128, build_bvh: bool = None) -> MeshData:
    """Build padded ``MeshData`` + AABB from world-space triangles.

    The AABB mirrors Scene::update_mesh_box (scene.h:28-44) but initializes
    the upper bound to -inf rather than FLT_MIN (the reference uses
    ``std::numeric_limits<float>::min()`` — the smallest *positive* float — at
    scene.cpp:216-218, which only makes its box conservatively larger).

    ``build_bvh``: attach the cluster hierarchy (default: iff the mesh has
    more than ``BVH_MIN_FACES`` faces).  Building reorders the faces into
    Morton order, which changes nothing but exact-tie winners.
    """
    num = int(vertices.shape[0])
    vertices = np.asarray(vertices, np.float32)
    normals = np.asarray(normals, np.float32)
    material_id = np.asarray(material_id, np.int32)
    if build_bvh is None:
        build_bvh = num > BVH_MIN_FACES
    bvh = None
    if build_bvh and num > 0:
        from ..ops.bvh import build_mesh_bvh
        bvh, order = build_mesh_bvh(vertices, normals, material_id)
        vertices, normals, material_id = (
            vertices[order], normals[order], material_id[order])
    if num:
        lb = vertices.reshape(-1, 3).min(axis=0)
        ub = vertices.reshape(-1, 3).max(axis=0)
    else:
        lb = np.zeros(3, np.float32)
        ub = np.zeros(3, np.float32)
    v, n, m, valid = pad_faces(vertices, normals, material_id, multiple)
    return MeshData(
        vertices=jnp.asarray(v), normals=jnp.asarray(n),
        material_id=jnp.asarray(m), valid=jnp.asarray(valid),
        aabb_lb=jnp.asarray(lb.astype(np.float32)),
        aabb_ub=jnp.asarray(ub.astype(np.float32)),
        bvh=bvh,
        num_faces=num,
    )


def empty_mesh(multiple: int = 128) -> MeshData:
    return make_mesh(np.zeros((0, 3, 3), np.float32),
                     np.zeros((0, 3, 3), np.float32),
                     np.zeros((0,), np.int32), multiple)
