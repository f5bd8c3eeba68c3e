"""Deterministic procedural OBJ asset generator.

The reference ships binary-ish mesh assets (bunny/dragon/elephant OBJs used
by Inference/scenes/Scenes/cornell_mesh_*.txt); we generate our own compact
test meshes instead, spanning the same coverage axes:

  icosahedron.obj  —  20 faces, flat-shaded (normal-debug / fast tests)
  icosphere.obj    — 320 faces, smooth per-vertex normals
  torus.obj        — 800 faces, genus-1 (rays can pass through the hole)
  gem.obj          —  12 faces, sharp bipyramid (refraction caustics)
  statue.obj       — 81,920 faces, high-frequency noisy icosphere: the
                     bunny/dragon-class BVH stress asset (ops/bvh.py)
  blob.obj         — 5120 faces, noisy icosphere (chunked-intersect stress,
                     the "bunny-scale" asset)

Run: python tools/make_assets.py   (writes into assets/, overwriting)
"""
from __future__ import annotations

import os
import sys

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "assets")


def icosahedron():
    p = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
        [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
        [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    return v, f


def subdivide(v, f, levels):
    for _ in range(levels):
        cache = {}
        verts = list(map(tuple, v))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(tuple(m))
            return cache[key]

        new_f = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_f += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts, np.float64)
        f = np.asarray(new_f, np.int64)
    return v, f


def torus(major=1.0, minor=0.4, nu=20, nv=20):
    verts, norms = [], []
    for i in range(nu):
        for j in range(nv):
            u = 2 * np.pi * i / nu
            t = 2 * np.pi * j / nv
            cx, cz = major * np.cos(u), major * np.sin(u)
            x = (major + minor * np.cos(t)) * np.cos(u)
            y = minor * np.sin(t)
            z = (major + minor * np.cos(t)) * np.sin(u)
            verts.append([x, y, z])
            n = np.array([x - cx, y, z - cz])
            norms.append(n / np.linalg.norm(n))
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d]]
    return (np.asarray(verts), np.asarray(norms),
            np.asarray(faces, np.int64))


def gem(n_sides=6, height=1.2, radius=0.8):
    ring = [[radius * np.cos(2 * np.pi * k / n_sides), 0.0,
             radius * np.sin(2 * np.pi * k / n_sides)] for k in range(n_sides)]
    v = np.asarray(ring + [[0.0, height, 0.0], [0.0, -height, 0.0]])
    top, bot = n_sides, n_sides + 1
    f = []
    for k in range(n_sides):
        k2 = (k + 1) % n_sides
        f += [[k, top, k2], [k2, bot, k]]
    return v, np.asarray(f, np.int64)


def blob(levels=4, seed=0):
    """Noisy icosphere: smooth low-frequency radial displacement."""
    v, f = subdivide(*icosahedron(), levels)
    rng = np.random.default_rng(seed)
    freqs = rng.normal(size=(6, 3))
    phases = rng.uniform(0, 2 * np.pi, size=6)
    amps = 0.12 / (1 + np.arange(6))
    r = np.ones(len(v))
    for k in range(6):
        r += amps[k] * np.sin(v @ (freqs[k] * (k + 1.5)) + phases[k])
    v = v * r[:, None]
    # smooth vertex normals from face areas
    n = np.zeros_like(v)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    for i in range(3):
        np.add.at(n, f[:, i], fn)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    return v, n, f


def star(spike=0.9):
    """60-face spiked icosahedron — the timing-scene star polyhedron.

    The reference's timing scene 1 loads a great dodecicosacron (60
    intersecting faces; its Models/ dir is absent from the checkout), so
    the reproduction uses the same face-count class: each icosahedron
    face is replaced by 3 triangles to an out-pushed apex.
    """
    v, f = icosahedron()
    verts = list(map(np.asarray, v))
    faces = []
    for a, b, c in f:
        centroid = (verts[a] + verts[b] + verts[c]) / 3.0
        apex = centroid * (1.0 + spike)
        k = len(verts)
        verts.append(apex)
        faces += [[a, b, k], [b, c, k], [c, a, k]]
    return np.asarray(verts), np.asarray(faces, np.int64)


def write_obj(path, v, f, n=None, flat=False):
    lines = [f"# generated by tools/make_assets.py — {os.path.basename(path)}"]
    for p in v:
        lines.append("v {:.6f} {:.6f} {:.6f}".format(*p))
    if flat:
        # one flat normal per face; reference-style f v//vn
        for a, b, c in f:
            fn = np.cross(v[b] - v[a], v[c] - v[a])
            fn = fn / np.linalg.norm(fn)
            lines.append("vn {:.6f} {:.6f} {:.6f}".format(*fn))
        for i, (a, b, c) in enumerate(f):
            k = i + 1
            lines.append(f"f {a+1}//{k} {b+1}//{k} {c+1}//{k}")
    elif n is not None:
        for p in n:
            lines.append("vn {:.6f} {:.6f} {:.6f}".format(*p))
        for a, b, c in f:
            lines.append(f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1}")
    else:
        for a, b, c in f:
            lines.append(f"f {a+1} {b+1} {c+1}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"{path}: {len(v)} verts, {len(f)} faces")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    v, f = icosahedron()
    write_obj(os.path.join(OUT_DIR, "icosahedron.obj"), v, f, flat=True)

    v, f = subdivide(*icosahedron(), 2)
    write_obj(os.path.join(OUT_DIR, "icosphere.obj"), v, f, n=v.copy())

    v, n, f = torus()
    write_obj(os.path.join(OUT_DIR, "torus.obj"), v, f, n=n)

    v, f = gem()
    write_obj(os.path.join(OUT_DIR, "gem.obj"), v, f, flat=True)

    v, n, f = blob()
    write_obj(os.path.join(OUT_DIR, "blob.obj"), v, f, n=n)

    v, n, f = blob(levels=6, seed=7)
    write_obj(os.path.join(OUT_DIR, "statue.obj"), v, f, n=n)

    v, f = star()
    write_obj(os.path.join(OUT_DIR, "star.obj"), v, f, flat=True)


if __name__ == "__main__":
    sys.exit(main())
