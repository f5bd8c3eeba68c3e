"""Motion blur: device-side geometry transform updates.

Equivalent of the moveGeom kernel + device buildTransformationMatrix
(pathtrace.cu:308-331, 441-446): every 4th iteration below iteration 3000,
each geom's translation is advanced by ``vel * dt`` and its transform triple
is rebuilt — here as a batched jnp matrix construction instead of a
one-thread-per-geom kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.structs import Geoms


def _build_matrices(translation, rotation_deg, scale):
    """Batched T @ Rx @ Ry @ Rz @ S, (G,4,4)."""
    g = translation.shape[0]
    r = jnp.radians(rotation_deg)
    cx, sx = jnp.cos(r[:, 0]), jnp.sin(r[:, 0])
    cy, sy = jnp.cos(r[:, 1]), jnp.sin(r[:, 1])
    cz, sz = jnp.cos(r[:, 2]), jnp.sin(r[:, 2])
    zeros = jnp.zeros((g,))
    ones = jnp.ones((g,))

    def mat(rows):
        return jnp.stack([jnp.stack(r_, axis=-1) for r_ in rows], axis=-2)

    rx = mat([[ones, zeros, zeros, zeros],
              [zeros, cx, -sx, zeros],
              [zeros, sx, cx, zeros],
              [zeros, zeros, zeros, ones]])
    ry = mat([[cy, zeros, sy, zeros],
              [zeros, ones, zeros, zeros],
              [-sy, zeros, cy, zeros],
              [zeros, zeros, zeros, ones]])
    rz = mat([[cz, -sz, zeros, zeros],
              [sz, cz, zeros, zeros],
              [zeros, zeros, ones, zeros],
              [zeros, zeros, zeros, ones]])
    t = mat([[ones, zeros, zeros, translation[:, 0]],
             [zeros, ones, zeros, translation[:, 1]],
             [zeros, zeros, ones, translation[:, 2]],
             [zeros, zeros, zeros, ones]])
    s = mat([[scale[:, 0], zeros, zeros, zeros],
             [zeros, scale[:, 1], zeros, zeros],
             [zeros, zeros, scale[:, 2], zeros],
             [zeros, zeros, zeros, ones]])
    return t @ rx @ ry @ rz @ s


def advance_geoms(geoms: Geoms, dt: float = 0.10) -> Geoms:
    """Integrate vel into translation and rebuild transform triples.

    Geoms with zero velocity are untouched (moveGeom early-out,
    pathtrace.cu:325-326).
    """
    moving = jnp.any(geoms.vel != 0.0, axis=-1)
    new_translation = jnp.where(moving[:, None],
                                geoms.translation + geoms.vel * dt,
                                geoms.translation)
    m = _build_matrices(new_translation, geoms.rotation, geoms.scale)
    inv = jnp.linalg.inv(m)
    transform = jnp.where(moving[:, None, None], m, geoms.transform)
    inverse_transform = jnp.where(moving[:, None, None], inv, geoms.inverse_transform)
    inv_transpose = jnp.where(moving[:, None, None],
                              jnp.swapaxes(inv, -1, -2), geoms.inv_transpose)
    return Geoms(
        type=geoms.type, material_id=geoms.material_id,
        translation=new_translation, rotation=geoms.rotation, scale=geoms.scale,
        vel=geoms.vel, transform=transform,
        inverse_transform=inverse_transform, inv_transpose=inv_transpose,
        type_tuple=geoms.type_tuple,
    )
