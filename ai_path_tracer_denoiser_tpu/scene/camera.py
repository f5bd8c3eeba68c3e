"""Camera derivation and the orbit (spherical) camera model.

Reproduces the reference math:
  * field-of-view / pixel-length derivation: scene.cpp:143-152,
  * the interactive orbit camera rebuild: main.cpp:122-140,
  * initial (phi, theta, zoom) extraction: main.cpp:66-78.

Quirk note (SURVEY.md §7): scene.cpp:148 computes ``camera.right`` from a
still-zero ``camera.view`` — masked in the reference because runCuda rebuilds
the whole basis on the first frame.  ``derive_camera`` computes ``right``
after ``view`` (the correct order); ``orbit_camera`` reproduces the rebuild
exactly, including its *unnormalized* right/up vectors (main.cpp:133-134),
which slightly widen the effective FOV and therefore matter for parity.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .structs import Camera


def derive_camera(resolution: Tuple[int, int], fovy_deg: float,
                  position, look_at, up) -> Camera:
    """Build a Camera from scene-file fields (RES/FOVY/EYE/LOOKAT/UP).

    Matches loadCamera (scene.cpp:142-152) including its non-standard FOV
    convention: ``yscaled = tan(fovy * pi/180)`` — the *full* fovy is used as
    the half-angle tangent argument (no /2).
    """
    w, h = resolution
    yscaled = math.tan(fovy_deg * (math.pi / 180.0))
    xscaled = (yscaled * w) / h
    fovx = math.degrees(math.atan(xscaled))
    position = np.asarray(position, np.float32)
    look_at = np.asarray(look_at, np.float32)
    up = np.asarray(up, np.float32)
    view = look_at - position
    view = view / np.linalg.norm(view)
    right = np.cross(view, up)
    right = right / np.linalg.norm(right)
    pixel_length = np.array([2 * xscaled / w, 2 * yscaled / h], np.float32)
    return Camera(
        position=jnp.asarray(position),
        look_at=jnp.asarray(look_at),
        view=jnp.asarray(view.astype(np.float32)),
        up=jnp.asarray(up),
        right=jnp.asarray(right.astype(np.float32)),
        fov=jnp.asarray(np.array([fovx, fovy_deg], np.float32)),
        pixel_length=jnp.asarray(pixel_length),
        resolution=(int(w), int(h)),
    )


def orbit_params_from_camera(camera: Camera):
    """Extract (phi, theta, zoom) from a camera, as main.cpp:66-78 does."""
    view = np.asarray(camera.view)
    view_xz = np.array([view[0], 0.0, view[2]])
    view_zy = np.array([0.0, view[1], view[2]])
    phi = math.acos(float(np.dot(view_xz / np.linalg.norm(view_xz), [0, 0, -1])))
    theta = math.acos(float(np.dot(view_zy / np.linalg.norm(view_zy), [0, 1, 0])))
    zoom = float(np.linalg.norm(np.asarray(camera.position) - np.asarray(camera.look_at)))
    return phi, theta, zoom


def orbit_camera(camera: Camera, phi: float, theta: float, zoom: float) -> Camera:
    """Rebuild the camera from spherical orbit parameters.

    Exact port of the runCuda camchanged block (main.cpp:126-138):
    position = lookAt + zoom*(sin phi sin theta, cos theta, cos phi sin theta),
    view = -normalize(offset), right = view x (0,1,0)  [unnormalized],
    up = right x view  [unnormalized].
    """
    offset = jnp.array([
        zoom * math.sin(phi) * math.sin(theta),
        zoom * math.cos(theta),
        zoom * math.cos(phi) * math.sin(theta),
    ], jnp.float32)
    view = -offset / jnp.linalg.norm(offset)
    u = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(view, u)       # NOT normalized (main.cpp:133)
    up = jnp.cross(right, view)      # NOT normalized (main.cpp:134)
    position = offset + camera.look_at
    return Camera(
        position=position, look_at=camera.look_at, view=view, up=up,
        right=right, fov=camera.fov, pixel_length=camera.pixel_length,
        resolution=camera.resolution,
    )


def orbit_path(camera: Camera, n_frames: int, dphi: float = 0.01,
               dtheta: float = 0.0, dzoom: float = 0.0):
    """Yield cameras along a smooth orbit pan — the data-generation camera
    path analogue of the reference's mouse-driven orbit (main.cpp:193-223)."""
    phi, theta, zoom = orbit_params_from_camera(camera)
    for i in range(n_frames):
        yield orbit_camera(camera, phi + dphi * i,
                           min(max(theta + dtheta * i, 1e-3), math.pi - 1e-3),
                           max(zoom + dzoom * i, 0.1))
