"""Parser for the reference's scene text format.

Grammar (scene.cpp:21-40): a file is a sequence of blocks introduced by
``MATERIAL <id>``, ``OBJECT <id>``, ``CAMERA`` or ``MESH <id>`` header lines;
each block is key/value lines terminated by a blank line.  Supported keys:

  MATERIAL: RGB, SPECEX, SPECRGB, REFL, REFR, REFRIOR, EMITTANCE
            (scene.cpp:171-192)
  OBJECT:   first line "sphere"|"cube", then "material <id>",
            then TRANS/ROTAT/SCALE/VEL lines (scene.cpp:54-90)
  CAMERA:   RES, FOVY, ITERATIONS, DEPTH, FILE + EYE/LOOKAT/UP
            (scene.cpp:109-140)
  MESH:     PATH, material, TRANS/ROTAT/SCALE/VEL (scene.cpp:219-255)

``//`` comment lines are tolerated anywhere (the reference relies on them
never starting a block).  CRLF endings are handled (utilities.cpp:62-92).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .structs import (CUBE, SPHERE, Scene, build_transformation_matrix,
                      empty_mesh, make_geoms, make_materials, make_mesh)
from .camera import derive_camera
from .obj_loader import load_obj


def _tokens(line: str) -> List[str]:
    return line.split()


def _vec3(tok: List[str]) -> tuple:
    return (float(tok[1]), float(tok[2]), float(tok[3]))


class _Lines:
    def __init__(self, text: str):
        # safeGetline equivalence: normalize CRLF/CR (utilities.cpp:62-92).
        self.lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
        self.i = 0

    def next(self) -> Optional[str]:
        if self.i >= len(self.lines):
            return None
        line = self.lines[self.i]
        self.i += 1
        return line


def parse_scene_text(text: str, base_dir: str = ".",
                     face_pad_multiple: int = 128) -> Scene:
    lines = _Lines(text)
    materials = []
    geoms = []
    mesh_records = []
    camera = None
    iterations, trace_depth, image_name = 5000, 8, "render"

    while True:
        line = lines.next()
        if line is None:
            break
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        tok = _tokens(line)
        head = tok[0]

        if head == "MATERIAL":
            rec = {}
            # Exactly 7 property lines (scene.cpp:171).
            for _ in range(7):
                t = _tokens(lines.next() or "")
                if not t:
                    continue
                if t[0] == "RGB":
                    rec["color"] = _vec3(t)
                elif t[0] == "SPECEX":
                    rec["specular_exponent"] = float(t[1])
                elif t[0] == "SPECRGB":
                    rec["specular_color"] = _vec3(t)
                elif t[0] == "REFL":
                    rec["has_reflective"] = float(t[1])
                elif t[0] == "REFR":
                    rec["has_refractive"] = float(t[1])
                elif t[0] == "REFRIOR":
                    rec["index_of_refraction"] = float(t[1])
                elif t[0] == "EMITTANCE":
                    rec["emittance"] = float(t[1])
            materials.append(rec)

        elif head == "OBJECT":
            shape = (lines.next() or "").strip()
            gtype = SPHERE if shape == "sphere" else CUBE
            mat_line = _tokens(lines.next() or "")
            rec = {"type": gtype, "material_id": int(mat_line[1]),
                   "translation": (0.0, 0.0, 0.0), "rotation": (0.0, 0.0, 0.0),
                   "scale": (1.0, 1.0, 1.0), "vel": (0.0, 0.0, 0.0)}
            while True:
                nxt = lines.next()
                if nxt is None or not nxt.strip():
                    break
                t = _tokens(nxt)
                if t[0] == "TRANS":
                    rec["translation"] = _vec3(t)
                elif t[0] == "ROTAT":
                    rec["rotation"] = _vec3(t)
                elif t[0] == "SCALE":
                    rec["scale"] = _vec3(t)
                elif t[0] == "VEL":
                    rec["vel"] = _vec3(t)
            geoms.append(rec)

        elif head == "CAMERA":
            res = (800, 800)
            fovy = 45.0
            eye = (0.0, 0.0, 0.0)
            look_at = (0.0, 0.0, 0.0)
            up = (0.0, 1.0, 0.0)
            # 5 static lines (scene.cpp:109) then EYE/LOOKAT/UP until blank.
            for _ in range(5):
                t = _tokens(lines.next() or "")
                if not t:
                    continue
                if t[0] == "RES":
                    res = (int(t[1]), int(t[2]))
                elif t[0] == "FOVY":
                    fovy = float(t[1])
                elif t[0] == "ITERATIONS":
                    iterations = int(t[1])
                elif t[0] == "DEPTH":
                    trace_depth = int(t[1])
                elif t[0] == "FILE":
                    image_name = t[1]
            while True:
                nxt = lines.next()
                if nxt is None or not nxt.strip():
                    break
                t = _tokens(nxt)
                if t[0] == "EYE":
                    eye = _vec3(t)
                elif t[0] == "LOOKAT":
                    look_at = _vec3(t)
                elif t[0] == "UP":
                    up = _vec3(t)
            camera = derive_camera(res, fovy, eye, look_at, up)

        elif head == "MESH":
            path = None
            material_id = 0
            translation, rotation, scale = (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
            vel = (0.0, 0.0, 0.0)
            t = _tokens(lines.next() or "")
            if t and t[0] == "PATH":
                path = t[1]
            t = _tokens(lines.next() or "")
            if t and t[0].lower() == "material":
                material_id = int(t[1])
            while True:
                nxt = lines.next()
                if nxt is None or not nxt.strip():
                    break
                t = _tokens(nxt)
                if t[0] == "TRANS":
                    translation = _vec3(t)
                elif t[0] == "ROTAT":
                    rotation = _vec3(t)
                elif t[0] == "SCALE":
                    scale = _vec3(t)
                elif t[0] == "VEL":
                    vel = _vec3(t)
            mesh_records.append(dict(path=path, material_id=material_id,
                                     translation=translation, rotation=rotation,
                                     scale=scale, vel=vel))

    if camera is None:
        raise ValueError("scene file has no CAMERA block")

    if mesh_records:
        # The reference supports exactly one mesh (scene.cpp:208); we merge
        # multiple MESH blocks into one triangle soup (a strict superset).
        all_v, all_n, all_m = [], [], []
        for rec in mesh_records:
            transform = build_transformation_matrix(
                rec["translation"], rec["rotation"], rec["scale"])
            obj_path = rec["path"]
            if not os.path.isabs(obj_path):
                obj_path = os.path.join(base_dir, obj_path)
            v, n = load_obj(obj_path, transform)
            all_v.append(v)
            all_n.append(n)
            all_m.append(np.full((v.shape[0],), rec["material_id"], np.int32))
        mesh = make_mesh(np.concatenate(all_v), np.concatenate(all_n),
                         np.concatenate(all_m), face_pad_multiple)
    else:
        mesh = empty_mesh(face_pad_multiple)

    return Scene(
        geoms=make_geoms(geoms),
        materials=make_materials(materials),
        mesh=mesh,
        camera=camera,
        iterations=iterations,
        trace_depth=trace_depth,
        image_name=image_name,
    )


def load_scene(path: str, face_pad_multiple: int = 128) -> Scene:
    with open(path, "r") as f:
        text = f.read()
    return parse_scene_text(text, base_dir=os.path.dirname(os.path.abspath(path)),
                            face_pad_multiple=face_pad_multiple)
