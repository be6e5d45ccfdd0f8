"""Bridge to the compiled upstream-reference renderer (native/ref_harness.cpp).

Dumps a visionaray_tpu Scene to the harness's text format, compiles the
harness on demand against the read-only reference checkout, runs it, and
loads the raw f32 framebuffer back — giving pytest TRUE reference images
(VERDICT round 1 Missing #10) and bench.py a same-scene CPU baseline.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_INCLUDE = "/root/reference/include"
HARNESS_SRC = os.path.join(REPO, "native", "ref_harness.cpp")
HARNESS_BIN = os.path.join(REPO, "build", "ref_harness")

_MTYPE_NAMES = {0: "emissive", 1: "matte", 2: "mirror", 3: "plastic"}


def harness_available() -> bool:
    return os.path.isdir(REFERENCE_INCLUDE)


def build_harness() -> str:
    """Compile (or reuse) the harness binary; returns its path."""
    if (os.path.exists(HARNESS_BIN)
            and os.path.getmtime(HARNESS_BIN) >= os.path.getmtime(HARNESS_SRC)):
        return HARNESS_BIN
    os.makedirs(os.path.dirname(HARNESS_BIN), exist_ok=True)
    subprocess.run(
        ["g++", "-std=c++14", "-O2", "-w", "-march=native",
         "-I" + REFERENCE_INCLUDE, "-o", HARNESS_BIN, HARNESS_SRC,
         "-pthread"],
        check=True, capture_output=True)
    return HARNESS_BIN


def _fmt3(v) -> str:
    v = np.asarray(v, np.float64).reshape(-1)
    return f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}"


def dump_scene(scene, cam, path: str, bg=(0.1, 0.4, 1.0, 1.0),
               ambient=(0.0, 0.0, 0.0, 0.0)):
    """Write the harness scene file for a (triangles+spheres) Scene."""
    lines = []
    lines.append(
        f"camera {_fmt3(cam.eye)} {_fmt3(cam.center)} {_fmt3(cam.up)} "
        f"{float(cam.fovy):.9g}")
    lines.append("bg " + " ".join(f"{float(x):.9g}" for x in bg))
    lines.append("ambient " + " ".join(f"{float(x):.9g}" for x in ambient))
    lt = scene.lights
    for i in range(lt.num_lights):
        att = np.asarray(lt.attenuation[i], np.float64)
        lines.append(
            f"light {_fmt3(lt.position[i])} {_fmt3(lt.cl[i])} "
            f"{float(lt.kl[i]):.9g} {att[0]:.9g} {att[1]:.9g} {att[2]:.9g}")
    m = scene.materials
    for i in range(m.num_materials):
        name = _MTYPE_NAMES[int(m.mtype[i])]
        lines.append(
            f"mat {name} {_fmt3(m.ca[i])} {float(m.ka[i]):.9g} "
            f"{_fmt3(m.cd[i])} {float(m.kd[i]):.9g} "
            f"{_fmt3(m.cs[i])} {float(m.ks[i]):.9g} "
            f"{float(m.specular_exp[i]):.9g} "
            f"{_fmt3(m.cr[i])} {float(m.kr[i]):.9g} "
            f"{_fmt3(m.ior[i])} {_fmt3(m.absorption[i])} "
            f"{_fmt3(m.ce[i])} {float(m.ls[i]):.9g}")
    if scene.mesh is not None:
        v1, e1, e2 = (np.asarray(a, np.float64)
                      for a in scene.mesh.corners())
        gids = np.asarray(scene.mesh.geom_ids)
        for i in range(v1.shape[0]):
            lines.append(f"tri {_fmt3(v1[i])} {_fmt3(e1[i])} "
                         f"{_fmt3(e2[i])} {int(gids[i])}")
    if scene.spheres is not None:
        c = np.asarray(scene.spheres.center, np.float64)
        r = np.asarray(scene.spheres.radius, np.float64)
        gids = np.asarray(scene.spheres.geom_ids)
        for i in range(r.shape[0]):
            lines.append(f"sphere {_fmt3(c[i])} {r[i]:.9g} {int(gids[i])}")
    assert scene.planes is None, \
        "harness scenes use large ground triangles instead of planes"
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_raw(path: str) -> np.ndarray:
    """Read the harness's raw f32 RGBA dump -> (H, W, 4), row 0 = bottom."""
    with open(path, "rb") as f:
        w, h = np.fromfile(f, np.int32, 2)
        data = np.fromfile(f, np.float32, int(w) * int(h) * 4)
    return data.reshape(int(h), int(w), 4)


def render_reference(scene, cam, width, height, algo="simple", bounces=4,
                     bg=(0.1, 0.4, 1.0, 1.0), ambient=(0.0, 0.0, 0.0, 0.0),
                     workdir="/tmp") -> np.ndarray:
    """Render `scene` with the REAL reference library; returns (H, W, 4)."""
    binary = build_harness()
    scene_path = os.path.join(workdir, "ref_scene.txt")
    out_path = os.path.join(workdir, "ref_out.raw")
    dump_scene(scene, cam, scene_path, bg=bg, ambient=ambient)
    subprocess.run(
        [binary, "parity", scene_path, out_path, algo,
         str(width), str(height), str(bounces)],
        check=True, capture_output=True, timeout=600)
    return load_raw(out_path)


def bench_reference(scene, cam, width, height, bounces=5, frames=3,
                    bg=(0.2, 0.3, 0.5, 1.0), ambient=(1.0, 1.0, 1.0, 1.0),
                    workdir="/tmp") -> dict:
    """Run the reference's tiled+SIMD pathtracer on `scene`; returns the
    parsed JSON metrics line (mrays_per_s etc.)."""
    import json
    binary = build_harness()
    scene_path = os.path.join(workdir, "ref_bench_scene.txt")
    dump_scene(scene, cam, scene_path, bg=bg, ambient=ambient)
    res = subprocess.run(
        [binary, "bench", scene_path, str(width), str(height),
         str(bounces), str(frames)],
        check=True, capture_output=True, timeout=3600)
    return json.loads(res.stdout.decode().strip().splitlines()[-1])
