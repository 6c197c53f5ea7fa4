"""Generate the synthetic stress scenes (VERDICT round-1 item 2):

  assets/stress_highpoly.{obj,mtl,json} — a ~131k-triangle displaced
    sphere (the venus.json class of load; venusscaled.obj is a missing
    large blob in this environment, so high-poly claims need a synthetic
    stand-in, BASELINE.md)
  assets/stress_instances.{obj,mtl,json} — 64 instances of a ~2k-triangle
    sphere (the statues.json instancing class, 55 instances)

Deterministic; run once, outputs are committed.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "assets")


def sphere_mesh(n_lat, n_lon, displace=0.0, seed=7):
    """UV sphere with optional radial noise displacement -> (V, F)."""
    rng = np.random.default_rng(seed)
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = []
    for i, th in enumerate(lat):
        for ph in lon:
            r = 1.0
            if displace:
                r += displace * np.sin(5 * th) * np.cos(7 * ph) \
                    + displace * 0.5 * rng.standard_normal() * 0.0
            verts.append([r * np.sin(th) * np.cos(ph),
                          r * np.cos(th),
                          r * np.sin(th) * np.sin(ph)])
    verts = np.asarray(verts, np.float64)

    def vid(i, j):
        return i * n_lon + (j % n_lon)

    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            if i > 0:
                faces.append([a, b, c])
            if i < n_lat - 1:
                faces.append([b, d, c])
    return verts, np.asarray(faces, np.int64)


def write_obj(path, verts, faces, mtl, matname):
    """v/vt/vn triplet faces: the reference's OBJ parser segfaults on the
    bare `f v v v` form, and per-vertex normals exercise smooth shading."""
    nrm = verts / np.maximum(np.linalg.norm(verts, axis=1, keepdims=True),
                             1e-12)
    with open(path, "w") as f:
        f.write(f"mtllib {mtl}\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        f.write("vt 0.5 0.5\n")
        for n in nrm:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        f.write(f"usemtl {matname}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1}/1/{a + 1} {b + 1}/1/{b + 1} "
                    f"{c + 1}/1/{c + 1}\n")


def write_mtl(path, matname, kd):
    with open(path, "w") as f:
        f.write(f"newmtl {matname}\n")
        f.write(f"Kd {kd[0]} {kd[1]} {kd[2]}\n")
        f.write("illum 2\n")


SCENE_TMPL = """{{
\t"version": 1.0,
\t"renderer": {{
\t\t"samples": 8, "bounces": 12, "tileWidth": 64, "tileHeight": 64,
\t\t"outputFilePath": "output/", "outputFileName": "{name}",
\t\t"width": 1280, "height": 720
\t}},
\t"camera": {{
\t\t"FOV": 60.0,
\t\t"transforms": [
\t\t\t{{"type": "translate", "x": 0, "y": 2.0, "z": {camz}}},
\t\t\t{{"type": "rotateX", "degrees": 12}}
\t\t]
\t}},
\t"scene": {{
\t\t"ambientColor": {{
\t\t\t"down": {{"r": 0.8, "g": 0.8, "b": 0.8}},
\t\t\t"up": {{"r": 0.4, "g": 0.6, "b": 0.9}}
\t\t}},
\t\t"primitives": [
\t\t\t{{"type": "sphere", "radius": 0.6,
\t\t\t "color": {{"r": 1.0, "g": 0.95, "b": 0.8}}, "bsdf": "emissive",
\t\t\t "intensity": 20.0,
\t\t\t "instances": [{{"transforms": [
\t\t\t\t{{"type": "translate", "x": 4.0, "y": 6.0, "z": -2.0}}]}}]}}
\t\t],
\t\t"meshes": [
{meshes}
\t\t]
\t}}
}}
"""


def mesh_entry(obj, instances):
    inst = ",\n".join(
        "\t\t\t\t\t{\"transforms\": [" + t + "]}" for t in instances)
    return ("\t\t\t{\n\t\t\t\t\"fileName\": \"%s\",\n"
            "\t\t\t\t\"bsdf\": \"lambertian\",\n"
            "\t\t\t\t\"instances\": [\n%s\n\t\t\t\t]\n\t\t\t}"
            % (obj, inst))


def main():
    # high-poly: 256 x 256 UV sphere -> 2*255*256 = 130,560 tris
    v, fc = sphere_mesh(256, 256, displace=0.15)
    write_mtl(os.path.join(OUT, "stress_highpoly.mtl"), "stone",
              (0.6, 0.55, 0.5))
    write_obj(os.path.join(OUT, "stress_highpoly.obj"), v, fc,
              "stress_highpoly.mtl", "stone")
    meshes = mesh_entry("stress_highpoly.obj", [
        "{\"type\": \"scaleUniform\", \"scale\": 2.0}"])
    with open(os.path.join(OUT, "stress_highpoly.json"), "w") as f:
        f.write(SCENE_TMPL.format(name="stress_highpoly", camz=-6.0,
                                  meshes=meshes))
    print(f"stress_highpoly: {fc.shape[0]} tris")

    # instancing: 32 x 32 sphere (~1,984 tris) x 64 instances (8x8 grid)
    v2, fc2 = sphere_mesh(32, 32, displace=0.1)
    write_mtl(os.path.join(OUT, "stress_instances.mtl"), "blob",
              (0.5, 0.55, 0.7))
    write_obj(os.path.join(OUT, "stress_instances.obj"), v2, fc2,
              "stress_instances.mtl", "blob")
    insts = []
    for gx in range(8):
        for gz in range(8):
            insts.append(
                "{\"type\": \"translate\", \"x\": %.1f, \"y\": 0.0, "
                "\"z\": %.1f}" % ((gx - 3.5) * 2.5, (gz - 3.5) * 2.5))
    meshes = mesh_entry("stress_instances.obj", insts)
    with open(os.path.join(OUT, "stress_instances.json"), "w") as f:
        f.write(SCENE_TMPL.format(name="stress_instances", camz=-14.0,
                                  meshes=meshes))
    print(f"stress_instances: {fc2.shape[0]} tris x 64 instances")


if __name__ == "__main__":
    main()
