"""SceneHost -> device pytrees + compiled shading programs.

Flattens all per-mesh BVHs and the TLAS into unified global node arrays
(node ids: [0, tlas_end) = TLAS, then each BLAS block), packs triangles,
instances, spheres, builds the global material table, dedups material node
graphs (the hash-consing analogue) and prepares the differentiable
ShadeParams tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax.numpy as jnp

from craytpu.ops import shading
from craytpu.ops.camera import CameraHost, make_camera_ray_fn
from craytpu.scene.device import Geometry, ShadeGeom, INST_MESH, INST_SPHERE
from craytpu.scene.types import Prefs, SceneHost

F = np.float32
I = np.int32


@dataclass
class CompiledScene:
    geom: Geometry
    shade: ShadeGeom
    params: shading.ShadeParams
    mat_graph: jnp.ndarray        # (K,) i32 material -> graph id
    graphs: list                  # unique bsdf IRs (static)
    bg_ir: Any
    reg: shading.Registry
    camera: CameraHost
    prefs: Prefs
    tlas_end: int
    stack_depth: int
    n_instances: int
    max_leaf_tris: int = 16
    max_leaf_inst: int = 16
    dense_meta: dict = None  # per-mesh MXU coefficient blocks (dense_isect)

    def bsdf_fns(self, kind: str):
        return [shading.compile_bsdf(g, self.reg, kind) for g in self.graphs]

    def background_fn(self):
        return shading.compile_background(self.bg_ir, self.reg)

    def camera_fn(self, kind: str):
        return make_camera_ray_fn(self.camera, kind)


def _cross_fms(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """vecCross with the reference BINARY's rounding: the contracted
    build computes cross_i = fma(a_j, b_k, -(a_k*b_j)) — one f32-rounded
    product, one fused one. Emulated via f64 (product exact in f64; the
    final f64->f32 round matches a true fma except ~2^-29-probability
    double-rounding ties). Device-side analogue: vecmath.vcross."""
    def fms(x, y, c):
        return (x.astype(np.float64) * y.astype(np.float64)
                - c.astype(np.float64)).astype(F)
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    return np.stack([
        fms(ay, bz, (az * by).astype(F)),
        fms(az, bx, (ax * bz).astype(F)),
        fms(ax, by, (ay * bx).astype(F)),
    ], axis=1)


def _mat34(A: np.ndarray) -> np.ndarray:
    return A[:3, :4].astype(F)


_CONST_KINDS = ("const_color", "const_value", "const_vec")


def _skeleton(ir):
    """IR with constant-node VALUES stripped (structure key)."""
    if isinstance(ir, tuple):
        if len(ir) and ir[0] in _CONST_KINDS:
            return (ir[0],)
        return tuple(_skeleton(x) for x in ir)
    return ir


def _build_structures(irs: list, K: int, reg) -> tuple:
    """Group materials by graph structure; emit param-indirected IRs.

    Returns (structures, mat_graph (K,) i32). Singleton groups keep their
    concrete IR (no indirection cost)."""
    from craytpu.scene.nodegraph import warning_bsdf
    irs = [ir if ir is not None else warning_bsdf() for ir in irs]
    groups: dict = {}
    for k, ir in enumerate(irs):
        groups.setdefault(_skeleton(ir), []).append(k)

    Kp = max(K, 1)
    param_kind = {"const_color": ("param_color", reg.color_idx),
                  "const_value": ("param_value", reg.value_idx),
                  "const_vec": ("param_vec", reg.vec_idx)}

    def xform(subs: list, members: list):
        head = subs[0]
        if isinstance(head, tuple):
            if len(head) and head[0] in _CONST_KINDS:
                pk, register = param_kind[head[0]]
                tbl = np.zeros(Kp, np.int32)
                for m_k, s in zip(members, subs):
                    tbl[m_k] = register(s[1])
                return (pk, tbl)
            return tuple(
                xform([s[i] for s in subs], members)
                if isinstance(head[i], tuple) else head[i]
                for i in range(len(head)))
        return head

    structures = []
    mat_graph = np.zeros(Kp, np.int32)
    for sk, members in groups.items():
        gi = len(structures)
        if len(members) == 1:
            structures.append(irs[members[0]])
        else:
            structures.append(xform([irs[k] for k in members], members))
        for m_k in members:
            mat_graph[m_k] = gi
    return structures, mat_graph


def compile_scene(scene: SceneHost) -> CompiledScene:
    # ---- global material table: mesh materials (mesh order) then spheres
    materials = []
    mesh_mat_base = []
    for mesh in scene.meshes:
        mesh_mat_base.append(len(materials))
        materials.extend(mesh.materials)
    sphere_mat_ids = []
    for sph in scene.spheres:
        sphere_mat_ids.append(len(materials))
        materials.append(sph.material)

    emission = np.zeros((max(len(materials), 1), 4), F)
    ior = np.ones(max(len(materials), 1), F)
    for k, m in enumerate(materials):
        emission[k] = m.emission
        ior[k] = m.ior

    # ---- triangles (global order: mesh order)
    tri_base = []
    total_tris = sum(m.tri_vidx.shape[0] for m in scene.meshes)
    P = max(total_tris, 1)
    tri_packed = np.zeros((P, 12), F)
    tri_nidx = np.zeros((P, 3), I)
    tri_uvidx = np.zeros((P, 3), I)
    tri_has_n = np.zeros(P, bool)
    tri_uv_ok = np.zeros(P, bool)
    tri_mat = np.zeros(P, I)
    pos = 0
    verts = scene.vertices if scene.vertices is not None else np.zeros((1, 3), F)
    for mi, mesh in enumerate(scene.meshes):
        n = mesh.tri_vidx.shape[0]
        tri_base.append(pos)
        if n == 0:
            continue
        v0 = verts[mesh.tri_vidx[:, 0]].astype(F)
        v1 = verts[mesh.tri_vidx[:, 1]].astype(F)
        v2 = verts[mesh.tri_vidx[:, 2]].astype(F)
        e1 = v0 - v1  # poly.c:20
        e2 = v2 - v0  # poly.c:21
        nrm = _cross_fms(e1, e2)
        tri_packed[pos:pos + n] = np.concatenate([v0, e1, e2, nrm], axis=1)
        tri_nidx[pos:pos + n] = np.maximum(mesh.tri_nidx, 0)
        tri_uvidx[pos:pos + n] = np.maximum(mesh.tri_uvidx, 0)
        tri_has_n[pos:pos + n] = mesh.tri_has_n
        tri_uv_ok[pos:pos + n] = ((mesh.texcoord_count > 0)
                                  & (mesh.tri_uvidx[:, 0] != -1))
        tri_mat[pos:pos + n] = mesh_mat_base[mi] + mesh.tri_mat
        pos += n

    # ---- unified node arrays: TLAS first, then each BLAS
    tlas = scene.tlas
    node_blocks_b = [tlas.bounds]
    node_blocks_c = [tlas.child.copy()]
    node_blocks_n = [tlas.count.copy()]
    prim_blocks = [tlas.prim_indices.copy()]  # instance ids
    node_off = tlas.node_count
    prim_off = tlas.prim_indices.shape[0]
    blas_root = np.full(max(len(scene.meshes), 1), -1, I)
    max_blas_depth = 0
    for mi, mesh in enumerate(scene.meshes):
        b = mesh.bvh
        if b.node_count == 0:
            continue
        blas_root[mi] = node_off
        child = b.child.copy()
        inner = b.count == 0
        child[inner] += node_off
        child[~inner] += prim_off
        node_blocks_b.append(b.bounds)
        node_blocks_c.append(child)
        node_blocks_n.append(b.count)
        prim_blocks.append(b.prim_indices + tri_base[mi])
        node_off += b.node_count
        prim_off += b.prim_indices.shape[0]
        max_blas_depth = max(max_blas_depth, b.max_depth())

    node_bounds = np.concatenate(node_blocks_b) if node_off else \
        np.zeros((1, 6), F)
    node_child = np.concatenate(node_blocks_c).astype(I) if node_off else \
        np.zeros(1, I)
    node_count = np.concatenate(node_blocks_n).astype(I) if node_off else \
        np.zeros(1, I)
    prim_idx = (np.concatenate(prim_blocks).astype(I) if prim_off
                else np.zeros(1, I))

    # ---- instances
    n_inst = len(scene.instances)
    Imax = max(n_inst, 1)
    inst_A = np.zeros((Imax, 3, 4), F)
    inst_Ainv = np.zeros((Imax, 3, 4), F)
    inst_kind = np.zeros(Imax, I)
    inst_obj = np.zeros(Imax, I)
    inst_offset = np.zeros(Imax, F)
    inst_density = np.zeros(Imax, F)
    for i, inst in enumerate(scene.instances):
        inst_A[i] = _mat34(inst.transform.A)
        inst_Ainv[i] = _mat34(inst.transform.Ainv)
        inst_kind[i] = inst.kind
        inst_obj[i] = inst.obj_index
        inst_density[i] = inst.density
        if inst.kind == INST_MESH:
            inst_offset[i] = scene.meshes[inst.obj_index].ray_offset
        elif inst.kind == INST_SPHERE:
            inst_offset[i] = scene.spheres[inst.obj_index].ray_offset

    # ---- spheres
    S = max(len(scene.spheres), 1)
    sph_radius = np.full(S, 10.0, F)
    sph_mat = np.zeros(S, I)
    for si, sph in enumerate(scene.spheres):
        sph_radius[si] = sph.radius
        sph_mat[si] = sphere_mat_ids[si]

    geom = Geometry(
        node_bounds=jnp.asarray(node_bounds),
        node_child=jnp.asarray(node_child),
        node_count=jnp.asarray(node_count),
        prim_idx=jnp.asarray(prim_idx),
        tri_packed=jnp.asarray(tri_packed),
        inst_A=jnp.asarray(inst_A),
        inst_Ainv=jnp.asarray(inst_Ainv),
        inst_kind=jnp.asarray(inst_kind),
        inst_obj=jnp.asarray(inst_obj),
        inst_offset=jnp.asarray(inst_offset),
        inst_density=jnp.asarray(inst_density),
        blas_root=jnp.asarray(blas_root),
        sph_radius=jnp.asarray(sph_radius),
    )
    normals = scene.normals if scene.normals is not None and \
        scene.normals.shape[0] else np.zeros((1, 3), F)
    uvs = scene.uvs if scene.uvs is not None and scene.uvs.shape[0] else \
        np.zeros((1, 2), F)
    nidx = np.minimum(tri_nidx, normals.shape[0] - 1)
    uvidx = np.minimum(tri_uvidx, uvs.shape[0] - 1)
    tri_shade = np.zeros((P, 16), F)
    tri_shade[:, 0:3] = normals[nidx[:, 0]]
    tri_shade[:, 3:6] = normals[nidx[:, 1]]
    tri_shade[:, 6:9] = normals[nidx[:, 2]]
    tri_shade[:, 9:11] = uvs[uvidx[:, 0]]
    tri_shade[:, 11:13] = uvs[uvidx[:, 1]]
    tri_shade[:, 13:15] = uvs[uvidx[:, 2]]
    tri_mf = np.zeros((P, 2), I)
    tri_mf[:, 0] = tri_mat
    tri_mf[:, 1] = tri_has_n.astype(I) | (tri_uv_ok.astype(I) << 1)
    shade = ShadeGeom(
        tri_shade=jnp.asarray(tri_shade),
        tri_mf=jnp.asarray(tri_mf),
        sph_mat=jnp.asarray(sph_mat),
    )

    reg = shading.Registry(scene.textures)
    # Structure-keyed graph dedup: materials whose bsdf graphs differ only
    # in constant values share ONE compiled structure that reads its
    # constants through mat_id-indexed tables (param_* nodes). This is the
    # batched analogue of the reference's hash-consing, and it collapses
    # e.g. scene.json's 14 per-material graphs to 3 compiled programs.
    graphs, mat_graph = _build_structures(
        [m.bsdf_ir for m in materials], len(materials), reg)
    # pre-register all remaining constants by compiling every graph once
    # (indices are deterministic; the real compile happens per sampler kind)
    from craytpu.scene.nodegraph import background as bg_default
    bg_ir = scene.background_ir or bg_default()
    for g in graphs:
        shading.compile_bsdf(g, reg, "random")
    shading.compile_background(bg_ir, reg)
    params = reg.finalize(emission, ior)

    # Worst-case unified stack: every TLAS level can push a far node, every
    # mesh instance can be pending as a BLAS root, and the deepest BLAS path
    # pushes a far node per level. Overflowing pushes are dropped by the
    # traversal, but size generously so that never happens in practice.
    n_mesh_inst = sum(1 for x in scene.instances if x.kind == INST_MESH)
    stack_depth = (tlas.max_depth() + max_blas_depth
                   + min(n_mesh_inst, 64) + 8)
    stack_depth = max(stack_depth, 8)

    # static leaf-size caps for the traversal's masked prim loops
    max_leaf_inst = int(tlas.count.max()) if tlas.node_count else 1
    max_leaf_tris = 1
    for mesh in scene.meshes:
        if mesh.bvh.node_count:
            max_leaf_tris = max(max_leaf_tris, int(mesh.bvh.count.max()))

    # dense (MXU) traversal data: per-mesh coefficient blocks over the SAME
    # packed triangle rows the SIMT path uses — one layout for the XLA
    # dense search, one (transposed + per-block bboxes + static instance
    # plan) for the Pallas flash-intersect kernel
    from craytpu.ops.dense_isect import build_tri_coeffs, build_tri_coeffs_T
    mesh_W = []
    WT_blocks, bb_blocks = [], []
    mesh_block_start, mesh_block_count = [], []
    mesh_root_bb = []
    nb_off = 0
    for mi, mesh in enumerate(scene.meshes):
        n = mesh.tri_vidx.shape[0] if mesh.tri_vidx is not None else 0
        if n == 0:
            mesh_W.append(None)
            mesh_block_start.append(0)
            mesh_block_count.append(0)
            mesh_root_bb.append(np.zeros(6, F))
            continue
        packed = tri_packed[tri_base[mi]:tri_base[mi] + n]
        mesh_W.append(jnp.asarray(build_tri_coeffs(packed)))
        WT, bb = build_tri_coeffs_T(packed)
        WT_blocks.append(WT)
        bb_blocks.append(bb)
        mesh_block_start.append(nb_off)
        mesh_block_count.append(WT.shape[0])
        nb_off += WT.shape[0]
        mesh_root_bb.append(np.array(
            [bb[:, 0].min(), bb[:, 1].max(), bb[:, 2].min(),
             bb[:, 3].max(), bb[:, 4].min(), bb[:, 5].max()], F))
    inst_order = [(i, inst.kind, inst.obj_index)
                  for i, inst in enumerate(scene.instances)]
    inst_rows = np.zeros((Imax, 24), F)
    plan = []
    mesh_plan = []
    sph_plan = []
    # per-mesh superblock (8-block group) bboxes over the block bboxes
    from craytpu.ops.flash2 import SB_BLOCKS
    bb_all = np.concatenate(bb_blocks) if bb_blocks else np.zeros((1, 8), F)
    mesh_sb_start, mesh_sb_count = [], []
    sb_rows = []
    for mi in range(len(scene.meshes)):
        b0, nb = mesh_block_start[mi], mesh_block_count[mi]
        mesh_sb_start.append(len(sb_rows))
        nsb = (nb + SB_BLOCKS - 1) // SB_BLOCKS
        mesh_sb_count.append(nsb)
        for s in range(nsb):
            blk = bb_all[b0 + s * SB_BLOCKS:b0 + min((s + 1) * SB_BLOCKS,
                                                     nb)]
            sb_rows.append([blk[:, 0].min(), blk[:, 1].max(),
                            blk[:, 2].min(), blk[:, 3].max(),
                            blk[:, 4].min(), blk[:, 5].max(), 0, 0])
    sb_bb = (np.asarray(sb_rows, F) if sb_rows else np.zeros((1, 8), F))
    for i, inst in enumerate(scene.instances):
        inst_rows[i, 0:12] = inst_Ainv[i].reshape(-1)
        inst_rows[i, 12] = inst_offset[i]
        if inst.kind == INST_MESH and mesh_W[inst.obj_index] is not None:
            mi = inst.obj_index
            inst_rows[i, 13:19] = mesh_root_bb[mi]
            plan.append((i, mesh_block_start[mi], mesh_block_count[mi],
                         int(tri_base[mi])))
            mesh_plan.append([i, mesh_block_start[mi],
                              mesh_block_count[mi], mesh_sb_start[mi],
                              mesh_sb_count[mi], int(tri_base[mi])])
        elif inst.kind == INST_SPHERE:
            inst_rows[i, 19] = sph_radius[inst.obj_index]
            sph_plan.append([i])

    # does any sphere's material graph read uv? (checker/image nodes) —
    # if not, hitrec skips the sphere uv trig (arctan2/arcsin per lane)
    def _reads_uv(ir):
        if isinstance(ir, tuple):
            if len(ir) and ir[0] in ("image", "checker"):
                return True
            return any(_reads_uv(x) for x in ir)
        return False
    sphere_uv = any(_reads_uv(scene.spheres[s].material.bsdf_ir)
                    for s in range(len(scene.spheres)))

    from craytpu.ops.hitrec import build_wide_rows
    tri_wide, inst_wide = build_wide_rows(
        tri_packed, tri_shade, tri_mf, inst_A, inst_Ainv, inst_offset,
        inst_kind, inst_obj, sph_mat, sph_radius)

    # PHI-major layout (NB, PHI, 4*TB): HBM DMA slices must keep the lane
    # dim (last, multiple of 128) intact. Stored as stacked hi/lo bf16
    # pairs so the winner search runs at ~f32 accuracy in ONE K=64 MXU
    # pass — see flash2.split_hi_lo.
    from craytpu.ops.flash2 import split_hi_lo
    W_all = (np.concatenate(WT_blocks) if WT_blocks
             else np.zeros((1, 16, 4 * 256), F))
    W_pad = split_hi_lo(np.concatenate(
        [W_all, np.zeros((SB_BLOCKS,) + W_all.shape[1:], F)]))
    # ---- NEE light table (north-star addition, ops/nee.py; the plain
    # integrator never reads it). World-space emissive entities = anything
    # whose LEGACY material emission is nonzero, matching exactly what
    # pathtrace.c:44 adds along BSDF paths. ----
    lt_kind, lt_mat, lt_p0, lt_e1, lt_e2, lt_n, lt_area = \
        [], [], [], [], [], [], []
    # materials whose emissive instance can't be sampled by the table
    # (non-uniformly scaled sphere = ellipsoid under the reference's
    # transformed-ray semantics; uniform-area sphere sampling would bias
    # it). Such emitters fall back to BSDF-path sampling: ALL lights of
    # that material are dropped from the table and the integrator's
    # post-NEE emission suppression skips them via lights_mat_mask.
    excluded_mats: set = set()
    for i, inst in enumerate(scene.instances):
        A4 = inst_A[i]
        if inst.kind == INST_SPHERE:
            m = sphere_mat_ids[inst.obj_index]
            if np.any(emission[m][:3] != 0.0):
                M = np.asarray(A4[:, :3], np.float64)
                MtM = M.T @ M
                s2 = float(np.trace(MtM)) / 3.0
                if not np.allclose(MtM, s2 * np.eye(3),
                                   rtol=1e-4, atol=1e-6 * max(s2, 1.0)):
                    excluded_mats.add(int(m))
                    continue
                c = A4[:, 3]
                rw = float(sph_radius[inst.obj_index]
                           * np.linalg.norm(A4[:, 0]))
                lt_kind.append(1)
                lt_mat.append(m)
                lt_p0.append(c)
                lt_e1.append([rw, 0, 0])
                lt_e2.append([0, 0, 0])
                lt_n.append([0, 0, 1])
                lt_area.append(4.0 * np.pi * rw * rw)
        elif inst.kind == INST_MESH:
            mi = inst.obj_index
            n = scene.meshes[mi].tri_vidx.shape[0] if \
                scene.meshes[mi].tri_vidx is not None else 0
            if n == 0:
                continue
            t0 = tri_base[mi]
            tm = tri_mat[t0:t0 + n]
            em = np.any(emission[tm][:, :3] != 0.0, axis=1)
            if not em.any():
                continue
            rows = tri_packed[t0:t0 + n][em]
            v0 = rows[:, 0:3]
            v1 = v0 - rows[:, 3:6]
            v2 = rows[:, 6:9] + v0
            R, T = A4[:, :3], A4[:, 3]
            w0 = v0 @ R.T + T
            w1 = v1 @ R.T + T
            w2 = v2 @ R.T + T
            e1w = w1 - w0
            e2w = w2 - w0
            cr = np.cross(e1w, e2w)
            ar = 0.5 * np.linalg.norm(cr, axis=1)
            nrm = cr / np.maximum(np.linalg.norm(cr, axis=1,
                                                 keepdims=True), 1e-20)
            for j in range(rows.shape[0]):
                if ar[j] <= 0:
                    continue
                lt_kind.append(0)
                lt_mat.append(int(tm[em][j]))
                lt_p0.append(w0[j])
                lt_e1.append(e1w[j])
                lt_e2.append(e2w[j])
                lt_n.append(nrm[j])
                lt_area.append(float(ar[j]))
    if excluded_mats:
        keep = [j for j in range(len(lt_kind))
                if int(lt_mat[j]) not in excluded_mats]
        lt_kind = [lt_kind[j] for j in keep]
        lt_mat = [lt_mat[j] for j in keep]
        lt_p0 = [lt_p0[j] for j in keep]
        lt_e1 = [lt_e1[j] for j in keep]
        lt_e2 = [lt_e2[j] for j in keep]
        lt_n = [lt_n[j] for j in keep]
        lt_area = [lt_area[j] for j in keep]
    # materials the table covers: the post-NEE emission suppression
    # (wavefront_pt step) must only suppress THESE — an emitter absent
    # from the table gets its direct light via BSDF paths instead
    lights_mat_mask = np.zeros(max(len(materials), 1), bool)
    for m in lt_mat:
        lights_mat_mask[int(m)] = True
    L = len(lt_kind)
    lights = None
    if L:
        lights = {
            "kind": jnp.asarray(np.asarray(lt_kind, I)),
            "mat": jnp.asarray(np.asarray(lt_mat, I)),
            "p0": jnp.asarray(np.asarray(lt_p0, F)),
            "e1": jnp.asarray(np.asarray(lt_e1, F)),
            "e2": jnp.asarray(np.asarray(lt_e2, F)),
            "n": jnp.asarray(np.asarray(lt_n, F)),
            "area": jnp.asarray(np.asarray(lt_area, F)),
            "count": L,
        }
    # NEE-eligible materials: a plain diffuse lobe, or the loader's
    # opaque alpha wrapper mix(transparent, diffuse, alpha(const a=1))
    # (nodegraph.append_alpha / material.c:58-65). The transparent branch
    # has probability 0 at a=1, so treating the material as pure diffuse
    # for light sampling is exact.
    def _nee_unwrap(ir):
        if not isinstance(ir, tuple) or not ir:
            return None, None
        if ir[0] == "diffuse":
            return ir[1], True
        if (ir[0] == "mix" and len(ir) == 4 and isinstance(ir[1], tuple)
                and ir[1] and ir[1][0] == "transparent"
                and isinstance(ir[2], tuple) and ir[2]
                and ir[2][0] == "diffuse"):
            fac = ir[3]
            opaque = (isinstance(fac, tuple) and len(fac) == 2
                      and fac[0] == "alpha"
                      and isinstance(fac[1], tuple)
                      and fac[1][0] == "const_color"
                      and float(fac[1][1][3]) == 1.0)
            return ir[2][1], opaque
        return None, None

    mat_nee = np.zeros(max(len(materials), 1), bool)
    for k, m in enumerate(materials):
        _, opaque = _nee_unwrap(m.bsdf_ir)
        mat_nee[k] = bool(opaque) and not np.any(emission[k][:3] != 0.0)
    diffuse_color_ir = {}
    for gi, g in enumerate(graphs):
        cir, _ = _nee_unwrap(g)
        if cir is not None:
            diffuse_color_ir[gi] = cir

    dense_meta = {
        "lights": lights,
        "lights_mat_mask": jnp.asarray(lights_mat_mask),
        "mat_nee": jnp.asarray(mat_nee),
        "diffuse_color_ir": diffuse_color_ir,
        "mesh_W": mesh_W,
        "mesh_base": list(tri_base),
        "inst_order": inst_order,
        "W_pad": jnp.asarray(W_pad),
        "bb": jnp.asarray(bb_all),
        "sb_bb": jnp.asarray(sb_bb),
        "inst_rows": jnp.asarray(inst_rows),
        "plan": tuple(plan),
        "mesh_plan": jnp.asarray(np.asarray(mesh_plan, I).reshape(-1, 6)
                                 if mesh_plan else np.zeros((1, 6), I)),
        "sph_plan": jnp.asarray(np.asarray(sph_plan, I).reshape(-1, 1)
                                if sph_plan else np.zeros((1, 1), I)),
        "n_mesh_inst": len(mesh_plan),
        "n_sph_inst": len(sph_plan),
        "nsb_max": max(mesh_sb_count) if mesh_sb_count else 1,
        "tri_wide": jnp.asarray(tri_wide),
        "inst_wide": jnp.asarray(inst_wide),
        "sphere_uv": bool(sphere_uv),
    }

    return CompiledScene(
        geom=geom, shade=shade, params=params,
        mat_graph=jnp.asarray(mat_graph), graphs=graphs, bg_ir=bg_ir,
        reg=reg, camera=scene.camera, prefs=scene.prefs,
        tlas_end=int(tlas.node_count), stack_depth=int(stack_depth),
        n_instances=n_inst, max_leaf_tris=max_leaf_tris,
        max_leaf_inst=max_leaf_inst, dense_meta=dense_meta)
