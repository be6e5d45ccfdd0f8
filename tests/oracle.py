"""Pure-numpy reference ray tracer — the golden-image oracle.

Independent re-implementation of the reference semantics (simple + whitted
kernels, brute-force closest/any hit) in plain numpy, used the way
Visionaray's scalar float path oracles its SIMD path (SURVEY.md §4).  It
shares no code with visionaray_tpu; discrepancies indicate a bug in one of
them.

Scene description is duck-typed off visionaray_tpu pytrees via np.asarray.
"""

from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(3.4028235e38)


def _norm(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def camera_rays(eye, center, up, fovy, aspect, width, height):
    eye = np.asarray(eye, np.float64)
    f = _norm(eye - np.asarray(center, np.float64))
    s = _norm(np.cross(np.asarray(up, np.float64), f))
    u = np.cross(f, s)
    t = np.tan(fovy / 2.0)
    cam_u, cam_v, cam_w = s * t * aspect, u * t, -f
    xs = np.arange(width)
    ys = np.arange(height)
    xx, yy = np.meshgrid(xs, ys)
    un = 2.0 * (xx + 0.5) / width - 1.0
    vn = 2.0 * (yy + 0.5) / height - 1.0
    d = _norm(cam_u[None, None] * un[..., None]
              + cam_v[None, None] * vn[..., None] + cam_w[None, None])
    o = np.broadcast_to(eye, d.shape)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def intersect_all(o, d, scene_np):
    """Brute force all primitives; returns dict of best-hit arrays."""
    N = o.shape[0]
    best_t = np.full(N, FLT_MAX, np.float64)
    best = dict(hit=np.zeros(N, bool), t=best_t,
                prim=np.zeros(N, np.int64), geom=np.zeros(N, np.int64),
                u=np.zeros(N), v=np.zeros(N))

    def consider(t, hit, pid, gid, u=None, v=None):
        valid = hit & (t >= 0.0) & (t < best["t"])
        best["hit"] |= valid
        best["t"] = np.where(valid, t, best["t"])
        best["prim"] = np.where(valid, pid, best["prim"])
        best["geom"] = np.where(valid, gid, best["geom"])
        best["u"] = np.where(valid, u if u is not None else 0.0, best["u"])
        best["v"] = np.where(valid, v if v is not None else 0.0, best["v"])

    pid = 0
    tris = scene_np.get("triangles")
    if tris is not None:
        v1, e1, e2, gids = tris
        for i in range(v1.shape[0]):
            s1 = np.cross(d, e2[i])
            div = np.einsum("nd,d->n", s1, e1[i])
            hit = div != 0.0
            inv = np.where(hit, 1.0 / np.where(div == 0, 1, div), 0.0)
            dd = o - v1[i]
            b1 = np.einsum("nd,nd->n", dd, s1) * inv
            hit &= (b1 >= 0.0) & (b1 <= 1.0)
            s2 = np.cross(dd, e1[i])
            b2 = np.einsum("nd,nd->n", d, s2) * inv
            hit &= (b2 >= 0.0) & (b1 + b2 <= 1.0)
            t = np.einsum("nd,d->n", s2, e2[i]) * inv
            consider(np.where(hit, t, -1.0), hit, pid + i, gids[i], b1, b2)
        pid += v1.shape[0]
    sph = scene_np.get("spheres")
    if sph is not None:
        centers, radii, gids = sph
        for i in range(len(radii)):
            oo = o - centers[i]
            A = np.einsum("nd,nd->n", d, d)
            B = 2.0 * np.einsum("nd,nd->n", d, oo)
            C = np.einsum("nd,nd->n", oo, oo) - radii[i] ** 2
            disc = B * B - 4 * A * C
            valid = disc >= 0
            rd = np.sqrt(np.where(valid, disc, 0.0))
            q = np.where(B < 0, -0.5 * (B - rd), -0.5 * (B + rd))
            qs = np.where(q == 0, 1.0, q)
            t = np.where(valid, np.minimum(q / A, C / qs), -1.0)
            consider(t, valid, pid + i, gids[i])
        pid += len(radii)
    pls = scene_np.get("planes")
    if pls is not None:
        normals, offs, gids = pls
        for i in range(len(offs)):
            s = np.einsum("nd,d->n", d, normals[i])
            hit = s != 0.0
            t = np.where(hit,
                         (offs[i] - np.einsum("nd,d->n", o, normals[i]))
                         / np.where(s == 0, 1, s), -1.0)
            consider(t, hit, pid + i, gids[i])
    return best


def any_hit(o, d, scene_np, max_t):
    b = intersect_all(o, d, scene_np)
    return b["hit"] & (b["t"] < max_t)


def get_surface(o, d, best, scene_np):
    N = o.shape[0]
    t = np.where(best["hit"], best["t"], 1.0)
    pos = o + d * t[:, None]
    gn = np.zeros((N, 3))
    sn = np.zeros((N, 3))
    pid = best["prim"].copy()
    ntri = 0
    tris = scene_np.get("triangles")
    if tris is not None:
        v1, e1, e2, _ = tris
        ntri = v1.shape[0]
        is_tri = pid < ntri
        ti = np.clip(pid, 0, max(ntri - 1, 0))
        n = _norm(np.cross(e1[ti], e2[ti]))
        gn = np.where(is_tri[:, None], n, gn)
        sn = np.where(is_tri[:, None], n, sn)
    nsph = 0
    sph = scene_np.get("spheres")
    if sph is not None:
        centers, radii, _ = sph
        nsph = len(radii)
        is_sph = (pid >= ntri) & (pid < ntri + nsph)
        si = np.clip(pid - ntri, 0, max(nsph - 1, 0))
        n = (pos - centers[si]) / radii[si][:, None]
        gn = np.where(is_sph[:, None], n, gn)
        sn = np.where(is_sph[:, None], n, sn)
    pls = scene_np.get("planes")
    if pls is not None:
        normals, offs, _ = pls
        npl = len(offs)
        is_pl = pid >= ntri + nsph
        li = np.clip(pid - ntri - nsph, 0, max(npl - 1, 0))
        gn = np.where(is_pl[:, None], normals[li], gn)
        sn = np.where(is_pl[:, None], normals[li], sn)
    return pos, gn, sn


def tex_color_at(scene_np, best):
    """Bilinear WRAP texture color at the hit (or ones when untextured).

    Triangles only (matching get_surface): uv = barycentric lerp of the
    per-corner uvs, sampled from the per-material texture with the
    half-texel-centered bilinear convention of texture.tex2d.
    """
    tex = scene_np.get("textures")
    N = best["prim"].shape[0]
    tc = np.ones((N, 3))
    if tex is None:
        return tc
    corner_uvs, texels, enabled = tex
    ntri = corner_uvs.shape[0]
    pid = np.clip(best["prim"], 0, max(ntri - 1, 0))
    is_tri = best["prim"] < ntri
    u, v = best["u"], best["v"]
    uv = ((1.0 - u - v)[:, None] * corner_uvs[pid, 0]
          + u[:, None] * corner_uvs[pid, 1]
          + v[:, None] * corner_uvs[pid, 2])
    gid = np.clip(best["geom"], 0, texels.shape[0] - 1)
    H, W = texels.shape[1], texels.shape[2]
    x = uv[:, 0] * W - 0.5
    y = uv[:, 1] * H - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        return texels[gid, np.mod(yi, H), np.mod(xi, W)]

    val = ((1 - fx) * (1 - fy) * fetch(x0, y0)
           + fx * (1 - fy) * fetch(x0 + 1, y0)
           + (1 - fx) * fy * fetch(x0, y0 + 1)
           + fx * fy * fetch(x0 + 1, y0 + 1))
    val = np.where(enabled[gid][:, None], val, 1.0)
    return np.where(is_tri[:, None], val, tc)


def shade_material(mats, gid, n, wo, wi, intensity, tex=None):
    """matte/plastic direct shading; mats is a dict of np arrays.

    ``tex``: optional (N,3) texture color multiplied into the diffuse and
    emissive terms (reference matte.inl:64, plastic.inl:62, emissive.inl:89).
    """
    mtype = mats["mtype"][gid]
    cd = mats["cd"][gid]
    if tex is not None:
        cd = cd * tex
    kd = mats["kd"][gid]
    cs = mats["cs"][gid]
    ks = mats["ks"][gid]
    exp = mats["specular_exp"][gid]
    ndotl = np.maximum(0.0, np.einsum("nd,nd->n", n, wi))
    diffuse = cd * (kd / np.pi)[:, None]
    h = _norm(wo + wi)
    hdotn = np.maximum(0.0, np.einsum("nd,nd->n", h, n))
    spec_col = cs * ks[:, None]
    schlick = spec_col + (1.0 - spec_col) * \
        (1.0 - np.clip(np.einsum("nd,nd->n", wi, h), 0, 1))[:, None] ** 5
    blinn = schlick * ((exp + 2.0) / (8.0 * np.pi)
                       * hdotn ** exp)[:, None]
    matte_c = np.pi * diffuse * intensity * ndotl[:, None]
    plastic_c = np.pi * (diffuse + blinn) * intensity * ndotl[:, None]
    ce = mats["ce"][gid]
    if tex is not None:
        ce = ce * tex
    emissive_c = ce * mats["ls"][gid][:, None]
    out = np.zeros_like(matte_c)
    out = np.where(mtype[:, None] == 1, matte_c, out)
    out = np.where(mtype[:, None] == 3, plastic_c, out)
    out = np.where(mtype[:, None] == 0, emissive_c, out)
    return out


def light_intensity(light, pos):
    p, cl, kl, att = light
    dist = np.linalg.norm(p - pos, axis=-1)
    a = att[0] + att[1] * dist + att[2] * dist * dist
    return cl[None, :] * (kl / a)[:, None]


def ambient_term(mats, gid, ambient_color):
    mtype = mats["mtype"][gid]
    amb = mats["ca"][gid] * mats["ka"][gid][:, None] * ambient_color[None, :3]
    return np.where((mtype[:, None] == 1) | (mtype[:, None] == 3), amb, 0.0)


def render_simple(scene_np, cam_np, width, height,
                  bg=(0.1, 0.4, 1.0, 1.0), ambient=(0.0, 0.0, 0.0, 0.0)):
    o, d = camera_rays(*cam_np, width, height)
    best = intersect_all(o, d, scene_np)
    pos, gn, sn = get_surface(o, d, best, scene_np)
    wo = -d
    n = np.where(np.einsum("nd,nd->n", gn, wo)[:, None] < 0.0, -sn, sn)
    bg = np.asarray(bg)
    ambient = np.asarray(ambient)
    shaded = ambient_term(scene_np["materials"], best["geom"], ambient)
    shaded = np.where(best["hit"][:, None], shaded, bg[None, :3])
    tex = tex_color_at(scene_np, best)
    for light in scene_np["lights"]:
        wi = _norm(light[0][None] - pos)
        inten = light_intensity(light, pos)
        clr = shade_material(scene_np["materials"], best["geom"],
                             n, wo, wi, inten, tex=tex)
        shaded = shaded + np.where(best["hit"][:, None], clr, 0.0)
    rgba = np.concatenate([shaded, np.ones((len(o), 1))], axis=-1)
    out = np.where(best["hit"][:, None], rgba, bg[None])
    return out.reshape(height, width, 4)


def render_whitted(scene_np, cam_np, width, height, bounces=4, epsilon=1e-3,
                   bg=(0.1, 0.4, 1.0, 1.0), ambient=(0.0, 0.0, 0.0, 0.0)):
    o, d = camera_rays(*cam_np, width, height)
    N = len(o)
    bg = np.asarray(bg)
    ambient = np.asarray(ambient)
    mats = scene_np["materials"]

    best = intersect_all(o, d, scene_np)
    first_hit = best["hit"].copy()
    color = np.zeros((N, 3))
    throughput = np.ones(N)
    no_hit_color = np.broadcast_to(bg[:3], (N, 3)).copy()
    active = first_hit.copy()

    for _ in range(bounces):
        live = active & (throughput > epsilon)
        pos, gn, sn = get_surface(o, d, best, scene_np)
        wo = -d
        n = np.where(np.einsum("nd,nd->n", gn, wo)[:, None] < 0.0, -sn, sn)
        shaded = ambient_term(mats, best["geom"], ambient)
        shaded = np.where(best["hit"][:, None], shaded, bg[None, :3])
        tex = tex_color_at(scene_np, best)
        for light in scene_np["lights"]:
            to_l = light[0][None] - pos
            dist = np.linalg.norm(to_l, axis=-1)
            wi = to_l / dist[:, None]
            occluded = any_hit(pos + wi * epsilon, wi, scene_np, dist)
            lit = best["hit"] & ~occluded
            inten = light_intensity(light, pos)
            clr = shade_material(mats, best["geom"], n, wo, wi, inten,
                                 tex=tex)
            shaded = shaded + np.where(lit[:, None], clr, 0.0)
        seg = np.where(best["hit"][:, None], shaded, no_hit_color)
        color += np.where(live[:, None], seg * throughput[:, None], 0.0)
        # specular bounce
        refl = 2.0 * np.einsum("nd,nd->n", sn, wo)[:, None] * sn - wo
        mtype = mats["mtype"][best["geom"]]
        kr = np.where(mtype == 1, 0.0,
                      np.where(mtype == 2, mats["kr"][best["geom"]], 0.1))
        o = pos + refl * epsilon
        d = refl
        best = intersect_all(o, d, scene_np)
        throughput = np.where(live, throughput * kr, throughput)
        active = live & best["hit"]
        no_hit_color = np.zeros_like(no_hit_color)

    rgba = np.concatenate([color, np.ones((N, 1))], axis=-1)
    out = np.where(first_hit[:, None], rgba, bg[None])
    return out.reshape(height, width, 4)


# ----------------------------------------------------------------------------
# Adapters from visionaray_tpu pytrees


def scene_to_np(scene):
    out = {}
    if scene.mesh is not None:
        import numpy as _np
        verts = _np.asarray(scene.mesh.vertices, _np.float64)
        faces = _np.asarray(scene.mesh.faces)
        v1 = verts[faces[:, 0]]
        e1 = verts[faces[:, 1]] - v1
        e2 = verts[faces[:, 2]] - v1
        out["triangles"] = (v1, e1, e2, np.asarray(scene.mesh.geom_ids))
    if scene.spheres is not None:
        out["spheres"] = (np.asarray(scene.spheres.center, np.float64),
                          np.asarray(scene.spheres.radius, np.float64),
                          np.asarray(scene.spheres.geom_ids))
    if scene.planes is not None:
        out["planes"] = (np.asarray(scene.planes.normal, np.float64),
                         np.asarray(scene.planes.offset, np.float64),
                         np.asarray(scene.planes.geom_ids))
    m = scene.materials
    out["materials"] = {k: np.asarray(getattr(m, k), np.float64)
                        for k in ("cd", "kd", "cs", "ks", "specular_exp",
                                  "ca", "ka", "ce", "ls", "kr")}
    out["materials"]["mtype"] = np.asarray(m.mtype)
    if scene.textures is not None and scene.mesh is not None:
        out["textures"] = (
            np.asarray(scene.mesh.tex_coords, np.float64),
            np.asarray(scene.textures.texels, np.float64),
            np.asarray(scene.textures.enabled),
        )
    out["lights"] = [
        (np.asarray(scene.lights.position[i], np.float64),
         np.asarray(scene.lights.cl[i], np.float64),
         float(scene.lights.kl[i]),
         np.asarray(scene.lights.attenuation[i], np.float64))
        for i in range(scene.lights.num_lights)
    ]
    return out


def cam_to_np(cam):
    return (np.asarray(cam.eye, np.float64),
            np.asarray(cam.center, np.float64),
            np.asarray(cam.up, np.float64),
            float(cam.fovy), float(cam.aspect))
