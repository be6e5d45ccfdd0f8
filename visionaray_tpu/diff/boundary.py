"""Silhouette/boundary gradients for primary visibility (edge sampling).

Plain autodiff differentiates the render at FIXED hit topology: which
primitive covers which pixel is decided under ``stop_gradient``, so moving a
vertex's silhouette across pixels produces exactly zero gradient.  This
module adds the missing boundary term of

    d/dθ ∫_pixel f(x; θ) dx
      = ∫_pixel ∂θ f dx  +  ∫_{edges ∩ pixel} (f⁻ − f⁺)(x) (n̂·∂x/∂θ) ds

via screen-space edge sampling (the estimator family of Li et al. 2018
"Differentiable Monte Carlo Ray Tracing through Edge Sampling"; the
reference framework has no autodiff at all, so this is capability beyond
`/root/reference` — BASELINE.json north_star "soft visibility").

TPU-first design decisions:

- **Static shapes end to end.**  Silhouette detection is a mask, not a
  compaction: every mesh edge is sampled every call and non-silhouette
  edges contribute exactly 0 through their mask weight.  For large meshes
  an optional fixed ``edge_budget`` importance-samples that many edges
  (with replacement, properly reweighted) so the cost is independent of
  mesh size — both paths are jit-compatible with no dynamic shapes.
- **Occlusion needs no visibility test.**  The two-sided radiance
  difference Δf = f(p−δn̂) − f(p+δn̂) is computed by tracing full rays on
  both sides of the edge point: where the edge is occluded by nearer
  geometry both rays hit the same surface and Δf vanishes — the mask that
  edge-sampling CPU renderers get from silhouette data structures falls
  out of two batched kernel evaluations (one extra MXU-friendly ray batch,
  no pointer chasing).
- **Gradients ride a zero-valued image.**  ``boundary_image`` returns a
  (H, W, 4) array whose VALUE is identically zero but whose vjp carries
  the boundary term, scatter-added into the pixel each edge sample falls
  in.  Adding it to the rendered image makes ANY downstream loss pick up
  silhouette gradients by the chain rule — no special loss plumbing.

The estimator, per edge sample p(s;θ) with screen-space edge normal n̂:

    contrib = (len_e / M) · sil_e · Δf_detached · (n̂_detached · p(s; θ))

Only p(s;θ) (endpoint projection of the differentiable vertices) carries
gradient; Δf, n̂, lengths and masks are detached.  Flipping n̂ swaps f⁺/f⁻
and negates n̂·v, so orientation cancels.

Scope: PRIMARY visibility (camera silhouettes) w.r.t. vertex and camera
parameters, Pinhole cameras.  Secondary boundaries (shadow/indirect
silhouettes) remain future work — see docs/diff.md.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.camera import project
from visionaray_tpu.core.types import pytree_dataclass
from visionaray_tpu.ops.sampling import Sampler, pcg_hash


@pytree_dataclass
class EdgeAdjacency:
    """Unique undirected mesh edges with their adjacent faces.

    ``edges``  (E, 2) i32 vertex ids (lo, hi)
    ``faces``  (E, 2) i32 adjacent face ids; faces[e, 1] == -1 for a mesh
               boundary edge (exactly one adjacent face).
    """

    edges: Any
    faces: Any


def build_edge_adjacency(faces, vertices=None,
                         weld_decimals: int = 5) -> EdgeAdjacency:
    """Host-side adjacency build (once per topology; numpy).

    Pass ``vertices`` to weld coincident positions before pairing edges —
    essential for soup-style meshes where every quad/face carries its own
    copies of shared corners (the Cornell boxes): without welding each
    geometric edge appears twice as two "open" edges and its boundary term
    double-counts.  Edge endpoint IDS keep referencing original vertices
    (any coincident copy projects identically), only the PAIRING uses the
    welded ids.
    """
    faces = np.asarray(faces)
    if vertices is not None:
        v = np.round(np.asarray(vertices, np.float64), weld_decimals)
        _, canon = np.unique(v, axis=0, return_inverse=True)
    else:
        canon = None
    eid = {}
    adj = []
    edges = []
    for f in range(faces.shape[0]):
        a, b, c = (int(x) for x in faces[f])
        for u, v in ((a, b), (b, c), (c, a)):
            cu = int(canon[u]) if canon is not None else u
            cv = int(canon[v]) if canon is not None else v
            key = (cu, cv) if cu < cv else (cv, cu)
            if key not in eid:
                eid[key] = len(edges)
                edges.append((u, v) if cu < cv else (v, u))
                adj.append([f, -1])
            else:
                adj[eid[key]][1] = f
    return EdgeAdjacency(
        edges=jnp.asarray(np.asarray(edges, np.int32)),
        faces=jnp.asarray(np.asarray(adj, np.int32)))


def silhouette_mask(vertices, faces, adjacency: EdgeAdjacency, eye,
                    geom_ids=None, crease_cos: float = 1.0 - 1e-4):
    """(E,) bool: edge can carry a radiance discontinuity from ``eye``.

    True for mesh-boundary edges, for edges whose two adjacent faces face
    the eye differently (the classic silhouette criterion), for crease
    edges (dihedral angle: face normals agree below ``crease_cos``), and
    for material-boundary edges (``geom_ids`` differ) — creases and
    material seams jump in shading even when both faces face the eye, so
    their motion carries a boundary term too (the reason redner samples
    all non-coplanar edges, not just silhouettes).  Face normals are
    recomputed from the CURRENT vertices (training loops swap vertices
    without refreshing cached normals).
    """
    v1 = vertices[faces[:, 0]]
    v2 = vertices[faces[:, 1]]
    v3 = vertices[faces[:, 2]]
    n = jnp.cross(v2 - v1, v3 - v1)
    nn = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    facing = jnp.sum(n * (eye - v1), axis=-1) > 0.0
    f0 = adjacency.faces[:, 0]
    f1 = adjacency.faces[:, 1]
    f1c = jnp.maximum(f1, 0)
    open_edge = f1 < 0
    sil = facing[f0] != facing[f1c]
    crease = jnp.sum(nn[f0] * nn[f1c], axis=-1) < crease_cos
    mask = open_edge | sil | crease
    if geom_ids is not None:
        mask = mask | (geom_ids[f0] != geom_ids[f1c])
    return mask


def _detach(tree):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def _cam_frame(cam):
    """(view, proj, eye, z_near) for Pinhole OR MatrixCamera.

    A MatrixCamera carries only the two matrices; the eye is the inverse-
    view translation (-R^T t) and for a GL projection the near plane
    recovers as m23 / (m22 - 1)  (= 2fn/(n-f) / ((f+n)/(n-f) - 1) = n).
    All derivations are differentiable, so camera-matrix gradients flow
    through the boundary terms too.
    """
    if hasattr(cam, "view_matrix"):
        return cam.view_matrix(), cam.proj_matrix(), cam.eye, cam.z_near
    view = cam.view
    proj = cam.proj
    eye = -(view[:3, :3].T @ view[:3, 3])
    z_near = proj[2, 3] / (proj[2, 2] - 1.0)
    return view, proj, eye, z_near


def _radiance_at(params, cam, sx, sy, width, height, algo, nee, seed,
                 frame_num):
    """Trace full rays through continuous window coords (sx, sy) ∈
    [0,W]x[0,H] and return kernel radiance (N, 4).  Everything here is
    detached — Δf is a coefficient of the boundary term, not a gradient
    path."""
    from visionaray_tpu.sched.render import KERNELS
    kernel = KERNELS[algo]
    params = _detach(params)
    cam = _detach(cam)
    # primary_rays applies the +0.5 pixel-center shift; window coords
    # already live on the [0, W] continuum, so unshift.
    ray = cam.primary_rays(jax.lax.stop_gradient(sx) - 0.5,
                           jax.lax.stop_gradient(sy) - 0.5,
                           width, height)
    pid = pcg_hash(jnp.arange(sx.shape[0], dtype=jnp.uint32)
                   ^ jnp.uint32(seed))
    samp = Sampler.seed(0, pid, jnp.asarray(frame_num, jnp.uint32))
    if algo == "pathtracing":
        rec = kernel(params, ray, samp, nee=nee)
    else:
        rec = kernel(params, ray, samp)
    return rec.color


def boundary_image(params, cam, width: int, height: int,
                   adjacency: EdgeAdjacency, *, algo: str = "simple",
                   nee: bool = False, samples_per_edge: int = 4,
                   delta: float = 0.03, edge_budget: Optional[int] = None,
                   seed: int = 0, frame_num: int = 1,
                   vertices=None):
    """Zero-valued (H, W, 4) image whose gradient is the primary-visibility
    boundary term.  Add it to the rendered image before the loss.

    ``vertices``: the differentiable vertex array; defaults to
    ``params.scene.mesh.vertices`` (pass explicitly when your loss closes
    over a separate θ leaf).  ``delta`` is the two-sided probe offset in
    PIXELS.  ``edge_budget``: if set and < E, importance-samples that many
    edges per call (∝ silhouette · screen length, with replacement,
    reweighted) so cost is independent of mesh size.
    """
    mesh = params.scene.mesh
    if vertices is None:
        vertices = mesh.vertices
    view, proj, cam_eye, cam_znear = _cam_frame(cam)

    # --- differentiable endpoint projection -----------------------------
    win = project(vertices, view, proj, (0.0, 0.0, width, height))[..., :2]
    pa = win[adjacency.edges[:, 0]]          # (E, 2), carries d/dθ
    pb = win[adjacency.edges[:, 1]]

    # --- detached geometry of the estimator -----------------------------
    pa_d = jax.lax.stop_gradient(pa)
    pb_d = jax.lax.stop_gradient(pb)
    seg = pb_d - pa_d
    seg_len = jnp.linalg.norm(seg, axis=-1)
    tangent = seg / jnp.maximum(seg_len[..., None], 1e-12)
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)

    sil = silhouette_mask(jax.lax.stop_gradient(vertices), mesh.faces,
                          adjacency, jax.lax.stop_gradient(cam_eye),
                          geom_ids=mesh.geom_ids)

    # near-plane cull: an edge with an endpoint behind the eye projects
    # nonsensically; drop it (clipping the visible sub-segment is future
    # refinement — such edges also need frustum-boundary terms).
    vh = jnp.concatenate([vertices, jnp.ones_like(vertices[..., :1])],
                         axis=-1)
    z_view = (jax.lax.stop_gradient(vh) @ view.T)[..., 2]
    in_front = z_view < -jnp.asarray(cam_znear, jnp.float32)
    valid = (sil & in_front[adjacency.edges[:, 0]]
             & in_front[adjacency.edges[:, 1]] & (seg_len > 1e-6))

    weight = jnp.where(valid, seg_len, 0.0)   # per-edge total measure

    # --- optional fixed-size edge budget --------------------------------
    if edge_budget is not None and edge_budget < weight.shape[0]:
        # fold the frame in: with a fixed seed across a training loop a
        # seed-only key would draw the SAME edge subset every step, so
        # never-drawn silhouette edges would get persistently zero
        # gradient instead of a fresh Monte Carlo pick per call
        key = jax.random.fold_in(
            jax.random.PRNGKey(seed ^ 0x9E3779B9),
            jnp.asarray(frame_num, jnp.uint32))
        total = jnp.sum(weight)
        p = weight / jnp.maximum(total, 1e-12)
        idx = jax.random.categorical(
            key, jnp.log(jnp.maximum(p, 1e-30)), shape=(edge_budget,))
        # importance weight: sum_e w_e g_e = E_idx~p [ w_idx g_idx / p_idx ]
        ew = jnp.where(total > 0,
                       total / jnp.float32(edge_budget), 0.0)
        pa, pb = pa[idx], pb[idx]
        tangent, normal = tangent[idx], normal[idx]
        edge_w = jnp.broadcast_to(ew, (edge_budget,))
        edge_w = edge_w * (weight[idx] > 0)   # degenerate-pick guard
    else:
        edge_w = weight

    E = pa.shape[0]
    M = samples_per_edge
    s = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M      # stratified
    # p(s; θ): (E, M, 2), differentiable through pa/pb
    pt = pa[:, None, :] * (1.0 - s[None, :, None]) + pb[:, None, :] * \
        s[None, :, None]
    pt_d = jax.lax.stop_gradient(pt)

    probe = delta * normal[:, None, :]
    flat = lambda a: a.reshape(E * M, 2)
    f_minus = _radiance_at(params, cam,
                           flat(pt_d - probe)[:, 0],
                           flat(pt_d - probe)[:, 1],
                           width, height, algo, nee, seed, frame_num)
    f_plus = _radiance_at(params, cam,
                          flat(pt_d + probe)[:, 0],
                          flat(pt_d + probe)[:, 1],
                          width, height, algo, nee, seed, frame_num)
    dF = (f_minus - f_plus).reshape(E, M, 4)              # detached

    # normal velocity of the edge point, the ONLY gradient path
    vel_n = jnp.sum(normal[:, None, :] * pt, axis=-1)     # (E, M)
    contrib = (edge_w / M)[:, None, None] * dF * vel_n[..., None]

    # scatter into the pixel each sample falls in (box filter, unit pixel)
    ix = jnp.clip(jnp.floor(pt_d[..., 0]).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(jnp.floor(pt_d[..., 1]).astype(jnp.int32), 0, height - 1)
    inside = ((pt_d[..., 0] >= 0) & (pt_d[..., 0] < width)
              & (pt_d[..., 1] >= 0) & (pt_d[..., 1] < height))
    contrib = jnp.where(inside[..., None], contrib, 0.0)

    img = jnp.zeros((height, width, 4), jnp.float32)
    img = img.at[iy.reshape(-1), ix.reshape(-1)].add(
        contrib.reshape(-1, 4))
    # forward value exactly 0; vjp carries the boundary term
    return img - jax.lax.stop_gradient(img)


# ---------------------------------------------------------------------------
# Secondary visibility: hard-shadow boundary gradients (point lights).
#
# A shadow boundary on a receiver is ALSO a screen-space discontinuity
# curve, but not a mesh edge: it is the projection (through the light) of
# the blocker's light-silhouette onto the receiver.  The same edge-sampling
# estimator applies once the curve is parameterized differentiably:
#
#     s on blocker edge (theta)  ->  q(s; theta)           3D edge point
#     ray  light L(theta) -> q    ->  receiver prim (stop_gradient search)
#     differentiable ray-plane intersection with that prim -> r(s; theta)
#     project(r) -> p(s; theta)   ->  screen curve point
#
# and the boundary term is sum_j w_j * Δf_j * (n̂_j · p_j(theta)) exactly as
# for primary silhouettes — with gradient paths through the BLOCKER
# vertices (q), the LIGHT position (L), the RECEIVER vertices (the plane),
# and the camera.  Δf is measured by image-space probes, so shadow curves
# that are themselves occluded from the camera contribute ~0 automatically.


def shadow_boundary_image(params, cam, width: int, height: int,
                          adjacency: EdgeAdjacency, *, algo: str = "whitted",
                          nee: bool = False, samples_per_edge: int = 8,
                          delta: float = 0.03, seed: int = 0,
                          frame_num: int = 1, vertices=None,
                          light_pos=None, light_index=0):
    """Zero-valued (H, W, 4) image whose gradient is the hard-shadow
    boundary term.  Add it (with `boundary_image` for the primary term)
    to the rendered image before the loss.

    ``light_index``: which point light to trace shadow curves for, or
    ``None`` to SUM the term over every point light in the scene (each
    light casts its own shadow curves; the boundary terms are additive
    because each light's direct contribution jumps independently across
    its own curve).  ``light_pos``: differentiable (3,) light position
    overriding the selected light (also usable as one sampled point of
    an AREA light: the penumbra boundary term is the expectation of this
    hard term over light-surface points, so averaging calls over sampled
    positions estimates it).  Scope: hard shadows.
    """
    if light_index is None and light_pos is None:
        n_lights = int(params.scene.lights.position.shape[0])
        img = jnp.zeros((height, width, 4), jnp.float32)
        for li in range(n_lights):
            img = img + shadow_boundary_image(
                params, cam, width, height, adjacency, algo=algo, nee=nee,
                samples_per_edge=samples_per_edge, delta=delta, seed=seed,
                frame_num=frame_num, vertices=vertices, light_index=li)
        return img
    from visionaray_tpu.ops.trace import closest_hit

    mesh = params.scene.mesh
    if vertices is None:
        vertices = mesh.vertices
    if light_pos is None:
        light_pos = params.scene.lights.position[light_index]
    L = jnp.asarray(light_pos, jnp.float32)
    view, proj, _, _ = _cam_frame(cam)
    eps = jnp.float32(params.epsilon)

    sg = jax.lax.stop_gradient
    sil = silhouette_mask(sg(vertices), mesh.faces, adjacency, sg(L),
                          geom_ids=mesh.geom_ids)

    E = adjacency.edges.shape[0]
    M = samples_per_edge
    a3 = vertices[adjacency.edges[:, 0]]             # (E, 3) differentiable
    b3 = vertices[adjacency.edges[:, 1]]
    s = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M
    q = (a3[:, None, :] * (1.0 - s[None, :, None])
         + b3[:, None, :] * s[None, :, None])        # (E, M, 3)

    # --- receiver search (detached): closest hit just past the edge point
    to_q = sg(q) - sg(L)[None, None, :]
    dist_q = jnp.linalg.norm(to_q, axis=-1)
    dhat_d = to_q / jnp.maximum(dist_q, 1e-12)[..., None]
    from visionaray_tpu.core.types import Ray as _Ray
    probe_ray = _Ray(ori=(sg(q) + dhat_d * (4.0 * eps)).reshape(-1, 3),
                     dir=dhat_d.reshape(-1, 3))
    rhr = closest_hit(probe_ray, _detach(params.scene))
    rprim = rhr.prim_id.reshape(E, M)
    rvalid = rhr.hit.reshape(E, M)

    # --- differentiable curve point: ray (L -> q) ∩ receiver plane.
    # The plane derives from the `vertices` ARGUMENT (not mesh.corners())
    # so receiver-vertex gradients flow even when the loss carries theta
    # as a separate leaf from params.
    fv = mesh.faces[rprim.reshape(-1)]
    rv1 = vertices[fv[:, 0]]
    pv1 = rv1.reshape(E, M, 3)
    nr = jnp.cross(vertices[fv[:, 1]] - rv1,
                   vertices[fv[:, 2]] - rv1).reshape(E, M, 3)

    def curve_point(qq):
        # unnormalized ray L + t*(q - L): t = 1 AT the edge point, so the
        # receiver-beyond-blocker test below is t_r > 1 (parameterization
        # note: t_r is NOT a world distance)
        d = qq - L[None, None, :]
        denom = jnp.sum(d * nr, axis=-1)
        scale = (jnp.linalg.norm(d, axis=-1)
                 * jnp.linalg.norm(nr, axis=-1))
        grazing = jnp.abs(denom) < 1e-7 * jnp.maximum(scale, 1e-12)
        t_r = jnp.sum((pv1 - L[None, None, :]) * nr, axis=-1) \
            / jnp.where(grazing, 1.0, denom)
        r = L[None, None, :] + d * t_r[..., None]
        p = project(r, view, proj, (0.0, 0.0, width, height))[..., :2]
        return p, t_r, grazing

    p, t_r, grazing = curve_point(q)

    # --- detached tangent/normal/length element via curve samples s ± ds
    ds = 0.5 / M
    edge_dir = sg(b3 - a3)[:, None, :]
    p_hi, _, _ = curve_point(sg(q) + edge_dir * ds)
    p_lo, _, _ = curve_point(sg(q) - edge_dir * ds)
    tan = jax.lax.stop_gradient(p_hi - p_lo)         # (E, M, 2) ∝ dp/ds
    seg = jnp.linalg.norm(tan, axis=-1)
    tangent = tan / jnp.maximum(seg, 1e-12)[..., None]
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)
    # |dp/ds| * (1/M): the curve-length measure each sample carries
    w = jax.lax.stop_gradient(seg / (2.0 * ds) / M)

    # validity: silhouette edge, real receiver, non-grazing plane, receiver
    # in front of the edge point (t_r beyond q), curve point on-screen
    p_d = jax.lax.stop_gradient(p)
    t_r_d = jax.lax.stop_gradient(t_r)
    valid = (sil[:, None] & rvalid & (~grazing)
             & (t_r_d > 1.0 + 2.0 * eps
                / jnp.maximum(jax.lax.stop_gradient(dist_q), 1e-6))
             & (p_d[..., 0] >= 0) & (p_d[..., 0] < width)
             & (p_d[..., 1] >= 0) & (p_d[..., 1] < height))
    w = jnp.where(valid, w, 0.0)

    # --- two-sided image-space radiance probes (detached)
    probe = delta * normal
    flat = lambda a: a.reshape(E * M, 2)
    f_minus = _radiance_at(params, cam, flat(p_d - probe)[:, 0],
                           flat(p_d - probe)[:, 1], width, height,
                           algo, nee, seed, frame_num)
    f_plus = _radiance_at(params, cam, flat(p_d + probe)[:, 0],
                          flat(p_d + probe)[:, 1], width, height,
                          algo, nee, seed, frame_num)
    dF = (f_minus - f_plus).reshape(E, M, 4)

    vel_n = jnp.sum(normal * p, axis=-1)             # gradient path
    contrib = w[..., None] * dF * vel_n[..., None]

    ix = jnp.clip(jnp.floor(p_d[..., 0]).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(jnp.floor(p_d[..., 1]).astype(jnp.int32), 0, height - 1)
    img = jnp.zeros((height, width, 4), jnp.float32)
    img = img.at[iy.reshape(-1), ix.reshape(-1)].add(contrib.reshape(-1, 4))
    return img - jax.lax.stop_gradient(img)


# ---------------------------------------------------------------------------
# Sphere silhouettes: the boundary curve of a sphere is not a mesh edge
# either — it is the circle where view rays graze the sphere.  The circle
# is closed-form differentiable in (center, radius, eye):
#
#     w = (C − E)/d,  d = |C − E|
#     circle center  Q = C − (R²/d)·w          (pulled toward the eye)
#     circle radius  ρ = R·sqrt(1 − R²/d²),    in the plane ⊥ w
#
# so the same Δf-probe estimator applies with angle-parameterized samples
# P(φ; θ) = Q + ρ(cos φ·u + sin φ·v) projected to the screen.


def sphere_boundary_image(params, cam, width: int, height: int, *,
                          algo: str = "simple", nee: bool = False,
                          samples_per_sphere: int = 32,
                          delta: float = 0.03, seed: int = 0,
                          frame_num: int = 1, centers=None, radii=None):
    """Zero-valued (H, W, 4) image whose gradient is the primary-
    visibility boundary term of the scene's SPHERES (center and radius
    gradients; camera too).  Companion to `boundary_image` (triangle
    edges); add both to the rendered image before the loss.

    ``centers``/``radii``: differentiable overrides; default to
    ``params.scene.spheres``.
    """
    sph = params.scene.spheres
    if centers is None:
        centers = sph.center
    if radii is None:
        radii = sph.radius
    view, proj, cam_eye, cam_znear = _cam_frame(cam)
    E = jnp.asarray(cam_eye, jnp.float32)
    sg = jax.lax.stop_gradient

    S = centers.shape[0]
    M = samples_per_sphere
    to_c = centers - E[None, :]
    d = jnp.linalg.norm(to_c, axis=-1)                     # (S,)
    visible = sg(d) > sg(radii) * (1.0 + 1e-6)
    w = to_c / jnp.maximum(d, 1e-12)[..., None]
    # differentiable orthonormal frame ⊥ w; the helper axis is chosen
    # DETACHED per sphere (argmin |w| component) so the frame never
    # degenerates and the choice itself carries no gradient
    helper_ix = jnp.argmin(jnp.abs(sg(w)), axis=-1)        # (S,)
    helper = jnp.eye(3, dtype=jnp.float32)[helper_ix]
    u = jnp.cross(w, helper)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    v = jnp.cross(w, u)

    ratio = jnp.clip(radii / jnp.maximum(d, 1e-12), 0.0, 1.0 - 1e-7)
    Q = centers - (radii * ratio)[..., None] * w           # (S, 3)
    rho = radii * jnp.sqrt(1.0 - ratio * ratio)

    phi = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M * (2.0 * np.pi)

    def circle_screen(phis):
        P = (Q[:, None, :]
             + rho[:, None, None] * (jnp.cos(phis)[None, :, None]
                                     * u[:, None, :]
                                     + jnp.sin(phis)[None, :, None]
                                     * v[:, None, :]))    # (S, M, 3)
        p = project(P, view, proj, (0.0, 0.0, width, height))[..., :2]
        zv = (jnp.concatenate(
            [P, jnp.ones_like(P[..., :1])], axis=-1) @ view.T)[..., 2]
        return p, zv

    p, zv = circle_screen(phi)
    dphi = 0.5 * (2.0 * np.pi) / M
    p_hi, _ = circle_screen(phi + dphi)
    p_lo, _ = circle_screen(phi - dphi)
    tan = sg(p_hi - p_lo)
    seg = jnp.linalg.norm(tan, axis=-1)
    tangent = tan / jnp.maximum(seg, 1e-12)[..., None]
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)
    wgt = sg(seg / (2.0 * dphi) * (2.0 * np.pi / M))       # |dp/dφ|·Δφ

    p_d = sg(p)
    valid = (visible[:, None]
             & (sg(zv) < -jnp.asarray(cam_znear, jnp.float32))
             & (p_d[..., 0] >= 0) & (p_d[..., 0] < width)
             & (p_d[..., 1] >= 0) & (p_d[..., 1] < height))
    wgt = jnp.where(valid, wgt, 0.0)

    # Two-offset sqrt-extrapolated jump: on a CURVED silhouette the
    # interior radiance approaches the limb with a sqrt profile (the
    # normal tips over like sqrt(depth)), so a single finite-delta probe
    # carries an O(sqrt(delta)) bias — measured 1.5x over-estimation at
    # delta = 0.03 px.  With f(d) = f0 + c*sqrt(d):
    # f0 = (sqrt(2)*f(d) - f(2d)) / (sqrt(2) - 1).
    flat = lambda a: a.reshape(S * M, 2)

    def jump(d):
        probe = d * normal
        f_m = _radiance_at(params, cam, flat(p_d - probe)[:, 0],
                           flat(p_d - probe)[:, 1], width, height,
                           algo, nee, seed, frame_num)
        f_p = _radiance_at(params, cam, flat(p_d + probe)[:, 0],
                           flat(p_d + probe)[:, 1], width, height,
                           algo, nee, seed, frame_num)
        return (f_m - f_p).reshape(S, M, 4)

    r2 = np.float32(np.sqrt(2.0))
    dF = (r2 * jump(delta) - jump(2.0 * delta)) / (r2 - 1.0)

    vel_n = jnp.sum(normal * p, axis=-1)
    contrib = wgt[..., None] * dF * vel_n[..., None]

    ix = jnp.clip(jnp.floor(p_d[..., 0]).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(jnp.floor(p_d[..., 1]).astype(jnp.int32), 0, height - 1)
    img = jnp.zeros((height, width, 4), jnp.float32)
    img = img.at[iy.reshape(-1), ix.reshape(-1)].add(contrib.reshape(-1, 4))
    return img - jax.lax.stop_gradient(img)
