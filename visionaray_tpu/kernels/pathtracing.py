"""Iterative path tracing kernel with lane masks.

Behavioral parity with reference detail/pathtracing.inl:24-132:
  - throughput dst starts at 1; bounce loop over num_bounces
  - rays that exit multiply the ambient color (environment) and retire
  - emissive surfaces multiply ce*ls and retire
  - otherwise: sample BSDF, dst *= f * dot(n, wi) / pdf; zero-pdf kills path
  - rays still active after the loop contribute 0
  - two-sided shading normal via faceforward
  - next ray: origin = isect_pos + wi * epsilon

``nee=True`` adds next-event estimation (a capability the reference lacks;
listed as "area sampling differentiable" in SURVEY §2.1 lights row): at
every non-specular hit one light is chosen uniformly, a position on it is
sampled (uniform over area lights' triangles), and the direct term is added
through a shadow ray.  Emissive surfaces then only contribute when hit by
the camera ray (bounce 0) or through a delta/specular chain (NEE cannot
sample a light through a mirror, so that term rides the path) — any other
arrival is already accounted by NEE at the previous bounce.  No MIS:
lights seen via glossy BSDF bounces after bounce 0 are resolved by NEE
alone (the standard bias-free NEE-without-MIS estimator; higher variance
for sharp glossy lobes, exact for matte/plastic/emissive scenes).

XLA note: the bounce loop is a lax.scan so the (expensive-to-compile)
BVH traversal is compiled once, not once per bounce.

The bounce loop itself (``pathtrace_loop``) is generic over a *tracer* —
a pair of callables (closest, any) that resolve rays against geometry and
return (HitRecord, Surface).  The replicated path supplies
``scene_tracer`` (closest_hit + get_surface over a replicated scene); the
geometry-sharded path (parallel/sharded_pt.py) supplies a ring tracer
whose hops gather surface data from each device's LOCAL shard — the same
kernel code runs over both, the reference's one-kernel-many-schedulers
property (SURVEY §3 key insight).

This is the differentiable target: all material/light/vertex leaves receive
gradients through the shading math (detached-pdf sampling; the traversal
itself differentiates by recompute, ops/traversal.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import FLT_MAX, Ray, ResultRecord
from visionaray_tpu.core.vecmath import cross, faceforward, length, normalize
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.sampling import Sampler
from visionaray_tpu.ops.trace import any_hit, closest_hit
from visionaray_tpu.shading.lights import AreaLights, light_groups
from visionaray_tpu.shading.surface import get_surface


def _nee_direct(lights, nc, surf, n, view_dir, isect_pos, eps, ua, ub, ul,
                trace_any, mask=None):
    """One-sample next-event estimate of the direct term at isect_pos.

    Uniform light pick (pdf 1/total); area lights integrate over their
    surface with the cos_l * A / (pi r^2) geometry factor (shade() carries
    the reference's pi convention, so the factor divides it back out);
    point/spot lights are delta lights whose intensity() already includes
    attenuation.

    ``trace_any(ray, max_t) -> HitRecord``: the occlusion query (replicated
    any_hit or the sharded ring, depending on the caller's tracer).
    ``mask``: lanes whose direct term will be consumed (active &
    non-emissive).  Lanes outside it — plus lanes facing away from the
    light or behind an area light (shade()/g() are zero there) — fire NO
    shadow ray (max_t = -1 drops them from the traversal kernel tiles);
    previously every retired lane paid a full trace per bounce.
    """
    groups = light_groups(lights)
    total = sum(g.num_lights for g in groups)
    if total == 0:
        return jnp.zeros(isect_pos.shape[:-1] + (nc,), jnp.float32)

    batch = isect_pos.shape[:-1]
    sel_idx = jnp.minimum((ul * total).astype(jnp.int32), total - 1)
    P = jnp.zeros(batch + (3,), jnp.float32)
    I = jnp.zeros(batch + (nc,), jnp.float32)
    g = jnp.ones(batch, jnp.float32)
    idx = 0
    for lgroup in groups:
        for li in range(lgroup.num_lights):
            sel = sel_idx == idx
            if isinstance(lgroup, AreaLights):
                P_l = lgroup.sample(li, ua, ub)
                to = P_l - isect_pos
                r2 = jnp.maximum(jnp.sum(to * to, axis=-1), 1e-12)
                wi_l = to / jnp.sqrt(r2)[..., None]
                nl = lgroup.normal(li)
                cos_l = jnp.maximum(0.0, -jnp.sum(nl * wi_l, axis=-1))
                g_l = cos_l * lgroup.area(li) / (jnp.pi * r2)
                I_l = lgroup.intensity(li, isect_pos)
            else:
                P_l = jnp.broadcast_to(lgroup.position[li],
                                       batch + (3,))
                g_l = jnp.ones(batch, jnp.float32)
                I_l = lgroup.intensity(li, isect_pos)
            P = jnp.where(sel[..., None], P_l, P)
            I = jnp.where(sel[..., None], I_l, I)
            g = jnp.where(sel, g_l, g)
            idx += 1

    to_light = P - isect_pos
    dist = length(to_light)
    wi = to_light / jnp.maximum(dist, 1e-12)[..., None]
    fire = (jnp.sum(n * wi, axis=-1) > 0.0) & (g > 0.0)
    if mask is not None:
        fire = fire & mask
    mt = jnp.where(fire, dist - 2.0 * eps, -1.0)
    if _SHADOW_REVERSED:
        # trace the SAME segment from the light end: all NEE shadow rays
        # of a point/small-area light share (nearly) one origin, so the
        # reversed batch is point-source coherent — tiles sorted by
        # surface-point locality become narrow cones (A/B knob; the
        # occlusion answer over a segment is direction-symmetric)
        shadow = trace_any(Ray(ori=P - wi * eps, dir=-wi), mt)
    else:
        shadow = trace_any(Ray(ori=isect_pos + wi * eps, dir=wi), mt)
    visible = fire & ~shadow.hit
    direct = surf.materials.shade(n, view_dir, wi, I)
    return direct * (g * visible * float(total))[..., None]


# NEE shadow rays share one origin region per surface patch and converge
# on the light — markedly more coherent than bounce rays.  A/B knob for
# routing them through the sorted global-consensus kernel instead of the
# treelet-binned one (docs/PERF.md records the measurement).
_SHADOW_BINNED = os.environ.get("VSNRAY_SHADOW_BINNED", "1") == "1"
# Trace NEE shadow segments from the LIGHT end (see _nee_direct).  ON by
# default: step 5.57 -> 5.29 s at the bench config (docs/PERF.md r5
# ladder); the knob remains for A/B.
_SHADOW_REVERSED = os.environ.get("VSNRAY_SHADOW_REVERSED", "1") == "1"


def scene_tracer(params: KernelParams, binned: bool):
    """(closest, any) over a replicated scene: closest_hit + get_surface.

    The reference analogue is the kernel calling closest_hit then
    get_surface(hit_rec, params) (pathtracing.inl:49,63, get_surface.h:577).
    """
    scene = params.scene

    def trace_closest(ray, max_t):
        hr = closest_hit(ray, scene, binned=binned, max_t=max_t,
                         hit_filter=params.hit_filter)
        return hr, get_surface(hr, ray, scene)

    def trace_any(ray, max_t):
        return any_hit(ray, scene, max_t=max_t,
                       binned=binned and _SHADOW_BINNED,
                       hit_filter=params.hit_filter)

    return trace_closest, trace_any


def pathtrace_loop(ray: Ray, sampler: Sampler, *, num_bounces: int,
                   tracer, tracer0=None, lights, nc: int, amb3, bg_color,
                   eps, nee: bool) -> ResultRecord:
    """The PT bounce loop, generic over the tracer.

    ``tracer`` / ``tracer0``: (closest, any) pairs; ``tracer0`` (if given)
    handles bounce 0 only — the replicated ClusterBVH path compiles the
    coherent consensus traversal for camera rays and the treelet-binned one
    for incoherent bounces (docs/PERF.md: the two regimes differ 10-60x).
    """
    batch = ray.batch_shape
    amb3 = jnp.asarray(amb3, jnp.float32)

    def make_bounce_body(tr):
        trace_closest, trace_any = tr

        def bounce_body(carry, bounce):
            (ray, sampler, active, dst, acc, first_hit, first_t,
             prev_delta) = carry
            # live-ray compaction: retired lanes carry max_t = -1 and are
            # dropped from the traversal kernel tiles (the TPU analogue of
            # the reference's any(active_rays) early-out,
            # pathtracing.inl:47-53)
            hit_rec, surf = trace_closest(
                ray, jnp.where(active, FLT_MAX, -1.0))

            exited = active & ~hit_rec.hit
            if nee:
                acc = jnp.where(exited[..., None], acc + dst * amb3, acc)
            else:
                dst = jnp.where(exited[..., None], dst * amb3, dst)
            active = active & hit_rec.hit

            is_first = bounce == 0
            first_hit = jnp.where(is_first, hit_rec.hit, first_hit)
            first_t = jnp.where(is_first, hit_rec.t, first_t)

            view_dir = -ray.dir
            n = faceforward(surf.shading_normal, view_dir,
                            surf.geometric_normal)

            if nee:
                (u_lobe, u1, u2, ul, ua, ub), sampler = sampler.next_n(6)
            else:
                (u_lobe, u1, u2), sampler = sampler.next_n(3)
            src, refl_dir, pdf = surf.materials.sample(n, view_dir, u_lobe,
                                                       u1, u2)

            zero_pdf = pdf <= 0.0
            emissive = surf.materials.is_emissive()

            if nee:
                isect_pos0 = ray.at(jnp.where(hit_rec.hit, hit_rec.t, 1.0))
                # delta-BSDF (mirror) lanes: shade() is identically 0, so
                # their shadow ray can never contribute — drop it from the
                # occlusion trace (max_t = -1) instead of paying the trace
                take_d = active & ~emissive & ~surf.materials.is_specular()
                direct = _nee_direct(lights, nc, surf, n, view_dir,
                                     isect_pos0, eps, ua, ub, ul,
                                     trace_any, mask=take_d)
                acc = jnp.where(take_d[..., None], acc + dst * direct, acc)
                # emissive counts on the camera ray and after a delta
                # (specular) bounce — NEE cannot sample a light through a
                # delta BSDF (shade() is 0 there, materials.py is_specular),
                # so the emitted term must come through the path itself or
                # mirror reflections of lights render black
                take_e = active & emissive & (is_first | prev_delta)
                acc = jnp.where(take_e[..., None], acc + dst * src, acc)

            # src *= dot(n, wi)/pdf for non-emissive (pathtracing.inl:97)
            safe_pdf = jnp.where(zero_pdf, 1.0, pdf)
            ndotwi = jnp.sum(n * refl_dir, axis=-1)
            weight = jnp.where(emissive, 1.0, ndotwi / safe_pdf)
            src = src * weight[..., None]

            upd = active & ~zero_pdf
            if nee:
                upd = upd & ~emissive
            dst = jnp.where(upd[..., None], dst * src, dst)
            dst = jnp.where((zero_pdf & active)[..., None], 0.0, dst)

            active = active & ~emissive & ~zero_pdf

            isect_pos = ray.at(jnp.where(hit_rec.hit, hit_rec.t, 1.0))
            ray = Ray(ori=isect_pos + refl_dir * eps, dir=refl_dir)
            prev_delta = active & surf.materials.is_specular()
            return (ray, sampler, active, dst, acc, first_hit, first_t,
                    prev_delta), None

        return bounce_body

    init = (ray, sampler,
            jnp.ones(batch, jnp.bool_),
            jnp.ones(batch + (nc,), jnp.float32),
            jnp.zeros(batch + (nc,), jnp.float32),
            jnp.zeros(batch, jnp.bool_),
            jnp.zeros(batch, jnp.float32),
            jnp.zeros(batch, jnp.bool_))
    # scan (not fori) + checkpoint: reverse-mode AD saves only the
    # per-bounce carry + the traversal kernel outputs ("traced_hits") and
    # recomputes the rest of the bounce interior (gathers, shading) in the
    # backward sweep.  Without the checkpoint, residuals for every bounce
    # of every ray blow HBM at 1080p (measured 50 GB); without the named
    # save, the backward sweep re-runs the traversal kernel itself
    # (profiled: traversal is ~96% of a training step).
    def ckpt(f):
        return jax.checkpoint(
            f, policy=jax.checkpoint_policies.save_only_these_names(
                "traced_hits"))

    if tracer0 is not None and num_bounces > 1:
        # bounce 0 hoisted out of the scan so it compiles its own traversal
        carry, _ = ckpt(make_bounce_body(tracer0))(init, jnp.int32(0))
        carry, _ = jax.lax.scan(
            ckpt(make_bounce_body(tracer)), carry,
            jnp.arange(1, num_bounces, dtype=jnp.int32))
    else:
        start = 0
        body = make_bounce_body(tracer0 if tracer0 is not None else tracer)
        carry, _ = jax.lax.scan(
            ckpt(body), init, jnp.arange(start, num_bounces,
                                         dtype=jnp.int32))
    _, _, active, dst, acc, first_hit, first_t, _ = carry

    if nee:
        out = acc
    else:
        # paths still alive at loop end terminate to black
        # (pathtracing.inl:115)
        out = jnp.where(active[..., None], 0.0, dst)

    if nc != 3:
        # fold the accumulated spectrum through the CIE observer for
        # display (spectrum.inl to_rgb / color_conversion.h:110-151)
        from visionaray_tpu.shading.spectrum import to_rgb
        out = to_rgb(out)

    rgba = jnp.concatenate([out, jnp.ones_like(out[..., :1])], axis=-1)
    color = jnp.where(first_hit[..., None], rgba, jnp.asarray(bg_color))
    return ResultRecord(color=color, hit=first_hit, depth=first_t)


def pathtracing_kernel(params: KernelParams, ray: Ray,
                       sampler: Sampler, nee: bool = False) -> ResultRecord:
    scene = params.scene
    # spectral mode (spectrum.lift_scene): all color algebra is channel-
    # count agnostic; nc follows the material table
    nc = scene.materials.cd.shape[-1]
    amb3 = params.ambient_color[:3]
    if nc != 3:
        from visionaray_tpu.shading.spectrum import from_rgb
        amb3 = from_rgb(amb3, nc)
    # treelet-built ClusterBVH: bounce 0 (coherent camera rays) runs the
    # global consensus traversal, bounces >= 1 (incoherent) run treelet-
    # binned — the two regimes differ 10-60x in Mrays/s (docs/PERF.md)
    has_treelets = scene.bvh is not None and \
        getattr(scene.bvh, "treelet_size", 0) > 0
    if has_treelets and params.num_bounces > 1:
        tracer0 = scene_tracer(params, binned=False)
        tracer = scene_tracer(params, binned=True)
    else:
        tracer0 = None
        tracer = scene_tracer(params, binned=False)
    return pathtrace_loop(
        ray, sampler, num_bounces=params.num_bounces, tracer=tracer,
        tracer0=tracer0, lights=scene.lights, nc=nc, amb3=amb3,
        bg_color=params.bg_color, eps=params.epsilon, nee=nee)
