"""Material system: SoA table + masked type dispatch.

The reference models materials as a class hierarchy dispatched statically
(material.h:84-339: emissive/matte/mirror/plastic) or through a device-variant
``generic_material`` (generic_material.h:25-66) with visitor dispatch.  The
TPU-native design replaces the tagged union with an integer ``mtype`` field and
computes all (cheap, elementwise) branches followed by ``jnp.where`` selection
— the same select/mask idiom the reference's SIMD packet path uses.

All material parameters are jnp arrays and thus differentiable leaves.

Interface parity:
  ambient()          -> material.h ambient() per type
  shade(sr)          -> direct-lighting BRDF evaluation per light
  sample(sr, u, ...) -> BRDF importance sample: (color, wi, pdf)
"""

from __future__ import annotations

from enum import IntEnum
from typing import Any

import jax.numpy as jnp

from visionaray_tpu.core.types import pytree_dataclass
from visionaray_tpu.core.vecmath import dot, reflect
from visionaray_tpu.shading import brdf


class MaterialType(IntEnum):
    EMISSIVE = 0   # material.h:84-122
    MATTE = 1      # material.h:133-197
    MIRROR = 2     # material.h:210-252
    PLASTIC = 3    # material.h:266-339


@pytree_dataclass
class Materials:
    """SoA material table; every field leading dim M (or gathered per-ray)."""

    mtype: Any       # (M,) i32
    ca: Any          # (M, 3) ambient color
    ka: Any          # (M,)   ambient scale
    cd: Any          # (M, 3) diffuse color
    kd: Any          # (M,)   diffuse scale
    cs: Any          # (M, 3) specular color
    ks: Any          # (M,)   specular scale
    specular_exp: Any  # (M,)
    cr: Any          # (M, 3) mirror reflective color
    kr: Any          # (M,)   mirror reflectivity
    ior: Any         # (M, 3) conductor eta
    absorption: Any  # (M, 3) conductor k
    ce: Any          # (M, 3) emissive color
    ls: Any          # (M,)   emissive scale

    # ------------------------------------------------------------------ build
    @staticmethod
    def zeros(M: int) -> "Materials":
        v3 = jnp.zeros((M, 3), jnp.float32)
        v1 = jnp.zeros((M,), jnp.float32)
        return Materials(
            mtype=jnp.full((M,), int(MaterialType.MATTE), jnp.int32),
            ca=v3, ka=v1, cd=v3, kd=v1, cs=v3, ks=v1,
            specular_exp=jnp.ones((M,), jnp.float32),
            cr=v3, kr=v1, ior=v3, absorption=v3, ce=v3, ls=v1,
        )

    @staticmethod
    def default() -> "Materials":
        return Materials.matte(cd=(0.8, 0.8, 0.8))

    @staticmethod
    def _make(mtype, **fields) -> "Materials":
        def dim3(x):
            a = jnp.asarray(x, jnp.float32)
            return a.reshape(-1, 3) if a.ndim <= 1 else a

        def dim1(x):
            return jnp.asarray(x, jnp.float32).reshape(-1)

        probe = None
        for k, v in fields.items():
            a = jnp.asarray(v, jnp.float32)
            n = a.reshape(-1, 3).shape[0] if k in _VEC_FIELDS and a.ndim >= 2 \
                else (1 if a.ndim <= 1 and k in _VEC_FIELDS else a.reshape(-1).shape[0])
            probe = n if probe is None else max(probe, n)
        M = probe or 1
        base = Materials.zeros(M)
        out = {"mtype": jnp.full((M,), int(mtype), jnp.int32)}
        for k, v in fields.items():
            if k in _VEC_FIELDS:
                out[k] = jnp.broadcast_to(dim3(v), (M, 3))
            else:
                out[k] = jnp.broadcast_to(dim1(v), (M,))
        import dataclasses
        return dataclasses.replace(base, **out)

    @staticmethod
    def matte(cd=(0.8, 0.8, 0.8), kd=1.0, ca=(0.2, 0.2, 0.2), ka=1.0):
        return Materials._make(MaterialType.MATTE, cd=cd, kd=kd, ca=ca, ka=ka)

    @staticmethod
    def emissive(ce=(1.0, 1.0, 1.0), ls=1.0):
        return Materials._make(MaterialType.EMISSIVE, ce=ce, ls=ls)

    @staticmethod
    def mirror(cr=(1.0, 1.0, 1.0), kr=1.0, ior=(1.34, 0.96, 0.62),
               absorption=(7.5, 6.4, 5.4)):
        return Materials._make(MaterialType.MIRROR, cr=cr, kr=kr, ior=ior,
                               absorption=absorption)

    @staticmethod
    def plastic(cd=(0.8, 0.8, 0.8), kd=1.0, cs=(0.2, 0.2, 0.2), ks=1.0,
                specular_exp=32.0, ca=(0.2, 0.2, 0.2), ka=1.0):
        return Materials._make(MaterialType.PLASTIC, cd=cd, kd=kd, cs=cs,
                               ks=ks, specular_exp=specular_exp, ca=ca, ka=ka)

    @staticmethod
    def concatenate(mats) -> "Materials":
        import jax
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *mats)

    @property
    def num_materials(self):
        return self.mtype.shape[0]

    def take(self, idx) -> "Materials":
        """Gather per-ray material rows by index (get_surface.h material fetch)."""
        import jax
        return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), self)

    # --------------------------------------------------------------- interface
    def ambient(self):
        """Per-type ambient term (emissive/mirror -> 0; matte/plastic -> ca*ka)."""
        amb = self.ca * self.ka[..., None]
        zero = jnp.zeros_like(amb)
        is_amb = (self.mtype == MaterialType.MATTE) | \
                 (self.mtype == MaterialType.PLASTIC)
        return jnp.where(is_amb[..., None], amb, zero)

    def shade(self, n, view_dir, light_dir, light_intensity):
        """Direct-lighting shade (per material type):

        matte   (matte.inl):   pi * (cd*kd/pi) * I * max(0, n.l)
        plastic (plastic.inl): pi * (cd*kd/pi + blinn_f) * I * max(0, n.l)
        mirror  (mirror.inl):  specular_brdf.f == fresnel mirror f = 0 for
                               non-delta directions (brdf.h:177-185 returns 0)
        emissive (emissive.inl): ce * ls
        """
        ndotl = jnp.maximum(0.0, dot(n, light_dir))[..., None]
        diffuse = brdf.lambertian_f(self.cd, self.kd)
        spec = brdf.blinn_f(self.cs, self.ks, self.specular_exp,
                            n, view_dir, light_dir)
        matte_c = jnp.pi * diffuse * light_intensity * ndotl
        plastic_c = jnp.pi * (diffuse + spec) * light_intensity * ndotl
        emissive_c = self.ce * self.ls[..., None]
        zero = jnp.zeros_like(matte_c)
        t = self.mtype[..., None]
        return jnp.where(
            t == MaterialType.PLASTIC, plastic_c,
            jnp.where(t == MaterialType.MATTE, matte_c,
                      jnp.where(t == MaterialType.EMISSIVE, emissive_c, zero)))

    def sample(self, n, view_dir, u_lobe, u1, u2):
        """BRDF importance sample; returns (color, wi, pdf).

        Mirrors material::sample per type:
        - emissive: pdf=1, color=ce*ls, wi undefined (paths terminate;
          detail/material/emissive.inl sample).
        - matte: lambertian.sample_f (matte.inl sample_impl).
        - mirror: specular_reflection.sample_f (mirror.inl).
        - plastic: probabilistic diffuse/specular lobe pick with
          prob ~ mean(cd)*kd vs mean(cs)*ks (plastic.inl:188-231).
        """
        # lambertian branch
        f_d, wi_d, pdf_d = brdf.lambertian_sample_f(
            self.cd, self.kd, n, view_dir, u1, u2)
        # blinn branch (plastic specular lobe)
        f_s, wi_s, pdf_s = brdf.blinn_sample_f(
            self.cs, self.ks, self.specular_exp, n, view_dir, u1, u2)
        # mirror branch
        f_m, wi_m, pdf_m = brdf.specular_reflection_sample_f(
            self.cr, self.kr, self.ior, self.absorption, n, view_dir)

        # plastic lobe probabilities (plastic.inl:203-211)
        prob_diff = jnp.mean(self.cd, axis=-1) * self.kd
        prob_spec = jnp.mean(self.cs, axis=-1) * self.ks
        all_zero = (prob_diff == 0.0) & (prob_spec == 0.0)
        prob_diff = jnp.where(all_zero, 0.5, prob_diff)
        prob_spec = jnp.where(all_zero, 0.5, prob_spec)
        prob_diff = prob_diff / (prob_diff + prob_spec)
        take_diff = u_lobe < prob_diff
        f_p = jnp.where(take_diff[..., None], f_d, f_s)
        wi_p = jnp.where(take_diff[..., None], wi_d, wi_s)
        pdf_p = jnp.where(take_diff, pdf_d, pdf_s)

        emissive_f = self.ce * self.ls[..., None]

        t = self.mtype
        t3 = t[..., None]
        f = jnp.where(
            t3 == MaterialType.PLASTIC, f_p,
            jnp.where(t3 == MaterialType.MATTE, f_d,
                      jnp.where(t3 == MaterialType.MIRROR, f_m, emissive_f)))
        wi = jnp.where(
            t3 == MaterialType.PLASTIC, wi_p,
            jnp.where(t3 == MaterialType.MATTE, wi_d, wi_m))
        pdf = jnp.where(
            t == MaterialType.PLASTIC, pdf_p,
            jnp.where(t == MaterialType.MATTE, pdf_d,
                      jnp.where(t == MaterialType.MIRROR, pdf_m,
                                jnp.ones_like(pdf_d))))
        return f, wi, pdf

    def specular_bounce(self, view_dir, normal):
        """Whitted-bounce reflectivity per type (detail/whitted.inl:80-131):

        matte -> kr=0; mirror -> kr=mat.kr; everything else (plastic,
        emissive via fall-through) -> kr=0.1.  Returns (reflected_dir, kr).
        """
        refl = reflect(view_dir, normal)
        kr = jnp.where(
            self.mtype == MaterialType.MATTE, 0.0,
            jnp.where(self.mtype == MaterialType.MIRROR, self.kr, 0.1))
        return refl, kr

    def is_emissive(self):
        return self.mtype == MaterialType.EMISSIVE

    def to_spectral(self, n: int = 300) -> "Materials":
        """Lift every color field from RGB to an n-sample SPD.

        The analogue of compiling the reference with VSNRAY_SPECTRUM_RGB
        unset (spectrum.h:17,32-37): the material color type switches to
        spectrum<T> and all shading algebra runs per-wavelength.  The
        shade/sample math here is channel-count agnostic, so lifting the
        SoA color fields is the whole switch.
        """
        import dataclasses
        from visionaray_tpu.shading.spectrum import from_rgb
        lift = {f: from_rgb(getattr(self, f), n) for f in _VEC_FIELDS}
        return dataclasses.replace(self, **lift)

    def is_specular(self):
        """Delta-BSDF types (mirror): sample() picks one exact direction and
        shade() returns 0 for any other (brdf.h:177-185), so NEE cannot see
        light through them — the path tracer lets the emissive term through
        after a specular bounce instead (the standard NEE delta exception)."""
        return self.mtype == MaterialType.MIRROR


_VEC_FIELDS = {"ca", "cd", "cs", "cr", "ior", "absorption", "ce"}
