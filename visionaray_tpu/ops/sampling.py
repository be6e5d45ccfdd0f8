"""Counter-based per-ray RNG.

The reference uses per-thread std::default_random_engine on the CPU
(random_sampler.h:24-58) and a hashed per-pixel seed on CUDA
(detail/cuda_sched.inl:26-45).  Neither is deterministic under re-sharding.
The TPU-native design keys every random draw off the *absolute* pixel id,
frame number, and a user seed with a stateless integer hash (PCG output
function, O'Neill 2014 / Jarzynski & Olano 2020, public domain), so renders
are bit-identical regardless of mesh shape or tiling — the distributed
determinism requirement of SURVEY.md §5.

State advances with an LCG; output is the PCG-RXS-M-XS permutation.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import pytree_dataclass

_MUL = np.uint32(747796405)
_INC = np.uint32(2891336453)
_MIX = np.uint32(277803737)


def pcg_hash(x):
    """One PCG-RXS-M-XS round over uint32 lanes."""
    x = x.astype(jnp.uint32) * _MUL + _INC
    word = ((x >> ((x >> np.uint32(28)) + np.uint32(4))) ^ x) * _MIX
    return (word >> np.uint32(22)) ^ word


def _to_unit_float(bits):
    """uint32 -> f32 in [0, 1)."""
    return bits.astype(jnp.float32) * np.float32(2.3283064e-10)  # 2^-32


@pytree_dataclass
class Sampler:
    """Stateless-seeded, stateful-advancing uniform sampler.

    ``state`` is a uint32 array of any shape; ``next()`` returns a uniform
    float per lane and the advanced sampler (functional update).
    """

    state: Any

    @staticmethod
    def seed(seed: int, pixel_id, frame=0) -> "Sampler":
        """Deterministic in (seed, absolute pixel id, frame) only."""
        pid = jnp.asarray(pixel_id, jnp.uint32)
        f = jnp.uint32(frame) if not hasattr(frame, "dtype") else frame.astype(jnp.uint32)
        s = pcg_hash(pid ^ pcg_hash(jnp.uint32(seed) + f * np.uint32(0x9E3779B9)))
        # one extra round to decorrelate adjacent pixels
        return Sampler(state=pcg_hash(s))

    def next(self):
        new_state = self.state * _MUL + _INC
        word = ((new_state >> ((new_state >> np.uint32(28)) + np.uint32(4)))
                ^ new_state) * _MIX
        bits = (word >> np.uint32(22)) ^ word
        return _to_unit_float(bits), Sampler(state=new_state)

    def next_n(self, n: int):
        """Draw n uniforms; returns (list of arrays, advanced sampler)."""
        us = []
        s = self
        for _ in range(n):
            u, s = s.next()
            us.append(u)
        return us, s


def radical_inverse(n, base: int = 2, iters: int = 32):
    """Van der Corput radical inverse (reference sampling.h:28-46)."""
    n = jnp.asarray(n, jnp.uint32)
    result = jnp.zeros(n.shape, jnp.float32)
    inv_base = np.float32(1.0 / base)
    inv_bi = inv_base
    for _ in range(iters):
        digit = (n % base).astype(jnp.float32)
        result = result + digit * inv_bi
        n = n // base
        inv_bi = inv_bi * inv_base
    return result
