"""snorm/unorm quantization round trips (reference test/unittests/math/
{snorm,unorm}.cpp semantics, OpenGL 4.4 2.3.4.1 conversions)."""

import numpy as np
import pytest

from visionaray_tpu.core.norm import (
    float_to_snorm, float_to_unorm, snorm_to_float, unorm_to_float,
)


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_unorm_endpoints(bits):
    assert int(float_to_unorm(0.0, bits)) == 0
    assert int(float_to_unorm(1.0, bits)) == (1 << bits) - 1
    assert float(unorm_to_float(np.array(0, np.uint64), bits)) == 0.0
    assert float(unorm_to_float(np.array((1 << bits) - 1, np.uint64),
                                bits)) == 1.0
    # saturation
    assert int(float_to_unorm(1.5, bits)) == (1 << bits) - 1
    assert int(float_to_unorm(-0.25, bits)) == 0


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_unorm_roundtrip_within_one_code(bits):
    # truncating encode (static_cast semantics, matching the reference)
    # may land one code low after a float32 decode; never more
    if bits == 32:
        codes = np.array([0, 1, 2, 12345, 2**31, 2**32 - 2, 2**32 - 1],
                         np.uint64)
    else:
        codes = np.arange(1 << bits, dtype=np.uint64)
    f = unorm_to_float(codes, bits)
    back = float_to_unorm(f, bits).astype(np.int64)
    err = np.abs(back - codes.astype(np.int64))
    assert err.max() <= 1
    # float-side round trip is tight: f -> u -> f within one grid step
    g = unorm_to_float(back, bits)
    assert np.abs(g - f).max() <= 1.0 / ((1 << bits) - 1)


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_snorm_endpoints(bits):
    m = (1 << (bits - 1)) - 1
    assert int(float_to_snorm(1.0, bits)) == m
    assert int(float_to_snorm(-1.0, bits)) == -m
    assert float(snorm_to_float(np.array(m, np.int64), bits)) == 1.0
    # the two's-complement minimum decodes to exactly -1 (the max(, -1))
    assert float(snorm_to_float(np.array(-m - 1, np.int64), bits)) == -1.0


@pytest.mark.parametrize("bits", [8, 16])
def test_snorm_roundtrip_within_one_code(bits):
    m = (1 << (bits - 1)) - 1
    codes = np.arange(-m, m + 1, dtype=np.int64)
    f = snorm_to_float(codes, bits)
    back = float_to_snorm(f, bits).astype(np.int64)
    assert np.abs(back - codes).max() <= 1


def test_quantization_truncates():
    # static_cast semantics, not rounding (unorm.inl:23)
    assert int(float_to_unorm(0.5, 8)) == 127      # 127.5 -> 127
    assert int(float_to_snorm(0.5, 8)) == 63       # 63.5 -> 63
    assert int(float_to_snorm(-0.5, 8)) == -63     # trunc toward zero
