"""Golden-image test: config #1 — tri+sphere+plane simple kernel vs oracle.

The BASELINE correctness target: forward renders match the (scalar CPU)
reference allclose at the pixel level.  The numpy oracle in tests/oracle.py
plays the role of Visionaray's scalar reference path.

NOTE: XLA CPU compiles are slow on the CI machine; tests share one small
render (module-scoped) and reuse jit caches.
"""

import numpy as np
import pytest

import oracle
from visionaray_tpu.scenes import tri_sphere_plane
from visionaray_tpu.sched.render import render

W = H = 64


@pytest.fixture(scope="module")
def setup():
    scene, cam = tri_sphere_plane()
    rt = render(scene, cam, W, H, algo="simple", spp=1)
    return scene, cam, rt


def test_config1_simple_matches_oracle(setup):
    scene, cam, rt = setup
    img = np.asarray(rt.color)
    ref = oracle.render_simple(oracle.scene_to_np(scene),
                               oracle.cam_to_np(cam), W, H)
    # f32 vs f64 and edge pixels: small tolerance, allow a tiny fraction of
    # disagreeing pixels exactly on silhouettes.
    diff = np.abs(img - ref.astype(np.float32))
    frac_bad = np.mean(np.any(diff > 1e-3, axis=-1))
    assert frac_bad < 0.005, f"{frac_bad:.4%} pixels differ (max {diff.max()})"
    assert diff.mean() < 1e-4
    # sanity: scene actually covers a good part of the frame
    assert np.asarray(rt.depth > 0).mean() > 0.3


def test_config1_depth_and_hit(setup):
    scene, cam, rt = setup
    ref = oracle.intersect_all(
        *oracle.camera_rays(*oracle.cam_to_np(cam), W, H),
        oracle.scene_to_np(scene))
    hit = ref["hit"].reshape(H, W)
    t = np.where(hit, ref["t"].reshape(H, W), 0.0)
    got_hit = np.asarray(rt.depth) > 0.0
    assert (got_hit == hit).mean() > 0.999
    ok = hit & got_hit
    np.testing.assert_allclose(np.asarray(rt.depth)[ok], t[ok], rtol=1e-3)


def test_render_is_deterministic(setup):
    scene, cam, rt = setup
    b = render(scene, cam, W, H, algo="simple", spp=1)  # jit cache hit
    np.testing.assert_array_equal(np.asarray(rt.color), np.asarray(b.color))


def test_tiled_matches_untiled(setup):
    """The tiled scheduler must be bit-identical to the whole-frame path
    (the determinism-under-scheduling requirement, SURVEY.md §5)."""
    scene, cam, rt = setup
    b = render(scene, cam, W, H, algo="simple", spp=1, tile_size=1024)
    # XLA fuses differently for different block shapes; sampling decisions
    # are identical (counter-based RNG) but float op order drifts ~1e-4
    np.testing.assert_allclose(np.asarray(rt.color), np.asarray(b.color),
                               atol=2e-3, rtol=1e-3)
