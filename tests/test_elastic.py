"""Failure detection / elastic recovery (SURVEY.md §5): re-dispatch of
failed tile batches, fault injection, checkpoint/resume of partial frames.
"""

import numpy as np
import pytest

from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.scenes import cornell_box
from visionaray_tpu.sched.elastic import render_frame_elastic

W = H = 32
BATCH = 256   # 4 batches per frame


@pytest.fixture(scope="module")
def setup():
    scene, cam = cornell_box()
    params = KernelParams.create(scene, num_bounces=2, epsilon=1e-3,
                                 bg_color=(0, 0, 0, 1),
                                 ambient_color=(0, 0, 0, 0))
    return params, cam


def _render(params, cam, **kw):
    return render_frame_elastic(params, cam, W, H, algo="pathtracing",
                                spp=1, batch=BATCH, **kw)


def test_clean_run(setup):
    params, cam = setup
    img, rep = _render(params, cam)
    assert rep.ok and rep.completed == rep.batches == (W * H) // BATCH
    assert rep.errors == rep.retried == rep.failed == rep.resumed == 0
    assert np.isfinite(img).all() and img[..., :3].max() > 0


def test_fault_injection_retries_bit_identical(setup):
    params, cam = setup
    ref, _ = _render(params, cam)

    class Bomb(Exception):
        pass

    def hook(b, attempt):
        if b == 1 and attempt == 0:
            raise Bomb("injected device fault")

    img, rep = _render(params, cam, fault_hook=hook)
    assert rep.ok and rep.errors == 1 and rep.retried == 1
    np.testing.assert_array_equal(img, ref)   # counter RNG: bit-identical


def test_exhausted_retries_reports_failure(setup):
    params, cam = setup

    def hook(b, attempt):
        if b == 2:
            raise RuntimeError("persistent fault")

    img, rep = _render(params, cam, retries=1, fault_hook=hook)
    assert not rep.ok
    assert rep.failed == 1 and rep.completed == rep.batches - 1
    assert rep.errors == 2   # first attempt + one retry


def test_checkpoint_resume(setup, tmp_path):
    params, cam = setup
    ref, _ = _render(params, cam)
    ck = str(tmp_path / "frame.npz")

    class Preempt(Exception):
        pass

    # first run: die at batch 2 after checkpointing every completed batch
    def hook(b, attempt):
        if b == 2:
            raise Preempt()

    img1, rep1 = _render(params, cam, retries=0, checkpoint_path=ck,
                         checkpoint_every=1, fault_hook=hook)
    assert rep1.failed >= 1 and rep1.completed >= 2

    # second run resumes: completed batches skipped, result bit-identical
    img2, rep2 = _render(params, cam, checkpoint_path=ck,
                         checkpoint_every=1)
    assert rep2.ok and rep2.resumed >= 2
    assert rep2.completed == rep2.batches - rep2.resumed
    np.testing.assert_array_equal(img2, ref)


def test_checkpoint_mismatch_ignored(setup, tmp_path):
    """A checkpoint from another frame/shape must not be resumed from."""
    params, cam = setup
    ck = str(tmp_path / "frame.npz")
    _render(params, cam, checkpoint_path=ck, frame_num=1)
    img, rep = _render(params, cam, checkpoint_path=ck, frame_num=2)
    assert rep.resumed == 0 and rep.ok
