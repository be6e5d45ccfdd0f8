"""Measure the numpy oracle's throughput — the vs_baseline denominator.

Run:  python -m tests.bench_oracle   (from the tests/ parent with tests on
      sys.path, or `cd tests && python bench_oracle.py`)

This is the "reference CPU scalar path" stand-in (the reference itself
publishes no numbers, BASELINE.md); bench.py pins the measured value.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    import oracle
    from visionaray_tpu.scenes import tri_sphere_plane

    scene, cam = tri_sphere_plane()
    snp = oracle.scene_to_np(scene)
    cnp = oracle.cam_to_np(cam)
    W = H = 256
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        oracle.render_whitted(snp, cnp, W, H, bounces=4)
    dt = (time.perf_counter() - t0) / reps
    # whitted: per bounce 1 closest + 1 shadow ray -> 8 rays/pixel
    rays = W * H * 8
    print(f"oracle whitted {W}x{H}: {dt:.3f}s/frame, "
          f"{rays / dt / 1e6:.3f} Mrays/s")


if __name__ == "__main__":
    main()
