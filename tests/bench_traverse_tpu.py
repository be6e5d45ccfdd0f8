"""Micro-benchmark: Pallas cluster traversal on the real TPU.

Run manually:  ROWS=32 BW=64 BH=64 K=64 python -m tests.bench_traverse_tpu

ROWS  sublane rows per ray tile (tile = ROWS*128 rays)
BW,BH pixel-block swizzle shape (BW*BH should equal ROWS*128)
K     cluster size (triangles per leaf)
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from visionaray_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import visionaray_tpu.ops.pallas.traverse as trav
    from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
    from visionaray_tpu.ops.pallas.traverse import cluster_closest_hit
    from visionaray_tpu.scenes import sponza_like_scene

    rows = int(os.environ.get("ROWS", trav.TILE_ROWS))
    bw = int(os.environ.get("BW", 64))
    bh = int(os.environ.get("BH", 64))
    K = int(os.environ.get("K", 64))
    G = int(os.environ.get("G", trav.INTERLEAVE))
    trav.TILE_ROWS = rows
    trav.INTERLEAVE = G

    scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
    mesh = scene.mesh
    cbvh = jax.jit(build_cluster_bvh, static_argnames=("cluster_size",))(
        mesh, cluster_size=K)
    jax.block_until_ready(cbvh.nodes)
    print(f"rows={rows} G={G} block={bw}x{bh} K={K} clusters={cbvh.num_clusters}")

    W, H = 1920, 1080
    Wp, Hp = -(-W // bw) * bw, -(-H // bh) * bh
    ypix, xpix = np.meshgrid(np.arange(Hp), np.arange(Wp), indexing="ij")
    order = (ypix // bh) * (Wp // bw) + (xpix // bw)
    flat = np.argsort(order.reshape(-1), kind="stable")
    xs = xpix.reshape(-1)[flat]
    ys = ypix.reshape(-1)[flat]
    ray = cam.primary_rays(jnp.asarray(xs, jnp.int32),
                           jnp.asarray(ys, jnp.int32), W, H)
    n = Wp * Hp

    f = jax.jit(lambda r: cluster_closest_hit(r, cbvh, mesh).t)
    t0 = time.perf_counter()
    out = f(ray)
    out.block_until_ready()
    print(f"compile+run: {time.perf_counter()-t0:.2f}s")
    print("hit frac:", float(jnp.mean(out < 1e30)))

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(ray)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"primary closest_hit: {dt*1e3:.1f} ms, {n/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
