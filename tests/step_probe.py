"""Ground truth: wall time of ONE full step (real pixels), fetch-forced."""
import dataclasses, time
from functools import partial
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as _np
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.sched.render import render_pixels

WIDTH, HEIGHT, TILE = 1920, 1080, 1 << 21
scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
scene = dataclasses.replace(scene, bvh=jax.jit(
    build_cluster_bvh, static_argnames=("cluster_size", "treelet_size"))(
        scene.mesh, cluster_size=32, treelet_size=128))
jax.block_until_ready(scene.bvh)
params = KernelParams.create(
    scene, num_bounces=5, epsilon=1e-3,
    bg_color=(0.2, 0.3, 0.5, 1.0), ambient_color=(1.0, 1.0, 1.0, 1.0))
B = 64
Wp, Hp = -(-WIDTH // B) * B, -(-HEIGHT // B) * B
yy, xx = _np.meshgrid(_np.arange(Hp), _np.arange(Wp), indexing="ij")
inb = (xx < WIDTH) & (yy < HEIGHT)
order = (yy // B) * (Wp // B) + (xx // B)
flat = _np.argsort(_np.where(inb, order, 1 << 30).reshape(-1),
                   kind="stable")[: WIDTH * HEIGHT]
x = jnp.asarray(xx.reshape(-1)[flat], jnp.int32)
y = jnp.asarray(yy.reshape(-1)[flat], jnp.int32)
n = x.shape[0]
pad = TILE - n % TILE if n % TILE else 0
xt = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(-1, TILE)
yt = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)]).reshape(-1, TILE)

def loss_fn(verts, cd, frame, p, kam, txt, tyt, nee):
    mesh2 = dataclasses.replace(p.scene.mesh, vertices=verts)
    mats2 = dataclasses.replace(p.scene.materials, cd=cd)
    scene2 = dataclasses.replace(p.scene, mesh=mesh2, materials=mats2)
    p2 = dataclasses.replace(p, scene=scene2)
    def tile_fn(args):
        tx, ty = args
        color, _ = render_pixels(p2, kam, tx, ty, WIDTH, HEIGHT,
                                 "pathtracing", 1, "jittered_blend",
                                 frame, nee=nee)
        return jnp.sum(color[..., :3])
    return jnp.sum(jax.lax.map(tile_fn, (txt, tyt))) / (n * 3)

step = jax.jit(jax.value_and_grad(partial(loss_fn, nee=True),
                                  argnums=(0, 1)))
fwd = jax.jit(partial(loss_fn, nee=False))
verts, cd = scene.mesh.vertices, scene.materials.cd
t0 = time.perf_counter()
loss, grads = step(verts, cd, jnp.uint32(1), params, cam, xt, yt)
print(f"step warm-compile+dispatch: {time.perf_counter()-t0:.1f}s",
      flush=True)
v = float(loss)
print(f"step1 total(with compile): {time.perf_counter()-t0:.1f}s "
      f"loss={v:.6f}", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    loss, grads = step(verts, cd, jnp.uint32(i + 2), params, cam, xt, yt)
    v = float(loss)
    print(f"step rep{i}: {time.perf_counter()-t0:.2f}s loss={v:.6f}",
          flush=True)
for i in range(3):
    t0 = time.perf_counter()
    f = fwd(verts, cd, jnp.uint32(i + 2), params, cam, xt, yt)
    v = float(f)
    print(f"fwd  rep{i}: {time.perf_counter()-t0:.2f}s", flush=True)
