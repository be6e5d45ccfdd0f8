import time, jax, jax.numpy as jnp
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
n = 2088960
key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1<<30, jnp.int32).astype(jnp.uint32)
tbl = jax.random.normal(jax.random.PRNGKey(1), (n, 8), jnp.float32)

@jax.jit
def f(key, tbl):
    perm = jnp.argsort(key)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n, dtype=perm.dtype))
    g = jnp.take(tbl, perm, axis=0)
    h = jnp.take(g, inv, axis=0)
    return perm, inv, g, h

out = f(key, tbl); jax.block_until_ready(out)
t0=time.perf_counter()
for _ in range(5): out = f(key, tbl)
jax.block_until_ready(out)
print(f"argsort+inv-scatter+2 gathers (n={n}): {(time.perf_counter()-t0)/5*1e3:.1f} ms")

@jax.jit
def g1(key):
    return jnp.argsort(key)
p = g1(key); p.block_until_ready()
t0=time.perf_counter()
for _ in range(5): p = g1(key)
p.block_until_ready()
print(f"argsort alone: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
