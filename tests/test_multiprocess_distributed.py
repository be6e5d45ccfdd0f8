"""Two REAL processes through jax.distributed + Gloo CPU collectives
(VERDICT r2 Next #8: "a 2-process CPU jax.distributed smoke test ... so
initialize() is exercised multi-process at least once").

The test spawns two fresh Python processes (the current pytest process
has already initialized the XLA backend, which jax.distributed forbids),
wires them with multihost.initialize(), and runs a cross-process sharded
reduction through the framework's entry points."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    pid = int(sys.argv[1]); port = sys.argv[2]
    from visionaray_tpu.parallel.multihost import (
        initialize, global_mesh, make_global_pixel_array,
        padded_global_size,
    )
    ok = initialize(coordinator_address="localhost:" + port,
                    num_processes=2, process_id=pid)
    assert ok, "not multi-process after initialize()"
    import jax, numpy as np, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    assert jax.process_count() == 2
    mesh = global_mesh()
    assert mesh.devices.size == 4          # 2 procs x 2 local devices

    # framework path: host-local shards -> global array -> collective
    n_global = padded_global_size(10)      # pads to a multiple of 4
    n_local = n_global // 2
    local = np.full((n_local,), float(pid + 1), np.float32)
    arr = make_global_pixel_array(local, mesh)
    total = float(jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr))
    expect = n_local * 1.0 + n_local * 2.0
    assert abs(total - expect) < 1e-6, (total, expect)
    print(f"proc {pid}: ok total={total}", flush=True)
""")


@pytest.mark.timeout(180)
def test_two_process_distributed_smoke(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: ok" in out
