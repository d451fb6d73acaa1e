"""Real multi-process (multi-"host") test: two coordinated CPU processes
form one global JAX runtime, build a 4-device global mesh, and run a psum +
a sharded SGD-style step through parallel.launch helpers.

This is the CPU stand-in for a 2-host TPU pod slice: same
jax.distributed.initialize + global-mesh + make_array_from_process_local_data
path the TPU deployment uses (SURVEY.md §2.3 comm-backend deliverable)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, os.environ["POSECNN_REPO"])
    from posecnn_tpu.parallel.launch import global_batch_from_local, initialize, process_local_batch_size
    from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

    initialize()  # from POSECNN_* env
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    mesh = make_mesh(MeshSpec(data=4, model=1))
    assert process_local_batch_size(mesh, 8) == 4

    # each process contributes its local half of a global batch of 8 rows.
    # keys outside DATA_SHARDED_KEYS replicate (a 'poses' table whose rows
    # merely divide the data axis must not be concatenated), so the custom
    # key is named explicitly; 'poses' round-trips as replicated.
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * pid
    poses = np.ones((6, 13), np.float32)
    batch = global_batch_from_local(mesh, {"x": local, "poses": poses}, batch_keys=("x",))
    assert batch["poses"].shape == (6, 13), batch["poses"].shape

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def step(x):
        return jnp.sum(x), (x * 2.0).sum(axis=1)

    total, rows = step(batch["x"])
    # global sum over both processes' halves
    expect = float(np.arange(12).sum() + (np.arange(12) + 100).sum())
    assert abs(float(total) - expect) < 1e-3, (float(total), expect)
    print(f"proc {pid} ok total={float(total)}")
    """
)


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            POSECNN_REPO=repo,
            POSECNN_COORDINATOR=f"127.0.0.1:{port}",
            POSECNN_NUM_PROCESSES="2",
            POSECNN_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} ok" in out
