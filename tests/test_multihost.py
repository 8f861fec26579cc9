"""Multi-host data parallelism over a (dcn, ici) hybrid mesh.

Two REAL processes (jax.distributed on CPU, 2 local devices each) run one
data-parallel train step on a global batch of 4 via
``make_array_from_process_local_data``; the losses must agree with each
other and with a single-process run of the same global batch — proving the
mesh, per-process input sharding, and XLA's hierarchical all-reduce compose
correctly. Capability parity: the legacy multi-GPU NCCL towers
(.legacy/multi_gpu_pipeline/feedforward_pipeline.py:92-138).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    pid, port, outfile = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    # this environment preimports jax at interpreter startup, so env vars
    # are too late — mirror tests/conftest.py: XLA_FLAGS before first
    # backend use + jax.config.update for the platform
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from m4depth_tpu.parallel import (
        distributed_init, make_hybrid_mesh, shard_batch_pytree)
    distributed_init(f"localhost:{{port}}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import numpy as np
    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.train.step import (
        create_train_state, jit_data_parallel, make_train_step)

    def global_batch():
        r = np.random.RandomState(0)
        b, T, h, w = 4, 2, 16, 16
        return {{
            "rgb": r.rand(b, T, h, w, 3).astype(np.float32),
            "depth": r.uniform(1, 50, (b, T, h, w, 1)).astype(np.float32),
            "rot": np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, T, 1)),
            "trans": np.tile(np.array([0.05, 0, 0.4], np.float32), (b, T, 1)),
            "camera_f": np.full((b, 2), 8.0, np.float32),
            "camera_c": np.full((b, 2), 8.0, np.float32),
        }}

    mesh = make_hybrid_mesh()          # (dcn=2 processes, ici=2 local)
    assert mesh.devices.shape == (2, 2)
    assert mesh.axis_names == ("dcn", "ici")

    cfg = ModelConfig(num_levels=2, compute_dtype="float32")
    model = M4Depth(cfg)
    gb = global_batch()
    sample = {{k: v[:1] for k, v in gb.items()}}
    state = create_train_state(model, jax.random.PRNGKey(0), sample)

    # this host's slice: samples [2*pid, 2*pid+2) of the global batch
    local = {{k: v[2 * pid:2 * pid + 2] for k, v in gb.items()}}
    sharded = shard_batch_pytree(local, mesh)
    step = jit_data_parallel(make_train_step(model), mesh,
                             donate_state=False)
    _, scalars = step(state, sharded)
    with open(outfile, "w") as f:
        f.write(repr((float(scalars["loss"]), float(scalars["grad_norm"]))))
""").format(repo=REPO)


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    script = tmp / "worker.py"
    script.write_text(WORKER)
    port = free_port()
    outs = [str(tmp / f"out{p}.txt") for p in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(p), str(port),
                          outs[p]],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for p in range(2)
    ]
    results = []
    for p, proc in enumerate(procs):
        _, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, f"worker {p} failed:\n{err[-3000:]}"
        results.append(eval(open(outs[p]).read()))
    return results


def test_processes_agree(two_process_result):
    (l0, g0), (l1, g1) = two_process_result
    assert np.isfinite(l0) and np.isfinite(g0)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(g0, g1, rtol=1e-6)


def test_matches_single_process(two_process_result):
    """The 2-host hybrid-mesh step computes the same loss as a flat
    single-process data-parallel step on the identical global batch."""
    import jax

    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.parallel import make_mesh, shard_batch_pytree
    from m4depth_tpu.train.step import (
        create_train_state,
        jit_data_parallel,
        make_train_step,
    )

    r = np.random.RandomState(0)
    b, T, h, w = 4, 2, 16, 16
    gb = {
        "rgb": r.rand(b, T, h, w, 3).astype(np.float32),
        "depth": r.uniform(1, 50, (b, T, h, w, 1)).astype(np.float32),
        "rot": np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, T, 1)),
        "trans": np.tile(np.array([0.05, 0, 0.4], np.float32), (b, T, 1)),
        "camera_f": np.full((b, 2), 8.0, np.float32),
        "camera_c": np.full((b, 2), 8.0, np.float32),
    }
    cfg = ModelConfig(num_levels=2, compute_dtype="float32")
    model = M4Depth(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               {k: v[:1] for k, v in gb.items()})
    mesh = make_mesh((4,), ("data",))
    step = jit_data_parallel(make_train_step(model), mesh,
                             donate_state=False)
    _, scalars = step(state, shard_batch_pytree(gb, mesh))
    (l0, _), _ = two_process_result
    np.testing.assert_allclose(float(scalars["loss"]), l0, rtol=1e-5)


def test_host_shard_indices_partition():
    """Strided host shards cover the index space exactly once."""
    from m4depth_tpu.parallel import host_shard_indices

    items = list(range(11))
    sl = host_shard_indices(len(items))
    # single-process: the full set
    assert items[sl] == items


def test_host_shard_indices_equal_lengths(monkeypatch):
    """Hosts must get EQUAL window counts (unequal steps_per_epoch would
    deadlock the first collective the shorter host never joins)."""
    import m4depth_tpu.parallel.mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    items = list(range(11))
    shards = []
    for i in range(2):
        monkeypatch.setattr(mesh_mod.jax, "process_index", lambda i=i: i)
        shards.append(items[mesh_mod.host_shard_indices(len(items))])
    assert len(shards[0]) == len(shards[1]) == 5
    assert not set(shards[0]) & set(shards[1])
