"""Data-parallel training on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from m4depth_tpu.config import ModelConfig
from m4depth_tpu.models import M4Depth
from m4depth_tpu.parallel import make_mesh, shard_batch_pytree
from m4depth_tpu.train import (
    create_train_state,
    jit_data_parallel,
    make_train_step,
)


def tiny_cfg():
    return ModelConfig(
        num_levels=2,
        encoder_channels=(8, 12),
        refiner_prep_channels=(16, 16, 8),
        refiner_est_channels=(8, 8, 5),
    )


def make_batch(rng, b, T=2, h=16, w=16):
    rot = np.tile(np.array([1.0, 0.0, 0.0, 0.0], np.float32), (b, T, 1))
    return {
        "rgb": jnp.asarray(rng.rand(b, T, h, w, 3).astype(np.float32)),
        "depth": jnp.asarray(
            rng.uniform(5, 50, (b, T, h, w, 1)).astype(np.float32)),
        "rot": jnp.asarray(rot),
        "trans": jnp.asarray(
            np.tile(np.array([0.05, 0.0, 0.4], np.float32), (b, T, 1))),
        "camera_f": jnp.full((b, 2), 8.0, jnp.float32),
        "camera_c": jnp.full((b, 2), 8.0, jnp.float32),
    }


class TestDataParallel:
    def test_eight_device_mesh(self):
        assert jax.device_count() >= 8
        mesh = make_mesh((-1,), ("data",))
        assert mesh.devices.size == 8

    def test_mesh_over_request_raises(self):
        """Asking for more mesh slots than devices must fail with a clear
        error, not numpy's cryptic 'cannot reshape array of size 8'."""
        import pytest

        with pytest.raises(ValueError, match="require 16 devices"):
            make_mesh((16,), ("data",))

    def test_sharded_train_step_matches_single_device(self):
        rng = np.random.RandomState(0)
        cfg = tiny_cfg()
        model = M4Depth(cfg)
        batch = make_batch(rng, b=8)
        state = create_train_state(model, jax.random.PRNGKey(0), batch)
        train_step = make_train_step(model)

        # single device reference
        _, scalars_ref = jax.jit(train_step)(state, batch)

        mesh = make_mesh((-1,), ("data",))
        sharded_batch = shard_batch_pytree(batch, mesh)
        dp_step = jit_data_parallel(train_step, mesh, donate_state=False)
        new_state, scalars = dp_step(state, sharded_batch)

        np.testing.assert_allclose(
            float(scalars["loss"]), float(scalars_ref["loss"]), rtol=1e-4)
        assert np.isfinite(float(scalars["RMSE_log"]))
        # params actually moved
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.array(p0), np.array(p1))

    def test_two_steps_progress(self):
        rng = np.random.RandomState(1)
        cfg = tiny_cfg()
        model = M4Depth(cfg)
        batch = make_batch(rng, b=8)
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   learning_rate=1e-3)
        mesh = make_mesh((-1,), ("data",))
        dp_step = jit_data_parallel(make_train_step(model), mesh,
                                    donate_state=False)
        sharded = shard_batch_pytree(batch, mesh)
        losses = []
        for _ in range(5):
            state, scalars = dp_step(state, sharded)
            losses.append(float(scalars["loss"]))
        assert losses[-1] < losses[0]
