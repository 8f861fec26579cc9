"""On-device augmentation (data/augment_device.py) parity vs the host
numpy augmentations (data/augment.py), whose geometric fixups are already
cross-checked against the reference's own reprojection
(test_tf_parity.py::test_augmented_scene_reference_consistency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m4depth_tpu.data import augment as host
from m4depth_tpu.data import augment_device as dev


def _seq(T=3, h=12, w=12, seed=0):
    r = np.random.RandomState(seed)
    return {
        "rgb": r.rand(T, h, w, 3).astype(np.float32),
        "depth": (1 + 10 * r.rand(T, h, w, 1)).astype(np.float32),
        "rot": np.tile(np.array([0.9, 0.1, -0.2, 0.05], np.float32), (T, 1)),
        "trans": np.tile(np.array([0.1, -0.05, 0.4], np.float32), (T, 1)),
        "camera_f": np.array([7.0, 6.0], np.float32),
        "camera_c": np.array([6.0, 5.5], np.float32),
    }


def _host_seq(seq):
    s = dict(seq)
    s["RGB_im"] = s.pop("rgb")
    return s


def _from_host(s):
    out = dict(s)
    out["rgb"] = out.pop("RGB_im")
    return out


class _ForcedRng:
    """Returns scripted uniform() draws, then falls back to 0.9 (no-op)."""

    def __init__(self, draws):
        self.draws = list(draws)

    def uniform(self, *a, **k):
        return self.draws.pop(0) if self.draws else 0.9

    def randint(self, lo, hi):
        return (lo + hi) // 2


@pytest.mark.parametrize("finetune", [False, True])
def test_color_transform_matches_numpy(finetune):
    rgb = _seq()["rgb"]
    p = {"brightness": 0.12, "contrast": 1.1, "saturation": 0.85,
         "hue": 0.17, "invert": 0.0}
    expect = host.apply_color(rgb, p)
    got = np.asarray(dev.apply_color(
        jnp.asarray(rgb), {k: jnp.float32(v) for k, v in p.items()}))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
    # inversion branch
    p["invert"] = 1.0
    expect = host.apply_color(rgb, p)
    got = np.asarray(dev.apply_color(
        jnp.asarray(rgb), {k: jnp.float32(v) for k, v in p.items()}))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_hsv_roundtrip():
    rgb = _seq()["rgb"]
    back = np.asarray(dev.hsv_to_rgb(dev.rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("which,draws", [
    ("vflip", [0.1, 0.9]),       # vertical fires, horizontal skipped
    ("hflip", [0.9, 0.1]),
    ("both", [0.1, 0.1]),
])
def test_flip_fixups_match_numpy(which, draws):
    seq = _seq()
    hseq = host.flip_augment(_host_seq(seq), _ForcedRng(list(draws)))
    got = {k: jnp.asarray(v) for k, v in seq.items()}
    if draws[0] < 0.5:
        got = dev._flip_v(got)
    if draws[1] < 0.5:
        got = dev._flip_h(got)
    ref = _from_host(hseq)
    for k in ("rgb", "depth", "rot", "trans", "camera_c"):
        np.testing.assert_allclose(np.asarray(got[k]), ref[k], atol=1e-6,
                                   err_msg=f"{which}: {k}")


def test_transpose_fixups_match_numpy():
    seq = _seq()
    hseq = host.transpose_augment(_host_seq(seq), _ForcedRng([0.1]))
    got = dev._transpose({k: jnp.asarray(v) for k, v in seq.items()})
    ref = _from_host(hseq)
    for k in ("rgb", "depth", "rot", "trans"):
        np.testing.assert_allclose(np.asarray(got[k]), ref[k], atol=1e-6,
                                   err_msg=k)
    # the host version leaves camera_c/f untouched for square images with
    # centered principal points; the device version swaps the axes, which
    # is the correct general fixup — check the swap explicitly
    np.testing.assert_allclose(np.asarray(got["camera_c"]),
                               seq["camera_c"][::-1])
    np.testing.assert_allclose(np.asarray(got["camera_f"]),
                               seq["camera_f"][::-1])


def test_crop_shifts_principal_point():
    seq = _seq(h=16, w=16)
    out = dev._crop({k: jnp.asarray(v) for k, v in seq.items()},
                    jax.random.PRNGKey(3), (16, 12))
    assert out["rgb"].shape == (3, 16, 12, 3)
    assert out["depth"].shape == (3, 16, 12, 1)
    off = seq["camera_c"][0] - np.asarray(out["camera_c"])[0]
    assert 0 <= off < 4
    # cropped content matches the corresponding slice
    o = int(off)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               seq["rgb"][:, :16, o:o + 12])


def test_batch_augment_runs_and_varies_per_sequence():
    b, T, h, w = 4, 2, 16, 16
    r = np.random.RandomState(1)
    batch = {
        "rgb": jnp.asarray(
            np.tile(r.rand(1, T, h, w, 3).astype(np.float32), (b, 1, 1, 1, 1))),
        "depth": jnp.ones((b, T, h, w, 1), jnp.float32),
        "rot": jnp.tile(jnp.asarray([[[1.0, 0, 0, 0]]], jnp.float32),
                        (b, T, 1)),
        "trans": jnp.tile(jnp.asarray([[[0.1, 0, 0.4]]], jnp.float32),
                          (b, T, 1)),
        "camera_f": jnp.full((b, 2), 8.0),
        "camera_c": jnp.full((b, 2), 8.0),
    }
    fn = jax.jit(dev.make_batch_augment(dataset="midair"))
    out = fn(batch, jax.random.PRNGKey(0))
    assert out["rgb"].shape == batch["rgb"].shape
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    # identical inputs but per-sequence draws: the elements must differ
    diffs = [np.abs(rgb[i] - rgb[0]).max() > 1e-3 for i in range(1, b)]
    assert any(diffs)
    # deterministic under the same key
    out2 = fn(batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(rgb, np.asarray(out2["rgb"]))
    # frames within a sequence share the draw: relative frame difference
    # is preserved under color ops for the unflipped... (flips permute
    # pixels, so just check finite + determinism here)


def test_kitti_policy_is_color_only():
    b, T, h, w = 2, 2, 8, 24
    batch = {
        "rgb": jnp.asarray(np.random.RandomState(0)
                           .rand(b, T, h, w, 3).astype(np.float32)),
        "depth": jnp.ones((b, T, h, w, 1), jnp.float32),
        "rot": jnp.tile(jnp.asarray([[[1.0, 0, 0, 0]]], jnp.float32),
                        (b, T, 1)),
        "trans": jnp.tile(jnp.asarray([[[0.1, 0, 0.4]]], jnp.float32),
                          (b, T, 1)),
        "camera_f": jnp.full((b, 2), 8.0),
        "camera_c": jnp.asarray(np.tile([[12.0, 4.0]], (b, 1))
                                .astype(np.float32)),
    }
    fn = jax.jit(dev.make_batch_augment(dataset="kitti-raw"))
    out = fn(batch, jax.random.PRNGKey(7))
    # geometry untouched: motion and intrinsics pass through exactly
    np.testing.assert_array_equal(np.asarray(out["rot"]),
                                  np.asarray(batch["rot"]))
    np.testing.assert_array_equal(np.asarray(out["camera_c"]),
                                  np.asarray(batch["camera_c"]))
    np.testing.assert_array_equal(np.asarray(out["depth"]),
                                  np.asarray(batch["depth"]))


def test_train_step_applies_augmentation():
    """make_train_step(augment_fn=...) changes the loss vs no augmentation
    and stays finite/deterministic."""
    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.train.step import create_train_state, make_train_step

    cfg = ModelConfig(num_levels=2)
    model = M4Depth(cfg)
    b, T, hw = 2, 2, 32
    r = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(r.rand(b, T, hw, hw, 3).astype(np.float32)),
        "depth": jnp.asarray((1 + 30 * r.rand(b, T, hw, hw, 1))
                             .astype(np.float32)),
        "rot": jnp.tile(jnp.asarray([[[1.0, 0.001, 0, 0]]], jnp.float32),
                        (b, T, 1)),
        "trans": jnp.tile(jnp.asarray([[[0.05, 0, 0.3]]], jnp.float32),
                          (b, T, 1)),
        "camera_f": jnp.full((b, 2), 16.0),
        "camera_c": jnp.full((b, 2), 16.0),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    aug = dev.make_batch_augment(dataset="midair")
    step_aug = jax.jit(make_train_step(model, augment_fn=aug))
    step_plain = jax.jit(make_train_step(model))
    _, aux_a = step_aug(state, batch)
    _, aux_p = step_plain(state, batch)
    la, lp = float(aux_a["loss"]), float(aux_p["loss"])
    assert np.isfinite(la) and np.isfinite(lp)
    assert la != lp  # augmentation actually perturbed the batch
    _, aux_a2 = step_aug(state, batch)
    assert float(aux_a2["loss"]) == la  # keyed by state.step: deterministic
