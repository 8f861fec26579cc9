"""Mid-Air split-generator math: relative motion, body->camera remap, splits.

Drives ``scripts/midair-split-generator.py`` as a subprocess on a synthetic
HDF5 trajectory with known world poses, then verifies each CSV row
*geometrically*: a world point's camera-frame coordinates in consecutive
frames must satisfy ``x_prev = R(q_csv) @ x_curr + t_csv`` — the motion
convention the model's reprojection assumes (geometry/parallax.py,
utils/depth_operations.py:71-105).

Parity reference: scripts/midair-split-generator.py:24-95 (q_a^-1 * q_b
relative rotation, q_a^-1-rotated displacement, body (x fwd, y right, z down)
-> camera (x right, y down, z fwd) axis remap, 1-in-3 test split,
FRAME_SKIP=4 with 4 IMU records per frame).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GENERATOR = os.path.join(REPO, "scripts", "midair-split-generator.py")

# body->camera axis permutation: x_cam = y_body, y_cam = z_body, z_cam = x_body
P_BC = np.array([[0.0, 1.0, 0.0],
                 [0.0, 0.0, 1.0],
                 [1.0, 0.0, 0.0]])


def quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def random_world_poses(n, seed):
    """Smooth body->world attitude quaternions + world positions."""
    r = np.random.RandomState(seed)
    quats, poss = [], []
    q = np.array([1.0, 0.0, 0.0, 0.0])
    p = r.randn(3)
    for _ in range(n):
        axis = r.randn(3)
        axis /= np.linalg.norm(axis)
        ang = r.uniform(-0.02, 0.02)
        dq = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        w1, x1, y1, z1 = q
        w2, x2, y2, z2 = dq
        q = np.array([w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])
        q /= np.linalg.norm(q)
        p = p + r.uniform(-0.1, 0.1, 3)
        quats.append(q.copy())
        poss.append(p.copy())
    return np.stack(quats), np.stack(poss)


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    """3 synthetic trajectories -> run the generator -> (db, out, poses)."""
    root = tmp_path_factory.mktemp("midair_db")
    db = root / "MidAir"
    out = root / "out"
    climate = db / "Kite_training" / "sunny"
    n_imu = 8 * 16 + 16  # 8 output frames (skip = FRAME_SKIP * IMU = 16)
    poses = {}
    with _open_h5(climate) as h5:
        for t in range(3):
            name = f"trajectory_{t:04d}"
            os.makedirs(climate / "color_left" / name, exist_ok=True)
            att, pos = random_world_poses(n_imu, seed=10 + t)
            g = h5.create_group(f"{name}/groundtruth")
            g.create_dataset("attitude", data=att)
            g.create_dataset("position", data=pos)
            poses[name] = (att, pos)
    r = subprocess.run(
        [sys.executable, GENERATOR, "--db_path", str(db),
         "--output_dir", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return str(db), str(out), poses


def _open_h5(climate):
    os.makedirs(climate, exist_ok=True)
    return h5py.File(str(climate / "sensor_records.hdf5"), "w")


def read_csv_rows(path):
    import pandas as pd

    return pd.read_csv(path, sep="\t")


def test_split_assignment(generated):
    _, out, _ = generated
    test_dir = os.path.join(out, "test_data", "Kite_training", "sunny")
    train_dir = os.path.join(out, "train_data", "Kite_training", "sunny")
    # 1-in-3: trajectory index 0 -> test, 1 and 2 -> train
    assert sorted(os.listdir(test_dir)) == ["traj_0000.csv"]
    assert sorted(os.listdir(train_dir)) == ["traj_0001.csv",
                                             "traj_0002.csv"]


def test_schema_and_paths(generated):
    _, out, _ = generated
    df = read_csv_rows(os.path.join(out, "train_data", "Kite_training",
                                    "sunny", "traj_0001.csv"))
    assert list(df.columns) == ["id", "camera_l", "disp", "qw", "qx", "qy",
                                "qz", "tx", "ty", "tz"]
    assert df.shape[0] == 8
    # frame index = (row + 1) * FRAME_SKIP, zero-padded to 6
    assert df["camera_l"].iloc[0].endswith(
        "color_left/trajectory_0001/000004.JPEG")
    assert df["disp"].iloc[2].endswith(
        "stereo_disparity/trajectory_0001/000012.PNG")


def test_relative_motion_reprojects_exactly(generated):
    """For random world points: camera coords at frame a must equal
    R(q_csv) @ (camera coords at frame b) + t_csv."""
    _, out, poses = generated
    att, pos = poses["trajectory_0001"]
    df = read_csv_rows(os.path.join(out, "train_data", "Kite_training",
                                    "sunny", "traj_0001.csv"))
    r = np.random.RandomState(0)
    skip = 16
    for row in range(df.shape[0] - 1):
        i_a, i_b = row * skip, row * skip + skip
        q_csv = df[["qw", "qx", "qy", "qz"]].iloc[row].to_numpy()
        t_csv = df[["tx", "ty", "tz"]].iloc[row].to_numpy()
        R_csv = quat_to_mat(q_csv)

        # world->camera pose at each frame: attitude is body->world
        def world_to_cam(i, X):
            R_bw = quat_to_mat(att[i] / np.linalg.norm(att[i]))
            x_body = R_bw.T @ (X - pos[i])
            return P_BC @ x_body

        for _ in range(5):
            X = r.randn(3) * 10.0
            x_a = world_to_cam(i_a, X)
            x_b = world_to_cam(i_b, X)
            np.testing.assert_allclose(
                x_a, R_csv @ x_b + t_csv, rtol=1e-4, atol=1e-4,
                err_msg=f"motion convention broken at row {row}")


def test_quaternion_remap_is_axis_permutation(generated):
    """The component shuffle [w, qy, qz, qx] must equal conjugating the
    rotation by the body->camera permutation: R(q_cam) = P R(q_body) P^T."""
    _, out, poses = generated
    att, _ = poses["trajectory_0002"]
    df = read_csv_rows(os.path.join(out, "train_data", "Kite_training",
                                    "sunny", "traj_0002.csv"))
    skip = 16
    for row in range(df.shape[0]):
        i = row * skip
        q_a = att[i] / np.linalg.norm(att[i])
        q_b = att[i + skip] / np.linalg.norm(att[i + skip])
        R_body = quat_to_mat(q_a).T @ quat_to_mat(q_b)
        q_csv = df[["qw", "qx", "qy", "qz"]].iloc[row].to_numpy()
        np.testing.assert_allclose(
            quat_to_mat(q_csv), P_BC @ R_body @ P_BC.T, rtol=1e-5, atol=1e-5)
