#!/usr/bin/env python
"""Generate Mid-Air CSV trajectory manifests (train/test splits).

Parity reference: scripts/midair-split-generator.py:24-95 — FRAME_SKIP=4,
every third trajectory to the test split, frame-to-frame motion computed as
q_a^-1 * q_b (rotation) and q_a^-1 . (p_b - p_a) (translation), body->camera
axis remap, TSV schema ``id camera_l disp qw qx qy qz tx ty tz``.

Quaternions are implemented in numpy (pyquaternion is not required).
"""

import argparse
import os

import h5py
import numpy as np

FRAME_SKIP = 4  # downsample framerate
IMU_PER_FRAME = 4  # IMU measurements between consecutive camera frames


def q_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]], q.dtype)


def q_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def q_rotate(q, v):
    """Rotate vector v by quaternion q."""
    qv = np.concatenate([[0.0], v])
    return q_mul(q_mul(q, qv), q_conj(q))[1:]


def main():
    here = os.path.dirname(os.path.realpath(__file__))
    p = argparse.ArgumentParser()
    p.add_argument("--db_path",
                   default=os.path.join(here, "..", "datasets", "MidAir"))
    p.add_argument("--output_dir",
                   default=os.path.join(here, "..", "data", "midair"))
    a = p.parse_args()
    os.makedirs(a.output_dir, exist_ok=True)

    for subset in ("Kite_training", "PLE_training"):
        subset_dir = os.path.join(a.db_path, subset)
        if not os.path.isdir(subset_dir):
            print(f"skipping {subset} (not found)")
            continue
        for climate in sorted(os.listdir(subset_dir)):
            print(f"Processing {subset} {climate}")
            color_dir = os.path.join(subset_dir, climate, "color_left")
            trajectories = sorted(os.listdir(color_dir))
            h5_db = h5py.File(
                os.path.join(subset_dir, climate, "sensor_records.hdf5"), "r")
            for tn, traj in enumerate(trajectories):
                split = "train_data" if tn % 3 != 0 else "test_data"
                out_dir = os.path.join(a.output_dir, split, subset, climate)
                os.makedirs(out_dir, exist_ok=True)
                out_csv = os.path.join(out_dir, f"traj_{tn:04d}.csv")

                gt = h5_db[traj]["groundtruth"]
                skip = FRAME_SKIP * IMU_PER_FRAME
                att = np.asarray(gt["attitude"])
                pos = np.asarray(gt["position"])
                n_frames = (att.shape[0] - skip) // skip

                with open(out_csv, "w") as f:
                    f.write("id\tcamera_l\tdisp\tqw\tqx\tqy\tqz\ttx\tty\ttz\n")
                    for idx in range(n_frames):
                        i = idx * skip
                        q_a = att[i] / np.linalg.norm(att[i])
                        q_b = att[i + skip] / np.linalg.norm(att[i + skip])
                        rot = q_mul(q_conj(q_a), q_b)
                        trans = q_rotate(q_conj(q_a), pos[i + skip] - pos[i])

                        frame = idx * FRAME_SKIP + FRAME_SKIP
                        img = os.path.join(subset, climate, "color_left",
                                           traj, f"{frame:06d}.JPEG")
                        disp = os.path.join(subset, climate,
                                            "stereo_disparity", traj,
                                            f"{frame:06d}.PNG")
                        # body frame (x fwd, y right, z down) -> camera frame
                        # (x right, y down, z fwd)
                        q = [rot[0], rot[2], rot[3], rot[1]]
                        t = [trans[1], trans[2], trans[0]]
                        f.write(f"{idx}\t{img}\t{disp}\t" +
                                "\t".join(f"{v:.6f}" for v in q + t) + "\n")
            h5_db.close()


if __name__ == "__main__":
    main()
