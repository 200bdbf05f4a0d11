"""Generate a tiny synthetic SemanticKITTI tree on disk for pipeline tests:
real file formats (.bin float32 xyzi, .label uint32 sem|inst<<16, calib.txt,
poses.txt) with a moving object so MOS labels are non-trivial."""
import os

import numpy as np


def make_sequence(root: str, seq_id: str = "00", n_frames: int = 8,
                  n_points: int = 3000, seed: int = 0):
    rng = np.random.default_rng(seed)
    seq = os.path.join(root, seq_id)
    os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(seq, "labels"), exist_ok=True)

    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")

    # ego moves +x at 1 m/frame; a car moves +y at 0.8 m/frame
    pose_lines = []
    for i in range(n_frames):
        pose_lines.append(f"1 0 0 {i * 1.0} 0 1 0 0 0 0 1 0")
    with open(os.path.join(seq, "poses.txt"), "w") as f:
        f.write("\n".join(pose_lines) + "\n")

    # static scene in world coords
    n_static = n_points - 600
    ground = np.stack([
        rng.uniform(-40, 40, n_static),
        rng.uniform(-40, 40, n_static),
        rng.uniform(-1.8, -1.6, n_static),
        rng.uniform(0, 1, n_static)], axis=-1)
    ground_sem = np.full(n_static, 40, np.uint32)  # road
    building = np.stack([
        rng.uniform(5, 15, 300),
        rng.uniform(8, 12, 300),
        rng.uniform(-1.5, 2.0, 300),
        rng.uniform(0, 1, 300)], axis=-1)
    building_sem = np.full(300, 50, np.uint32)

    for i in range(n_frames):
        car = np.stack([
            rng.uniform(3, 6, 300),
            rng.uniform(-2, 0, 300) + 0.8 * i,  # moving +y in world
            rng.uniform(-1.4, 0.2, 300),
            rng.uniform(0, 1, 300)], axis=-1)
        car_sem = np.full(300, 252, np.uint32)  # moving-car
        world = np.concatenate([ground, building, car], axis=0)
        sems = np.concatenate([ground_sem, building_sem, car_sem])
        # into ego frame of scan i
        pts = world.copy()
        pts[:, 0] -= i * 1.0
        pts.astype(np.float32).tofile(
            os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        inst = np.zeros_like(sems)
        (sems | (inst << 16)).astype(np.uint32).tofile(
            os.path.join(seq, "labels", f"{i:06d}.label"))
    return seq
