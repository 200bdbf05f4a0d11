"""Point-cloud geometry: quantization, spherical projection, rigid transforms.

Numerical contracts mirror the reference implementation
(`/root/reference/datasets/utils.py:151-192` Quantize/SphereQuantize,
`/root/reference/datasets/data_StreamMOS.py:25-50` make_point_feat,
`/root/reference/datasets/utils.py:116-126` Trans,
`/root/reference/datasets/utils.py:11-54` calib/pose parsing).

All array math is written once against an array namespace ``xp`` so the same
formulas run inside a jitted TPU graph (``jax.numpy``) and in the host input
pipeline (``numpy``). On TPU these ops are trivially fused elementwise work —
keeping them in-graph means the host pipeline ships only raw float32 points.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Generic math (xp = numpy | jax.numpy)
# --------------------------------------------------------------------------

def _quantize(xp, pcds, range_x, range_y, range_z, size):
    """Cartesian -> fractional BEV grid coords (reference utils.py:151-169).

    pcds: (..., >=3) with x, y, z leading channels.
    Returns (..., 3) float fractional indices in [0, size) for in-range points.
    """
    x = pcds[..., 0]
    y = pcds[..., 1]
    z = pcds[..., 2]
    dx = (range_x[1] - range_x[0]) / size[0]
    dy = (range_y[1] - range_y[0]) / size[1]
    dz = (range_z[1] - range_z[0]) / size[2]
    x_quan = (x - range_x[0]) / dx
    y_quan = (y - range_y[0]) / dy
    z_quan = (z - range_z[0]) / dz
    return xp.stack((x_quan, y_quan, z_quan), axis=-1)


def _sphere_quantize(xp, pcds, phi_range, theta_range, size):
    """Cartesian -> fractional range-view coords (reference utils.py:172-192).

    Row 0 is the vertical (theta) coordinate, row 1 the horizontal (phi), both
    as fractional indices into an (H, W) range image.
    """
    H, W = size
    phi_lo, phi_hi = (phi_range[0] * np.pi / 180.0, phi_range[1] * np.pi / 180.0)
    th_lo, th_hi = (theta_range[0] * np.pi / 180.0, theta_range[1] * np.pi / 180.0)
    dphi = (phi_hi - phi_lo) / W
    dtheta = (th_hi - th_lo) / H

    x = pcds[..., 0]
    y = pcds[..., 1]
    z = pcds[..., 2]
    d = xp.sqrt(x * x + y * y + z * z) + 1e-12

    phi = phi_hi - xp.arctan2(x, y)
    phi_quan = phi / dphi
    theta = th_hi - xp.arcsin(z / d)
    theta_quan = theta / dtheta
    return xp.stack((theta_quan, phi_quan), axis=-1)


def _cylinder_quantize(xp, pcds, phi_range, range_z, size):
    """Cartesian -> fractional cylindrical coords (reference utils.py:195-212,
    unused by shipped configs; kept for view parity). Row 0 is height (z),
    row 1 azimuth (phi), fractional indices into an (H, W) cylinder image."""
    H, W = size
    phi_lo, phi_hi = (phi_range[0] * np.pi / 180.0, phi_range[1] * np.pi / 180.0)
    dphi = (phi_hi - phi_lo) / W
    dz = (range_z[1] - range_z[0]) / H

    x = pcds[..., 0]
    y = pcds[..., 1]
    z = pcds[..., 2]
    phi_quan = (phi_hi - xp.arctan2(x, y)) / dphi
    z_quan = (z - range_z[0]) / dz
    return xp.stack((z_quan, phi_quan), axis=-1)


def _make_point_feat(xp, pcds_xyzi, pcds_coord):
    """Per-point 7-channel feature (reference data_StreamMOS.py:25-50):
    (x, y, z, intensity, dist, diff_x, diff_y) where diff_* are the fractional
    parts of the BEV grid coordinates."""
    x = pcds_xyzi[..., 0]
    y = pcds_xyzi[..., 1]
    z = pcds_xyzi[..., 2]
    intensity = pcds_xyzi[..., 3]
    dist = xp.sqrt(x * x + y * y + z * z) + 1e-12
    diff_x = pcds_coord[..., 0] - xp.floor(pcds_coord[..., 0])
    diff_y = pcds_coord[..., 1] - xp.floor(pcds_coord[..., 1])
    return xp.stack((x, y, z, intensity, dist, diff_x, diff_y), axis=-1)


def _transform(xp, pcds, mat):
    """Rigid/homogeneous transform of the xyz channels (utils.py:116-126).

    pcds (..., C>=3), mat (4, 4). Remaining channels pass through unchanged.
    """
    xyz = pcds[..., :3]
    xyz_h = xyz @ xp.swapaxes(mat[:3, :3], -1, -2) + mat[:3, 3]
    return xp.concatenate((xyz_h, pcds[..., 3:]), axis=-1)


def _filter_mask(xp, pcds, range_x, range_y, range_z):
    """In-range crop mask (utils.py:107-113): min-inclusive, max-exclusive."""
    vx = (pcds[..., 0] >= range_x[0]) & (pcds[..., 0] < range_x[1])
    vy = (pcds[..., 1] >= range_y[0]) & (pcds[..., 1] < range_y[1])
    vz = (pcds[..., 2] >= range_z[0]) & (pcds[..., 2] < range_z[1])
    return vx & vy & vz


# --------------------------------------------------------------------------
# Public wrappers
# --------------------------------------------------------------------------

def quantize(pcds, range_x, range_y, range_z, size):
    return _quantize(jnp, pcds, range_x, range_y, range_z, size)


def sphere_quantize(pcds, phi_range, theta_range, size):
    return _sphere_quantize(jnp, pcds, phi_range, theta_range, size)


def cylinder_quantize(pcds, phi_range, range_z, size):
    return _cylinder_quantize(jnp, pcds, phi_range, range_z, size)


def make_point_feat(pcds_xyzi, pcds_coord):
    return _make_point_feat(jnp, pcds_xyzi, pcds_coord)


def transform(pcds, mat):
    return _transform(jnp, pcds, mat)


def filter_mask(pcds, range_x, range_y, range_z):
    return _filter_mask(jnp, pcds, range_x, range_y, range_z)


def np_quantize(pcds, range_x, range_y, range_z, size):
    return _quantize(np, pcds, range_x, range_y, range_z, size)


def np_sphere_quantize(pcds, phi_range, theta_range, size):
    return _sphere_quantize(np, pcds, phi_range, theta_range, size)


def np_cylinder_quantize(pcds, phi_range, range_z, size):
    return _cylinder_quantize(np, pcds, phi_range, range_z, size)


def np_make_point_feat(pcds_xyzi, pcds_coord):
    return _make_point_feat(np, pcds_xyzi, pcds_coord)


def np_transform(pcds, mat):
    return _transform(np, pcds, mat)


def np_filter_mask(pcds, range_x, range_y, range_z):
    return _filter_mask(np, pcds, range_x, range_y, range_z)


# --------------------------------------------------------------------------
# KITTI calibration / pose files (host-side, file IO)
# --------------------------------------------------------------------------

def parse_calibration(filename: str):
    """Read a KITTI calib.txt into {key: 4x4} (reference utils.py:11-31)."""
    calib = {}
    with open(filename, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, content = line.split(":", 1)
            values = [float(v) for v in content.strip().split()]
            pose = np.zeros((4, 4))
            pose[0, :4] = values[0:4]
            pose[1, :4] = values[4:8]
            pose[2, :4] = values[8:12]
            pose[3, 3] = 1.0
            calib[key] = pose
    return calib


def parse_poses(filename: str, calibration):
    """Per-scan poses in the LiDAR frame: Tr^-1 . P . Tr (utils.py:34-54)."""
    Tr = calibration["Tr"]
    Tr_inv = np.linalg.inv(Tr)
    poses = []
    with open(filename, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            values = [float(v) for v in line.split()]
            pose = np.zeros((4, 4))
            pose[0, :4] = values[0:4]
            pose[1, :4] = values[4:8]
            pose[2, :4] = values[8:12]
            pose[3, 3] = 1.0
            poses.append(Tr_inv @ pose @ Tr)
    return poses
