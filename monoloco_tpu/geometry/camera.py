"""Camera geometry as pure, jittable JAX functions over batched arrays.

Functional parity targets (semantics, not code) in the reference:
/root/reference/monoloco/utils/camera.py:10-29 (pixel_to_camera),
:69-107 (get_keypoints), :161-177 (xyz_from_distance), :186-208 (angle
corrections), :211-248 (spherical<->cartesian).

Everything here is shape-polymorphic over leading batch dims, uses no Python
branching on data, and therefore fuses into surrounding XLA computations.
"""

import math

import jax
import jax.numpy as jnp
from PIL import Image

# Small 3x3-intrinsics transforms must not run at TPU-default (bfloat16) matmul
# precision: a 1e-3 relative error on pixel coordinates is a ~2 cm input error.
# HIGHEST forces full f32 on the MXU for these tiny ops at negligible cost.
_PRECISE = jax.lax.Precision.HIGHEST

# COCO-17 joint indices used by the reductions below.
_HEAD_SLICE = slice(0, 5)
_SHOULDER_SLICE = slice(5, 7)
_HIP_SLICE = slice(11, 13)
_ANKLE_SLICE = slice(15, 17)


def pixel_to_camera(uv, kk, z_met):
    """Back-project pixel coordinates into camera coordinates at depth ``z_met``.

    uv: (..., 2) pixel coordinates, or (m, 2, k) keypoint layout (x-row, y-row),
        which is transposed to (m, k, 2) first — mirroring the reference's
        permute at camera.py:20-22.
    kk: (3, 3) intrinsics.
    Returns (..., 3) metric coordinates: z_met * K^-1 @ [u, v, 1].
    """
    uv = jnp.asarray(uv, dtype=jnp.float32)
    kk = jnp.asarray(kk, dtype=jnp.float32)
    if uv.shape[-1] != 2:
        # (m, 2, k) -> (m, k, 2)
        uv = jnp.swapaxes(uv, -1, -2)
    ones = jnp.ones(uv.shape[:-1] + (1,), dtype=uv.dtype)
    uv1 = jnp.concatenate([uv, ones], axis=-1)
    kk_inv = jnp.linalg.inv(kk)
    return jnp.matmul(uv1, kk_inv.T, precision=_PRECISE) * z_met


def project_points(xyz, kk):
    """Project 3D camera-frame points (..., 3) into pixel coordinates (..., 2)."""
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    kk = jnp.asarray(kk, dtype=jnp.float32)
    uvw = jnp.matmul(xyz, kk.T, precision=_PRECISE)
    return uvw[..., 0:2] / uvw[..., 2:3]


def project_3d(box_obj, kk):
    """Project a 3D box (nuScenes Box object) into an image-plane 2D box using
    the two central corners at the center depth (reference camera.py:40-66).
    Host-side numpy."""
    import numpy as np
    xc, yc, zc = box_obj.center
    ww, _, hh = box_obj.wlh
    corners = np.array([[xc - ww / 2, yc - hh / 2, zc],
                        [xc + ww / 2, yc + hh / 2, zc]])
    kk = np.asarray(kk, dtype=np.float64)
    box_2d = []
    for xyz in corners:
        uvw = kk @ xyz
        box_2d.append(float(uvw[0] / uvw[2]))
        box_2d.append(float(uvw[1] / uvw[2]))
    return box_2d


def get_keypoints(keypoints, mode):
    """Reduce COCO-17 keypoints (m, 3, 17) to a single 2D point per person (m, 2).

    Modes follow the reference (camera.py:69-107):
      center   — midpoint of the keypoint bounding box
      bottom   — box-center x, max y (feet line)
      head     — mean of joints 0..4
      shoulder — mean of joints 5..6
      hip      — mean of joints 11..12
      ankle    — mean of joints 15..16
    """
    kps = jnp.asarray(keypoints, dtype=jnp.float32)
    if kps.ndim == 2:
        kps = kps[None]
    xy = kps[:, 0:2, :]  # (m, 2, 17)
    if mode == 'center':
        return (xy.max(axis=2) + xy.min(axis=2)) / 2.0
    if mode == 'bottom':
        cx = (xy[:, 0:1, :].max(axis=2) + xy[:, 0:1, :].min(axis=2)) / 2.0
        by = xy[:, 1:2, :].max(axis=2)
        return jnp.concatenate([cx, by], axis=-1)
    if mode == 'head':
        return xy[:, :, _HEAD_SLICE].mean(axis=2)
    if mode == 'shoulder':
        return xy[:, :, _SHOULDER_SLICE].mean(axis=2)
    if mode == 'hip':
        return xy[:, :, _HIP_SLICE].mean(axis=2)
    if mode == 'ankle':
        return xy[:, :, _ANKLE_SLICE].mean(axis=2)
    raise ValueError(f"unknown keypoint mode: {mode}")


def transform_kp(kps, tr_mode):
    """Ablation keypoint warps (reference camera.py:110-158): collapse or
    distort the pose to study which cues carry depth information.

    kps: [xs(17), ys(17), confs(17)] lists; returns the same structure plus an
    empty tail element, matching the reference's output shape."""
    import numpy as np
    assert tr_mode in ("None", "singularity", "upper", "lower", "horizontal",
                       "vertical", "lateral", 'shoulder', 'knee', 'up',
                       'upside', 'falling', 'random')
    uv_c = np.asarray(get_keypoints(np.asarray(kps)[None, ...], mode='center'))[0]
    uu_c, vv_c = float(uv_c[0]), float(uv_c[1])

    if tr_mode == "None":
        return kps
    if tr_mode == "singularity":
        uus = [uu_c] * 17
        vvs = [vv_c] * 17
    elif tr_mode == "vertical":
        uus = [uu_c] * 17
        vvs = list(kps[1])
    elif tr_mode == 'horizontal':
        uus = list(kps[0])
        vvs = [vv_c] * 17
    elif tr_mode == 'shoulder':
        uus = list(kps[0])
        vvs = list(kps[1][:7]) + [kps[1][6]] * len(kps[1][7:])
    elif tr_mode == 'knee':
        uus = list(kps[0])
        vvs = [kps[1][14]] * len(kps[1][:13]) + list(kps[1][13:])
    elif tr_mode == 'up':
        uus = list(kps[0])
        vvs = [kp - 300 for kp in kps[1]]
    elif tr_mode == 'falling':
        uus = [kps[0][16] - kp + kps[1][16] for kp in kps[1]]
        vvs = [kps[1][16] - kp + kps[0][16] for kp in kps[0]]
    elif tr_mode == 'random':
        np.random.seed(6)
        uus = np.random.uniform(min(kps[0]), max(kps[0]), len(kps[0])).tolist()
        vvs = np.random.uniform(min(kps[1]), max(kps[1]), len(kps[1])).tolist()
    else:
        # 'upper'/'lower'/'lateral'/'upside' appear in the reference's assert
        # but have no implementation there either; fail loudly rather than
        # silently reproducing the baseline.
        raise NotImplementedError(f"transform_kp mode '{tr_mode}' has no warp")
    return [uus, vvs, kps[2], []]


def xyz_from_distance(distances, xy_centers):
    """Scale normalized rays (z=1 coordinates) by distances to 3D points.

    distances: (m,) or (m, 1) or scalar; xy_centers: (m, 3) or (3,).
    Matches camera.py:161-177: xyz = ray * d / sqrt(1 + x^2 + y^2).
    """
    d = jnp.asarray(distances, dtype=jnp.float32)
    c = jnp.asarray(xy_centers, dtype=jnp.float32)
    if d.ndim == 0:
        d = d[None]
    if d.ndim == 1:
        d = d[:, None]
    if c.ndim == 1:
        c = c[None]
    denom = jnp.sqrt(1.0 + c[:, 0:1] ** 2 + c[:, 1:2] ** 2)
    return c * d / denom


def correct_angle(yaw, xyz):
    """Egocentric (rotation_y) -> allocentric (observation angle), wrapped to [-pi, pi].

    Scalar helper used by the data-prep path (camera.py:186-199).
    Returns (sin(alpha), cos(alpha), alpha).
    """
    correction = math.atan2(float(xyz[0]), float(xyz[2]))
    alpha = float(yaw) - correction
    if alpha > math.pi:
        alpha -= 2 * math.pi
    elif alpha < -math.pi:
        alpha += 2 * math.pi
    return math.sin(alpha), math.cos(alpha), alpha


def back_correct_angles(yaws, xyz):
    """Allocentric -> egocentric yaw for batches (camera.py:202-208).

    yaws: (m, 1) observation angles; xyz: (m, 3) predicted positions.
    """
    yaws = jnp.asarray(yaws, dtype=jnp.float32)
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    corr = jnp.arctan2(xyz[:, 0], xyz[:, 2])[:, None]
    out = yaws + corr
    out = jnp.where(out > math.pi, out - 2 * math.pi, out)
    out = jnp.where(out < -math.pi, out + 2 * math.pi, out)
    return out


def to_spherical(xyz):
    """Cartesian -> spherical [r, theta, psi] (camera.py:211-220). Host-side scalar."""
    x, y, z = float(xyz[0]), float(xyz[1]), float(xyz[2])
    r = math.sqrt(x * x + y * y + z * z)
    theta = math.atan2(z, x)
    psi = math.acos(y / r)
    return [r, theta, psi]


def to_cartesian(rtp, mode=None):
    """Spherical -> cartesian.

    Batched variant mirrors the reference's *channel convention for predictions*
    (camera.py:226-243): given network outputs (m, 3) laid out as
    [theta, psi, r], returns x = r sin(psi) cos(theta) or y = r cos(psi).
    The list variant takes [r, theta, psi].
    """
    if mode in ('x', 'y'):
        arr = jnp.asarray(rtp, dtype=jnp.float32)
        t, p, r = arr[:, 0], arr[:, 1], arr[:, 2]
        if mode == 'x':
            return (r * jnp.sin(p) * jnp.cos(t))[:, None]
        return (r * jnp.cos(p))[:, None]
    r, t, p = float(rtp[0]), float(rtp[1]), float(rtp[2])
    return [r * math.sin(p) * math.cos(t), r * math.cos(p), r * math.sin(p) * math.sin(t)]


def open_image(path_image):
    with open(path_image, 'rb') as f:
        return Image.open(f).convert('RGB')
