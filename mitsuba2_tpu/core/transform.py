"""4x4 homogeneous transforms (reference: include/mitsuba/core/transform.h).

A Transform stores the matrix and its inverse-transpose (cached, like the
reference) as (..., 4, 4) arrays. Constructors mirror the reference's static
factories: translate/scale/rotate/perspective/orthographic/look_at.

AnimatedTransform (transform.h:240+) keyframe interpolation: keyframes are
decomposed into scale/quaternion/translation and interpolated at eval time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import math as m


class Transform(NamedTuple):
    matrix: jnp.ndarray           # (..., 4, 4)
    inverse_transpose: jnp.ndarray  # (..., 4, 4)

    # ---- constructors -------------------------------------------------------
    @staticmethod
    def identity(dtype=jnp.float32) -> "Transform":
        i = jnp.eye(4, dtype=dtype)
        return Transform(i, i)

    @staticmethod
    def from_matrix(mat) -> "Transform":
        mat = jnp.asarray(mat, dtype=jnp.result_type(mat, 1.0))
        inv_t = jnp.transpose(jnp.linalg.inv(mat), (*range(mat.ndim - 2), -1, -2))
        return Transform(mat, inv_t)

    @staticmethod
    def translate(v) -> "Transform":
        v = np.asarray(v, dtype=np.float64)
        mat = np.eye(4); mat[:3, 3] = v
        inv_t = np.eye(4); inv_t[3, :3] = -v
        return Transform(jnp.asarray(mat, jnp.float32), jnp.asarray(inv_t, jnp.float32))

    @staticmethod
    def scale(v) -> "Transform":
        v = np.broadcast_to(np.asarray(v, dtype=np.float64), (3,))
        mat = np.diag(np.concatenate([v, [1.0]]))
        inv_t = np.diag(np.concatenate([1.0 / v, [1.0]]))
        return Transform(jnp.asarray(mat, jnp.float32), jnp.asarray(inv_t, jnp.float32))

    @staticmethod
    def rotate(axis, angle_deg) -> "Transform":
        """Rotation around an axis, angle in degrees (transform.h rotate)."""
        axis = np.asarray(axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        theta = np.deg2rad(float(angle_deg))
        s, c = np.sin(theta), np.cos(theta)
        x, y, z = axis
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        R = np.eye(3) * c + (1 - c) * np.outer(axis, axis) + s * K
        mat = np.eye(4); mat[:3, :3] = R
        inv_t = np.eye(4); inv_t[:3, :3] = R  # rotation: inv-transpose == R
        return Transform(jnp.asarray(mat, jnp.float32), jnp.asarray(inv_t, jnp.float32))

    @staticmethod
    def look_at(origin, target, up) -> "Transform":
        """Camera-to-world: +z toward target, +y ~ up (transform.h look_at)."""
        origin = np.asarray(origin, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        dir_ = target - origin
        dir_ = dir_ / np.linalg.norm(dir_)
        left = np.cross(up / np.linalg.norm(up), dir_)
        left = left / np.linalg.norm(left)
        new_up = np.cross(dir_, left)
        mat = np.eye(4)
        mat[:3, 0] = left
        mat[:3, 1] = new_up
        mat[:3, 2] = dir_
        mat[:3, 3] = origin
        return Transform.from_matrix(np.asarray(mat, np.float32))

    @staticmethod
    def perspective(fov_deg, near, far) -> "Transform":
        """Projection onto [0,1]^2 image plane at z=1 (transform.h perspective)."""
        recip = 1.0 / (far - near)
        tan_half = np.tan(np.deg2rad(float(fov_deg)) * 0.5)
        cot = 1.0 / tan_half
        mat = np.array([
            [cot, 0, 0, 0],
            [0, cot, 0, 0],
            [0, 0, far * recip, -near * far * recip],
            [0, 0, 1, 0]], dtype=np.float64)
        return Transform.from_matrix(np.asarray(mat, np.float32))

    @staticmethod
    def orthographic(near, far) -> "Transform":
        return (Transform.scale([1.0, 1.0, 1.0 / (far - near)])
                @ Transform.translate([0.0, 0.0, -near]))

    # ---- application --------------------------------------------------------
    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(self.matrix @ other.matrix,
                         self.inverse_transpose @ other.inverse_transpose)

    def inverse(self) -> "Transform":
        t = lambda a: jnp.swapaxes(a, -1, -2)
        return Transform(t(self.inverse_transpose), t(self.matrix))

    def transform_point(self, p):
        mat = self.matrix
        out = p @ jnp.swapaxes(mat[..., :3, :3], -1, -2) + mat[..., :3, 3]
        w = p @ mat[..., 3, :3] + mat[..., 3, 3]
        return out / w[..., None]

    def transform_vector(self, v):
        return v @ jnp.swapaxes(self.matrix[..., :3, :3], -1, -2)

    def transform_normal(self, n):
        return n @ jnp.swapaxes(self.inverse_transpose[..., :3, :3], -1, -2)

    def transform_ray(self, o, d):
        return self.transform_point(o), self.transform_vector(d)

    @property
    def translation(self):
        return self.matrix[..., :3, 3]

    def has_scale(self) -> bool:
        lin = np.asarray(self.matrix)[..., :3, :3]
        g = lin @ np.swapaxes(lin, -1, -2)
        return not np.allclose(g, np.eye(3), atol=1e-5)


def _quat_from_matrix(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


class AnimatedTransform:
    """Keyframed transform with slerp interpolation (transform.h:240+).

    Keyframes are decomposed host-side into (scale, quaternion, translation);
    ``eval(t)`` interpolates with lerp/slerp/lerp like the reference.
    """

    def __init__(self, base: Transform | None = None):
        self._base = base if base is not None else Transform.identity()
        self._times: list[float] = []
        self._scales: list[np.ndarray] = []
        self._quats: list[np.ndarray] = []
        self._trans: list[np.ndarray] = []

    def append(self, time: float, trafo: Transform) -> None:
        mat = np.asarray(trafo.matrix, np.float64)
        T = mat[:3, 3]
        A = mat[:3, :3]
        # polar decomposition A = R S
        U, s, Vt = np.linalg.svd(A)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            U[:, -1] *= -1
            s = s.copy(); s[-1] *= -1
            R = U @ Vt
        S = Vt.T @ np.diag(s) @ Vt
        self._times.append(float(time))
        self._scales.append(np.diag(np.diag(S)) if False else S)
        self._quats.append(_quat_from_matrix(R))
        self._trans.append(T)

    @property
    def is_static(self) -> bool:
        return len(self._times) <= 1

    def eval(self, time: float) -> Transform:
        if not self._times:
            return self._base
        times = np.asarray(self._times)
        if len(times) == 1 or time <= times[0]:
            idx0 = idx1 = 0; t = 0.0
        elif time >= times[-1]:
            idx0 = idx1 = len(times) - 1; t = 0.0
        else:
            idx1 = int(np.searchsorted(times, time, side="right"))
            idx0 = idx1 - 1
            t = (time - times[idx0]) / (times[idx1] - times[idx0])
        S = (1 - t) * self._scales[idx0] + t * self._scales[idx1]
        T = (1 - t) * self._trans[idx0] + t * self._trans[idx1]
        q0, q1 = self._quats[idx0], self._quats[idx1]
        d = float(np.dot(q0, q1))
        if d < 0:
            q1, d = -q1, -d
        if d > 0.9995:
            q = (1 - t) * q0 + t * q1
        else:
            th = np.arccos(np.clip(d, -1, 1))
            q = (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
        mat = np.eye(4)
        mat[:3, :3] = R @ S
        mat[:3, 3] = T
        return Transform.from_matrix(np.asarray(mat, np.float32))

    def translation_bounds(self):
        pts = np.asarray(self._trans) if self._trans else np.zeros((1, 3))
        return pts.min(axis=0), pts.max(axis=0)
