"""Quaternion / covariance math for 3D Gaussians (pure jnp, differentiable).

Parity targets: quaternion convention is w-first, unnormalized storage,
normalized on use (reference /root/reference/gs_renderer.py:85-117,127-142).
3D covariance is ``Sigma = R S S^T R^T`` packed as the 6 upper-triangular
entries (xx, xy, xz, yy, yz, zz).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions ``[..., 4]`` (w, x, y, z)."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), eps))
    return q / norm


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion ``[..., 4]`` (w, x, y, z) -> rotation matrix ``[..., 3, 3]``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def build_covariance(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """3D covariance from (activated) scale and (unnormalized) quaternion.

    Args:
        scale: ``[..., 3]`` positive standard deviations.
        quat: ``[..., 4]`` w-first quaternion (normalized internally).

    Returns:
        ``[..., 3, 3]`` symmetric covariance.
    """
    R = quat_to_rotmat(normalize_quat(quat))
    # Sigma = R diag(s^2) R^T; fold s into R columns to avoid a matmul.
    # f32 accumulation: TPU default matmul precision is bf16-grade.
    M = R * scale[..., None, :]
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=jax.lax.Precision.HIGHEST)


def build_covariance6(scale: jnp.ndarray, quat: jnp.ndarray) -> tuple:
    """Packed upper-triangular covariance components as six ``[...]`` arrays.

    Same math as :func:`build_covariance` but fully scalarized: batched
    3x3 matmuls lower to padded MXU ops or VPU loops on TPU (measured
    ~1.3 ms for the whole projection at N=8k); ~40 elementwise [N] ops
    are effectively free. Returns (xx, xy, xz, yy, yz, zz).
    """
    q = normalize_quat(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = scale[..., 0] * scale[..., 0]
    s1 = scale[..., 1] * scale[..., 1]
    s2 = scale[..., 2] * scale[..., 2]
    # C = R diag(s^2) R^T -> C_ij = sum_k R_ik R_jk s_k^2.
    xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return xx, xy, xz, yy, yz, zz


def pack_covariance(cov: jnp.ndarray) -> jnp.ndarray:
    """Symmetric ``[..., 3, 3]`` -> packed 6-vector (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def gaussian_3d_weight(offsets: jnp.ndarray, cov6: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized Gaussian density exp(-0.5 x^T Sigma^-1 x).

    Used by occupancy-field extraction. Mirrors the closed-form 3x3 inverse
    of the reference (/root/reference/gs_renderer.py:64-83), including the
    guard that zeroes abnormal (positive) exponents.

    Args:
        offsets: ``[..., 3]`` point minus gaussian center.
        cov6: ``[..., 6]`` packed covariance (xx, xy, xz, yy, yz, zz).
    """
    x, y, z = offsets[..., 0], offsets[..., 1], offsets[..., 2]
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    inv_det = 1.0 / (
        a * d * f + 2.0 * e * c * b - e * e * a - c * c * d - b * b * f + 1e-24
    )
    inv_a = (d * f - e * e) * inv_det
    inv_b = (e * c - b * f) * inv_det
    inv_c = (e * b - c * d) * inv_det
    inv_d = (a * f - c * c) * inv_det
    inv_e = (b * c - e * a) * inv_det
    inv_f = (a * d - b * b) * inv_det
    power = (
        -0.5 * (x * x * inv_a + y * y * inv_d + z * z * inv_f)
        - x * y * inv_b
        - x * z * inv_c
        - y * z * inv_e
    )
    power = jnp.where(power > 0.0, -1e10, power)
    return jnp.exp(power)
