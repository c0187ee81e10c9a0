"""Batched perspective projection of 3D gaussians to screen space.

TPU-native equivalent of gsplat's ``fully_fused_projection`` CUDA kernels
(reference SURVEY D2; called via ``rasterization(...)`` at reference
model.py:267-288). Everything is expressed as dense, fixed-shape elementwise
math + tiny batched matmuls over a ``[C cameras, N gaussians]`` grid so XLA
fuses it into a handful of VPU kernels; gradients come from plain autodiff.

Reproduced semantics:
- EWA splatting: cov2d = J W Sigma W^T J^T with the frustum-clamped Jacobian;
- ``classic`` mode adds a 0.3px screen blur to cov2d; ``antialiased`` mode
  additionally computes the opacity compensation factor
  sqrt(det(cov2d) / det(cov2d + 0.3 I)) (model.py:253-254, 285);
- conservative radius = ceil(3 sqrt(lambda_max)) like gsplat/3DGS;
- validity: near/far plane (0.01 / 1e10 at model.py:279-280), positive
  determinant, and image-bounds overlap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProjectionResult(NamedTuple):
    """Screen-space gaussians for each (camera, gaussian) pair.

    All arrays are [C, N, ...]; invalid entries have radius == 0.
    """

    means2d: jnp.ndarray        # [C, N, 2] pixel coordinates
    depths: jnp.ndarray         # [C, N] camera-space z
    conics: jnp.ndarray         # [C, N, 3] inverse 2D covariance (a, b, c)
    radii: jnp.ndarray          # [C, N] int32 conservative pixel radius
    compensations: jnp.ndarray  # [C, N] antialiasing opacity factor (1.0 classic)
    valid: jnp.ndarray          # [C, N] bool


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize [..., 4] (w, x, y, z) quaternions and convert to [..., 3, 3].

    NaN-safe at q == 0: ``sqrt(max(|q|^2, eps))`` keeps the *backward* pass
    finite (``maximum(norm(q), eps)`` does not — d|q|/dq = q/|q| is 0/0 at
    zero, and 0-cotangent x NaN-partial = NaN; a zero quat in any dead
    capacity slot would poison every gradient in the step).
    """
    sq = jnp.sum(quats * quats, axis=-1, keepdims=True)
    q = quats / jnp.sqrt(jnp.maximum(sq, 1e-24))
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
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def covariance3d_sqrt(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """M = R diag(scales): Sigma = M M^T. quats [..., 4] wxyz, scales [..., 3] > 0."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def project_gaussians(
    means: jnp.ndarray,        # [N, 3] world
    quats: jnp.ndarray,        # [N, 4] wxyz (need not be normalized; model.py:269)
    scales: jnp.ndarray,       # [N, 3] positive world-space scales (exp'd upstream)
    viewmats: jnp.ndarray,     # [C, 4, 4] world-to-camera (OpenCV, +z forward)
    Ks: jnp.ndarray,           # [C, 3, 3] intrinsics
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    antialiased: bool = False,
    radius_clip: float = 0.0,
) -> ProjectionResult:
    """Project N gaussians into C cameras (dense [C, N] output).

    Static args: image size, blur eps, mode — shapes and compiled code depend
    only on these, so the train step compiles once per resolution bucket.
    """
    f32 = jnp.float32
    means = means.astype(f32)
    quats = quats.astype(f32)
    scales = scales.astype(f32)
    # Containment: a gaussian whose parameters went non-finite (however it
    # happened) must neither render nor emit gradients. Without this, a NaN
    # mean flows NaN into the camera-pose gradient sum and every eval
    # render, even though the row itself is radii-0-masked.
    row_ok = (
        jnp.all(jnp.isfinite(means), axis=-1)
        & jnp.all(jnp.isfinite(quats), axis=-1)
        & jnp.all(jnp.isfinite(scales), axis=-1)
    )                                            # [N]
    means = jnp.where(row_ok[:, None], means, 0.0)
    quats = jnp.where(
        row_ok[:, None], quats, jnp.asarray([1.0, 0.0, 0.0, 0.0], f32)
    )
    scales = jnp.where(row_ok[:, None], scales, 1.0)
    R = viewmats[:, :3, :3].astype(f32)          # [C, 3, 3]
    t = viewmats[:, :3, 3].astype(f32)           # [C, 3]
    fx = Ks[:, 0, 0].astype(f32)[:, None]        # [C, 1]
    fy = Ks[:, 1, 1].astype(f32)[:, None]
    cx = Ks[:, 0, 2].astype(f32)[:, None]
    cy = Ks[:, 1, 2].astype(f32)[:, None]

    # Camera-space means: [C, N, 3] as explicit fused multiply-adds (an
    # einsum here lowers to a TPU conv — see the cov_cam note below); all
    # f32 vector math, so the old bf16-matmul jitter concern is moot.
    p_cam = jnp.stack(
        [
            sum(R[:, None, i, j] * means[None, :, j] for j in range(3))
            + t[:, None, i]
            for i in range(3)
        ],
        axis=-1,
    )
    z = p_cam[..., 2]
    in_depth = (z > near_plane) & (z < far_plane)
    z_safe = jnp.where(in_depth, z, 1.0)

    # Frustum-clamped normalized coords for the EWA Jacobian (gsplat-style
    # 1.3x tan-fov limit keeps the linearization sane at the image border).
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(p_cam[..., 0] / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(p_cam[..., 1] / z_safe, -lim_y, lim_y) * z_safe

    # Screen-space means: [C, N, 2]
    means2d = jnp.stack(
        [
            fx * p_cam[..., 0] / z_safe + cx,
            fy * p_cam[..., 1] / z_safe + cy,
        ],
        axis=-1,
    )

    # 3D covariance in camera frame: cov_cam = (R M)(R M)^T, [C, N, 3, 3].
    # Written as explicit per-component math on [C, N] vectors: an einsum
    # over batched 3x3 matrices lowers to a TPU convolution + slice fusions
    # (~5 ms/step at 131k gaussians); 27 fused multiply-adds are ~free.
    M = covariance3d_sqrt(quats.astype(f32), scales.astype(f32))  # [N, 3, 3]
    RMr = [
        [
            sum(R[:, None, i, j] * M[None, :, j, k] for j in range(3))
            for k in range(3)
        ]
        for i in range(3)
    ]  # RM[i][k]: [C, N]

    def dotrow(i, l):
        return sum(RMr[i][k] * RMr[l][k] for k in range(3))

    # EWA Jacobian J = d(pixel)/d(cam): [[fx/z, 0, -fx tx/z^2],
    #                                    [0, fy/z, -fy ty/z^2]]
    inv_z = 1.0 / z_safe
    j00 = fx * inv_z
    j11 = fy * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j12 = -fy * ty * inv_z * inv_z

    s00 = dotrow(0, 0)
    s01 = dotrow(0, 1)
    s02 = dotrow(0, 2)
    s11 = dotrow(1, 1)
    s12 = dotrow(1, 2)
    s22 = dotrow(2, 2)

    # cov2d = J S J^T (symmetric 2x2: a = xx, b = xy, c = yy)
    a = j00 * (j00 * s00 + j02 * s02) + j02 * (j00 * s02 + j02 * s22)
    b = j00 * (j11 * s01 + j12 * s02) + j02 * (j11 * s12 + j12 * s22)
    c = j11 * (j11 * s11 + j12 * s12) + j12 * (j11 * s12 + j12 * s22)

    det_orig = a * c - b * b
    a_blur = a + eps2d
    c_blur = c + eps2d
    det_blur = a_blur * c_blur - b * b

    # A PSD cov2d guarantees det_blur >= eps2d*(a+c) + eps2d^2 >= 0.09 in
    # exact arithmetic, so any tiny/negative computed det_blur is pure f32
    # cancellation from a numerically degenerate (needle) splat. Guard with
    # ``where`` — NOT ``maximum(det, 1e-30)``: the maximum-clamp's backward
    # partial d(1/det)/d(det) = -1/det^2 overflows f32 to inf for
    # det < ~5e-20, and 0-cotangent x inf = NaN. One such invisible splat
    # poisons the summed camera-opt gradient and from there every gaussian
    # (the round-2 30k-run collapse: means/scales/quats/camera all-NaN with
    # opacities/features_dc clean — exactly this gradient path).
    det_ok = det_blur > 1e-6
    det_safe = jnp.where(det_ok, det_blur, 1.0)
    inv_det = 1.0 / det_safe

    if antialiased:
        # same where-guard discipline for sqrt(det_orig/det_blur): sqrt has
        # an inf backward partial at 0 (reference semantics: compensation 0
        # for degenerate splats, gsplat fully_fused_projection).
        comp_ok = det_ok & (det_orig > 0)
        ratio = jnp.where(comp_ok, det_orig, 1.0) * inv_det
        compensations = jnp.where(
            comp_ok, jnp.sqrt(jnp.maximum(ratio, 1e-24)), 0.0
        )
    else:
        compensations = jnp.ones_like(det_blur)

    conics = jnp.stack([c_blur * inv_det, -b * inv_det, a_blur * inv_det], axis=-1)

    # Conservative extent: 3 sigma of the dominant eigenvalue of blurred cov2d.
    mid = 0.5 * (a_blur + c_blur)
    lambda_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det_blur, 0.01))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda_max))

    inside = (
        (means2d[..., 0] + radius_f > 0)
        & (means2d[..., 0] - radius_f < width)
        & (means2d[..., 1] + radius_f > 0)
        & (means2d[..., 1] - radius_f < height)
    )
    valid = (
        in_depth & det_ok & inside & (radius_f > radius_clip)
        & row_ok[None, :]
    )

    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    return ProjectionResult(
        means2d=means2d,
        depths=z,
        conics=conics,
        radii=radii,
        compensations=compensations,
        valid=valid,
    )
