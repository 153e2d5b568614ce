"""Two-view epipolar geometry: essential-matrix estimation, pose recovery,
and linear triangulation (pure ``jnp`` linear algebra — batched SVDs and
3×3/4×4 solves, TPU-friendly).

Greenfield convenience completing the uncalibrated-extrinsics flow:
match correspondences → :func:`estimate_essential` → :func:`recover_pose`
→ :func:`stepth_tpu.ops.rectify.rectify_maps` → dense matchers. The
reference has no multi-view geometry at all (SURVEY.md §5).

Conventions match :mod:`stepth_tpu.ops.rectify` and :mod:`.geometry`:
``x_cam2 = R · x_cam1 + T``; inputs here are *normalized* image coordinates
(``K⁻¹ · pixel``), so the same code serves any intrinsics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _homogeneous(xn):
    return jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)


def estimate_essential(x1n, x2n) -> jax.Array:
    """Normalized eight-point essential matrix from N ≥ 8 correspondences in
    normalized coordinates ([N, 2] each): Hartley-style isotropic scaling,
    least-squares null vector, then projection to the essential manifold
    (singular values (σ, σ, 0)). Satisfies ``x2ᵀ E x1 = 0``."""
    x1 = _homogeneous(x1n)
    x2 = _homogeneous(x2n)

    def normalize(x):
        mean = jnp.mean(x[..., :2], axis=0)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(x[..., :2] - mean, axis=-1)), 1e-12
        )
        tf = jnp.asarray(
            [
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
            jnp.float32,
        )
        tf = tf.at[0, 0].set(scale).at[1, 1].set(scale)
        tf = tf.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
        return jnp.einsum("ij,nj->ni", tf, x), tf

    p1, t1 = normalize(x1)
    p2, t2 = normalize(x2)
    # x2ᵀ E x1 = 0 → A · vec(E) = 0 with A rows = kron(x1, x2)
    a = (p2[:, :, None] * p1[:, None, :]).reshape(-1, 9)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    e = vt[-1].reshape(3, 3)
    e = t2.T @ e @ t1  # denormalize
    u, s, vt = jnp.linalg.svd(e)
    sigma = (s[0] + s[1]) / 2.0
    return u @ jnp.diag(jnp.asarray([sigma, sigma, 0.0])) @ vt


def triangulate(R, T, x1n, x2n) -> jax.Array:
    """Linear (DLT) triangulation of normalized correspondences under
    ``x_cam2 = R x_cam1 + T``; returns cam1-frame points [N, 3]."""
    R = jnp.asarray(R, jnp.float32)
    T = jnp.asarray(T, jnp.float32).reshape(3)
    P1 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1))], 1)
    P2 = jnp.concatenate([R, T[:, None]], 1)

    def one(u1, u2):
        rows = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(rows)
        X = vt[-1]
        return X[:3] / X[3]

    return jax.vmap(one)(x1n, x2n)


def recover_pose(E, x1n, x2n) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decompose ``E`` into the physically valid ``(R, T̂)`` (unit-norm
    translation — the global scale is unobservable from two views) by the
    cheirality test: the candidate placing the most triangulated points in
    front of BOTH cameras wins. Returns ``(R, T_unit, points_cam1)``."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ w @ vt
    R2 = u @ w.T @ vt
    t = u[:, 2]

    def score(R, T):
        X1 = triangulate(R, T, x1n, x2n)
        X2 = jnp.einsum("ij,nj->ni", R, X1) + T
        return jnp.sum((X1[:, 2] > 0) & (X2[:, 2] > 0)), X1

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    scores = []
    points = []
    for R, T in cands:
        s, X = score(R, T)
        scores.append(s)
        points.append(X)
    best = jnp.argmax(jnp.stack(scores))
    Rb = jnp.stack([c[0] for c in cands])[best]
    Tb = jnp.stack([c[1] for c in cands])[best]
    Xb = jnp.stack(points)[best]
    return Rb, Tb, Xb


def pose_from_correspondences(uv1, uv2, K1, K2):
    """Pixels → relative pose: normalize by the intrinsics, eight-point,
    cheirality decomposition. Returns ``(R, T_unit, points_cam1)`` — feed
    ``(R, T_unit · b)`` to :func:`stepth_tpu.ops.rectify.rectify_maps` with a
    known baseline length ``b`` for metric depth."""
    K1i = jnp.linalg.inv(jnp.asarray(K1, jnp.float32))
    K2i = jnp.linalg.inv(jnp.asarray(K2, jnp.float32))
    x1 = jnp.einsum("ij,nj->ni", K1i, _homogeneous(jnp.asarray(uv1, jnp.float32)))
    x2 = jnp.einsum("ij,nj->ni", K2i, _homogeneous(jnp.asarray(uv2, jnp.float32)))
    x1n = x1[:, :2] / x1[:, 2:3]
    x2n = x2[:, :2] / x2[:, 2:3]
    E = estimate_essential(x1n, x2n)
    return recover_pose(E, x1n, x2n)
