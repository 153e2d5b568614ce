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


def epipolar_residuals(E, x1n, x2n) -> jax.Array:
    """Sampson-normalized epipolar distances |x2ᵀEx1| / ‖gradient‖ — the
    standard first-order geometric residual for inlier scoring."""
    h1 = _homogeneous(x1n)
    h2 = _homogeneous(x2n)
    Eh1 = jnp.einsum("ij,nj->ni", E, h1)
    Eth2 = jnp.einsum("ji,nj->ni", E, h2)
    num = jnp.abs(jnp.einsum("ni,ni->n", h2, Eh1))
    den = jnp.sqrt(
        Eh1[:, 0] ** 2 + Eh1[:, 1] ** 2 + Eth2[:, 0] ** 2 + Eth2[:, 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def ransac_essential(
    x1n,
    x2n,
    iters: int = 256,
    thresh: float = 2.5e-3,
    seed: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """RANSAC eight-point, TPU-shaped: all ``iters`` minimal hypotheses are
    estimated by ONE batched (vmapped) eight-point solve and scored by ONE
    batched Sampson-residual pass — no data-dependent Python loop. Returns
    ``(E, inlier_mask)`` where ``E`` is re-estimated on the consensus set.

    ``thresh`` is in *normalized* coordinates (divide a pixel tolerance by
    the focal length). Gross outliers (repetitive-texture false matches,
    which survive descriptor similarity checks) bias the plain least-squares
    eight-point enough to throw the downstream robust BA into a wrong basin
    (measured: 6% outliers → 124° translation-direction error); consensus
    sampling is the standard fix and costs one batched solve."""
    import numpy as np

    n = x1n.shape[0]
    if n < 8:
        return estimate_essential(x1n, x2n), jnp.ones(n, bool)
    keys = jax.random.split(jax.random.PRNGKey(seed), iters)
    # minimal samples without replacement (degenerate duplicate picks would
    # make the 8-point system rank-deficient)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(8,), replace=False)
    )(keys)
    Es = jax.vmap(lambda i: estimate_essential(x1n[i], x2n[i]))(idx)
    resid = jax.vmap(lambda E: epipolar_residuals(E, x1n, x2n))(Es)
    counts = jnp.sum(resid < thresh, axis=1)
    best = jnp.argmax(counts)
    mask = resid[best] < thresh
    # refit on the consensus set (host-side gather: the inlier count is
    # data-dependent, and this function is orchestration, not a jit region)
    sel = np.asarray(mask)
    if sel.sum() >= 8:
        E = estimate_essential(x1n[jnp.asarray(sel)], x2n[jnp.asarray(sel)])
    else:
        E, mask = Es[best], jnp.ones(n, bool)
    return E, mask


def refine_pose_ba(uv1, uv2, K, R0, T0, X0, iters: int = 15,
                   cg_iters: int = 10, loss: str = "huber",
                   loss_delta: float = 1.0, weights=None):
    """Gold-standard two-view refinement: triangulated structure + the
    eight-point pose as the init for a robust bundle adjustment over
    {cam2 pose, points} (cam1 fixed — the gauge). Returns
    ``(R, T_unit, points_cam1)``.

    Eight-point from noisy sub-pixel matches leaves the translation
    *direction* tens of degrees off in weakly-conditioned geometries (narrow
    FOV, shallow relief); two-view BA is the maximum-likelihood estimate and
    recovers it (measured on the synthetic rig: t-direction error 25° → 5°,
    R max-entry error 0.076 → 0.008; tests/test_features.py)."""
    from stepth_tpu.fusion import ba, geometry as geo

    K = jnp.asarray(K, jnp.float32)
    n = uv1.shape[0]
    w0 = geo.log_so3(jnp.asarray(R0, jnp.float32))
    pose2 = jnp.concatenate([w0, jnp.asarray(T0, jnp.float32).reshape(3)])
    poses0 = jnp.stack([jnp.zeros(6, jnp.float32), pose2])
    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], jnp.float32)
    prob = ba.BAProblem(
        poses=poses0,
        points=jnp.asarray(X0, jnp.float32),
        intrinsics=intr,
        cam_idx=jnp.concatenate(
            [jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.int32)]
        ),
        pt_idx=jnp.tile(jnp.arange(n, dtype=jnp.int32), 2),
        uv=jnp.concatenate(
            [jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)]
        ),
        weight=(
            jnp.ones(2 * n, jnp.float32)
            if weights is None
            else jnp.tile(jnp.asarray(weights, jnp.float32), 2)
        ),
    )
    st = ba.solve(prob, iters=iters, cg_iters=cg_iters, loss=loss,
                  loss_delta=loss_delta)
    R = geo.exp_so3(st.poses[1, :3])
    t = st.poses[1, 3:]
    return R, t / jnp.linalg.norm(t), st.points


def pose_from_correspondences(uv1, uv2, K1, K2, trim_iters: int = 0,
                              keep: float = 0.7, refine: bool = True,
                              ransac_iters: int = 256,
                              ransac_px: float = 2.0,
                              seed: int = 0):
    """Pixels → relative pose: normalize by the intrinsics, RANSAC
    eight-point (``ransac_iters`` batched hypotheses, ``ransac_px`` pixel
    inlier tolerance), cheirality decomposition on the consensus set, then
    (``refine=True``, the default) robust two-view bundle adjustment with
    the outliers zero-weighted. Returns ``(R, T_unit, points_cam1)`` — feed
    ``(R, T_unit · b)`` to :func:`stepth_tpu.ops.rectify.rectify_maps` with a
    known baseline length ``b`` for metric depth.

    Outlier handling is two-layered: RANSAC rejects *gross* outliers (e.g.
    repetitive-texture false matches — a least-squares eight-point fit under
    6% of them lands the subsequent BA in a wrong basin, measured 124°
    translation error on the synthetic rig), then huber IRLS in the BA
    handles the sub-pixel tail. ``ransac_iters=0`` restores the plain
    least-squares eight-point. Residual-trimmed re-estimation
    (``trim_iters`` > 0) is also available but off by default: trimming
    against a *biased* eight-point fit preferentially discards the
    high-parallax correspondences that carry the translation signal
    (measured: it made the refined pose WORSE). BA refinement requires
    shared intrinsics (K1 == K2); it is skipped otherwise."""
    import numpy as np

    K1 = jnp.asarray(K1, jnp.float32)
    K2 = jnp.asarray(K2, jnp.float32)
    K1i = jnp.linalg.inv(K1)
    K2i = jnp.linalg.inv(K2)
    x1 = jnp.einsum("ij,nj->ni", K1i, _homogeneous(jnp.asarray(uv1, jnp.float32)))
    x2 = jnp.einsum("ij,nj->ni", K2i, _homogeneous(jnp.asarray(uv2, jnp.float32)))
    x1n = x1[:, :2] / x1[:, 2:3]
    x2n = x2[:, :2] / x2[:, 2:3]
    inlier = jnp.ones(x1n.shape[0], bool)
    if ransac_iters > 0:
        focal = float(K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
        E, inlier = ransac_essential(
            x1n, x2n, iters=ransac_iters, thresh=ransac_px / focal, seed=seed
        )
    else:
        E = estimate_essential(x1n, x2n)
    x1k, x2k = x1n, x2n
    for _ in range(trim_iters):
        r = np.asarray(epipolar_residuals(E, x1k, x2k))
        if len(r) * keep < 8:
            break
        thresh = np.quantile(r, keep)
        sel = jnp.asarray(np.asarray(r <= thresh))
        x1k, x2k = x1k[sel], x2k[sel]
        E = estimate_essential(x1k, x2k)
    sel_np = np.asarray(inlier)
    R, T, _ = recover_pose(E, x1n[jnp.asarray(sel_np)], x2n[jnp.asarray(sel_np)])
    X = triangulate(R, T, x1n, x2n)
    if refine and np.allclose(np.asarray(K1), np.asarray(K2)):
        # refine on the full set with outliers zero-weighted; huber IRLS
        # gates the sub-pixel tail among the inliers
        R, T, X = refine_pose_ba(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            K1, R, T, X, weights=inlier.astype(jnp.float32),
        )
    return R, T, X
