"""Two-view geometry: essential matrix, pose recovery, triangulation, and the
integration with rectification."""

import numpy as np
import jax.numpy as jnp

from stepth_tpu.fusion import epipolar, geometry as geo
from tests.test_rectify import K, _rot


def _rig(rng, n=120):
    R = (_rot("y", 4.0) @ _rot("x", -2.0)).astype(np.float32)
    T = np.array([-0.8, 0.05, 0.03], np.float32)
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 7.0
    x1 = pts[:, :2] / pts[:, 2:3]
    p2 = pts @ R.T + T
    x2 = p2[:, :2] / p2[:, 2:3]
    return R, T, pts, x1.astype(np.float32), x2.astype(np.float32)


def test_essential_epipolar_constraint(rng):
    R, T, _, x1, x2 = _rig(rng)
    E = np.asarray(epipolar.estimate_essential(jnp.asarray(x1), jnp.asarray(x2)))
    h1 = np.concatenate([x1, np.ones((len(x1), 1), np.float32)], 1)
    h2 = np.concatenate([x2, np.ones((len(x2), 1), np.float32)], 1)
    resid = np.abs(np.einsum("ni,ij,nj->n", h2, E, h1))
    assert resid.max() < 1e-4, resid.max()
    # E ∝ [T]x R (up to sign/scale)
    Tx = np.array(
        [[0, -T[2], T[1]], [T[2], 0, -T[0]], [-T[1], T[0], 0]], np.float32
    )
    E_gt = Tx @ R
    E_gt /= np.linalg.norm(E_gt)
    En = E / np.linalg.norm(E)
    assert min(np.abs(En - E_gt).max(), np.abs(En + E_gt).max()) < 1e-4


def test_recover_pose_and_triangulate(rng):
    R, T, pts, x1, x2 = _rig(rng)
    E = epipolar.estimate_essential(jnp.asarray(x1), jnp.asarray(x2))
    Rb, Tb, X = epipolar.recover_pose(E, jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(Rb), R, atol=1e-4)
    t_unit = T / np.linalg.norm(T)
    np.testing.assert_allclose(np.asarray(Tb), t_unit, atol=1e-4)
    # triangulated points match ground truth up to the global scale 1/|T|
    X = np.asarray(X)
    scale = np.median(pts[:, 2] / X[:, 2])
    np.testing.assert_allclose(X * scale, pts, rtol=2e-3, atol=2e-3)
    assert abs(scale - np.linalg.norm(T)) < 1e-3 * np.linalg.norm(T) + 1e-3


def test_pose_from_pixels_feeds_rectification(rng):
    """Pixels → pose → rectification: rows align in the rectified views."""
    from stepth_tpu.ops import rectify

    R, T, pts, _, _ = _rig(rng)
    uv1 = np.asarray(geo.project(jnp.asarray(pts), jnp.asarray([200.0, 200.0, 96.0, 64.0])))
    p2 = pts @ R.T + T
    uv2 = np.asarray(geo.project(jnp.asarray(p2), jnp.asarray([200.0, 200.0, 96.0, 64.0])))

    Rb, Tb, _ = epipolar.pose_from_correspondences(uv1, uv2, K, K)
    baseline = np.linalg.norm(T)  # known rig scale
    maps = rectify.rectify_maps(K, K, Rb, np.asarray(Tb) * baseline, (128, 192))
    r1, r2 = rectify.project_rectified(jnp.asarray(pts), maps, Rb, np.asarray(Tb) * baseline)
    np.testing.assert_allclose(
        np.asarray(r1)[:, 1], np.asarray(r2)[:, 1], atol=5e-3
    )
    assert abs(float(maps.baseline) - baseline) < 1e-5
