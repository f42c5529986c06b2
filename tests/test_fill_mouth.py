"""fill_mouth parity vs the reference's actual OpenCV flood-fill semantics
(renderer.py:583-601) — cv2 is available on host, so the oracle is exact."""

import numpy as np
import pytest

import jax.numpy as jnp

from next3d_tpu.render.fill_mouth import fill_mouth, fill_mouth_exact


def cv2_fill_mouth(images):
    """Oracle: the reference's exact pipeline (renderer.py:583-601)."""
    import cv2
    out = []
    for image in images:
        img = image[0] * 255.0
        copy_img = img.copy().astype(np.float32)
        h, w = img.shape
        mask = np.zeros([h + 2, w + 2], np.uint8)
        cv2.floodFill(copy_img, mask, (0, 0), (255, 255, 255), (0, 0, 0),
                      (254, 254, 254), cv2.FLOODFILL_FIXED_RANGE)
        m = copy_img.astype(np.float32) / 127.5 - 1
        m = ((m * 2. - 1.) * -1. + 1.) / 2.
        out.append(np.clip(image[0] + m, 0, 1)[None])
    return np.stack(out, 0)


def make_face_alpha(rng, size=64):
    """Ring-like alpha with an enclosed 'mouth' hole + soft edges."""
    y, x = np.mgrid[0:size, 0:size]
    cy = cx = size / 2
    r = np.sqrt((y - cy) ** 2 + (x - cx) ** 2)
    alpha = (r < size * 0.4).astype(np.float32)
    # soft boundary ring
    edge = (r >= size * 0.4) & (r < size * 0.44)
    alpha[edge] = rng.rand(edge.sum()).astype(np.float32) * 0.9
    # mouth hole (enclosed)
    mouth = (np.abs(y - cy * 1.3) < size * 0.06) & (np.abs(x - cx) < size * 0.12)
    alpha[mouth] = 0.0
    return alpha[None]


@pytest.mark.parametrize("impl", [fill_mouth_exact, fill_mouth])
def test_fill_mouth_matches_cv2(rng, impl):
    imgs = np.stack([make_face_alpha(rng) for _ in range(3)])
    want = cv2_fill_mouth(imgs)
    got = np.asarray(impl(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fill_mouth_thin_border_channel(rng):
    """Round-4 regression: a background region whose ONLY path from the
    (0, 0) seed is a long 1-px channel hugging the border. The old bounded
    multigrid schedule mis-filled exactly this topology on the real FFHQ
    face silhouette (it touches the frame edge, leaving the bottom-right
    background connected only along the frame border) — see
    docs/PARITY_RESIDUAL.md."""
    size = 128
    a = np.ones((size, size), np.float32)
    a[0, :] = 0.0          # top border channel from the seed
    a[:, -1] = 0.0         # right border channel down to the corner
    a[-1, 60:] = 0.0       # bottom-right pocket reachable only via above
    a[90:, 60] = 0.0
    imgs = a[None, None]
    want = cv2_fill_mouth(imgs)
    got = np.asarray(fill_mouth(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fill_mouth_backward_masking(rng):
    """Adversarial layout for the cummax sweep: the cell at (2, 0) is
    reachable only through a same-run source AFTER it (backward sweep),
    while a reachable cell in a LATER run sits further right on the same
    row — with naive suffix-max tags the later run masks the same-run hit
    permanently (fixpoint converges wrong). Guards the negated-id tagging
    in fill_mouth._sweep_axis."""
    m = np.zeros((3, 4), np.float32)
    m[1, 0] = m[1, 2] = m[2, 2] = 1.0
    imgs = m[None, None]
    want = cv2_fill_mouth(imgs)
    got = np.asarray(fill_mouth(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fill_mouth_spiral_channel(rng):
    """Worst-case path length (spiral): the fixpoint sweep must stay exact
    where any bounded iteration schedule breaks."""
    size = 64
    m = np.ones((size, size), np.float32)
    lo, hi = 0, size - 1
    while lo < hi:
        m[lo, lo:hi + 1] = 0
        m[lo:hi + 1, hi] = 0
        m[hi, lo:hi + 1] = 0
        m[lo + 2:hi + 1, lo] = 0
        lo += 2
        hi -= 2
    imgs = m[None, None]
    want = cv2_fill_mouth(imgs)
    got = np.asarray(fill_mouth(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fill_mouth_no_hole_is_identity(rng):
    imgs = np.zeros((1, 1, 64, 64), np.float32)
    imgs[:, :, 20:40, 20:40] = 1.0
    got = np.asarray(fill_mouth(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, imgs, atol=1e-6)
