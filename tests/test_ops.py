"""Resize ops vs cv2 conventions (the pipeline-edge parity, SURVEY.md hard parts)."""

import cv2
import jax.numpy as jnp
import numpy as np

from tpuseg.ops.resize import resize_bilinear, resize_nearest


def test_bilinear_matches_cv2_inter_linear():
    """align_corners=False == cv2 INTER_LINEAR (half-pixel convention)."""
    rng = np.random.RandomState(0)
    x = rng.rand(37, 53, 3).astype(np.float32)
    ref = cv2.resize(x, (256, 128), interpolation=cv2.INTER_LINEAR)
    out = np.asarray(resize_bilinear(jnp.asarray(x), 128, 256, align_corners=False))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_nearest_matches_cv2_inter_nearest():
    """Class-map resize (inference.py:68-70) == cv2 INTER_NEAREST."""
    rng = np.random.RandomState(1)
    m = rng.randint(0, 10, (64, 128)).astype(np.uint8)
    for out_wh in [(256, 128), (640, 360), (37, 91)]:
        ref = cv2.resize(m, out_wh, interpolation=cv2.INTER_NEAREST)
        out = np.asarray(resize_nearest(jnp.asarray(m), out_wh[1], out_wh[0]))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, ref)


def test_identity_resize_is_exact():
    x = np.random.RandomState(2).rand(16, 16, 3).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(x), 16, 16))
    np.testing.assert_array_equal(out, x)


def test_batched_resize():
    x = np.random.RandomState(3).rand(4, 8, 8, 3).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), 16, 16)
    assert out.shape == (4, 16, 16, 3)
    one = resize_bilinear(jnp.asarray(x[0]), 16, 16)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(one), rtol=1e-6)
