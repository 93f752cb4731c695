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


def test_upsample2x_argmax_head_exact():
    """Phase-decomposed head (upsample2x_argmax_head) == the matrix-path
    upsample(ac=True) + argmax, bit-for-bit on the class map — full-res
    fp32 logits never materialize (VERDICT r1 task 4)."""
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.ops.resize import upsample2x_argmax_head, upsample2x_bilinear

    for h, w, c, b in [(8, 12, 10, 2), (5, 7, 3, 1), (64, 128, 10, 3)]:
        x = jnp.asarray(
            np.random.RandomState(h).randn(b, h, w, c).astype(np.float32)
        )
        ref = jnp.argmax(upsample2x_bilinear(x, align_corners=True), axis=-1)
        got = upsample2x_argmax_head(x)
        assert got.dtype == jnp.uint8 and got.shape == (b, 2 * h, 2 * w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_phase2_ac_true_values_exact():
    """The even/odd phase lerps reproduce the ac=True interpolation values
    (not just the argmax) to fp32 exactness."""
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.ops.resize import _phase2_ac_true, upsample2x_bilinear

    x = jnp.asarray(np.random.RandomState(0).rand(2, 9, 4, 3).astype(np.float32))
    full = np.asarray(upsample2x_bilinear(x, align_corners=True))
    even, odd = _phase2_ac_true(x, 1)
    # rows 2k of the H-upsampled result == even[k] after W upsample; check
    # along H only by comparing against a W-identity slice: upsample W too
    ew_even, _ = _phase2_ac_true(even, 2)
    np.testing.assert_allclose(
        np.asarray(ew_even), full[:, 0::2, 0::2, :], rtol=1e-5, atol=1e-6
    )
