"""Fused inverted-residual kernel (tpuseg/ops/pallas_mbconv.py): exactness
vs the literal expand/depthwise/project math, interpret mode (CI sanitizer
per SURVEY.md §5.2), all block variants: expand_ratio 1 and 6, stride 1/2,
with and without the residual add."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.ops.pallas_mbconv import (
    fold_bn_affine,
    fused_inverted_residual,
    mbconv_reference,
)


def _case(rng, b, h, w, cin, hidden, cout, stride, use_res, expand=True):
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    we = (
        jnp.asarray(rng.randn(cin, hidden) * 0.2, jnp.float32)
        if expand else None
    )
    mkv = lambda n, s: jnp.asarray(rng.rand(n) + 0.5 if s
                                   else rng.randn(n) * 0.1, jnp.float32)
    return (
        x, we, mkv(hidden, True), mkv(hidden, False),
        jnp.asarray(rng.randn(3, 3, hidden) * 0.2, jnp.float32),
        mkv(hidden, True), mkv(hidden, False),
        jnp.asarray(rng.randn(hidden, cout) * 0.2, jnp.float32),
        mkv(cout, True), mkv(cout, False),
        stride, use_res,
    )


@pytest.mark.parametrize(
    "spec",
    [
        dict(b=2, h=16, w=24, cin=8, hidden=48, cout=16, stride=1,
             use_res=False),
        dict(b=1, h=16, w=16, cin=16, hidden=16, cout=16, stride=1,
             use_res=True, expand=False),     # t1 block with residual
        dict(b=2, h=16, w=24, cin=8, hidden=48, cout=12, stride=2,
             use_res=False),
        dict(b=1, h=8, w=8, cin=24, hidden=144, cout=24, stride=1,
             use_res=True),
    ],
)
def test_fused_inverted_residual_exact(spec):
    rng = np.random.RandomState(0)
    args = _case(rng, **spec)
    ref = mbconv_reference(*args)
    got = fused_inverted_residual(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_fold_bn_affine_matches_batchnorm_eval():
    """scale/bias fold == flax BatchNorm in eval mode (eps 1e-5)."""
    import flax.linen as nn

    rng = np.random.RandomState(1)
    c = 12
    x = jnp.asarray(rng.randn(2, 4, 4, c), jnp.float32)
    params = {"scale": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
              "bias": jnp.asarray(rng.randn(c), jnp.float32)}
    stats = {"mean": jnp.asarray(rng.randn(c), jnp.float32),
             "var": jnp.asarray(rng.rand(c) + 0.1, jnp.float32)}
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9)
    want = bn.apply({"params": params, "batch_stats": stats}, x)
    scale, bias = fold_bn_affine(params, stats)
    got = x * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
