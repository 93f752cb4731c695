"""--train.class_weights=auto: startup resolution against the train split.

The measured +8.2-pt imbalance remedy (docs/DESIGN.md §38) as one word:
the Trainer scans its own TRAIN split, combines per-source frequencies
with the sampler's mix probabilities, and resolves median-frequency (or
inverse) weights (tpuseg/data/class_stats.py). The reference has no
counterpart (it trains unweighted CE, main.py:99)."""

import numpy as np
import pytest

from tpuseg.data.class_stats import (
    compute_stats,
    resolve_auto_class_weights,
    stream_class_frequencies,
    suggest_weights,
)
from tpuseg.data.combined import CombinedDataset
from tpuseg.data.sources import SyntheticSource


def _imbalanced(n=48):
    return SyntheticSource(
        n, width=64, height=32, seed=3, car_prob=0.12, car_scale=0.45
    )


def test_auto_matches_offline_tool_suggestion():
    """val_split=0 and a small source => the trainer-path scan sees exactly
    the images tools/class_stats.py scans; weights must agree."""
    src = _imbalanced()
    counts, _, read = compute_stats(src, 10)
    assert read == len(src)
    offline = suggest_weights(counts, "median")

    combined = CombinedDataset([src], val_split=0.0, seed=0)
    auto = np.asarray(
        resolve_auto_class_weights(combined, 10, "auto", samples_per_source=64)
    )
    # Same pixels, but the stream estimate normalizes per-source frequency
    # before the (here trivial) mix combination — ratios are identical.
    present = counts > 0
    assert auto.shape == (10,)
    np.testing.assert_allclose(auto[present], offline[present], rtol=1e-9)
    assert (auto[~present] == 0).all()


def test_mix_weights_shape_the_estimate():
    """A zero-weight source must not contribute; a 50/50 mix must land
    between the two sources' own frequencies."""
    bal = SyntheticSource(32, width=64, height=32, seed=1)
    imb = _imbalanced(32)

    only_bal = stream_class_frequencies(
        CombinedDataset([bal, imb], weights=[1.0, 0.0], val_split=0.0),
        10, samples_per_source=32,
    )
    bal_alone = stream_class_frequencies(
        CombinedDataset([bal], val_split=0.0), 10, samples_per_source=32
    )
    np.testing.assert_allclose(only_bal, bal_alone, rtol=1e-12)

    imb_alone = stream_class_frequencies(
        CombinedDataset([imb], val_split=0.0), 10, samples_per_source=32
    )
    half = stream_class_frequencies(
        CombinedDataset([bal, imb], weights=[1.0, 1.0], val_split=0.0),
        10, samples_per_source=32,
    )
    np.testing.assert_allclose(
        half, 0.5 * bal_alone + 0.5 * imb_alone, rtol=1e-12
    )
    # the rehearsal knobs actually make car (class 2) rarer
    assert imb_alone[2] < 0.25 * bal_alone[2]


def test_inverse_scheme_and_bad_scheme():
    counts = np.array([100, 10, 0, 1])
    w = suggest_weights(counts, "inverse")
    present = counts > 0
    assert w[2] == 0.0
    np.testing.assert_allclose(w[present].mean(), 1.0)
    assert w[3] > w[1] > w[0]
    with pytest.raises(ValueError, match="scheme"):
        suggest_weights(counts, "geometric")
    with pytest.raises(ValueError, match="auto"):
        resolve_auto_class_weights(
            CombinedDataset([_imbalanced(4)], val_split=0.0), 10, "matic"
        )


def test_trainer_resolves_auto(caplog):
    """Trainer(--train.class_weights=auto) builds a weighted loss whose
    value differs from the unweighted CE on the same batch."""
    import logging

    import jax.numpy as jnp

    from tpuseg.configs import load_config
    from tpuseg.train.loss import cross_entropy_loss
    from tpuseg.train.trainer import Trainer

    argv = [
        "--model.name=unet",
        "--model.base_filters=4",
        "--data.width=32",
        "--data.height=16",
        "--train.batch_size=8",
        "--train.log_every=0",
        '--data.sources=[{"kind":"synthetic","num_samples":8,"weight":1.0,'
        '"car_prob":0.12,"car_scale":0.45}]',
    ]
    with caplog.at_level(logging.INFO, logger="tpuseg.train.trainer"):
        tr = Trainer(load_config(argv + ["--train.class_weights=auto"]))
    assert any("resolved --train.class_weights=auto" in r.message
               for r in caplog.records)
    loss_fn = tr._build_loss()
    assert loss_fn is not None

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 8, 8, 10).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 3, (2, 8, 8)))
    weighted = float(loss_fn(logits, targets))
    plain = float(cross_entropy_loss(logits, targets))
    assert weighted != pytest.approx(plain, rel=1e-3)

    # auto with a loss that cannot honor weights still refuses
    with pytest.raises(ValueError, match="class_weights"):
        Trainer(load_config(
            argv + ["--train.class_weights=auto", "--train.loss=lovasz"]
        ))


def test_config_parses_auto_string():
    from tpuseg.configs import load_config

    cfg = load_config(["--train.class_weights=auto:inverse"])
    assert cfg.train.class_weights == "auto:inverse"
