"""PRNG threading helpers.

JAX randomness is explicit; this tiny sequence object replaces global seeding
(the reference seeds Python's ``random`` once at CombinedDataset.py:24 and
lets albumentations consume an implicit global RNG). Every consumer —
init, dropout-free here, per-sample augmentation, data shuffling — gets its
own split so runs are reproducible regardless of execution order.
"""

from __future__ import annotations

import jax


class PRNGSequence:
    """An iterator of fresh PRNG keys split from one root seed."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def __next__(self) -> jax.Array:
        return self.next()

    def __iter__(self):
        return self

    def take(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
