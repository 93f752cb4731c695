"""Multi-source combination: seeded split + weighted mixing.

Behavioral spec: src/CombinedDataset.py (seeded shuffle, per-source
train/val split, global-index routing bdd -> seame -> carla) plus main.py's
WeightedRandomSampler targeting a 50/20/30 BDD/SEAME/CARLA mix
(main.py:67-85).

The reference's weight computation has two bugs SURVEY.md §2.2 flags as
do-NOT-replicate: `total_samples` omits CARLA (main.py:68) and the weight
assignment loop gives CARLA samples the SEAME weight (main.py:73-78). Here
the mix is realized exactly: each draw picks a source with probability
proportional to its configured weight (renormalized over non-empty sources),
then a uniform sample within the source — sampling WITH replacement, the
same semantics as WeightedRandomSampler(replacement=True).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class CombinedDataset:
    """Seeded per-source shuffle + train/val split + index routing."""

    def __init__(
        self,
        sources: Sequence,
        weights: Optional[Sequence[float]] = None,
        val_split: float = 0.0,
        seed: int = 42,
    ):
        if not sources:
            raise ValueError("need at least one source")
        self.sources = list(sources)
        self.weights = list(
            weights if weights is not None else [1.0] * len(sources)
        )
        if len(self.weights) != len(self.sources):
            raise ValueError("weights/sources length mismatch")
        rng = np.random.RandomState(seed)
        self.train_indices: List[np.ndarray] = []
        self.val_indices: List[np.ndarray] = []
        for src in self.sources:
            idx = rng.permutation(len(src))
            n_val = int(len(src) * val_split)
            self.val_indices.append(idx[:n_val])
            self.train_indices.append(idx[n_val:])

    @property
    def train_size(self) -> int:
        return sum(len(i) for i in self.train_indices)

    @property
    def val_size(self) -> int:
        return sum(len(i) for i in self.val_indices)

    def load_train(self, source_id: int, pos: int):
        return self.sources[source_id].load(
            int(self.train_indices[source_id][pos])
        )

    def iter_val(self):
        """Deterministic pass over the validation split of every source."""
        for sid, idx in enumerate(self.val_indices):
            for i in idx:
                sample = self.sources[sid].load(int(i))
                if sample is not None:
                    yield sample

    def summary(self) -> str:
        lines = ["Combined dataset:"]
        for src, tr, va in zip(self.sources, self.train_indices, self.val_indices):
            lines.append(
                f"  {type(src).__name__}: {len(tr)} train, {len(va)} val"
            )
        lines.append(f"  Total: {self.train_size} train, {self.val_size} val")
        return "\n".join(lines)


class WeightedMixSampler:
    """Infinite sampler of (source_id, position) pairs with replacement.

    Equivalent-in-distribution to the reference's WeightedRandomSampler with
    correct per-source weights: P(source s) = w_s / sum(w over non-empty),
    uniform within the source.
    """

    def __init__(self, combined: CombinedDataset, seed: int = 0):
        self.combined = combined
        sizes = np.array(
            [len(i) for i in combined.train_indices], dtype=np.int64
        )
        w = np.array(combined.weights, dtype=np.float64)
        w = np.where(sizes > 0, w, 0.0)
        if w.sum() <= 0:
            # fall back to size-proportional sampling
            w = sizes.astype(np.float64)
        if w.sum() <= 0:
            # empty train split (e.g. val_split=1.0 eval-only): uniform
            # placeholder probs — sample() must never be called, but the
            # constructor should not emit NaNs
            w = np.ones_like(w)
        self.probs = w / w.sum()
        self.sizes = sizes
        self.rng = np.random.RandomState(seed)

    def sample(self, n: int) -> List[Tuple[int, int]]:
        sids = self.rng.choice(len(self.probs), size=n, p=self.probs)
        return [
            (int(s), int(self.rng.randint(self.sizes[s]))) for s in sids
        ]

    def state(self) -> dict:
        """Serializable RNG position (checkpointed for exact resume)."""
        st = self.rng.get_state()
        return {
            "key": st[1].tolist(),
            "pos": int(st[2]),
            "has_gauss": int(st[3]),
            "cached": float(st[4]),
        }

    def restore(self, state: dict) -> None:
        self.rng.set_state(
            (
                "MT19937",
                np.array(state["key"], dtype=np.uint32),
                state["pos"],
                state["has_gauss"],
                state["cached"],
            )
        )
