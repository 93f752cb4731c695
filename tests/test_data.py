"""Data layer: LUT remaps, polygon rasterization, splits, weighted mixing."""

import json
import os

import numpy as np
import pytest

from tpuseg.configs import DatasetSourceConfig
from tpuseg.data.class_maps import (
    BDD100K_CLASS_MAP,
    BDD100K_LUT,
    CARLA_CLASS_MAP,
    CARLA_LUT,
    build_lut,
)
from tpuseg.data.combined import CombinedDataset, WeightedMixSampler
from tpuseg.data.sources import (
    BDD100KSource,
    SEAMESource,
    SyntheticSource,
    build_source,
)


def _reference_remap(raw, class_map):
    """The reference's per-class boolean-mask loop (src/BDD100KDataset.py:67-69)."""
    out = np.zeros_like(raw)
    for src, dst in class_map.items():
        out[raw == src] = dst
    return out


@pytest.mark.parametrize(
    "lut,cmap", [(BDD100K_LUT, BDD100K_CLASS_MAP), (CARLA_LUT, CARLA_CLASS_MAP)]
)
def test_lut_equals_reference_loop(lut, cmap):
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 40, (50, 80)).astype(np.uint8)
    np.testing.assert_array_equal(lut[raw], _reference_remap(raw, cmap))


def test_build_lut_unmapped_to_background():
    lut = build_lut({3: 7})
    assert lut[3] == 7 and lut[0] == 0 and lut[255] == 0


@pytest.fixture
def fake_bdd(tmp_path):
    """Miniature BDD100K dir tree (SURVEY.md §4.3 integration fixture)."""
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"),
                    rng.randint(0, 255, (60, 100, 3), np.uint8))
        cv2.imwrite(str(mask_dir / f"{i:03d}.png"),
                    rng.randint(0, 20, (60, 100), np.uint8))
    return str(img_dir), str(mask_dir)


def test_bdd100k_source(fake_bdd):
    img_dir, mask_dir = fake_bdd
    src = BDD100KSource(img_dir, mask_dir, width=64, height=32)
    assert len(src) == 4
    image, mask = src.load(0)
    assert image.shape == (32, 64, 3) and image.dtype == np.uint8
    assert mask.shape == (32, 64) and mask.dtype == np.uint8
    assert mask.max() <= 9  # remapped into the 10-class scheme


def test_seame_source(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path
    (img_dir / "frames").mkdir()
    rng = np.random.RandomState(0)
    ann_file = tmp_path / "ann.jsonl"
    lines = []
    # multi-class format
    cv2.imwrite(str(img_dir / "frames" / "a.jpg"),
                rng.randint(0, 255, (40, 80, 3), np.uint8))
    lines.append({
        "raw_file": "frames/a.jpg", "image_height": 40, "image_width": 80,
        "annotations": [
            {"type": "drivable_area",
             "polygons": [[[5, 35], [70, 35], [40, 10]]]},
            {"type": "car", "polygons": [[[0, 0], [10, 0], [10, 10], [0, 10]]]},
            {"type": "unknown_thing", "polygons": [[[0, 0], [5, 0], [5, 5]]]},
        ],
    })
    # legacy road-only format
    cv2.imwrite(str(img_dir / "frames" / "b.jpg"),
                rng.randint(0, 255, (40, 80, 3), np.uint8))
    lines.append({
        "raw_file": "frames/b.jpg", "image_height": 40, "image_width": 80,
        "polygons": [[[0, 39], [79, 39], [40, 20]]],
    })
    # missing image -> filtered out
    lines.append({"raw_file": "frames/missing.jpg",
                  "image_height": 40, "image_width": 80, "polygons": []})
    ann_file.write_text("\n".join(json.dumps(l) for l in lines))

    src = SEAMESource(str(img_dir), str(ann_file), width=80, height=40)
    assert len(src) == 2  # missing image filtered (src/SEAMEDataset.py:49-51)
    _, mask_a = src.load(0)
    assert set(np.unique(mask_a)) <= {0, 1, 2}
    assert (mask_a == 1).any() and (mask_a == 2).any()
    _, mask_b = src.load(1)
    assert (mask_b == 1).any() and not (mask_b == 2).any()


def test_combined_split_deterministic():
    srcs = [SyntheticSource(20, 32, 32, seed=s) for s in range(3)]
    a = CombinedDataset(srcs, val_split=0.25, seed=7)
    b = CombinedDataset(srcs, val_split=0.25, seed=7)
    for ia, ib in zip(a.train_indices, b.train_indices):
        np.testing.assert_array_equal(ia, ib)
    assert a.val_size == 3 * 5 and a.train_size == 3 * 15
    # no leakage
    for tr, va in zip(a.train_indices, a.val_indices):
        assert not set(tr.tolist()) & set(va.tolist())


def test_weighted_mix_targets_50_20_30():
    """The CORRECT realization of main.py:67-78's intended mix (the reference
    buggily gives CARLA the SEAME weight — SURVEY.md §2.2 do-not-replicate)."""
    srcs = [SyntheticSource(n, 8, 8) for n in (100, 40, 60)]
    combined = CombinedDataset(srcs, weights=[0.5, 0.2, 0.3])
    sampler = WeightedMixSampler(combined, seed=0)
    picks = sampler.sample(20000)
    counts = np.bincount([s for s, _ in picks], minlength=3) / 20000
    np.testing.assert_allclose(counts, [0.5, 0.2, 0.3], atol=0.02)


def test_sampler_state_roundtrip():
    combined = CombinedDataset([SyntheticSource(10, 8, 8)])
    s1 = WeightedMixSampler(combined, seed=3)
    s1.sample(17)
    state = s1.state()
    seq_a = s1.sample(50)
    s2 = WeightedMixSampler(combined, seed=999)
    s2.restore(state)
    assert s2.sample(50) == seq_a


def test_empty_source_gets_zero_probability():
    combined = CombinedDataset(
        [SyntheticSource(0, 8, 8), SyntheticSource(10, 8, 8)],
        weights=[0.5, 0.5],
    )
    sampler = WeightedMixSampler(combined, seed=0)
    assert all(s == 1 for s, _ in sampler.sample(100))


def test_build_source_dispatch():
    src = build_source(
        DatasetSourceConfig(kind="synthetic", num_samples=5), 16, 16
    )
    assert isinstance(src, SyntheticSource) and len(src) == 5
    with pytest.raises(KeyError):
        build_source(DatasetSourceConfig(kind="imagenet"), 16, 16)


def test_synthetic_imbalance_knobs():
    # Defaults must be BIT-identical to the original generator (the knobs
    # only consume extra RNG draws when non-default).
    a = SyntheticSource(8, 64, 32, seed=7)
    b = SyntheticSource(8, 64, 32, seed=7, car_prob=1.0, car_scale=1.0)
    for i in range(8):
        ia, ma = a.load(i)
        ib, mb = b.load(i)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)

    # The imbalanced variant makes the car class (id 2) much rarer while
    # keeping the scene structure (road/sidewalk present everywhere), and
    # build_source routes the knobs through DatasetSourceConfig.
    rare = build_source(
        DatasetSourceConfig(kind="synthetic", num_samples=64,
                            car_prob=0.12, car_scale=0.45), 64, 32
    )
    bal_car = sum((a.load(i % 8)[1] == 2).sum() for i in range(64))
    rare_car = sum((rare.load(i)[1] == 2).sum() for i in range(64))
    assert rare_car < bal_car / 10
    assert all((rare.load(i)[1] == 1).any() for i in range(4))  # road intact
    # deterministic across instances
    rare2 = SyntheticSource(64, 64, 32, car_prob=0.12, car_scale=0.45)
    np.testing.assert_array_equal(rare.load(3)[1], rare2.load(3)[1])


def test_pipeline_skips_unreadable_images(fake_bdd, tmp_path):
    """SURVEY.md §5.3: a corrupt image is skipped-with-redraw, not a crash."""
    import jax

    from tpuseg.data.pipeline import InputPipeline

    img_dir, mask_dir = fake_bdd
    # corrupt one image file in place
    files = sorted(os.listdir(img_dir))
    with open(os.path.join(img_dir, files[0]), "wb") as f:
        f.write(b"not an image")
    src = BDD100KSource(img_dir, mask_dir, width=32, height=16)
    combined = CombinedDataset([src])
    pipe = InputPipeline(combined, batch_size=4, height=16, width=32, seed=0)
    batches = list(pipe.train_batches(3))
    assert len(batches) == 3
    for images, masks in batches:
        assert images.shape == (4, 16, 32, 3)
        assert bool(jax.numpy.isfinite(images.astype("float32")).all())


def test_eval_miou_tool_on_bdd_fixture(fake_bdd):
    """The north-star mIoU gate, rehearsed (VERDICT r1 missing item 2): a
    BDD100K-layout dir + checkpoint path -> one JSON line with mIoU, via the
    production eval path. When real BDD100K data lands, the measurement is
    exactly this command with the real paths."""
    import io
    import json
    import os
    from contextlib import redirect_stdout

    import tools.eval_miou as eval_miou

    img_dir, mask_dir = fake_bdd
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = eval_miou.main([
            "--data_dir", os.path.dirname(img_dir),
            "--model", "unet", "--base_filters", "4",  # random init smoke
            "--width", "64", "--height", "32", "--batch", "4",
        ])
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["n_images"] == 4
    assert 0.0 <= rec["miou"] <= 1.0
    assert 0.0 <= rec["pixel_acc"] <= 1.0
    assert len(rec["iou_per_class"]) == 10
    # a missing dir fails loudly, not silently
    assert eval_miou.main(["--data_dir", "/nonexistent"]) == 1


def test_eval_miou_limit_subsample():
    """--limit N: the first-contact smoke mode (README 'when BDD100K lands'
    checklist) evaluates an evenly-strided deterministic subset."""
    import io
    import json
    from contextlib import redirect_stdout

    import tools.eval_miou as eval_miou

    def run(extra):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = eval_miou.main([
                "--kind", "synthetic", "--samples", "32",
                "--model", "unet", "--base_filters", "4",
                "--width", "64", "--height", "32", "--batch", "4",
            ] + extra)
        assert rc == 0
        [line] = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
        return json.loads(line)

    limited = run(["--limit", "8"])
    assert limited["n_images"] == 8
    # deterministic: same subset, same score, run to run
    assert run(["--limit", "8"]) == limited
    # a limit >= the dataset is a no-op
    assert run(["--limit", "999"])["n_images"] == 32


def test_sample_cache_exact_and_bounded():
    """Cache hits are byte-identical; eviction keeps usage under budget."""
    from tpuseg.data.pipeline import SampleCache

    rng = np.random.RandomState(0)
    samples = {
        i: (rng.randint(0, 255, (4, 4, 3)).astype(np.uint8),
            rng.randint(0, 9, (4, 4)).astype(np.uint8))
        for i in range(8)
    }
    loads = []

    def loader(i):
        loads.append(i)
        return samples[i]

    per = samples[0][0].nbytes + samples[0][1].nbytes
    cache = SampleCache(budget_bytes=3 * per)
    for i in [0, 1, 2, 0, 1, 2]:
        img, msk = cache.get(i, lambda i=i: loader(i))
        np.testing.assert_array_equal(img, samples[i][0])
        np.testing.assert_array_equal(msk, samples[i][1])
    assert loads == [0, 1, 2]  # second round all hit
    # 4th item evicts the LRU entry; usage stays within budget
    cache.get(3, lambda: loader(3))
    assert cache.used <= cache.budget
    cache.get(0, lambda: loader(0))  # 0 was evicted (LRU) -> reload
    assert loads == [0, 1, 2, 3, 0]
    # None (unreadable) is returned but never cached
    assert cache.get(99, lambda: None) is None
    assert 99 not in cache._d


def test_sample_cache_respects_reservation():
    """Reserved (non-evictable) bytes shrink the insertable headroom: the
    cache must never sit over budget thrashing against bytes eviction
    cannot reclaim (ADVICE r1 item 5)."""
    from tpuseg.data.pipeline import SampleCache

    rng = np.random.RandomState(1)
    mk = lambda: (rng.randint(0, 255, (4, 4, 3)).astype(np.uint8),
                  rng.randint(0, 9, (4, 4)).astype(np.uint8))
    s = mk()
    per = s[0].nbytes + s[1].nbytes
    cache = SampleCache(budget_bytes=3 * per)
    cache.reserved = 2 * per  # e.g. a cached eval pass took 2/3 of budget
    for i in range(4):
        cache.get(i, mk)
    # only one evictable entry fits the remaining headroom
    assert len(cache._d) == 1
    assert cache.used + cache.reserved <= cache.budget
    # reservation larger than the budget: nothing is ever inserted
    cache.reserved = 4 * per
    cache.get(99, mk)
    assert 99 not in cache._d


def test_pipeline_cache_identical_batches():
    """cache_bytes on vs off: identical train batch streams (same seed),
    and the eval pass is byte-identical + served from RAM on pass 2."""
    from tpuseg.data.pipeline import InputPipeline

    def make(cache_bytes):
        combined = CombinedDataset(
            [SyntheticSource(12, 32, 16)], val_split=0.25, seed=3
        )
        return InputPipeline(
            combined, batch_size=4, height=16, width=32, seed=0,
            cache_bytes=cache_bytes,
        )

    plain, cached = make(0), make(1 << 20)
    for (xa, ya), (xb, yb) in zip(
        plain.train_batches(4), cached.train_batches(4)
    ):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    ev1 = [(np.asarray(x), np.asarray(y), n)
           for x, y, n in cached.eval_batches()]
    assert isinstance(cached._eval_cache, list) and cached._eval_cache
    # the eval cache debits the SAME budget as the sample cache (the
    # configured cache_bytes is a single total, not two) — as RESERVED
    # (non-evictable) bytes the sample cache's insert path must respect
    eval_bytes = sum(x.nbytes + y.nbytes for x, y, _ in cached._eval_cache)
    assert cached._cache.reserved >= eval_bytes
    assert (cached._cache.used + cached._cache.reserved
            <= cached._cache.budget)
    ev2 = [(np.asarray(x), np.asarray(y), n)
           for x, y, n in cached.eval_batches()]
    for (x1, y1, n1), (x2, y2, n2) in zip(ev1, ev2):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
        assert n1 == n2
    # a too-small budget must not freeze a partial cache
    tiny = make(8)
    _ = list(tiny.eval_batches())
    assert tiny._eval_cache is None


def test_packed_dataset_roundtrip(tmp_path):
    """tools/pack_dataset.py -> PackedSource: byte-identical samples, and
    a size mismatch fails fast with a re-pack hint."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "packed"
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "pack_dataset.py"),
         "--kind", "synthetic", "--num_samples", "12",
         "--out", str(out), "--width", "32", "--height", "16"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr

    from tpuseg.data.sources import PackedSource, SyntheticSource

    packed = PackedSource(str(out), 32, 16)
    ref = SyntheticSource(12, 32, 16)
    assert len(packed) == 12
    for i in (0, 5, 11):
        pi, pm = packed.load(i)
        ri, rm = ref.load(i)
        np.testing.assert_array_equal(pi, ri)
        np.testing.assert_array_equal(pm, rm)

    with pytest.raises(ValueError, match="re-pack"):
        PackedSource(str(out), 64, 32)

    # end-to-end: the pipeline trains from a packed source
    cfg = DatasetSourceConfig(kind="packed", packed_dir=str(out), weight=1.0)
    src = build_source(cfg, 32, 16)
    from tpuseg.data.pipeline import InputPipeline

    pipe = InputPipeline(
        CombinedDataset([src]), batch_size=4, height=16, width=32, seed=0
    )
    batches = list(pipe.train_batches(2))
    assert len(batches) == 2 and batches[0][0].shape == (4, 16, 32, 3)


def test_packed_fast_path_equals_slow_path(tmp_path):
    """The batched gather fast path produces the identical batch stream as
    the per-sample path (forced via cache_bytes, which disables it)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "packed"
    subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "pack_dataset.py"),
         "--kind", "synthetic", "--num_samples", "16",
         "--out", str(out), "--width", "32", "--height", "16"],
        capture_output=True, text=True, timeout=300, check=True,
    )
    from tpuseg.data.pipeline import InputPipeline

    def make(cache_bytes):
        src = build_source(
            DatasetSourceConfig(kind="packed", packed_dir=str(out)), 32, 16
        )
        return InputPipeline(
            CombinedDataset([src]), batch_size=4, height=16, width=32,
            seed=0, cache_bytes=cache_bytes,
        )

    fast, slow = make(0), make(1 << 20)
    for (xa, ya), (xb, yb) in zip(
        fast.train_batches(4), slow.train_batches(4)
    ):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_dir_source_pairs_by_stem_on_mismatch(fake_bdd):
    """A missing mask in the middle of the sort order must not mispair
    every later sample (review round 2: truncate-to-min paired image N
    with mask N+1 for the whole tail)."""
    import os

    img_dir, mask_dir = fake_bdd
    os.remove(os.path.join(mask_dir, "001.png"))  # hole in the MIDDLE
    src = BDD100KSource(img_dir, mask_dir, width=64, height=32)
    assert len(src) == 3
    stems = [os.path.splitext(os.path.basename(p))[0] for p in src.images]
    mask_stems = [os.path.splitext(os.path.basename(p))[0] for p in src.masks]
    assert stems == mask_stems == ["000", "002", "003"]


def test_dir_source_no_stem_overlap_raises(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.jpg"), rng.randint(0, 255, (8, 8, 3), np.uint8))
    cv2.imwrite(str(mask_dir / "b.png"), rng.randint(0, 5, (8, 8), np.uint8))
    cv2.imwrite(str(mask_dir / "c.png"), rng.randint(0, 5, (8, 8), np.uint8))
    with pytest.raises(FileNotFoundError, match="no filename stems match"):
        BDD100KSource(str(img_dir), str(mask_dir), width=8, height=8)
