"""Host-feature-safe persistent compile cache (tpuseg.core.platform).

Cached XLA:CPU entries are AOT machine code for the host that compiled
them; jax's cache key does not include host CPU features, so a cache warmed
on one machine can SIGILL a process on another (both r02 driver tails
carried XLA's explicit warning). VERDICT r2 item 1: probe before trusting,
isolate to a per-host subdir on mismatch, and let bench.py's parent widen
its watchdog when a cold compile is coming.
"""

import json
import os

import pytest

from tpuseg.core import platform as plat


def _stamp(cache_dir):
    with open(os.path.join(cache_dir, "host_features.json")) as f:
        return json.load(f)


def test_empty_cache_stamps_writer_without_probing(tmp_path, monkeypatch):
    """A brand-new cache has nothing foreign to load — this host becomes
    the writer with zero subprocess cost (tests create fresh caches)."""
    def no_probe(*a, **k):
        raise AssertionError("probe must not run for an empty cache")

    monkeypatch.setattr(plat, "_run_probe", no_probe)
    d = str(tmp_path / "cache")
    assert plat._safe_cache_dir(d) == d
    st = _stamp(d)
    assert plat.host_fingerprint() in st["compatible"]
    assert plat.cache_status(d) == "compatible"
    # second call: pure fast path (stamp read), still no probe
    assert plat._safe_cache_dir(d) == d


def test_unknown_host_probe_pass_uses_shared_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "cache")
    os.makedirs(d)
    open(os.path.join(d, "jit_foo-cache"), "w").close()  # foreign entry
    calls = []
    monkeypatch.setattr(
        plat, "_run_probe", lambda cd, **k: calls.append(cd) or 0
    )
    assert plat.cache_status(d) == "unknown"
    assert plat._safe_cache_dir(d) == d
    assert calls == [d]
    assert plat.cache_status(d) == "compatible"
    # verdict is stamped: no re-probe on the next process
    assert plat._safe_cache_dir(d) == d
    assert calls == [d]


def test_unknown_host_probe_fail_isolates_per_host(tmp_path, monkeypatch):
    d = str(tmp_path / "cache")
    os.makedirs(d)
    open(os.path.join(d, "jit_foo-cache"), "w").close()
    calls = []
    monkeypatch.setattr(
        plat, "_run_probe", lambda cd, **k: calls.append(cd) or -4  # SIGILL
    )
    sub = plat._safe_cache_dir(d)
    assert sub == os.path.join(d, "hostf-" + plat.host_fingerprint())
    assert plat.cache_status(d) == "incompatible"
    st = _stamp(d)
    assert st["probed"][plat.host_fingerprint()] == -4
    # stamped incompatible: straight to the subdir, no re-probe
    assert plat._safe_cache_dir(d) == sub
    assert calls == [d]


def test_probe_env_opt_out(tmp_path, monkeypatch):
    d = str(tmp_path / "cache")
    os.makedirs(d)
    open(os.path.join(d, "jit_foo-cache"), "w").close()

    def no_probe(*a, **k):
        raise AssertionError("TPUSEG_CACHE_PROBE=0 must skip probing")

    monkeypatch.setattr(plat, "_run_probe", no_probe)
    monkeypatch.setenv("TPUSEG_CACHE_PROBE", "0")
    assert plat._safe_cache_dir(d) == d


def test_cache_status_is_jaxfree_file_read(tmp_path):
    """bench.py's PARENT calls cache_status before deciding its watchdog —
    it must work from the stamp file alone."""
    assert plat.cache_status(str(tmp_path / "nope")) == "unknown"
    assert plat.cache_status("") == "unknown"


def test_real_probe_seeds_then_loads_cached_entry(tmp_path):
    """End-to-end with the REAL subprocess: the first probe compiles and
    seeds the feature-diverse entry; a later 'unknown' host (stamp reset)
    probes again and this time LOADS the cached AOT blob and executes it —
    the actual cross-host safety test the driver hosts will run."""
    d = str(tmp_path / "cache")
    os.makedirs(d)
    open(os.path.join(d, "jit_foo-cache"), "w").close()  # force non-empty
    before = set(os.listdir(d))
    assert plat._run_probe(d) == 0  # compiles + seeds
    seeded = set(os.listdir(d)) - before
    assert seeded, "probe did not write a cache entry"
    assert plat._run_probe(d) == 0  # loads the seeded AOT entry
    assert set(os.listdir(d)) == before | seeded  # hit, not a re-compile


def test_host_fingerprint_stable_and_flags_nonempty():
    assert plat.host_fingerprint() == plat.host_fingerprint()
    assert len(plat.host_fingerprint()) == 12
    assert plat.host_cpu_flags(), "expected /proc/cpuinfo flags on linux"
