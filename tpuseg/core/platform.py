"""Platform selection helper for the CLI entry points.

The runtime image pins ``JAX_PLATFORMS=axon`` via sitecustomize (appending
to whatever the user sets), so the environment variable alone cannot force
CPU execution. ``apply_platform_flag`` pops ``--platform=cpu|tpu|axon`` from
argv and applies it through ``jax.config`` before the backend initializes —
the reliable override. This mirrors the reference's graceful device
degradation (cuda -> mps -> cpu, main.py:13-21) as an explicit choice.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
from typing import List, Optional, Sequence


def _default_cache_dir() -> str:
    return os.environ.get(
        "TPUSEG_BENCH_CACHE",
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".xla_cache",
        ),
    )


def host_cpu_flags() -> List[str]:
    """Sorted CPU feature flags of THIS host (/proc/cpuinfo)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return sorted(set(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return []


def host_fingerprint() -> str:
    return hashlib.sha1(
        " ".join(host_cpu_flags()).encode()
    ).hexdigest()[:12]


_STAMP = "host_features.json"

# Feature-diverse probe program: matmul, gather, scatter, sort, cumsum,
# bf16 round-trip, conv — the op classes whose XLA:CPU AOT codegen the
# r02 driver tails warned about (+prefer-no-gather/+prefer-no-scatter
# absent on the execution host, "could lead to ... SIGILL"). Deterministic
# source => stable cache key: the first compatible host SEEDS the entry,
# every later host LOADS that foreign AOT blob and executes it — a real
# cross-host test, isolated in a killable CPU child.
_PROBE_SRC = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["TPUSEG_PROBE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

def f(x, idx):
    y = jnp.dot(x, x.T)
    g = jnp.take(y, idx, axis=0)
    s = y.at[idx].add(1.0)
    z = jnp.sort(g, axis=-1)
    w = jnp.cumsum(z, axis=0).astype(jnp.bfloat16).astype(jnp.float32)
    c = jax.lax.conv_general_dilated(
        x[None, :, :, None], jnp.ones((3, 3, 1, 1), jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return w.sum() + s.sum() + c.sum()

out = float(jax.jit(f)(
    jnp.linspace(0.0, 1.0, 64 * 64, dtype=jnp.float32).reshape(64, 64),
    jnp.arange(4),
))
assert out == out, "non-finite probe output"
print("TPUSEG_PROBE_OK", out)
"""


def _load_stamp(cache_dir: str) -> Optional[dict]:
    try:
        with open(os.path.join(cache_dir, _STAMP)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_stamp(cache_dir: str, stamp: dict) -> None:
    tmp = os.path.join(cache_dir, _STAMP + ".tmp.%d" % os.getpid())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(stamp, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(cache_dir, _STAMP))
    except OSError:
        pass  # stamping is advisory; never block the caller


def _run_probe(cache_dir: str, timeout_s: int = 300) -> int:
    """Execute the probe program against ``cache_dir`` in a CPU child.

    Returns the child's return code (0 = the cached AOT artifacts load and
    execute on this host; a SIGILL shows up as -4). The child is CPU-only
    (cannot wedge the TPU) so killing it on timeout is safe.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # canonical key: no virtual devices, no timeouts
    env["TPUSEG_PROBE_CACHE"] = cache_dir
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            env=env, capture_output=True, timeout=timeout_s,
        )
        if proc.returncode == 0 and b"TPUSEG_PROBE_OK" in proc.stdout:
            return 0
        return proc.returncode or 1
    except subprocess.TimeoutExpired:
        return -9
    except OSError:
        return 1


def cache_status(cache_dir: Optional[str] = None) -> str:
    """'compatible' | 'incompatible' | 'unknown' for THIS host — a pure
    file read (no jax import). bench.py's parent widens its watchdog when
    the child is about to probe or cold-compile instead of riding the warm
    cache."""
    if cache_dir is None:
        cache_dir = _default_cache_dir()
    if not cache_dir:
        return "unknown"
    stamp = _load_stamp(cache_dir)
    if stamp is None:
        return "unknown"
    fp = host_fingerprint()
    if fp in stamp.get("compatible", ()):
        return "compatible"
    if fp in stamp.get("incompatible", ()):
        return "incompatible"
    return "unknown"


def _safe_cache_dir(cache_dir: str) -> str:
    """The directory JAX may actually trust on THIS host.

    The jax persistent cache key does NOT include host CPU features, but
    XLA:CPU entries are AOT machine code for the compile host — loading
    them on a host with different features risks SIGILL mid-execution
    (both r02 driver tails carried exactly that warning; a SIGILL inside a
    TPU-attached process is this repo's worst hazard, CLAUDE.md). Policy:

    - host fingerprint recorded compatible -> use the shared cache (fast
      path: one stamp read).
    - recorded incompatible -> per-host subdir ``hostf-<fp>`` (cold
      compiles, but can never execute a foreign AOT blob).
    - unknown host, non-empty cache -> run the probe child once: it loads
      + executes the seeded feature-diverse entry (real foreign-AOT test,
      SIGILL isolated in a killable CPU child) and the verdict is stamped.
    - unknown host, empty cache -> this host is the writer: stamp it
      compatible; the probe entry is seeded on first use.

    ``TPUSEG_CACHE_PROBE=0`` skips probing (trust the shared dir as-is).
    """
    fp = host_fingerprint()
    stamp = _load_stamp(cache_dir) or {
        "compatible": [], "incompatible": [], "flags": {}, "probed": {}}
    if fp in stamp.get("compatible", ()):
        return cache_dir
    sub = os.path.join(cache_dir, "hostf-" + fp)
    if fp in stamp.get("incompatible", ()):
        return sub
    if os.environ.get("TPUSEG_CACHE_PROBE", "1") == "0":
        return cache_dir
    entries = []
    if os.path.isdir(cache_dir):
        entries = [e for e in os.listdir(cache_dir)
                   if not e.startswith((_STAMP, "hostf-"))]
    if not entries:
        # brand-new cache: this host is the writer — nothing foreign to load
        stamp.setdefault("compatible", []).append(fp)
        stamp.setdefault("flags", {})[fp] = host_cpu_flags()
        _write_stamp(cache_dir, stamp)
        return cache_dir
    rc = _run_probe(cache_dir)
    stamp.setdefault("flags", {})[fp] = host_cpu_flags()
    stamp.setdefault("probed", {})[fp] = rc
    if rc == 0:
        stamp.setdefault("compatible", []).append(fp)
        _write_stamp(cache_dir, stamp)
        print(
            f"compile cache: host {fp} PROBED COMPATIBLE with cached AOT "
            "artifacts (foreign-blob load + execute OK); using shared cache",
            file=sys.stderr,
        )
        return cache_dir
    stamp.setdefault("incompatible", []).append(fp)
    _write_stamp(cache_dir, stamp)
    print(
        f"compile cache: host {fp} INCOMPATIBLE with cached AOT artifacts "
        f"(probe rc {rc}); isolating to per-host subdir (cold compiles "
        "instead of risking SIGILL mid-TPU-execution)",
        file=sys.stderr,
    )
    return sub


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX at the repo's persistent XLA compilation cache — safely.

    Every fresh process otherwise pays the full model compile (tens of
    seconds on CPU, minutes through the remote-TPU tunnel — the round-1
    driver bench timed out twice on exactly that). The cache lives on disk
    (untracked, ~180 MB) and persists across processes in the working tree.
    Precedence: explicit arg > ``TPUSEG_BENCH_CACHE`` env > ``<repo>/.xla_cache``.
    An empty-string env value disables caching (returns "").

    Cached XLA:CPU entries are AOT machine code for the host that compiled
    them; before trusting them on a new host the cache is probed (see
    :func:`_safe_cache_dir`) and, on mismatch, isolated to a per-host
    subdirectory — VERDICT r2 item 1.
    """
    if cache_dir is None:
        cache_dir = _default_cache_dir()
    if cache_dir:
        cache_dir = _safe_cache_dir(cache_dir)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def env_platform_override() -> Optional[str]:
    """"cpu" when the JAX_PLATFORMS env names cpu FIRST, else None.

    The axon plugin's register() (sitecustomize) re-pins the default
    backend to the TPU regardless of the env (measured: with
    ``JAX_PLATFORMS=cpu`` the backend still reports 'tpu'), so a user who
    exported cpu-first gets the chip anyway — and a process they casually
    kill can wedge it for hours. Honoring that env value through
    ``jax.config`` (the path that actually wins) makes the intuitive
    spelling safe; ``--platform`` still takes precedence.
    """
    env = os.environ.get("JAX_PLATFORMS", "")
    first = env.split(",")[0].strip().lower()
    return "cpu" if first == "cpu" else None


def apply_platform_flag(argv: Sequence[str]) -> List[str]:
    enable_compile_cache()
    argv = list(argv)
    platform = None
    remaining = []
    for a in argv:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        else:
            remaining.append(a)
    if platform is None:
        platform = env_platform_override()
    if platform:
        import jax

        if platform in ("tpu", "axon"):
            platform = "axon,cpu"  # fall back to CPU if no chip attached
        jax.config.update("jax_platforms", platform)
    else:
        # No explicit choice: keep the env platform as the default backend
        # but ALSO register the host cpu backend — model init runs there as
        # one jitted program instead of minutes of per-op tunnel round
        # trips (tpuseg.core.device_io).
        from tpuseg.core.device_io import ensure_cpu_backend

        ensure_cpu_backend()
    return remaining
