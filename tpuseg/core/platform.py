"""Platform selection helper for the CLI entry points.

The runtime image pins ``JAX_PLATFORMS=axon`` via sitecustomize (appending
to whatever the user sets), so the environment variable alone cannot force
CPU execution. ``apply_platform_flag`` pops ``--platform=cpu|tpu|axon`` from
argv and applies it through ``jax.config`` before the backend initializes —
the reliable override. This mirrors the reference's graceful device
degradation (cuda -> mps -> cpu, main.py:13-21) as an explicit choice.
"""

from __future__ import annotations

from typing import List, Sequence


def apply_platform_flag(argv: Sequence[str]) -> List[str]:
    argv = list(argv)
    platform = None
    remaining = []
    for a in argv:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        else:
            remaining.append(a)
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
