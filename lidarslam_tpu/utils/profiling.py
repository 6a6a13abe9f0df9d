"""xplane trace parsing: device-busy time and per-op tables.

Shared by `scripts/profile_stream.py` (interactive op tables) and
`bench.py` (device-busy fraction in the benchmark record). The parsing
rules were learned the hard way (see profile_stream.py docstring): only
"XLA Modules" events measure wall-to-wall device occupancy; "XLA Ops" is
the leaf-op line, where `while`/`cond` wrappers double-count their bodies
and copy-start spans measure wait time, not bandwidth.

Equivalent role to the reference's per-step timers
(Utilities.h Timer / Slam.cxx "Processing duration" logs), but measured
from the device's own trace rather than host clocks.
"""

from __future__ import annotations

import collections
import glob
import os

_WRAPPERS = ("while", "cond", "copy-start", "copy-done")


def find_xplane(logdir: str):
    """Newest .xplane.pb under a jax.profiler.trace() log dir, or None."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    return max(paths, key=os.path.getmtime) if paths else None


def _device_planes(xplane_path: str):
    import jax

    pd = jax.profiler.ProfileData.from_file(xplane_path)
    for plane in pd.planes:
        if "TPU" in plane.name or "Device" in plane.name:
            yield plane


def device_busy_ms(xplane_path: str) -> float:
    """Total device-occupied time (ms) across the trace: the sum of
    "XLA Modules" event durations (each event = one executable run)."""
    total = 0.0
    for plane in _device_planes(xplane_path):
        for line in plane.lines:
            if line.name == "XLA Modules":
                total += sum(ev.duration_ns / 1e6 for ev in line.events)
    return total


def op_totals(xplane_path: str):
    """Per-op leaf totals: (dur_ms Counter, count Counter, category Counter,
    {op: example event name}). Wrapper events are excluded."""
    dur = collections.Counter()
    cnt = collections.Counter()
    cat = collections.Counter()
    meta = {}
    for plane in _device_planes(xplane_path):
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev.name.split(" = ")[0]
                kind = name.lstrip("%").rstrip("0123456789.").rstrip(".")
                if kind in _WRAPPERS:
                    continue
                d = ev.duration_ns / 1e6
                cat[kind] += d
                dur[name] += d
                cnt[name] += 1
                meta.setdefault(name, ev.name[:110])
    return dur, cnt, cat, meta
