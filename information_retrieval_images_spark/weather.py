"""Host-weather probes: memcpy-bandwidth measurements that gate benchmarks.

This sandbox VM shows extreme, structured performance pathology (documented
in BENCH/BASELINE.md "standing structural evidence"): identical pure-numpy
memcpy probes swing 0.3 <-> 120 GB/s across back-to-back windows, and
freezes persist for minutes to hours. Any wall-clock benchmark taken during
a freeze is uninterpretable, so every timing harness in this repo (the
scaling campaign, scripts/scaling_bench.py, and the driver bench, bench.py)
brackets its legs with these probes and flags/filters degraded samples.

Probes run in a FRESH SUBPROCESS SESSION (start_new_session), never
in-process: freezes on this host stick to process groups (observed r4: a
long-lived parent's in-process probes read 0.3 GB/s for 6+ minutes while a
fresh shell measured 81 GB/s at the same moment). Spark's python workers are
fresh subprocesses too, so a fresh-session probe samples the same fate a
worker is about to get.
"""

from __future__ import annotations

import subprocess
import sys
import threading

_PROBE_CODE = r"""
import sys, time
import numpy as np
import multiprocessing as mp

def burn(secs):
    a = np.ones(50_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        np.copyto(b, a)
        n += 1
    return n * 0.05 * 2

nproc, secs = int(sys.argv[1]), float(sys.argv[2])
t0 = time.time()
if nproc == 1:
    total = burn(secs)
else:
    with mp.Pool(nproc) as p:
        total = sum(p.map(burn, [secs] * nproc))
print(round(total / max(time.time() - t0 if nproc == 1 else secs, 1e-9), 1))
"""


def _probe_subprocess(nproc: int, secs: float) -> float:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE, str(nproc), str(secs)],
            capture_output=True,
            text=True,
            timeout=secs * 10 + 30,
            start_new_session=True,
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:
        return 0.0  # an unmeasurable window gates itself out


def bw_probe(nproc: int = 8, secs: float = 3.0) -> float:
    """Aggregate memcpy GB/s right now — the host-weather tag for a sample.
    Healthy readings on this box are ~60-120; a deep freeze reads ~0.3."""
    return _probe_subprocess(nproc, secs)


def bw_rate_single(secs: float = 0.4) -> float:
    """One-process memcpy GB/s — the in-run weather burst (healthy ~21-24)."""
    return _probe_subprocess(1, secs)


class InRunProber(threading.Thread):
    """Samples single-proc memcpy bursts every ``period`` s while a leg runs."""

    def __init__(self, period: float = 10.0, burst: float = 0.4):
        super().__init__(daemon=True)
        self.period, self.burst = period, burst
        self.values: list[float] = []
        # NB: not named _stop — threading.Thread uses a private _stop method
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.wait(self.period):
            self.values.append(bw_rate_single(self.burst))

    def stop(self) -> list[float]:
        self._halt.set()
        self.join(timeout=5)
        return self.values
