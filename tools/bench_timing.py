"""THE shared measurement method for pre-registration price/scale
rows (one definition so the methodology cannot drift between rounds
— r13 review: three tools carried verbatim copies): min-of-2 after a
discarded warmup, loadavg-bracketed. Cross-round price comparisons
in BASELINE.md assume every row was taken this way."""
from __future__ import annotations

import os
import time


def timed(fn, n=3):
    """n runs of fn(); report min of the post-warmup samples (the
    first run is JVM/code-gen warmup and is recorded but excluded
    from the min) plus the loadavg bracket around each run."""
    samples, loads = [], []
    for _ in range(n):
        l0 = os.getloadavg()[0]
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        loads.append((round(l0, 1), round(os.getloadavg()[0], 1)))
        samples.append(round(dt, 2))
    return {"min": min(samples[1:]), "samples": samples, "loadavg": loads}
