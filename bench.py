#!/usr/bin/env python
"""Benchmark: the reference soc_example workload on real TPU hardware.

Runs the BASELINE config-1 workload (64^3 uniform cloud, 44 frequencies,
isotropic background, ~1e6 packets per frequency = 43.3M packets total,
equilibrium T solve + emission + 64x64 orthographic map) and reports photon
packets/sec through the transport phase.

vs_baseline: the reference reports ~2.5 s per frequency iteration for a
~1e6-packet frequency step on a discrete GPU (ASOC.py:1176-1177 notes 0.43 s
of 2.5 s is host staging) => ~4.7e5 packets/s. We report the ratio to that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE_PACKETS_PER_SEC = 4.7e5


def prepare_workdir(workdir):
    os.makedirs(workdir, exist_ok=True)
    with zipfile.ZipFile("/root/reference/soc_example.zip") as z:
        for name in ("my.ini", "tmp.dust", "tmp.dsc", "bg_intensity.bin",
                     "freq.dat"):
            z.extract(name, workdir)
    # generate the cloud exactly like the example's make_cloud.py
    n = 64
    with open(os.path.join(workdir, "tmp.cloud"), "wb") as fp:
        np.asarray([n, n, n, 1, n**3], np.int32).tofile(fp)
        np.asarray([n**3], np.int32).tofile(fp)
        np.ones(n**3, np.float32).tofile(fp)
    return os.path.join(workdir, "my.ini")


def main():
    from soc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from soc_tpu.pipeline import driver

    workdir = os.environ.get("SOC_BENCH_DIR", "/tmp/soc_bench")
    ini = prepare_workdir(workdir)
    # 16k lanes is the measured sweet spot on v5e: larger pools pay more per
    # iteration (gather/scatter cost grows faster than occupancy gains)
    lanes = int(os.environ.get("SOC_BENCH_LANES", 1 << 14))

    t0 = time.time()
    res = driver.run(ini, lanes=lanes)
    wall = time.time() - t0

    # packet budget actually simulated (reference normalization)
    area = 2 * 3 * 64 * 64
    batch = max(1, int(round(999999 / (8.0 * area))))
    per_freq = 8 * area * batch
    nfreq = len(res.freq)
    total_packets = per_freq * nfreq

    transport_time = res.timings["constant_sources"]
    pps = total_packets / transport_time

    # sanity: energy conservation must hold or the number is meaningless
    closure = abs((res.injected - res.escaped).sum()
                  / max(res.injected.sum(), 1e-30))
    ok = np.isfinite(res.temperature).all() and 0 < closure < 1

    result = {
        "metric": "bg_transport_packets_per_sec",
        "value": round(pps, 1),
        "unit": "packets/s/chip",
        "vs_baseline": round(pps / REFERENCE_PACKETS_PER_SEC, 3),
        "detail": {
            "total_packets": total_packets,
            "transport_s": round(transport_time, 2),
            "solve_s": round(res.timings.get("solve", 0), 2),
            "maps_s": round(res.timings.get("maps", 0), 2),
            "wall_s": round(wall, 2),
            "sane": bool(ok),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
