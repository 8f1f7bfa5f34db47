#!/usr/bin/env python3
"""Temporal (time-series) compression
(testfloat_compress_ts.c analog; SZ_compress_ts, sz.c:963).

Variables register once (SZ_registerVar analog); snapshot steps
compress spatially, intermediate steps compress the delta against the
carried per-variable reconstruction history.
"""

import numpy as np

from sz_tpu.config import SZConfig, ErrorBoundMode
from sz_tpu.temporal import TemporalCompressor

rng = np.random.default_rng(3)
nx = 256 * 256
base = np.cumsum(rng.standard_normal(nx)).astype(np.float32)

cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-2)
comp = TemporalCompressor(snapshot_step=5)
comp.register(0, "temperature", (nx,), np.float32, cfg)

steps, truth = [], []
state = base.copy()
for t in range(10):
    state = state + 0.01 * rng.standard_normal(nx).astype(np.float32)
    truth.append(state.copy())
    steps.append(comp.compress_step({0: state}))

total = sum(len(s) for s in steps)
print(f"10 steps, ratio {10 * base.nbytes / total:.2f}")

# the decompressor re-registers the variables (as in the reference)
dec = TemporalCompressor(snapshot_step=5)
dec.register(0, "temperature", (nx,), np.float32, cfg)
for t, s in enumerate(steps):
    out = dec.decompress_step(s)[0]
    err = np.abs(out.astype("f8") - truth[t].astype("f8")).max()
    assert err <= 1e-2 * 1.0001, (t, err)
print("all steps within bound")
