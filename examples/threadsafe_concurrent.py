#!/usr/bin/env python3
"""Thread-safety demo (test_threadsafe.c analog).

The reference needed a dedicated thread-safe API mode because its
codec state lived in globals; sz_tpu has no globals — SZConfig is a
frozen dataclass and every codec is a pure function — so concurrent
compression from Python threads just works (and overlaps in the
native kernels, which release the GIL via ctypes).
"""

import concurrent.futures as cf

import numpy as np

import sz_tpu

rng = np.random.default_rng(5)
fields = [np.cumsum(rng.standard_normal(64 ** 3))
          .reshape(64, 64, 64).astype(np.float32) for _ in range(8)]
cfg = sz_tpu.SZConfig().with_bound(sz_tpu.ErrorBoundMode.ABS, 1e-3)


def roundtrip(d):
    blob = sz_tpu.compress(d, cfg)
    out = sz_tpu.decompress(blob, d.shape, np.float32)
    return len(blob), float(np.abs(out - d).max())


with cf.ThreadPoolExecutor(max_workers=4) as ex:
    results = list(ex.map(roundtrip, fields))

serial = [roundtrip(d) for d in fields]
assert results == serial, "concurrent != serial"
for i, (size, err) in enumerate(results):
    print(f"field {i}: {size} bytes, max err {err:.2e}")
print("concurrent results identical to serial")
