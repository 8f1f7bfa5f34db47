#!/usr/bin/env python3
"""Random-access compression + region decode
(example/sz_randomaccess.c analog; format: sz_float.c:7492,
region decoder: szd_float.c:7597).

With random_access=True the stream uses the reference's blockwise
random-access bit format: every (padded, edge-replicated) block is
self-contained, so any sub-region decodes without touching the rest of
the stream.  A reference binary built with -DBUILD_RANDOMACCESS=ON
decodes these streams via SZ_decompress_args_randomaccess_float.
"""

import time

import numpy as np

import sz_tpu

rng = np.random.default_rng(2)
ax = np.linspace(0, 4 * np.pi, 192)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
data = (np.sin(x) * np.cos(y) * np.sin(z)
        + 0.05 * rng.standard_normal(x.shape)).astype(np.float32)

cfg = sz_tpu.SZConfig(random_access=True).with_bound(
    sz_tpu.ErrorBoundMode.ABS, 1e-3)
blob = sz_tpu.compress(data, cfg)
print(f"ratio {data.nbytes / len(blob):.2f}")

# full decode
out = sz_tpu.decompress(blob, data.shape, np.float32)
print(f"full  max err {np.abs(out - data).max():.2e}")

# region decode: a 30^3 window, only its blocks are touched
start, end = (64, 80, 96), (94, 110, 126)
t0 = time.perf_counter()
region = sz_tpu.decompress_region(blob, data.shape, start, end,
                                  np.float32)
t1 = time.perf_counter()
sl = tuple(slice(s, e) for s, e in zip(start, end))
assert np.array_equal(region, out[sl])
print(f"region {region.shape} decoded in {1e3 * (t1 - t0):.0f} ms, "
      f"bit-identical to the full decode")

# sub-block compression of a region of a larger array
# (SZ_compress_args3, sz.c:403)
blob_region = sz_tpu.compress_region(data, start, end, cfg=sz_tpu
                                     .SZConfig().with_bound(
                                         sz_tpu.ErrorBoundMode.ABS, 1e-3))
print(f"sub-block stream for the region: {len(blob_region)} bytes")
