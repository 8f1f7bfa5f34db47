#!/usr/bin/env python3
"""Basic float/double compression (testfloat_compress.c /
testdouble_compress.c analog).

Compresses a 3D field at an absolute error bound, decompresses it, and
reports ratio and max error.  The stream is reference-compatible: the
upstream `sz -x` CLI decodes it bit-identically.
"""

import numpy as np

import sz_tpu

rng = np.random.default_rng(0)
ax = np.linspace(0, 4 * np.pi, 128)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
data = (np.sin(x) * np.cos(y) * np.sin(z)
        + 0.05 * rng.standard_normal(x.shape)).astype(np.float32)

cfg = sz_tpu.SZConfig().with_bound(sz_tpu.ErrorBoundMode.ABS, 1e-3)
blob = sz_tpu.compress(data, cfg)
out = sz_tpu.decompress(blob, data.shape, np.float32)

print(f"ratio   {data.nbytes / len(blob):.2f}")
print(f"max err {np.abs(out.astype('f8') - data.astype('f8')).max():.2e}")
print(f"meta    {sz_tpu.get_metadata(blob)}")

# double precision, relative bound
d64 = data.astype(np.float64)
cfg64 = sz_tpu.SZConfig().with_bound(sz_tpu.ErrorBoundMode.REL, 1e-4)
blob64 = sz_tpu.compress(d64, cfg64)
out64 = sz_tpu.decompress(blob64, d64.shape, np.float64)
print(f"f64 ratio {d64.nbytes / len(blob64):.2f}")
