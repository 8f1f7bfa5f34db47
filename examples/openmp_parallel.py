#!/usr/bin/env python3
"""Block-parallel compression in the sz_omp byte format
(example/sz_openmp.c analog; format: sz_omp.c:209-325).

The grid is cut into a thread grid of blocks; every block compresses
independently (native kernels under a thread pool — deterministic,
unlike the reference's racy OpenMP histogram), per-block streams are
concatenated by exclusive-scan offsets, and the parallel decoder
reverses it.  Streams are byte-compatible with the reference's
SZ_compress_float_3D_MDQ_openmp.
"""

import time

import numpy as np

from sz_tpu.parallel import ompsz

rng = np.random.default_rng(1)
ax = np.linspace(0, 4 * np.pi, 256)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
data = (np.sin(x) * np.cos(y) * np.sin(z)
        + 0.05 * rng.standard_normal(x.shape)).astype(np.float32)

t0 = time.perf_counter()
blob = ompsz.compress_omp(data, real_precision=1e-3, thread_num=4)
t1 = time.perf_counter()
out = ompsz.decompress_omp(blob, data.shape)
t2 = time.perf_counter()

print(f"ratio   {data.nbytes / len(blob):.2f}")
print(f"encode  {data.nbytes / 1e6 / (t1 - t0):.0f} MB/s")
print(f"decode  {data.nbytes / 1e6 / (t2 - t1):.0f} MB/s")
print(f"max err {np.abs(out.astype('f8') - data.astype('f8')).max():.2e}")
