#!/usr/bin/env python3
"""PaSTRI pattern codec for GAMESS two-electron integrals
(example/sz_pastri.c analog; pastri.c:33, pastriD.h:483).

Batches of basis-function blocks share a scaled pattern; PaSTRI stores
the pattern + per-block scales + residuals.  Streams are byte-exact
vs SZ_pastriCompressBatch (tests/test_pastri.py).
"""

import numpy as np

from sz_tpu.apps import pastri

rng = np.random.default_rng(4)
p = pastri.PastriParams(bf=(1, 1, 2, 2), original_eb=1e-7,
                        data_size=8, num_blocks=32)
# one shared pattern, scaled per block (the GAMESS integral structure)
pattern = np.sin(np.linspace(0.3, 6.0, p.b_size))
data = np.concatenate([
    s * pattern + 1e-10 * rng.standard_normal(p.b_size)
    for s in rng.uniform(0.1, 10.0, p.num_blocks)
]).astype(np.float64)

blob = pastri.compress_batch(p, data)
_, out = pastri.decompress_batch(blob)
print(f"ratio   {data.nbytes / len(blob):.2f}")
print(f"max err {np.abs(out - data).max():.2e} (bound {p.original_eb})")
