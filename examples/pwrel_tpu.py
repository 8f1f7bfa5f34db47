#!/usr/bin/env python3
"""Point-wise-relative (PW_REL / MSST19) compression on TPU.

The reference's marquee accelerated mode (user guide §6(5),
sz_float_pwr.c:1978 MSST19) with the TPU engine: the whole
multiplicative-Lorenzo chain runs in ONE Pallas wavefront dispatch
with integer software-IEEE-f64 arithmetic, so the device stream is
byte-identical to the host (and reference) encoder BY CONSTRUCTION —
on emulated-f64 TPU silicon too.  engine="auto" picks the device on
TPU hosts for large fields (measured 1-2.8 GB/s/chip vs ~0.1 GB/s for
the host codec, BASELINE.md round 5) and falls back to the host
wherever the device would not win (small arrays, link-bound tunnels,
interval counts past the kernel envelope).
"""

import numpy as np

import sz_tpu

rng = np.random.default_rng(0)
x = np.linspace(0.1, 9.3, 256)[:, None, None]
y = np.linspace(0.2, 7.1, 256)[None, :, None]
z = np.linspace(0.3, 5.7, 256)[None, None, :]
data = (np.exp(np.sin(x) * np.cos(y) + 0.2 * np.sin(z))
        * (1 + 0.05 * rng.standard_normal((256, 256, 256)))
        ).astype(np.float32)

cfg = sz_tpu.SZConfig(
    error_bound_mode=sz_tpu.ErrorBoundMode.PW_REL,
    pw_rel_bound_ratio=1e-3,      # every point within 0.1% of itself
    engine="auto",                # device on TPU hosts, host otherwise
)

blob = sz_tpu.compress(data, cfg)
out = sz_tpu.decompress(blob, data.shape, np.float32)

rel = np.abs(out - data) / np.maximum(np.abs(data), 1e-30)
print(f"ratio        {data.nbytes / len(blob):.2f}x")
print(f"max point-wise relative error {rel.max():.3e}  (bound 1e-3)")

# the stream is reference-compatible: `sz -x -f -s out.sz -3 256 256
# 256` decodes it bit-identically
with open("/tmp/pwrel_example.sz", "wb") as f:
    f.write(blob)
print("wrote /tmp/pwrel_example.sz (decodable by the reference CLI)")
