#!/usr/bin/env python3
"""Dataset regression sweep — test/travis-ci/test.sh mirror (SURVEY §4
tier 4).

The reference CI sweeps `sz -z/-x … -a` at REL and PW_REL bounds
1E-1/1E-3/1E-5 over CESM-ATM / EXAFEL / HACC / Hurricane / QMCPACK and
reads the `-a` report (max err, PSNR, CR) as the scoreboard.  The real
datasets need network access; this sweep runs the same shapes/bounds on
synthetic fields of matching character and scores BOTH codecs live:

  * our CR must match the reference's (same inner streams),
  * the reference binary must decode our stream bit-identically to its
    own roundtrip (full interop),
  * our error metrics must satisfy the bound.

Usage: python tools/ci_sweep.py [--quick]
"""

import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode

SZ_BIN = Path("/tmp/szref/build/bin/sz")

CONFIGS = [
    # (name, shape, character)  shapes from test/travis-ci/test.sh
    ("CESM-ATM-like", (1800, 3600), "smooth2d"),
    ("EXAFEL-like", (388, 185, 320), "detector"),
    ("HACC-like", (1048576,), "particles"),
    ("Hurricane-like", (100, 500, 500), "smooth3d"),
    ("QMCPACK-like", (115, 69, 69), "smooth3d"),
]
BOUNDS = [("REL", 1e-1), ("REL", 1e-3), ("REL", 1e-5),
          ("PW_REL", 1e-1), ("PW_REL", 1e-3), ("PW_REL", 1e-5)]


def synth(shape, kind, rng):
    axes = [np.linspace(0.05, (3 + i) * np.pi, n)
            for i, n in enumerate(shape)]
    g = np.meshgrid(*axes, indexing="ij")
    if kind == "particles":
        f = np.cumsum(rng.standard_normal(shape[0])) * 0.01 + 10.0
    elif kind == "detector":
        f = np.abs(rng.standard_normal(shape)) ** 3 * 50 + 1.0
        f = f + 200 * np.exp(-((g[0] - g[0].mean()) ** 2) / 4)
    else:
        f = 1.0
        for a in g:
            f = f * np.sin(a)
        f = f * 50 + 100 + 0.5 * rng.standard_normal(shape)
    return np.ascontiguousarray(f, np.float32)


def psnr(orig, rec):
    rng_ = float(orig.max() - orig.min())
    mse = float(np.mean((orig.astype(np.float64)
                         - rec.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20 * np.log10(rng_) - 10 * np.log10(mse)


def run_ref(dat, shape, mode, bound, tmp):
    dims = [str(s) for s in reversed(shape)]  # CLI order: fastest first
    dflag = {1: "-1", 2: "-2", 3: "-3"}[len(shape)]
    bflag = ["-M", mode, "-R" if mode == "REL" else "-P", str(bound)]
    if mode == "PW_REL":
        bflag = ["-M", "PW_REL", "-P", str(bound)]
    t0 = time.time()
    subprocess.run([str(SZ_BIN), "-z", "-f", "-i", str(dat)] + bflag
                   + [dflag] + dims, check=True, capture_output=True)
    enc_t = time.time() - t0
    sz = dat.with_suffix(dat.suffix + ".sz")
    t0 = time.time()
    subprocess.run([str(SZ_BIN), "-x", "-f", "-s", str(sz), dflag]
                   + dims, check=True, capture_output=True)
    dec_t = time.time() - t0
    out = np.fromfile(str(sz) + ".out", np.float32).reshape(shape)
    return sz.stat().st_size, out, enc_t, dec_t


def main():
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(2026)
    rows = []
    configs = CONFIGS[:2] if quick else CONFIGS
    bounds = BOUNDS[1:2] if quick else BOUNDS
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        for name, shape, kind in configs:
            data = synth(shape, kind, rng)
            dat = td / f"{name}.dat"
            data.tofile(dat)
            for mode, bound in bounds:
                ebm = (ErrorBoundMode.REL if mode == "REL"
                       else ErrorBoundMode.PW_REL)
                cfg = SZConfig().with_bound(ebm, bound)
                t0 = time.time()
                blob = sz_tpu.compress(data, cfg)
                enc_t = time.time() - t0
                t0 = time.time()
                ours = sz_tpu.decompress(blob, shape, np.float32)
                dec_t = time.time() - t0
                cr = data.nbytes / len(blob)
                p = psnr(data, ours)
                interop = "-"
                ref_cr = ref_p = None
                if SZ_BIN.exists():
                    ref_sz, ref_out, ref_et, ref_dt = run_ref(
                        dat, shape, mode, bound, td)
                    ref_cr = data.nbytes / ref_sz
                    ref_p = psnr(data, ref_out)
                    # full interop: reference decodes OUR stream
                    mine = td / "mine.sz"
                    mine.write_bytes(blob)
                    dims = [str(s) for s in reversed(shape)]
                    dflag = {1: "-1", 2: "-2", 3: "-3"}[len(shape)]
                    subprocess.run(
                        [str(SZ_BIN), "-x", "-f", "-s", str(mine),
                         dflag] + dims, check=True, capture_output=True)
                    ref_dec = np.fromfile(str(mine) + ".out",
                                          np.float32).reshape(shape)
                    interop = ("BIT-EQ" if np.array_equal(ref_dec, ours)
                               else "DIVERGES")
                rows.append((name, mode, bound, cr, p, enc_t, dec_t,
                             ref_cr, ref_p, interop))
                r = rows[-1]
                print(f"{r[0]:16s} {r[1]:7s} {r[2]:.0e}  "
                      f"CR {r[3]:7.2f} (ref {r[7] if r[7] else 0:7.2f})"
                      f"  PSNR {r[4]:6.1f} (ref"
                      f" {r[8] if r[8] else 0:6.1f})  enc {r[5]:5.1f}s"
                      f"  dec {r[6]:5.1f}s  interop={r[9]}",
                      flush=True)
    bad = [r for r in rows if r[9] == "DIVERGES"]
    print(f"\n{len(rows)} configs swept; "
          f"{'ALL INTEROP BIT-EQUAL' if not bad else f'{len(bad)} DIVERGE'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
