"""sz-tpu command-line interface, mirroring the reference `sz` CLI
(example/sz.c): -z/-x compression/decompression, -p metadata print,
-M/-A/-R/-P/-S/-N bound control, -1..-4 dimensions, -a error analysis.

Dim order follows the reference: `-3 nx ny nz` has nx fastest, so the
numpy array shape is (nz, ny, nx).
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import pathlib
import sys
import time

import numpy as np

from sz_tpu import api
from sz_tpu.config import SZConfig, ErrorBoundMode, SZMode


_DTYPES = {
    "f": np.float32, "d": np.float64,
    "i8": np.int8, "ui8": np.uint8, "i16": np.int16, "ui16": np.uint16,
    "i32": np.int32, "ui32": np.uint32, "i64": np.int64, "ui64": np.uint64,
}


def _build_parser():
    p = argparse.ArgumentParser(
        prog="sz-tpu",
        description="TPU-native SZ2-compatible error-bounded lossy "
                    "compressor")
    p.add_argument("-z", nargs="?", const="", metavar="OUT",
                   help="compress (output file, default <input>.sz)")
    p.add_argument("-x", nargs="?", const="", metavar="OUT",
                   help="decompress (output file, default <input>.out)")
    p.add_argument("-p", action="store_true", help="print stream metadata")
    p.add_argument("-f", action="store_true", help="float32 data")
    p.add_argument("-d", action="store_true", help="float64 data")
    p.add_argument("--int", dest="int_type", choices=list(_DTYPES),
                   help="integer data type (i8..ui64)")
    p.add_argument("-M", default="ABS", metavar="MODE",
                   help="ABS|REL|ABS_AND_REL|ABS_OR_REL|PSNR|NORM|PW_REL")
    p.add_argument("-A", type=float, default=1e-4, help="absolute bound")
    p.add_argument("-R", type=float, default=1e-4, help="relative bound")
    p.add_argument("-P", type=float, default=1e-3, help="pw-rel bound")
    p.add_argument("-S", type=float, default=90.0, help="PSNR")
    p.add_argument("-N", type=float, default=0.0, help="norm error")
    p.add_argument("-i", metavar="FILE", help="original data file")
    p.add_argument("-s", metavar="FILE", help="compressed data file")
    p.add_argument("-1", dest="d1", nargs=1, type=int, metavar="nx")
    p.add_argument("-2", dest="d2", nargs=2, type=int, metavar=("nx", "ny"))
    p.add_argument("-3", dest="d3", nargs=3, type=int,
                   metavar=("nx", "ny", "nz"))
    p.add_argument("-4", dest="d4", nargs=4, type=int,
                   metavar=("nx", "ny", "nz", "np"))
    p.add_argument("-a", action="store_true", help="print error analysis")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "jax", "numpy"])
    p.add_argument("--best-speed", action="store_true",
                   help="skip the final lossless stage (SZ_BEST_SPEED)")
    p.add_argument("--no-regression", action="store_true",
                   help="classic SZ1.4 kernels (withRegression=NO)")
    return p


def _shape(args):
    for dims in (args.d4, args.d3, args.d2, args.d1):
        if dims:
            return tuple(reversed(dims))  # nx fastest -> numpy slowest-first
    sys.exit("error: dimensions required (-1/-2/-3/-4)")


def _dtype(args):
    if args.d:
        return np.float64
    if args.int_type:
        return _DTYPES[args.int_type]
    return np.float32


def _cfg(args) -> SZConfig:
    mode = getattr(ErrorBoundMode, args.M)
    value = {ErrorBoundMode.ABS: args.A, ErrorBoundMode.REL: args.R,
             ErrorBoundMode.PW_REL: args.P, ErrorBoundMode.PSNR: args.S,
             ErrorBoundMode.NORM: args.N}.get(mode, args.A)
    cfg = SZConfig(engine=args.engine).with_bound(mode, value)
    if mode in (ErrorBoundMode.ABS_AND_REL, ErrorBoundMode.ABS_OR_REL):
        cfg = dataclasses.replace(cfg, abs_err_bound=args.A,
                                  rel_bound_ratio=args.R)
    if args.best_speed:
        cfg = dataclasses.replace(cfg, sz_mode=SZMode.BEST_SPEED)
    if args.no_regression:
        cfg = dataclasses.replace(cfg, with_regression=False)
    return cfg


def _analysis(ori: np.ndarray, dec: np.ndarray, byte_length: int):
    """The reference's -a report (example/sz.c:603-620)."""
    o = ori.astype(np.float64).ravel()
    r = dec.astype(np.float64).ravel()
    mn, mx = o.min(), o.max()
    rng = mx - mn
    diff = r - o
    diff_max = np.abs(diff).max()
    nz = o != 0
    maxpw = np.abs(diff[nz] / o[nz]).max() if nz.any() else 0.0
    mse = np.mean(diff * diff)
    psnr = 20 * math.log10(rng) - 10 * math.log10(mse) if mse > 0 \
        else math.inf
    nrmse = math.sqrt(mse) / rng if rng else 0.0
    cr = ori.nbytes / byte_length
    norm_err = math.sqrt(np.sum(diff * diff))
    sum22 = np.sum(o * o)
    o_c = o - o.mean()
    r_c = r - r.mean()
    denom = math.sqrt(np.sum(o_c * o_c)) * math.sqrt(np.sum(r_c * r_c))
    ac_eff = float(np.sum(o_c * r_c)) / denom if denom else 0.0
    print(f"Min={mn:.20G}, Max={mx:.20G}, range={rng:.20G}")
    print(f"Max absolute error = {diff_max:.10f}")
    print(f"Max relative error = {diff_max / rng:f}")
    print(f"Max pw relative error = {maxpw:f}")
    print(f"PSNR = {psnr:f}, NRMSE= {nrmse:.20G}")
    print(f"normError = {norm_err:f}, "
          f"normErr_norm = {norm_err / math.sqrt(sum22):f}")
    print(f"acEff={ac_eff:f}")
    print(f"compressionRatio={cr:f}")


def main(argv=None):
    args = _build_parser().parse_args(argv)
    if args.p:
        if not args.s:
            sys.exit("error: -p needs -s <compressed file>")
        meta = api.get_metadata(pathlib.Path(args.s).read_bytes())
        for k, v in meta.items():
            print(f"{k}: {v}")
        return

    dtype = _dtype(args)
    shape = _shape(args)

    if args.z is not None:
        if not args.i:
            sys.exit("error: -z needs -i <original data file>")
        data = np.fromfile(args.i, dtype=dtype).reshape(shape)
        cfg = _cfg(args)
        t0 = time.time()
        blob = api.compress(data, cfg)
        dt = time.time() - t0
        out = args.z or (args.i + ".sz")
        pathlib.Path(out).write_bytes(blob)
        print(f"compression time = {dt:f}")
        print(f"compressed data file: {out}")
        if args.a:
            dec = api.decompress(blob, shape, dtype)
            _analysis(data, dec, len(blob))
        return

    if args.x is not None:
        if not args.s:
            sys.exit("error: -x needs -s <compressed file>")
        blob = pathlib.Path(args.s).read_bytes()
        t0 = time.time()
        dec = api.decompress(blob, shape, dtype, engine=args.engine)
        dt = time.time() - t0
        out = args.x or (args.s + ".out")
        np.asarray(dec, dtype=dtype).tofile(out)
        print(f"decompression time = {dt:f} seconds.")
        print(f"decompressed data file: {out}")
        if args.a and args.i:
            ori = np.fromfile(args.i, dtype=dtype).reshape(shape)
            _analysis(ori, dec, len(blob))
        return

    _build_parser().print_help()


if __name__ == "__main__":
    main()
