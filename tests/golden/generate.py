#!/usr/bin/env python3
"""Generate golden .sz streams with the reference SZ2 binary.

Usage: python tests/golden/generate.py
Requires the reference built at /tmp/szref/build/bin/sz (see README):
    cmake /root/reference -DCMAKE_BUILD_TYPE=Release -DBUILD_SZ_EXAMPLES=ON \
          -DBUILD_TIMECMPR=ON -DBUILD_RANDOMACCESS=ON -DSZ_FIND_DEPS=OFF
Golden outputs are committed so the test suite runs without the binary.
"""

import pathlib
import shutil
import subprocess
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")

# (name, datafile-or-None, dtype flag, dims (fastest first), mode args)
CASES = [
    ("f32_3d_abs1e-4", "testfloat_8_8_128.dat", "-f", (8, 8, 128),
     ["-M", "ABS", "-A", "1E-4"]),
    ("f32_3d_rel1e-3", "testfloat_8_8_128.dat", "-f", (8, 8, 128),
     ["-M", "REL", "-R", "1E-3"]),
    ("f32_3d_psnr90", "testfloat_8_8_128.dat", "-f", (8, 8, 128),
     ["-M", "PSNR", "-S", "90"]),
    ("f32_1d_abs1e-4", "testfloat_8_8_128.dat", "-f", (8192,),
     ["-M", "ABS", "-A", "1E-4"]),
    ("f32_2d_abs1e-4", "testfloat_8_8_128.dat", "-f", (64, 128),
     ["-M", "ABS", "-A", "1E-4"]),
    ("f64_3d_abs1e-4", "testdouble_8_8_128.dat", "-d", (8, 8, 128),
     ["-M", "ABS", "-A", "1E-4"]),
    ("f64_1d_abs1e-4", "testdouble_8_8_128.dat", "-d", (8192,),
     ["-M", "ABS", "-A", "1E-4"]),
    ("f64_2d_abs1e-4", "testdouble_8_8_128.dat", "-d", (64, 128),
     ["-M", "ABS", "-A", "1E-4"]),
    ("f64_4d_rel1e-3", "testdouble_8_8_8_128.dat", "-d", (8, 8, 8, 128),
     ["-M", "REL", "-R", "1E-3"]),
    ("f32_3d_pwrel1e-3", "testfloat_8_8_128.dat", "-f", (8, 8, 128),
     ["-M", "PW_REL", "-P", "1E-3"]),
    ("f32_1d_pwrel1e-3", "testfloat_8_8_128.dat", "-f", (8192,),
     ["-M", "PW_REL", "-P", "1E-3"]),
    # synthetic 64^3 smooth field exercises many blocks + escapes
    ("f32_3d64_abs1e-3", "synth_f32_64.dat", "-f", (64, 64, 64),
     ["-M", "ABS", "-A", "1E-3"]),
    ("f64_3d64_abs1e-3", "synth_f64_64.dat", "-d", (64, 64, 64),
     ["-M", "ABS", "-A", "1E-3"]),
]


def synth(path: pathlib.Path, dtype):
    if path.exists():
        return
    n = 64
    rng = np.random.default_rng(12345)
    x, y, z = np.meshgrid(*[np.linspace(0, 4 * np.pi, n)] * 3,
                          indexing="ij")
    field = (np.sin(x) * np.cos(y) * np.sin(z)
             + 0.1 * rng.standard_normal((n, n, n))
             + 0.05 * x * y / 16.0)
    field.astype(dtype).tofile(path)


def main():
    if not REF_BIN.exists():
        sys.exit("reference binary not found; build it first")
    work = HERE / "work"
    work.mkdir(exist_ok=True)
    synth(HERE / "synth_f32_64.dat", np.float32)
    synth(HERE / "synth_f64_64.dat", np.float64)

    for name, datafile, tflag, dims, margs in CASES:
        src = (HERE / datafile) if datafile.startswith("synth") \
            else (REF_DATA / datafile)
        local = work / datafile
        shutil.copy(src, local)
        szfile = HERE / f"{name}.sz"
        outfile = HERE / f"{name}.out"
        dimflag = {1: "-1", 2: "-2", 3: "-3", 4: "-4"}[len(dims)]
        subprocess.run(
            [str(REF_BIN), "-z", str(szfile), tflag, "-i", str(local),
             *margs, dimflag, *map(str, dims)],
            check=True, capture_output=True)
        subprocess.run(
            [str(REF_BIN), "-x", str(outfile), tflag, "-s", str(szfile),
             "-i", str(local), dimflag, *map(str, dims), "-a"],
            check=True, capture_output=True)
        print(f"{name}: sz={szfile.stat().st_size}B")
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
