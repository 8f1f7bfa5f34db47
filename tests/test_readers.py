"""NetCDF reader tests (classic CDF-1 via the built-in parser and
NetCDF-4 via h5py), plus the ADIOS gate + stream version enforcement."""

import pathlib
import struct

import numpy as np
import pytest

import sz_tpu
from sz_tpu.integrations import readers


def _write_classic_nc(path, name, arr):
    """Tiny CDF-1 writer (non-record variable) for test fixtures."""
    out = bytearray()
    out += b"CDF\x01"
    out += struct.pack(">I", 0)  # numrecs
    # dim list
    out += struct.pack(">II", 0x0A, arr.ndim)
    for i, d in enumerate(arr.shape):
        nm = f"d{i}".encode()
        out += struct.pack(">I", len(nm)) + nm.ljust((len(nm) + 3) & ~3,
                                                     b"\x00")
        out += struct.pack(">I", d)
    out += struct.pack(">II", 0, 0)  # no global attrs
    # var list
    out += struct.pack(">II", 0x0B, 1)
    nm = name.encode()
    out += struct.pack(">I", len(nm)) + nm.ljust((len(nm) + 3) & ~3,
                                                 b"\x00")
    out += struct.pack(">I", arr.ndim)
    for i in range(arr.ndim):
        out += struct.pack(">I", i)
    out += struct.pack(">II", 0, 0)  # no attrs
    nc_type = {np.dtype(np.float32): 5, np.dtype(np.float64): 6}[arr.dtype]
    out += struct.pack(">I", nc_type)
    data = arr.astype(arr.dtype.newbyteorder(">")).tobytes()
    out += struct.pack(">I", len(data))
    begin = len(out) + 4
    out += struct.pack(">I", begin)
    out += data
    path.write_bytes(bytes(out))


def test_read_classic_netcdf(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(4, 6) * 0.5
    p = tmp_path / "c.nc"
    _write_classic_nc(p, "field", arr)
    out = readers.read_netcdf(str(p), "field")
    assert np.array_equal(out, arr)
    with pytest.raises(KeyError):
        readers.read_netcdf(str(p), "missing")


def test_read_netcdf4_via_h5py(tmp_path):
    h5py = pytest.importorskip("h5py")
    arr = np.arange(60, dtype=np.float64).reshape(3, 4, 5)
    p = tmp_path / "n4.nc"
    with h5py.File(p, "w") as f:
        f.create_dataset("field", data=arr)
    out = readers.read_netcdf(str(p), "field")
    assert np.array_equal(out, arr)


def test_adios_gated():
    with pytest.raises((ImportError, FileNotFoundError)):
        readers.read_adios_bp("/nonexistent.bp", "x")


# ADIOS2-written BP3 fixtures vendored from the reference's own test
# data (/root/reference/adiosReader/test/testdata — the ADIOS project's
# standard SmallTestData: 36 rank blocks x 3 steps, every block the
# series base..base+7 with base = 1 + step*8 + ...): the built-in BP3
# parser must read what the reference's libadios-based reader reads
# (adiosReader.c:5-80, test_adiosReader.c usage -1 8 / -2 4 2).
BP_1D = pathlib.Path(__file__).parent / "golden" / \
    "ADIOS2ADIOS1WriteADIOS1Read1D8.bp"
BP_2D = pathlib.Path(__file__).parent / "golden" / \
    "ADIOS2ADIOS1WriteADIOS1Read2D2x4Test.bp"


def test_adios_bp3_1d():
    names = ["i8", "i16", "i32", "i64", "u8", "u16", "u32", "u64",
             "r32", "r64"]
    # the reference reads a [0:8) bounding box at one step for every
    # typed variable (adiosReader_1D)
    arrs = {n: readers.read_adios_bp(str(BP_1D), n, start=(0,),
                                     count=(8,)) for n in names}
    for n in names:
        assert arrs[n].shape == (8,)
    # ADIOS2 SmallTestData at step 1: per-type base series + step
    assert np.array_equal(arrs["i8"],
                          np.array([0, 1, -2, 3, -4, 5, -6, 7],
                                   np.int8) + 1)
    assert np.array_equal(arrs["i16"],
                          np.array([512, 513, -510, 515, -508, 517,
                                    -506, 519], np.int16) + 1)
    assert np.array_equal(arrs["u8"],
                          np.arange(128, 136, dtype=np.uint8) + 1)
    assert np.array_equal(arrs["r32"],
                          np.arange(8, dtype=np.float32) + 1)
    assert np.array_equal(arrs["r64"],
                          np.arange(8, dtype=np.float64) + 1)
    # every type advances by one update per rank-block per step:
    # the writer bumped the series 36 times per step (36 rank blocks)
    for n in names:
        for t in (2, 3):
            st = readers.read_adios_bp(str(BP_1D), n, step=t,
                                       start=(0,), count=(8,))
            d = (st - arrs[n]).astype(np.float64)  # native-dtype sub
            assert np.array_equal(d, np.full(8, 36.0 * (t - 1))), (n, t)


def test_adios_bp3_global_assembly_and_steps():
    # full global array: 36 rank blocks assembled at their offsets
    full = readers.read_adios_bp(str(BP_1D), "r32")
    assert full.shape == (288,)
    assert np.array_equal(full[:8], np.arange(1.0, 9.0,
                                              dtype=np.float32))
    # per-step selection: step 3's first block in this fixture holds
    # the series starting where step 1's last rank block ends + 8
    s3 = readers.read_adios_bp(str(BP_1D), "r32", step=3)
    assert s3.shape == (288,)
    assert not np.array_equal(full, s3)


def test_adios_bp3_2d():
    out = readers.read_adios_bp(str(BP_2D), "r32", start=(0, 0),
                                count=(2, 4))
    assert out.shape == (2, 4)
    assert np.array_equal(out.reshape(-1),
                          np.arange(1.0, 9.0, dtype=np.float32))
    full = readers.read_adios_bp(str(BP_2D), "i64")
    assert full.shape == (2, 144)


def test_stream_version_enforced():
    data = np.linspace(0, 1, 4096).astype(np.float32).reshape(16, 16, 16)
    blob = sz_tpu.compress(data, sz_tpu.SZConfig().with_bound(
        sz_tpu.ErrorBoundMode.ABS, 1e-3))
    from sz_tpu.format import lossless as ll
    inner = bytearray(ll.decompress(blob))
    inner[0:3] = bytes([2, 0, 0])  # pre-2.1.8 producer
    from sz_tpu.format import lossless
    tampered = lossless.compress(bytes(inner),
                                 sz_tpu.SZConfig().lossless, 3)
    with pytest.raises(ValueError, match="version"):
        sz_tpu.decompress(tampered, data.shape, np.float32)


def test_numpy_fast_paths_match_oracle():
    """The vectorized host fixpoint (regnd default) is bit-identical to
    the serial per-point oracle loops, encode and decode."""
    from sz_tpu.core import regnd

    rng = np.random.default_rng(5)
    for shape, dt, dense in [((40, 30, 25), np.float32, 0.0),
                             ((30, 24, 18), np.float32, 0.4),
                             ((64, 96), np.float32, 0.0),
                             ((20, 18, 14), np.float64, 0.0)]:
        axes = [np.linspace(0, 4 * np.pi, n) for n in shape]
        grids = np.meshgrid(*axes, indexing="ij")
        field = np.sin(grids[0])
        for g in grids[1:]:
            field = field * np.cos(g)
        data = (field + 0.05 * rng.standard_normal(shape)).astype(dt)
        if dense:
            data[rng.random(shape) < dense] = dt(0.25)
        kw = dict(max_range_radius=32768, sample_distance=100,
                  pred_threshold=np.float32(0.99))
        a = regnd.compress(data, 1e-3, oracle=True, **kw)
        b = regnd.compress(data, 1e-3, **kw)
        assert a.body == b.body, (shape, dt, dense)
        da = regnd.decompress(a.body, shape, dt, oracle=True)
        db = regnd.decompress(a.body, shape, dt)
        assert np.array_equal(da, db), (shape, dt, dense)
