"""NetCDF reader tests (classic CDF-1 via the built-in parser and
NetCDF-4 via h5py), plus the ADIOS gate + stream version enforcement."""

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
