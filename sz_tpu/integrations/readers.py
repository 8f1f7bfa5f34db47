"""Input-format readers (NetCDF / ADIOS), the analogs of the
reference's thin library shims `NetCDFReader/src/NetCDFReader.c` (a
nc_get_var_* wrapper) and `adiosReader/src/adiosReader.c` (an ADIOS1
read wrapper).

NetCDF-4 files are HDF5 and read through h5py; classic NetCDF (CDF-1 /
CDF-2 magic) is parsed by a built-in dependency-free reader.  ADIOS BP
needs the adios2 package (like the reference needs libadios) and is
gated accordingly.
"""

from __future__ import annotations

import struct

import numpy as np

_CDF_TYPES = {
    1: np.dtype(">i1"), 2: np.dtype("S1"), 3: np.dtype(">i2"),
    4: np.dtype(">i4"), 5: np.dtype(">f4"), 6: np.dtype(">f8"),
}


def _read_cdf(path: str, dataset: str) -> np.ndarray:
    """Minimal classic-NetCDF (CDF-1/CDF-2) variable reader."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file")
    offsize = 4 if buf[3] == 1 else 8
    pos = 4
    (numrecs,) = struct.unpack_from(">I", buf, pos)
    pos += 4

    def read_u32():
        nonlocal pos
        (v,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        return v

    def read_name():
        nonlocal pos
        ln = read_u32()
        name = buf[pos:pos + ln].decode()
        pos += (ln + 3) & ~3
        return name

    def skip_attrs():
        nonlocal pos
        tag = read_u32()
        n = read_u32()
        if tag == 0 and n == 0:
            return
        assert tag == 0x0C, "bad attribute list"
        for _ in range(n):
            read_name()
            nc_type = read_u32()
            cnt = read_u32()
            size = _CDF_TYPES[nc_type].itemsize * cnt
            pos += (size + 3) & ~3

    # dimensions
    dims = []
    tag = read_u32()
    ndims = read_u32()
    if tag == 0x0A:
        for _ in range(ndims):
            read_name()
            dims.append(read_u32())  # 0 = record dimension
    skip_attrs()
    # variables
    tag = read_u32()
    nvars = read_u32()
    assert tag in (0x0B, 0), "bad variable list"
    for _ in range(nvars):
        name = read_name()
        nd = read_u32()
        dimids = [read_u32() for _ in range(nd)]
        skip_attrs()
        nc_type = read_u32()
        _vsize = read_u32()
        if offsize == 4:
            (begin,) = struct.unpack_from(">I", buf, pos)
        else:
            (begin,) = struct.unpack_from(">Q", buf, pos)
        pos += offsize
        if name != dataset:
            continue
        shape = [dims[d] for d in dimids]
        dt = _CDF_TYPES[nc_type]
        if shape and shape[0] == 0:  # record variable
            shape[0] = numrecs
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, dtype=dt, count=n, offset=begin)
        return arr.reshape(shape).astype(dt.newbyteorder("="))
    raise KeyError(f"variable {dataset!r} not found")


def read_netcdf(path: str, dataset: str) -> np.ndarray:
    """netcdfReader analog (NetCDFReader.c:5): read one variable."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:3] == b"CDF":
        return _read_cdf(path, dataset)
    import h5py  # NetCDF-4 files are HDF5

    with h5py.File(path, "r") as f:
        return np.asarray(f[dataset])


def read_adios_bp(path: str, dataset: str) -> np.ndarray:
    """adiosReader analog: read one variable from an ADIOS .bp file.
    Requires the adios2 package (the reference likewise links libadios;
    sz_tpu gates rather than vendoring a BP parser)."""
    try:
        import adios2  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "reading ADIOS .bp files requires the adios2 package "
            "(the reference's adiosReader likewise requires libadios)"
        ) from e
    with adios2.open(path, "r") as f:  # pragma: no cover
        for step in f:
            return np.asarray(step.read(dataset))
