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


# ADIOS1 BP3 type codes -> numpy (adios_types.h; the subset the
# reference's adiosReader dispatches on, adiosReader.c:13-22)
_BP_TYPES = {0: np.int8, 1: np.int16, 2: np.int32, 4: np.int64,
             50: np.uint8, 51: np.uint16, 52: np.uint32, 54: np.uint64,
             5: np.float32, 6: np.float64}

# characteristic ids (adios_internals.h enum ADIOS_CHARACTERISTICS)
_BP_CH_OFFSET = 3
_BP_CH_DIMS = 4
_BP_CH_PAYLOAD = 6
_BP_CH_FILE_INDEX = 7
_BP_CH_TIME_INDEX = 8


def _parse_bp3_vars(buf: bytes) -> dict:
    """Parse a BP3 file's variable index: {name: (dtype, [block...])}
    where each block is (time_index, payload_offset,
    [(local, global, offset) per dim]).

    Layout (ADIOS1 bp format, written here by ADIOS2's BP3 engine):
    28-byte minifooter [pg_index u64][vars_index u64][attrs_index u64]
    [4 version bytes, minor in byte 3]; vars index = u32 count,
    u64 length, then per variable: u32 entry_len, u32 member_id,
    u16+group, u16+name, u16+path, u8 type, u64 sets_count, and per
    characteristics set u8 item_count, u32 set_len, then (u8 id,
    payload) items."""
    if len(buf) < 28:
        raise ValueError("not a BP3 file (too short)")
    pg_off, vars_off, attrs_off = struct.unpack("<QQQ", buf[-28:-4])
    version = buf[-1]
    if version != 3 or vars_off >= len(buf):
        raise ValueError(f"unsupported BP version {version} "
                         "(only BP3 little-endian is vendored; install "
                         "adios2 for other containers)")
    off = vars_off
    count = struct.unpack_from("<I", buf, off)[0]
    off += 12  # count + index length
    out = {}
    for _ in range(count):
        elen = struct.unpack_from("<I", buf, off)[0]
        entry_end = off + 4 + elen
        o = off + 8  # entry_len + member_id
        gl = struct.unpack_from("<H", buf, o)[0]
        o += 2 + gl
        nl = struct.unpack_from("<H", buf, o)[0]
        name = buf[o + 2:o + 2 + nl].decode()
        o += 2 + nl
        pl = struct.unpack_from("<H", buf, o)[0]
        o += 2 + pl
        typ = buf[o]
        o += 1
        nsets = struct.unpack_from("<Q", buf, o)[0]
        o += 8
        blocks = []
        for _s in range(nsets):
            o += 1  # item count
            slen = struct.unpack_from("<I", buf, o)[0]
            o += 4
            send = o + slen
            time = payload = None
            dims = []
            while o < send:
                cid = buf[o]
                o += 1
                if cid in (_BP_CH_OFFSET, _BP_CH_PAYLOAD):
                    v = struct.unpack_from("<Q", buf, o)[0]
                    o += 8
                    if cid == _BP_CH_PAYLOAD:
                        payload = v
                elif cid == _BP_CH_FILE_INDEX:
                    o += 4
                elif cid == _BP_CH_TIME_INDEX:
                    time = struct.unpack_from("<I", buf, o)[0]
                    o += 4
                elif cid == _BP_CH_DIMS:
                    dl = struct.unpack_from("<H", buf, o + 1)[0]
                    d = struct.unpack_from("<%dQ" % (dl // 8), buf,
                                           o + 3)
                    dims = [d[i:i + 3] for i in range(0, len(d), 3)]
                    o += 3 + dl
                else:
                    # value / bitmap / statistics / transform: not
                    # needed for payload reads — skip to the set end
                    o = send
            o = send
            if payload is not None:
                blocks.append((time, payload, dims))
        off = entry_end
        if typ in _BP_TYPES:
            out[name] = (np.dtype(_BP_TYPES[typ]), blocks)
    return out


def read_adios_bp(path: str, dataset: str, step: int = None,
                  start=None, count=None) -> np.ndarray:
    """adiosReader analog (adiosReader.c:5-80): read one variable from
    an ADIOS .bp file.

    BP3 containers (the format the reference's ADIOS1-based reader
    consumes, and what its vendored test fixtures are) parse with a
    built-in dependency-free reader: per-step rank blocks assemble into
    the global array at their recorded offsets, `step` selects the
    1-based BP time index (default: first, matching the reference's
    t=1 read), and start/count crop a bounding box like
    adios_selection_boundingbox.  Other BP versions route to the
    adios2 package when it is installed."""
    with open(path, "rb") as f:
        buf = f.read()
    try:
        idx = _parse_bp3_vars(buf)
        if dataset not in idx:
            raise KeyError(f"variable {dataset!r} not in "
                           f"{sorted(idx)} ({path})")
        dt, blocks = idx[dataset]
        times = sorted({t for t, _, _ in blocks})
        sel_t = times[0] if step is None else step
        sel = [b for b in blocks if b[0] == sel_t]
        if not sel:
            raise KeyError(f"step {sel_t} not in {times}")
        rank = len(sel[0][2])
        gshape = tuple(max(int(d[1]) if d[1] else int(d[0]) + int(d[2])
                           for _, _, ds in sel for d in [ds[ax]])
                       for ax in range(rank))
        out = np.zeros(gshape, dt)
        for _t, payload, dims in sel:
            local = tuple(int(d[0]) for d in dims)
            offs = tuple(int(d[2]) for d in dims)
            n = int(np.prod(local))
            block = np.frombuffer(buf, dt, n, payload).reshape(local)
            out[tuple(slice(o, o + c)
                      for o, c in zip(offs, local))] = block
        if start is not None:
            out = out[tuple(slice(s, s + c)
                            for s, c in zip(start, count))]
        return out
    except ValueError:
        pass  # not BP3: fall through to adios2 if present
    try:
        import adios2  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "this container is not BP3; reading it requires the "
            "adios2 package") from e
    with adios2.open(path, "r") as f:  # pragma: no cover
        for s in f:
            return np.asarray(s.read(dataset))
