"""Random-access blockwise container.

The reference's random-access mode (HAVE_RANDOMACCESS, randomAccess=1:
SZ_compress_float_*_MDQ_decompression_random_access_with_blocked_regression,
sz_float.c:7492-10106, region decode szd_float.c:6567-7597) makes every
block's stream self-contained so any sub-region can be decoded without
touching the rest.  Here the same capability is provided with a
slab-granular container whose payloads are ordinary reference-format SZ
streams — each slab independently decodable (by us or by the reference
binary), with an offset index for O(1) slab lookup:

    [magic "SZRA" 4B][version u8][dtype u8][rank u8][slab_axis u8=0]
    [shape rank*u64 LE][n_slabs u32 LE][slab_starts (n+1)*u64 LE]
    [offsets (n+1)*u64 LE][payload_0]...[payload_{n-1}]

This is also the multi-device container: parallel/slab.py compresses
slabs on separate devices/hosts and the ordered concatenation happens
here (the MPI-rank-independent chunk pattern, SURVEY §2.3).
"""

from __future__ import annotations

import struct

import numpy as np

from sz_tpu import api
from sz_tpu.config import SZConfig, DEFAULT_CONFIG

MAGIC = b"SZRA"

_DT_CODE = {np.dtype(np.float32): 0, np.dtype(np.float64): 1}
_CODE_DT = {v: k for k, v in _DT_CODE.items()}


def _slab_bounds(r0: int, n_slabs: int) -> np.ndarray:
    """Equal-ish slab starts along axis 0 (last slab takes the remainder)."""
    base = r0 // n_slabs
    starts = np.arange(n_slabs + 1, dtype=np.uint64) * base
    starts[-1] = r0
    return starts


def compress(data: np.ndarray, cfg: SZConfig = DEFAULT_CONFIG,
             slab_points: int = 1 << 22, n_slabs: int = None) -> bytes:
    """Compress into the random-access container.

    Each slab (along axis 0) is an independent SZ stream; slab size
    defaults to ~4M points.  n_slabs overrides (e.g. = mesh size for
    multi-device encode)."""
    data = np.asarray(data)
    if data.dtype not in _DT_CODE:
        raise TypeError(f"random-access container: {data.dtype}")
    shape = data.shape
    r0 = shape[0]
    if n_slabs is None:
        per_slab = max(1, int(slab_points // max(
            1, int(np.prod(shape[1:])))))
        n_slabs = max(1, (r0 + per_slab - 1) // per_slab)
    n_slabs = min(n_slabs, r0)
    starts = _slab_bounds(r0, n_slabs)

    payloads = []
    for s in range(n_slabs):
        a, b = int(starts[s]), int(starts[s + 1])
        payloads.append(api.compress(data[a:b], cfg))
    return build_container(shape, data.dtype, starts, payloads)


def build_container(shape, dtype, starts: np.ndarray, payloads) -> bytes:
    """Assemble the SZRA container from per-slab payload streams (the
    ordered-concatenation step of the parallel codec, sz_omp.c:313-325
    analog — offsets are the exclusive scan of payload sizes)."""
    n_slabs = len(payloads)
    out = bytearray()
    out += MAGIC
    out += bytes([1, _DT_CODE[np.dtype(dtype)], len(shape), 0])
    for r in shape:
        out += struct.pack("<Q", r)
    out += struct.pack("<I", n_slabs)
    out += np.asarray(starts).astype("<u8").tobytes()
    offsets = np.zeros(n_slabs + 1, dtype=np.uint64)
    for i, p in enumerate(payloads):
        offsets[i + 1] = offsets[i] + len(p)
    out += offsets.astype("<u8").tobytes()
    for p in payloads:
        out += p
    return bytes(out)


class Reader:
    """Parsed container with O(1) slab access (region decode without
    touching unrelated slabs — SZ_decompress_args_randomaccess analog,
    szd_float.c:7597)."""

    def __init__(self, blob: bytes):
        if blob[:4] != MAGIC:
            raise ValueError("not an SZRA container")
        ver, dtc, rank, axis = blob[4:8]
        pos = 8
        self.shape = tuple(
            struct.unpack_from("<Q", blob, pos + 8 * i)[0]
            for i in range(rank))
        pos += 8 * rank
        (self.n_slabs,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        self.starts = np.frombuffer(blob, dtype="<u8",
                                    count=self.n_slabs + 1, offset=pos)
        pos += 8 * (self.n_slabs + 1)
        self.offsets = np.frombuffer(blob, dtype="<u8",
                                     count=self.n_slabs + 1, offset=pos)
        pos += 8 * (self.n_slabs + 1)
        self.base = pos
        self.blob = blob
        self.dtype = _CODE_DT[dtc]

    def slab_bytes(self, i: int) -> bytes:
        a = self.base + int(self.offsets[i])
        b = self.base + int(self.offsets[i + 1])
        return self.blob[a:b]

    def decode_slab(self, i: int, engine: str = "auto") -> np.ndarray:
        a, b = int(self.starts[i]), int(self.starts[i + 1])
        shp = (b - a, *self.shape[1:])
        return api.decompress(self.slab_bytes(i), shp, self.dtype,
                              engine=engine)

    def decode_region(self, start0: int, end0: int,
                      engine: str = "auto") -> np.ndarray:
        """Decode rows [start0, end0) of axis 0, touching only the
        slabs that intersect the region."""
        first = int(np.searchsorted(self.starts, start0, "right") - 1)
        last = int(np.searchsorted(self.starts, end0, "left"))
        parts = []
        for i in range(first, last):
            sl = self.decode_slab(i, engine)
            a = int(self.starts[i])
            lo = max(start0 - a, 0)
            hi = min(int(self.starts[i + 1]), end0) - a
            parts.append(sl[lo:hi])
        return np.concatenate(parts, axis=0)

    def decode(self, engine: str = "auto") -> np.ndarray:
        return self.decode_region(0, int(self.shape[0]), engine)


def decompress(blob: bytes, engine: str = "auto") -> np.ndarray:
    return Reader(blob).decode(engine)
