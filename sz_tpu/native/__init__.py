"""ctypes bindings for the native host runtime (core.c).

Builds the shared library on first import if missing (cc -O3).  Every
entry point has a pure-Python/numpy fallback elsewhere in the package;
import failure is therefore non-fatal for callers that guard with
try/except.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SO = _HERE / "_core.so"
_SRC = _HERE / "core.c"


def _build() -> None:
    # -ffp-contract=off: gcc at -O3 -march=native would otherwise fuse
    # a*b+c into FMA, breaking bit-parity with the reference binary
    # (built without -march, i.e. no FMA) and with the numpy oracle.
    cmd = ["cc", "-O3", "-march=native", "-ffp-contract=off", "-fopenmp",
           "-shared", "-fPIC", str(_SRC), "-o", str(_SO), "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:  # pragma: no cover
        cmd.remove("-fopenmp")
        subprocess.run(cmd, check=True, capture_output=True)


if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
    _build()

_lib = ctypes.CDLL(str(_SO))

# --- vendored zstd 1.3.5 (byte-parity lossless stage) ------------------
# The reference vendors zstd 1.3.5; building the same release makes the
# outer frame of every stream byte-identical to the reference binary's
# (see vendor/zstd/PROVENANCE.md).  Optional: lossless.py falls back to
# the system zstandard module when this build is unavailable.
_ZSTD_DIR = _HERE / "vendor" / "zstd"
_ZSTD_SO = _HERE / "_zstd135.so"


def _build_zstd() -> None:
    srcs = [str(p) for sub in ("common", "compress", "decompress")
            for p in sorted((_ZSTD_DIR / sub).glob("*.c"))]
    cmd = ["cc", "-O3", "-fPIC", "-shared",
           "-I", str(_ZSTD_DIR), "-I", str(_ZSTD_DIR / "common"),
           *srcs, "-o", str(_ZSTD_SO), "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


_zstd_lib = None
try:
    if _ZSTD_DIR.is_dir():
        if (not _ZSTD_SO.exists()
                or _ZSTD_SO.stat().st_mtime < max(
                    p.stat().st_mtime for p in _ZSTD_DIR.rglob("*.[ch]"))):
            _build_zstd()
        _zstd_lib = ctypes.CDLL(str(_ZSTD_SO))
        _zstd_lib.ZSTD_compress.restype = ctypes.c_size_t
        _zstd_lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int]
        _zstd_lib.ZSTD_decompress.restype = ctypes.c_size_t
        _zstd_lib.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t]
        _zstd_lib.ZSTD_compressBound.restype = ctypes.c_size_t
        _zstd_lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        _zstd_lib.ZSTD_isError.restype = ctypes.c_uint
        _zstd_lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _zstd_lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
        _zstd_lib.ZSTD_getFrameContentSize.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t]
except Exception:  # pragma: no cover - toolchain unavailable
    _zstd_lib = None

HAVE_ZSTD135 = _zstd_lib is not None


def zstd135_compress(data: bytes, level: int) -> bytes:
    """Single-shot ZSTD_compress with the vendored 1.3.5 encoder —
    byte-identical frames to the reference's sz_lossless_compress
    (utility.c:174 -> ZSTD_compress)."""
    bound = _zstd_lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    r = _zstd_lib.ZSTD_compress(dst, bound, data, len(data), level)
    if _zstd_lib.ZSTD_isError(r):
        raise RuntimeError(f"ZSTD_compress error code {r}")
    return dst.raw[:r]


def zstd135_decompress(blob: bytes, expected_size: int) -> bytes:
    dst = ctypes.create_string_buffer(expected_size)
    r = _zstd_lib.ZSTD_decompress(dst, expected_size, blob, len(blob))
    if _zstd_lib.ZSTD_isError(r):
        raise RuntimeError(f"ZSTD_decompress error code {r}")
    return dst.raw[:r]


def zstd135_frame_content_size(blob: bytes) -> int:
    """ZSTD_getFrameContentSize: size from the frame header, or <0
    sentinel values mapped to -1 (unknown / error)."""
    v = _zstd_lib.ZSTD_getFrameContentSize(blob, len(blob))
    # ZSTD_CONTENTSIZE_UNKNOWN = -1, _ERROR = -2 (as unsigned long long)
    if v >= 2**64 - 2:
        return -1
    return int(v)

# Raise glibc's mmap threshold so the codec's large numpy temporaries
# (type lattices, masks — tens to hundreds of MB per call) come from
# the reusable brk heap instead of fresh mmaps that are returned to the
# OS on free and page-fault again on the next call (on VMs that hand
# freed pages back to the hypervisor this costs ~7 MB/s per call).
# Standard big-array tuning (glibc itself auto-raises the threshold to
# 32 MB); opt out with SZ_TPU_MALLOC_TUNE=0.
if os.environ.get("SZ_TPU_MALLOC_TUNE", "1") != "0":
    try:
        _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        _libc.mallopt(ctypes.c_int(-3), ctypes.c_int(2**31 - 1))
    except Exception:  # pragma: no cover - non-glibc
        pass

_lib.seq_sum_f32.restype = ctypes.c_float
_lib.seq_sum_f64.restype = ctypes.c_double
_lib.huff_encode.restype = ctypes.c_int64
_lib.huff_total_bits.restype = ctypes.c_int64
_lib.huff_encode_u16.restype = ctypes.c_int64
_lib.huff_total_bits_u16.restype = ctypes.c_int64
_lib.huff_fsm_decode.restype = ctypes.c_int64
_lib.huff_fsm_decode2.restype = ctypes.c_int64
_lib.huff_fsm_decode_par.restype = ctypes.c_int64
_lib.huff_tree_decode.restype = ctypes.c_int64


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def seq_sum(vals: np.ndarray):
    """Strictly-ordered accumulation in the array dtype."""
    vals = np.ascontiguousarray(vals)
    n = ctypes.c_int64(vals.size)
    if vals.dtype == np.float32:
        return np.float32(_lib.seq_sum_f32(_ptr(vals), n))
    if vals.dtype == np.float64:
        return np.float64(_lib.seq_sum_f64(_ptr(vals), n))
    raise TypeError(vals.dtype)


def huff_encode(syms: np.ndarray, code_hi: np.ndarray, code_lo: np.ndarray,
                code_len: np.ndarray) -> bytes:
    code_hi = np.ascontiguousarray(code_hi, dtype=np.uint64)
    code_lo = np.ascontiguousarray(code_lo, dtype=np.uint64)
    lens = np.ascontiguousarray(code_len, dtype=np.uint8)
    if syms.dtype == np.uint16 and syms.flags.c_contiguous:
        total_bits = int(_lib.huff_total_bits_u16(
            _ptr(syms), ctypes.c_int64(syms.size), _ptr(lens)))
        out = np.zeros((total_bits + 7) // 8, dtype=np.uint8)
        if total_bits:
            _lib.huff_encode_u16(_ptr(syms), ctypes.c_int64(syms.size),
                                 _ptr(code_hi), _ptr(code_lo), _ptr(lens),
                                 _ptr(out))
        return out.tobytes()
    syms = np.ascontiguousarray(syms, dtype=np.int32)
    if syms.size >= (1 << 20):
        # Chunk-parallel pack: identical bytes, OpenMP over chunks.
        nchunks = 32
        bits = np.zeros(nchunks, np.int64)
        _lib.huff_chunk_bits(_ptr(syms), ctypes.c_int64(syms.size),
                             _ptr(lens), ctypes.c_int(nchunks), _ptr(bits))
        total_bits = int(bits.sum())
        out = np.zeros((total_bits + 7) // 8, dtype=np.uint8)
        if total_bits:
            _lib.huff_encode_chunks(
                _ptr(syms), ctypes.c_int64(syms.size), _ptr(code_hi),
                _ptr(code_lo), _ptr(lens), ctypes.c_int(nchunks),
                _ptr(bits), _ptr(out))
        return out.tobytes()
    total_bits = int(_lib.huff_total_bits(_ptr(syms),
                                          ctypes.c_int64(syms.size),
                                          _ptr(lens)))
    out = np.zeros((total_bits + 7) // 8, dtype=np.uint8)
    if total_bits:
        _lib.huff_encode(_ptr(syms), ctypes.c_int64(syms.size),
                         _ptr(code_hi), _ptr(code_lo), _ptr(lens),
                         _ptr(out))
    return out.tobytes()


def pack_w_bits(vals: np.ndarray, w: int) -> bytes:
    """MSB-first fixed-width (w < 8) bit pack, zero-padded to a byte
    (convertIntArray2ByteArray_fast_dynamic, TypeManager.c:377)."""
    vals = np.ascontiguousarray(vals, np.uint8)
    n = vals.size
    out = np.zeros((n * w + 7) // 8, np.uint8)
    if n:
        _lib.pack_w_bits(_ptr(vals), ctypes.c_int64(n), ctypes.c_int(w),
                         _ptr(out))
    return out.tobytes()


def pack_wide_bits_u32(vals: np.ndarray, w: int) -> np.ndarray:
    """MSB-first fixed-width (w <= 24) bit pack of int32 symbols,
    returned as native uint32 words whose value order matches the
    big-endian bit stream (word k = stream bits [32k, 32k+32), MSB
    first).  One pad word is appended so a device unpack may always
    gather word k+1."""
    vals = np.ascontiguousarray(vals, np.int32)
    n = vals.size
    nbytes = (n * w + 7) // 8
    nwords = (nbytes + 3) // 4 + 1
    out = np.zeros(nwords * 4, np.uint8)
    if n:
        _lib.pack_wide_bits(_ptr(vals), ctypes.c_int64(n),
                            ctypes.c_int(w), _ptr(out))
    return out.view(">u4").astype(np.uint32)


def huff_fsm_build(L, R, C, T):
    """(state, byte) -> (next_state, emitted symbols) tables, OpenMP
    over states.  Same contract as huffman._fsm_tables."""
    n_nodes = len(L)
    next_state = np.zeros((n_nodes, 256), np.int32)
    emit_cnt = np.zeros((n_nodes, 256), np.int8)
    emit_syms = np.zeros((n_nodes, 256, 8), np.int32)
    _lib.huff_fsm_build(
        _ptr(np.ascontiguousarray(L, np.int32)),
        _ptr(np.ascontiguousarray(R, np.int32)),
        _ptr(np.ascontiguousarray(C, np.int32)),
        _ptr(np.ascontiguousarray(T, np.uint8)),
        ctypes.c_int64(n_nodes),
        _ptr(next_state), _ptr(emit_cnt), _ptr(emit_syms))
    return next_state, emit_cnt, emit_syms


def huff_fsm_build2(L, R, C, T):
    """Compact byte-FSM: 16-byte (state, byte) entries with the first
    two emitted symbols inline (one cache line per decode step), plus
    a 4-byte packed (next | cnt<<28) mirror for count-only passes."""
    n_nodes = len(L)
    tab = np.zeros(n_nodes * 256 * 16, np.uint8)
    packed = np.zeros(n_nodes * 256, np.uint32)
    _lib.huff_fsm_build2(
        _ptr(np.ascontiguousarray(L, np.int32)),
        _ptr(np.ascontiguousarray(R, np.int32)),
        _ptr(np.ascontiguousarray(C, np.int32)),
        _ptr(np.ascontiguousarray(T, np.uint8)),
        ctypes.c_int64(n_nodes), _ptr(tab), _ptr(packed))
    return tab, packed


def huff_fsm_decode2(tabs, L, R, C, T, data: np.ndarray,
                     out: np.ndarray) -> np.ndarray:
    """Speculative chunk-parallel FSM decode (self-synchronizing
    Huffman chunks; serial compact-FSM fallback for short streams)."""
    tab, packed = tabs
    _lib.huff_fsm_decode_par(
        _ptr(tab), _ptr(packed),
        _ptr(np.ascontiguousarray(L, np.int32)),
        _ptr(np.ascontiguousarray(R, np.int32)),
        _ptr(np.ascontiguousarray(C, np.int32)),
        _ptr(np.ascontiguousarray(T, np.uint8)),
        _ptr(np.ascontiguousarray(data, np.uint8)),
        ctypes.c_int64(data.size), _ptr(out), ctypes.c_int64(out.size))
    return out


def huff_fsm_decode(next_state: np.ndarray, emit_cnt: np.ndarray,
                    emit_syms: np.ndarray, data: np.ndarray,
                    out: np.ndarray) -> np.ndarray:
    _lib.huff_fsm_decode(
        _ptr(np.ascontiguousarray(next_state, np.int32)),
        _ptr(np.ascontiguousarray(emit_cnt, np.int8)),
        _ptr(np.ascontiguousarray(emit_syms, np.int32)),
        _ptr(np.ascontiguousarray(data, np.uint8)),
        ctypes.c_int64(data.size), _ptr(out), ctypes.c_int64(out.size))
    return out


def huff_tree_decode(L, R, C, T, data: np.ndarray,
                     count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.int32)
    _lib.huff_tree_decode(
        _ptr(np.ascontiguousarray(L, np.int32)),
        _ptr(np.ascontiguousarray(R, np.int32)),
        _ptr(np.ascontiguousarray(C, np.int32)),
        _ptr(np.ascontiguousarray(T, np.uint8)),
        _ptr(np.ascontiguousarray(data, np.uint8)),
        ctypes.c_int64(data.size), _ptr(out), ctypes.c_int64(count))
    return out


def coeff_chain(coeffs: np.ndarray, precision: np.ndarray, use_mean: bool,
                capacity: int, radius: int):
    """Encode-side coefficient chain.  Returns (ctypes[nc,nreg],
    unpred list per coeff, qcoeffs[nreg,nc])."""
    T = coeffs.dtype.type
    nreg, nc = coeffs.shape
    ct = np.zeros((nc, max(nreg, 1)), dtype=np.int32)
    unpred = np.zeros((nc, max(nreg, 1)), dtype=T)
    ucnt = np.zeros(8, dtype=np.int64)
    qc = np.zeros((nreg, nc), dtype=T)
    if nreg:
        fn = (_lib.coeff_chain_f32 if T is np.float32
              else _lib.coeff_chain_f64)
        fn(_ptr(np.ascontiguousarray(coeffs)), ctypes.c_int64(nreg),
           ctypes.c_int(nc), _ptr(np.ascontiguousarray(precision, T)),
           ctypes.c_int(1 if use_mean else 0), _ptr(ct), _ptr(unpred),
           _ptr(ucnt), _ptr(qc), ctypes.c_int(capacity),
           ctypes.c_int(radius))
    ulist = [unpred[e, :ucnt[e]].copy() for e in range(nc)]
    return ct[:, :nreg], ulist, qc


def coeff_chain_decode(ctypes_arr: np.ndarray, precision: np.ndarray,
                       cradius: np.ndarray, unpred_list, T) -> np.ndarray:
    nc, nreg = ctypes_arr.shape
    stride = max([len(u) for u in unpred_list] + [1])
    up = np.zeros((nc, stride), dtype=T)
    for e, u in enumerate(unpred_list):
        up[e, :len(u)] = u
    qc = np.zeros((nreg, nc), dtype=T)
    fn = (_lib.coeff_chain_decode_f32 if T is np.float32
          else _lib.coeff_chain_decode_f64)
    fn(_ptr(np.ascontiguousarray(ctypes_arr, np.int32)),
       ctypes.c_int64(nreg), ctypes.c_int(nc),
       _ptr(np.ascontiguousarray(precision, T)),
       _ptr(np.ascontiguousarray(cradius, np.int32)), _ptr(up),
       _ptr(np.array([stride], dtype=np.int64)), _ptr(qc))
    return qc


def v_log2(x: np.ndarray) -> np.ndarray:
    """Elementwise libm log2 (glibc scalar, not numpy SIMD) — last-ulp
    parity with the reference binary's pre-log transform."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(x)
    _lib.v_log2_f64(_ptr(x), _ptr(out), ctypes.c_int64(x.size))
    return out


def v_exp2(x: np.ndarray) -> np.ndarray:
    """Elementwise libm exp2."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(x)
    _lib.v_exp2_f64(_ptr(x), _ptr(out), ctypes.c_int64(x.size))
    return out


_lib.huff_block_sizes.restype = ctypes.c_int64


def huff_encode_blocks(syms: np.ndarray, code_hi: np.ndarray,
                       code_lo: np.ndarray, code_len: np.ndarray):
    """Encode (nb, ncell) int32 symbols with one shared table into
    byte-aligned per-block streams.  Returns (sizes u32[nb], bytes)."""
    syms = np.ascontiguousarray(syms, dtype=np.int32)
    nb, ncell = syms.shape
    code_hi = np.ascontiguousarray(code_hi, dtype=np.uint64)
    code_lo = np.ascontiguousarray(code_lo, dtype=np.uint64)
    lens = np.ascontiguousarray(code_len, dtype=np.uint8)
    sizes = np.zeros(nb, dtype=np.uint32)
    total = int(_lib.huff_block_sizes(_ptr(syms), ctypes.c_int64(nb),
                                      ctypes.c_int64(ncell), _ptr(lens),
                                      _ptr(sizes)))
    out = np.zeros(total, dtype=np.uint8)
    if total:
        _lib.huff_encode_blocks(_ptr(syms), ctypes.c_int64(nb),
                                ctypes.c_int64(ncell), _ptr(code_hi),
                                _ptr(code_lo), _ptr(lens), _ptr(sizes),
                                _ptr(out))
    return sizes, out.tobytes()


_lib.huff_build_tree.restype = ctypes.c_int64


def huff_build_tree(freq: np.ndarray, state_num: int, node_count: int):
    """Reference-exact Huffman tree build.  Returns
    (code_hi, code_lo, code_len, L, R, C, T) or None if the stream has
    no symbols (caller falls back)."""
    freq = np.ascontiguousarray(freq, dtype=np.int64)
    code_hi = np.zeros(state_num, dtype=np.uint64)
    code_lo = np.zeros(state_num, dtype=np.uint64)
    code_len = np.zeros(state_num, dtype=np.uint8)
    L = np.zeros(node_count, dtype=np.uint32)
    R = np.zeros(node_count, dtype=np.uint32)
    C = np.zeros(node_count, dtype=np.uint32)
    T = np.zeros(node_count, dtype=np.uint8)
    rc = int(_lib.huff_build_tree(
        _ptr(freq), ctypes.c_int64(freq.size), ctypes.c_int64(state_num),
        _ptr(code_hi), _ptr(code_lo), _ptr(code_len),
        _ptr(L), _ptr(R), _ptr(C), _ptr(T)))
    if rc < 0:
        return None
    assert rc == node_count
    return code_hi, code_lo, code_len, L, R, C, T


def ra_encode_blocks(blocks: np.ndarray, rank: int, bs: int,
                     lor: np.ndarray, qc: np.ndarray, rp: float,
                     cap: int, radius: int, use_mean: bool,
                     mean: float) -> np.ndarray:
    """Random-access per-block quantize (types out)."""
    blocks = np.ascontiguousarray(blocks, dtype=np.float32)
    nb, ncell = blocks.shape
    lor = np.ascontiguousarray(lor, dtype=np.uint8)
    qc = np.ascontiguousarray(qc, dtype=np.float32)
    types = np.zeros((nb, ncell), dtype=np.int32)
    _lib.ra_encode_blocks_f32(
        _ptr(blocks), ctypes.c_int64(nb), ctypes.c_int(rank),
        ctypes.c_int(bs), _ptr(lor), _ptr(qc),
        ctypes.c_int(qc.shape[1]), ctypes.c_double(rp),
        ctypes.c_int(cap), ctypes.c_int(radius),
        ctypes.c_int(1 if use_mean else 0), ctypes.c_float(mean),
        _ptr(types))
    return types


def ra_decode_blocks(types: np.ndarray, rank: int, bs: int,
                     lor: np.ndarray, qc: np.ndarray, rp: float,
                     radius: int, use_mean: bool, mean: float,
                     unpred: np.ndarray,
                     esc_base: np.ndarray) -> np.ndarray:
    """Random-access per-block reconstruct."""
    types = np.ascontiguousarray(types, dtype=np.int32)
    nsel, ncell = types.shape
    lor = np.ascontiguousarray(lor, dtype=np.uint8)
    qc = np.ascontiguousarray(qc, dtype=np.float32)
    unpred = np.ascontiguousarray(unpred, dtype=np.float32)
    esc_base = np.ascontiguousarray(esc_base, dtype=np.int64)
    out = np.zeros((nsel, ncell), dtype=np.float32)
    _lib.ra_decode_blocks_f32(
        _ptr(types), ctypes.c_int64(nsel), ctypes.c_int(rank),
        ctypes.c_int(bs), _ptr(lor), _ptr(qc),
        ctypes.c_int(qc.shape[1]), ctypes.c_double(rp),
        ctypes.c_int(radius), ctypes.c_int(1 if use_mean else 0),
        ctypes.c_float(mean), _ptr(unpred), _ptr(esc_base), _ptr(out))
    return out


def huff_tree_decode_blocks(L, R, C, T, data: bytes, offsets: np.ndarray,
                            sizes: np.ndarray, count: int) -> np.ndarray:
    """Decode nsel per-block bitstreams of `count` symbols each."""
    L = np.ascontiguousarray(L, dtype=np.int32)
    R = np.ascontiguousarray(R, dtype=np.int32)
    C = np.ascontiguousarray(C, dtype=np.int32)
    T = np.ascontiguousarray(T, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.uint16)
    nsel = offsets.size
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros((nsel, count), dtype=np.int32)
    _lib.huff_tree_decode_blocks(
        _ptr(L), _ptr(R), _ptr(C), _ptr(T), _ptr(buf), _ptr(offsets),
        _ptr(sizes), ctypes.c_int64(nsel), ctypes.c_int64(count),
        _ptr(out))
    return out



_lib.classic1d_encode_f32.restype = ctypes.c_int64
_lib.classic1d_encode_f64.restype = ctypes.c_int64


def exact_stream(vals: np.ndarray, req_length: int, median, raw: bool,
                 prev: bytes):
    """Batched exact-value escape stream.  Returns
    (lead u8[n], mid bytes, resi u8[<=n], recon, new_prev)."""
    T = vals.dtype.type
    vals = np.ascontiguousarray(vals)
    n = vals.size
    rb = req_length // 8
    lead = np.zeros(max(n, 1), np.uint8)
    mid = np.zeros(max(n * max(rb, 1), 1), np.uint8)
    resi = np.zeros(max(n, 1), np.uint8)
    recon = np.zeros(n, vals.dtype)
    prev_io = np.zeros(8, np.uint8)
    prev_io[:len(prev)] = np.frombuffer(prev, np.uint8)
    nmid = np.zeros(1, np.int64)
    if T is np.float32:
        _lib.exact_stream_f32(_ptr(vals), ctypes.c_int64(n),
                              ctypes.c_int(req_length),
                              ctypes.c_float(median),
                              ctypes.c_int(1 if raw else 0), _ptr(prev_io),
                              _ptr(lead), _ptr(mid), _ptr(nmid),
                              _ptr(resi), _ptr(recon))
        esize = 4
    else:
        _lib.exact_stream_f64(_ptr(vals), ctypes.c_int64(n),
                              ctypes.c_int(req_length),
                              ctypes.c_double(median),
                              ctypes.c_int(1 if raw else 0), _ptr(prev_io),
                              _ptr(lead), _ptr(mid), _ptr(nmid),
                              _ptr(resi), _ptr(recon))
        esize = 8
    has_resi = (req_length % 8) != 0 and rb < esize
    return (lead[:n], mid[:int(nmid[0])].tobytes(),
            resi[:n] if has_resi else resi[:0],
            recon, prev_io[:esize].tobytes())


def classic1d_encode(x: np.ndarray, rp, rp64: float, intervals: int,
                     radius: int, req_length: int, median,
                     subblock: bool):
    """Classic 1D MDQ encode.  Returns (types, lead u8, mid bytes,
    resi u8 entries, n_exact)."""
    T = x.dtype.type
    x = np.ascontiguousarray(x)
    n = x.size
    rb = req_length // 8
    types = np.zeros(n, np.int32)
    lead = np.zeros(max(n, 1), np.uint8)
    mid = np.zeros(max(n * max(rb, 1), 1), np.uint8)
    resi = np.zeros(max(n, 1), np.uint8)
    nmid = np.zeros(1, np.int64)
    if T is np.float32:
        cnt = int(_lib.classic1d_encode_f32(
            _ptr(x), ctypes.c_int64(n), ctypes.c_float(rp),
            ctypes.c_double(rp64), ctypes.c_int(intervals),
            ctypes.c_int(radius), ctypes.c_int(req_length),
            ctypes.c_float(median), ctypes.c_int(1 if subblock else 0),
            _ptr(types), _ptr(lead), _ptr(mid), _ptr(nmid), _ptr(resi)))
        esize = 4
    else:
        cnt = int(_lib.classic1d_encode_f64(
            _ptr(x), ctypes.c_int64(n), ctypes.c_double(rp),
            ctypes.c_double(rp64), ctypes.c_int(intervals),
            ctypes.c_int(radius), ctypes.c_int(req_length),
            ctypes.c_double(median), ctypes.c_int(1 if subblock else 0),
            _ptr(types), _ptr(lead), _ptr(mid), _ptr(nmid), _ptr(resi)))
        esize = 8
    has_resi = (req_length % 8) != 0 and rb < esize
    return (types, lead[:cnt], mid[:int(nmid[0])].tobytes(),
            resi[:cnt] if has_resi else resi[:0], cnt)


def classic1d_decode(types: np.ndarray, interval2, radius: int,
                     req_length: int, median, raw: bool, lead: np.ndarray,
                     mid: bytes, resi: bytes, T) -> np.ndarray:
    types = np.ascontiguousarray(types, np.int32)
    n = types.size
    lead = np.ascontiguousarray(lead, np.uint8)
    midb = np.frombuffer(mid, np.uint8) if len(mid) else np.zeros(1, np.uint8)
    resb = (np.frombuffer(resi, np.uint8) if len(resi)
            else np.zeros(1, np.uint8))
    out = np.zeros(n, T)
    if T is np.float32:
        _lib.classic1d_decode_f32(
            _ptr(types), ctypes.c_int64(n), ctypes.c_float(interval2),
            ctypes.c_int(radius), ctypes.c_int(req_length),
            ctypes.c_float(median), ctypes.c_int(1 if raw else 0),
            _ptr(lead), _ptr(midb), _ptr(resb), _ptr(out))
    else:
        _lib.classic1d_decode_f64(
            _ptr(types), ctypes.c_int64(n), ctypes.c_double(interval2),
            ctypes.c_int(radius), ctypes.c_int(req_length),
            ctypes.c_double(median), ctypes.c_int(1 if raw else 0),
            _ptr(lead), _ptr(midb), _ptr(resb), _ptr(out))
    return out


def ra_coeff_chain(coeffs: np.ndarray, prec, cap: int, radius: int):
    """RA coefficient chain (double division).  Returns
    (ctypes (nc,nreg), unpred list, qcoeffs (nreg,nc))."""
    coeffs = np.ascontiguousarray(coeffs, np.float32)
    nreg, nc = coeffs.shape
    prec = np.ascontiguousarray(prec, np.float64)
    ct = np.zeros((nc, max(nreg, 1)), np.int32)
    unpred = np.zeros((nc, max(nreg, 1)), np.float32)
    ucnt = np.zeros(nc, np.int64)
    qc = np.zeros((nreg, nc), np.float32)
    _lib.ra_coeff_chain_f32(_ptr(coeffs), ctypes.c_int64(nreg),
                            ctypes.c_int(nc), _ptr(prec),
                            ctypes.c_int(cap), ctypes.c_int(radius),
                            _ptr(ct), _ptr(unpred), _ptr(ucnt), _ptr(qc))
    ulist = [unpred[e, :ucnt[e]].copy() for e in range(nc)]
    return ct[:, :nreg], ulist, qc


def ra_coeff_chain_decode(ctypes_arr: np.ndarray, prec, cradius,
                          unpred_list, nreg: int) -> np.ndarray:
    ctypes_arr = np.ascontiguousarray(ctypes_arr, np.int32)
    nc = ctypes_arr.shape[0]
    prec = np.ascontiguousarray(prec, np.float64)
    rad = np.ascontiguousarray(cradius, np.int32)
    lens = [len(u) for u in unpred_list]
    off = np.zeros(nc, np.int64)
    np.cumsum(lens[:-1], out=off[1:])
    flat = (np.concatenate([np.asarray(u, np.float32)
                            for u in unpred_list])
            if sum(lens) else np.zeros(1, np.float32))
    qc = np.zeros((nreg, nc), np.float32)
    if ctypes_arr.shape[1] != nreg:
        ctypes_arr = np.ascontiguousarray(ctypes_arr[:, :nreg])
    _lib.ra_coeff_chain_decode_f32(_ptr(ctypes_arr),
                                   ctypes.c_int64(nreg), ctypes.c_int(nc),
                                   _ptr(prec), _ptr(rad), _ptr(flat),
                                   _ptr(off), _ptr(qc))
    return qc


_lib.msst19_encode_f32.restype = ctypes.c_int64
_lib.msst19_encode_f64.restype = ctypes.c_int64
_lib.msst19_encode_wf_f32.restype = ctypes.c_int64
_lib.msst19_encode_wf_f64.restype = ctypes.c_int64


def msst19_encode(data: np.ndarray, table: np.ndarray, base_index: int,
                  top_index: int, bits: int, ptable: np.ndarray,
                  req_length: int):
    """MSST19 multiplicative encode (1D/2D/3D).  Returns
    (types, lead u8[cnt], mid bytes, resi u8 entries, cnt)."""
    T = data.dtype.type
    x = np.ascontiguousarray(data)
    rank = x.ndim
    if rank == 1:
        r1, r2, r3 = 1, 1, x.shape[0]
    elif rank == 2:
        r1, r2, r3 = 1, x.shape[0], x.shape[1]
    else:
        r1, r2, r3 = x.shape
    n = x.size
    rb = req_length // 8
    table = np.ascontiguousarray(table, np.uint16)
    ptable = np.ascontiguousarray(ptable, np.float64)
    types = np.zeros(n, np.int32)
    lead = np.zeros(max(n, 1), np.uint8)
    mid = np.zeros(max(n * max(rb, 1), 1), np.uint8)
    resi = np.zeros(max(n, 1), np.uint8)
    nmid = np.zeros(1, np.int64)
    if rank >= 2 and n >= _CLASSIC_WF_MIN:
        # blocked-wavefront tiles (bit-identical; OpenMP anti-diagonals)
        fn = _lib.msst19_encode_wf_f32 if T is np.float32 \
            else _lib.msst19_encode_wf_f64
        cnt = int(fn(_ptr(x), ctypes.c_int(rank), ctypes.c_int64(r1),
                     ctypes.c_int64(r2), ctypes.c_int64(r3), _ptr(table),
                     ctypes.c_int64(base_index),
                     ctypes.c_int64(top_index),
                     ctypes.c_int(bits), ctypes.c_int64(table.shape[1]),
                     _ptr(ptable), ctypes.c_int(req_length),
                     ctypes.c_int(_CLASSIC_WF_BS), _ptr(types),
                     _ptr(lead), _ptr(mid), _ptr(nmid), _ptr(resi)))
    else:
        fn = _lib.msst19_encode_f32 if T is np.float32 \
            else _lib.msst19_encode_f64
        cnt = int(fn(_ptr(x), ctypes.c_int(rank), ctypes.c_int64(r1),
                     ctypes.c_int64(r2), ctypes.c_int64(r3), _ptr(table),
                     ctypes.c_int64(base_index),
                     ctypes.c_int64(top_index),
                     ctypes.c_int(bits), ctypes.c_int64(table.shape[1]),
                     _ptr(ptable), ctypes.c_int(req_length), _ptr(types),
                     _ptr(lead), _ptr(mid), _ptr(nmid), _ptr(resi)))
    esize = 4 if T is np.float32 else 8
    has_resi = (req_length % 8) != 0 and rb < esize
    return (types, lead[:cnt], mid[:int(nmid[0])].tobytes(),
            resi[:cnt] if has_resi else resi[:0], cnt)


def msst19_decode(types: np.ndarray, shape, ptable: np.ndarray,
                  req_length: int, lead: np.ndarray, mid: bytes,
                  resi: bytes, T) -> np.ndarray:
    types = np.ascontiguousarray(types, np.int32)
    rank = len(shape)
    if rank == 1:
        r1, r2, r3 = 1, 1, shape[0]
    elif rank == 2:
        r1, r2, r3 = 1, shape[0], shape[1]
    else:
        r1, r2, r3 = shape
    ptable = np.ascontiguousarray(ptable, np.float64)
    lead = np.ascontiguousarray(lead, np.uint8)
    midb = np.frombuffer(mid, np.uint8) if len(mid) else np.zeros(1, np.uint8)
    resb = (np.frombuffer(resi, np.uint8) if len(resi)
            else np.zeros(1, np.uint8))
    out = np.zeros(types.size, T)
    if rank >= 2 and types.size >= _CLASSIC_WF_MIN:
        fn = _lib.msst19_decode_wf_f32 if T is np.float32 \
            else _lib.msst19_decode_wf_f64
        fn(_ptr(types), ctypes.c_int(rank), ctypes.c_int64(r1),
           ctypes.c_int64(r2), ctypes.c_int64(r3), _ptr(ptable),
           ctypes.c_int(req_length), _ptr(lead), _ptr(midb), _ptr(resb),
           ctypes.c_int64(int(lead.size)),
           ctypes.c_int(_CLASSIC_WF_BS), _ptr(out))
        return out
    fn = _lib.msst19_decode_f32 if T is np.float32 \
        else _lib.msst19_decode_f64
    fn(_ptr(types), ctypes.c_int(rank), ctypes.c_int64(r1),
       ctypes.c_int64(r2), ctypes.c_int64(r3), _ptr(ptable),
       ctypes.c_int(req_length), _ptr(lead), _ptr(midb), _ptr(resb),
       _ptr(out))
    return out


_lib.range_scan_f32.restype = ctypes.c_int
_lib.range_scan_f64.restype = ctypes.c_int
_lib.i32_hist.restype = ctypes.c_int64


def range_scan(flat: np.ndarray):
    """(fmin, fmax, near, signs u8[n], positive) in one native pass."""
    T = flat.dtype.type
    flat = np.ascontiguousarray(flat)
    n = flat.size
    signs = np.zeros(n, np.uint8)
    if T is np.float32:
        mn = ctypes.c_float(0); mx = ctypes.c_float(0)
        nr = ctypes.c_float(0)
        pos = _lib.range_scan_f32(_ptr(flat), ctypes.c_int64(n),
                                  _ptr(signs), ctypes.byref(mn),
                                  ctypes.byref(mx), ctypes.byref(nr))
    else:
        mn = ctypes.c_double(0); mx = ctypes.c_double(0)
        nr = ctypes.c_double(0)
        pos = _lib.range_scan_f64(_ptr(flat), ctypes.c_int64(n),
                                  _ptr(signs), ctypes.byref(mn),
                                  ctypes.byref(mx), ctypes.byref(nr))
    return T(mn.value), T(mx.value), T(nr.value), signs, bool(pos)


_lib.i32_hist.restype = ctypes.c_int64
_lib.i32_hist_mt.restype = ctypes.c_int64


def i32_hist(x: np.ndarray, nbins: int):
    """int32 histogram; None if any value falls outside [0, nbins)."""
    x = np.ascontiguousarray(x, np.int32)
    hist = np.zeros(nbins, np.int64)
    fn = _lib.i32_hist_mt if x.size >= (1 << 20) else _lib.i32_hist
    rc = int(fn(_ptr(x), ctypes.c_int64(x.size), _ptr(hist),
                ctypes.c_int64(nbins)))
    return None if rc < 0 else hist


_lib.regnd_encode3d_f32.restype = ctypes.c_int64
_lib.regnd_encode3d_f64.restype = ctypes.c_int64
_lib.regnd_encode3d_wf_f32.restype = ctypes.c_int64
_lib.regnd_encode3d_wf_f64.restype = ctypes.c_int64
_lib.regnd_encode2d_wf_f32.restype = ctypes.c_int64
_lib.regnd_encode2d_wf_f64.restype = ctypes.c_int64
_lib.regnd_encode2d_f32.restype = ctypes.c_int64
_lib.regnd_encode2d_f64.restype = ctypes.c_int64


def _geo(db):
    return (np.array([db.start(i) for i in range(db.num)], np.int64),
            np.array([db.count(i) for i in range(db.num)], np.int64))


def regnd_encode(data: np.ndarray, dbs, use_reg: np.ndarray,
                 qcoeffs: np.ndarray, rp, recip, intervals: int,
                 use_mean: bool, mean):
    """Blocked-regression point quantization (2D/3D).  Returns
    (result_type i32[n], unpred values)."""
    T = data.dtype.type
    data = np.ascontiguousarray(data)
    rank = data.ndim
    n = data.size
    result_type = np.zeros(n, np.int32)
    unpred = np.zeros(n, T)
    ur = np.ascontiguousarray(use_reg, np.uint8)
    qc = np.ascontiguousarray(qcoeffs, T)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    geos = [_geo(db) for db in dbs]
    if rank == 3:
        (xo, xc), (yo, yc), (zo, zc) = geos
        nb = len(xo) * len(yo) * len(zo)
        if nb >= 64:
            # wavefront over block anti-diagonals, OpenMP within each;
            # byte-identical to the serial strip kernel
            fn = (_lib.regnd_encode3d_wf_f32 if T is np.float32
                  else _lib.regnd_encode3d_wf_f64)
            ucnt = int(fn(
                _ptr(data), ctypes.c_int64(data.shape[0]),
                ctypes.c_int64(data.shape[1]),
                ctypes.c_int64(data.shape[2]),
                _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
                _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
                _ptr(zo), _ptr(zc), ctypes.c_int64(len(zo)),
                _ptr(ur), _ptr(qc),
                cF(rp), cF(recip), ctypes.c_int(int(intervals)),
                ctypes.c_int(1 if use_mean else 0), cF(mean),
                _ptr(result_type), _ptr(unpred)))
            return result_type, unpred[:ucnt].copy()
        fn = (_lib.regnd_encode3d_f32 if T is np.float32
              else _lib.regnd_encode3d_f64)
        ucnt = int(fn(
            _ptr(data), ctypes.c_int64(data.shape[0]),
            ctypes.c_int64(data.shape[1]), ctypes.c_int64(data.shape[2]),
            _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
            _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
            _ptr(zo), _ptr(zc), ctypes.c_int64(len(zo)),
            ctypes.c_int64(dbs[0].early), _ptr(ur), _ptr(qc),
            cF(rp), cF(recip), ctypes.c_int(int(intervals)),
            ctypes.c_int(1 if use_mean else 0), cF(mean),
            _ptr(result_type), _ptr(unpred)))
    else:
        (xo, xc), (yo, yc) = geos
        nb = len(xo) * len(yo)
        if nb >= 64:
            fn = (_lib.regnd_encode2d_wf_f32 if T is np.float32
                  else _lib.regnd_encode2d_wf_f64)
            ucnt = int(fn(
                _ptr(data), ctypes.c_int64(data.shape[0]),
                ctypes.c_int64(data.shape[1]),
                _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
                _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
                _ptr(ur), _ptr(qc),
                cF(rp), cF(recip), ctypes.c_int(int(intervals)),
                _ptr(result_type), _ptr(unpred)))
            return result_type, unpred[:ucnt].copy()
        fn = (_lib.regnd_encode2d_f32 if T is np.float32
              else _lib.regnd_encode2d_f64)
        ucnt = int(fn(
            _ptr(data), ctypes.c_int64(data.shape[0]),
            ctypes.c_int64(data.shape[1]),
            _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
            _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
            ctypes.c_int64(dbs[0].early), _ptr(ur), _ptr(qc),
            cF(rp), cF(recip), ctypes.c_int(int(intervals)),
            ctypes.c_int(1 if use_mean else 0), cF(mean),
            _ptr(result_type), _ptr(unpred)))
    return result_type, unpred[:ucnt].copy()


def regnd_decode(types: np.ndarray, shape, dbs, indicator: np.ndarray,
                 qcoeffs: np.ndarray, unpred: np.ndarray, intervals: int,
                 rp, use_mean: bool, mean, T) -> np.ndarray:
    """Blocked-regression reconstruction (2D/3D)."""
    types = np.ascontiguousarray(types, np.int32)
    rank = len(shape)
    out = np.zeros(int(np.prod(shape)), T)
    ind = np.ascontiguousarray(indicator, np.uint8)
    qc = np.ascontiguousarray(qcoeffs, T)
    up = (np.ascontiguousarray(unpred, T) if len(unpred)
          else np.zeros(1, T))
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    geos = [_geo(db) for db in dbs]
    if rank == 3:
        (xo, xc), (yo, yc), (zo, zc) = geos
        nb = len(xo) * len(yo) * len(zo)
        if nb >= 64:
            fn = (_lib.regnd_decode3d_wf_f32 if T is np.float32
                  else _lib.regnd_decode3d_wf_f64)
        else:
            fn = (_lib.regnd_decode3d_f32 if T is np.float32
                  else _lib.regnd_decode3d_f64)
        fn(_ptr(types), ctypes.c_int64(shape[0]),
           ctypes.c_int64(shape[1]), ctypes.c_int64(shape[2]),
           _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
           _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
           _ptr(zo), _ptr(zc), ctypes.c_int64(len(zo)),
           _ptr(ind), _ptr(qc), _ptr(up), cF(rp),
           ctypes.c_int(int(intervals)),
           ctypes.c_int(1 if use_mean else 0), cF(mean), _ptr(out))
    else:
        (xo, xc), (yo, yc) = geos
        nb = len(xo) * len(yo)
        if nb >= 64:
            fn = (_lib.regnd_decode2d_wf_f32 if T is np.float32
                  else _lib.regnd_decode2d_wf_f64)
        else:
            fn = (_lib.regnd_decode2d_f32 if T is np.float32
                  else _lib.regnd_decode2d_f64)
        fn(_ptr(types), ctypes.c_int64(shape[0]),
           ctypes.c_int64(shape[1]),
           _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
           _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
           _ptr(ind), _ptr(qc), _ptr(up), cF(rp),
           ctypes.c_int(int(intervals)),
           ctypes.c_int(1 if use_mean else 0), cF(mean), _ptr(out))
    return out.reshape(shape)


def regnd_prep(data: np.ndarray, dbs, noise, use_mean: bool, mean):
    """Fused per-block regression fit + predictor selection (2D/3D),
    OpenMP over blocks.  Returns (coeffs[nb, ncoeff], use_reg[nb] bool)
    bit-identical to regnd.compute_reg_coeffs + regnd.select_predictor."""
    T = data.dtype.type
    data = np.ascontiguousarray(data)
    rank = data.ndim
    nb = 1
    for db in dbs:
        nb *= db.num
    ncoeff = 4 if rank == 3 else 3
    coeffs = np.zeros((nb, ncoeff), T)
    use_reg = np.zeros(nb, np.uint8)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    geos = [_geo(db) for db in dbs]
    if rank == 3:
        fn = (_lib.regnd_prep3d_f32 if T is np.float32
              else _lib.regnd_prep3d_f64)
        (xo, xc), (yo, yc), (zo, zc) = geos
        fn(_ptr(data), ctypes.c_int64(data.shape[0]),
           ctypes.c_int64(data.shape[1]), ctypes.c_int64(data.shape[2]),
           _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
           _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
           _ptr(zo), _ptr(zc), ctypes.c_int64(len(zo)),
           cF(noise), ctypes.c_int(1 if use_mean else 0), cF(mean),
           _ptr(coeffs), _ptr(use_reg))
    else:
        fn = (_lib.regnd_prep2d_f32 if T is np.float32
              else _lib.regnd_prep2d_f64)
        (xo, xc), (yo, yc) = geos
        fn(_ptr(data), ctypes.c_int64(data.shape[0]),
           ctypes.c_int64(data.shape[1]),
           _ptr(xo), _ptr(xc), ctypes.c_int64(len(xo)),
           _ptr(yo), _ptr(yc), ctypes.c_int64(len(yo)),
           cF(noise), ctypes.c_int(1 if use_mean else 0), cF(mean),
           _ptr(coeffs), _ptr(use_reg))
    return coeffs, use_reg.astype(bool)


_lib.classicnd_encode_f32.restype = ctypes.c_int64
_lib.classicnd_encode_f64.restype = ctypes.c_int64
_lib.classicnd_encode_wf_f32.restype = ctypes.c_int64
_lib.classicnd_encode_wf_f64.restype = ctypes.c_int64

# volumes at or above this size route to the blocked-wavefront classic
# kernels (bit-identical; parallel over bs^3 tile anti-diagonals)
_CLASSIC_WF_MIN = 1 << 16
_CLASSIC_WF_BS = 32


def classicnd_encode(data: np.ndarray, rp64: float, recip64: float,
                     rp, recip, intervals: int, radius: int, dbl: bool,
                     req_length: int, median, subblock: bool = False):
    """Classic 2D/3D/4D MDQ encode.  Returns
    (types, lead u8, mid bytes, resi u8 entries, cnt).
    subblock=True selects the *_MDQ_subblock quantizer (double
    division, no epsilon recheck; wavefront kernel only)."""
    T = data.dtype.type
    x = np.ascontiguousarray(data)
    if x.ndim == 2:
        q1, r1, r2, r3 = 1, 1, x.shape[0], x.shape[1]
    elif x.ndim == 3:
        q1, r1, r2, r3 = 1, x.shape[0], x.shape[1], x.shape[2]
    else:
        q1, r1, r2, r3 = x.shape
    n = x.size
    rb = req_length // 8
    types = np.zeros(n, np.int32)
    lead = np.zeros(max(n, 1), np.uint8)
    mid = np.zeros(max(n * max(rb, 1), 1), np.uint8)
    resi = np.zeros(max(n, 1), np.uint8)
    nmid = np.zeros(1, np.int64)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    if subblock and n < _CLASSIC_WF_MIN:
        raise ValueError("subblock native encode needs the wavefront "
                         "kernel (n >= _CLASSIC_WF_MIN)")
    if n >= _CLASSIC_WF_MIN:
        fn = (_lib.classicnd_encode_wf_f32 if T is np.float32
              else _lib.classicnd_encode_wf_f64)
        cnt = int(fn(_ptr(x), ctypes.c_int64(q1), ctypes.c_int64(r1),
                     ctypes.c_int64(r2), ctypes.c_int64(r3),
                     ctypes.c_double(rp64), ctypes.c_double(recip64),
                     cF(rp), cF(recip), ctypes.c_int(int(intervals)),
                     ctypes.c_int(radius), ctypes.c_int(1 if dbl else 0),
                     ctypes.c_int(1 if subblock else 0),
                     ctypes.c_int(req_length), cF(median),
                     ctypes.c_int(_CLASSIC_WF_BS), _ptr(types),
                     _ptr(lead), _ptr(mid), _ptr(nmid), _ptr(resi)))
    else:
        fn = (_lib.classicnd_encode_f32 if T is np.float32
              else _lib.classicnd_encode_f64)
        cnt = int(fn(_ptr(x), ctypes.c_int64(q1), ctypes.c_int64(r1),
                     ctypes.c_int64(r2), ctypes.c_int64(r3),
                     ctypes.c_double(rp64), ctypes.c_double(recip64),
                     cF(rp), cF(recip), ctypes.c_int(int(intervals)),
                     ctypes.c_int(radius), ctypes.c_int(1 if dbl else 0),
                     ctypes.c_int(req_length), cF(median), _ptr(types),
                     _ptr(lead), _ptr(mid), _ptr(nmid), _ptr(resi)))
    esize = 4 if T is np.float32 else 8
    has_resi = (req_length % 8) != 0 and rb < esize
    return (types, lead[:cnt], mid[:int(nmid[0])].tobytes(),
            resi[:cnt] if has_resi else resi[:0], cnt)


def classicnd_decode(types: np.ndarray, shape, rp64: float, rp,
                     radius: int, dbl: bool, req_length: int, median,
                     lead: np.ndarray, mid: bytes, resi: bytes,
                     T) -> np.ndarray:
    types = np.ascontiguousarray(types, np.int32)
    if len(shape) == 2:
        q1, r1, r2, r3 = 1, 1, shape[0], shape[1]
    elif len(shape) == 3:
        q1, r1, r2, r3 = 1, shape[0], shape[1], shape[2]
    else:
        q1, r1, r2, r3 = shape
    lead = np.ascontiguousarray(lead, np.uint8)
    midb = np.frombuffer(mid, np.uint8) if len(mid) else np.zeros(1, np.uint8)
    resb = (np.frombuffer(resi, np.uint8) if len(resi)
            else np.zeros(1, np.uint8))
    out = np.zeros(types.size, T)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    if types.size >= _CLASSIC_WF_MIN:
        fn = (_lib.classicnd_decode_wf_f32 if T is np.float32
              else _lib.classicnd_decode_wf_f64)
        fn(_ptr(types), ctypes.c_int64(q1), ctypes.c_int64(r1),
           ctypes.c_int64(r2), ctypes.c_int64(r3), ctypes.c_double(rp64),
           cF(rp), ctypes.c_int(radius), ctypes.c_int(1 if dbl else 0),
           ctypes.c_int(req_length), cF(median), _ptr(lead), _ptr(midb),
           _ptr(resb), ctypes.c_int64(int(lead.size)),
           ctypes.c_int(_CLASSIC_WF_BS), _ptr(out))
        return out
    fn = (_lib.classicnd_decode_f32 if T is np.float32
          else _lib.classicnd_decode_f64)
    fn(_ptr(types), ctypes.c_int64(q1), ctypes.c_int64(r1),
       ctypes.c_int64(r2), ctypes.c_int64(r3), ctypes.c_double(rp64),
       cF(rp), ctypes.c_int(radius), ctypes.c_int(1 if dbl else 0),
       ctypes.c_int(req_length), cF(median), _ptr(lead), _ptr(midb),
       _ptr(resb), _ptr(out))
    return out


_lib.intnd_encode2.restype = ctypes.c_int64
_lib.intnd_encode_wf.restype = ctypes.c_int64


def intnd_encode(data: np.ndarray, rp: float, intervals: int,
                 radius: int, an_dtype, dn_dtype, min_value: int,
                 byte_size: int, store_esize: int, quirk4d: bool):
    """Integer 2D/3D/4D MDQ encode.  Returns (types, exact bytes,
    n_exact)."""
    x = np.ascontiguousarray(data)
    if x.ndim == 2:
        q1, r1, r2, r3 = 1, 1, x.shape[0], x.shape[1]
    elif x.ndim == 3:
        q1, r1, r2, r3 = 1, x.shape[0], x.shape[1], x.shape[2]
    else:
        q1, r1, r2, r3 = x.shape
    n = x.size
    dt = x.dtype
    an = np.dtype(an_dtype)
    dn = np.dtype(dn_dtype)
    types = np.zeros(n, np.int32)
    exact = np.zeros(max(n * byte_size, 1), np.uint8)
    common = (ctypes.c_int64(q1), ctypes.c_int64(r1),
              ctypes.c_int64(r2), ctypes.c_int64(r3),
              ctypes.c_double(rp), ctypes.c_int(int(intervals)),
              ctypes.c_int(radius), ctypes.c_int(an.itemsize * 8),
              ctypes.c_int(1 if an.kind == "i" else 0),
              ctypes.c_int(dn.itemsize * 8),
              ctypes.c_int64(int(min_value)), ctypes.c_int(byte_size),
              ctypes.c_int(store_esize),
              ctypes.c_int(1 if quirk4d else 0))
    if n >= _CLASSIC_WF_MIN:
        cnt = int(_lib.intnd_encode_wf(
            _ptr(x), ctypes.c_int(dt.itemsize),
            ctypes.c_int(1 if dt.kind == "i" else 0), *common,
            ctypes.c_int(_CLASSIC_WF_BS), _ptr(types), _ptr(exact)))
    else:
        cnt = int(_lib.intnd_encode2(
            _ptr(x), ctypes.c_int(dt.itemsize),
            ctypes.c_int(1 if dt.kind == "i" else 0), *common,
            _ptr(types), _ptr(exact)))
    return types, exact[:cnt * byte_size].tobytes(), cnt


def intnd_decode(types: np.ndarray, shape, interval2: float,
                 radius: int, out_dtype, min_value: int, byte_size: int,
                 store_esize: int, exact: bytes) -> np.ndarray:
    types = np.ascontiguousarray(types, np.int32)
    if len(shape) == 2:
        q1, r1, r2, r3 = 1, 1, shape[0], shape[1]
    elif len(shape) == 3:
        q1, r1, r2, r3 = 1, shape[0], shape[1], shape[2]
    else:
        q1, r1, r2, r3 = shape
    dt = np.dtype(out_dtype)
    eb = (np.frombuffer(exact, np.uint8) if len(exact)
          else np.zeros(1, np.uint8))
    out = np.zeros(types.size, np.int64)
    common = (ctypes.c_int64(q1), ctypes.c_int64(r1),
              ctypes.c_int64(r2), ctypes.c_int64(r3),
              ctypes.c_double(interval2), ctypes.c_int(radius),
              ctypes.c_int(dt.itemsize * 8),
              ctypes.c_int(1 if dt.kind == "i" else 0),
              ctypes.c_int64(int(min_value)), ctypes.c_int(byte_size),
              ctypes.c_int(store_esize), _ptr(eb))
    if types.size >= _CLASSIC_WF_MIN:
        _lib.intnd_decode_wf(_ptr(types), *common,
                             ctypes.c_int(_CLASSIC_WF_BS), _ptr(out))
    else:
        _lib.intnd_decode(_ptr(types), *common, _ptr(out))
    return out.astype(out_dtype)


_lib.ompblock_encode_f32.restype = ctypes.c_int64
_lib.ompblock_encode_f64.restype = ctypes.c_int64


def ompblock_encode(block: np.ndarray, rp, intervals: int, radius: int):
    """sz_omp RA_block encode (classic scheme, raw escapes, self-seeded
    first element).  Returns (types flat i32, unpred values)."""
    T = block.dtype.type
    x = np.ascontiguousarray(block)
    r1, r2, r3 = x.shape
    n = x.size
    types = np.zeros(n, np.int32)
    unpred = np.zeros(n, x.dtype)
    dbl = T is np.float64
    rp64 = float(rp)
    recip64 = float(np.float64(np.float32(np.float32(1) / np.float32(rp)))
                    if T is np.float32 else 1.0 / rp64)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    fn = (_lib.ompblock_encode_f32 if T is np.float32
          else _lib.ompblock_encode_f64)
    ucnt = int(fn(_ptr(x), ctypes.c_int64(r1), ctypes.c_int64(r2),
                  ctypes.c_int64(r3), ctypes.c_double(rp64),
                  ctypes.c_double(recip64), cF(rp),
                  ctypes.c_int(int(intervals)), ctypes.c_int(radius),
                  ctypes.c_int(1 if dbl else 0), _ptr(types),
                  _ptr(unpred)))
    return types, unpred[:ucnt].copy()


def ompblock_decode(types: np.ndarray, shape, mean, rp,
                    radius: int, unpred: np.ndarray, T) -> np.ndarray:
    types = np.ascontiguousarray(types, np.int32)
    r1, r2, r3 = shape
    out = np.zeros(int(np.prod(shape)), T)
    up = (np.ascontiguousarray(unpred, T) if len(unpred)
          else np.zeros(1, T))
    dbl = T is np.float64
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    fn = (_lib.ompblock_decode_f32 if T is np.float32
          else _lib.ompblock_decode_f64)
    fn(_ptr(types), ctypes.c_int64(r1), ctypes.c_int64(r2),
       ctypes.c_int64(r3), cF(mean), ctypes.c_double(float(rp)), cF(rp),
       ctypes.c_int(radius), ctypes.c_int(1 if dbl else 0), _ptr(up),
       _ptr(out))
    return out.reshape(shape)


_lib.int1d_encode.restype = ctypes.c_int64


def int1d_encode(data: np.ndarray, rp: float, intervals: int,
                 radius: int, a1_dtype, min_value: int, byte_size: int,
                 store_esize: int):
    """Integer 1D MDQ encode (general bound).  Returns
    (types, exact bytes, n_exact)."""
    x = np.ascontiguousarray(data)
    n = x.size
    dt = x.dtype
    a1 = np.dtype(a1_dtype)
    types = np.zeros(n, np.int32)
    exact = np.zeros(max(n * byte_size, 1), np.uint8)
    cnt = int(_lib.int1d_encode(
        _ptr(x), ctypes.c_int(dt.itemsize),
        ctypes.c_int(1 if dt.kind == "i" else 0), ctypes.c_int64(n),
        ctypes.c_double(rp), ctypes.c_int(int(intervals)),
        ctypes.c_int(radius), ctypes.c_int(a1.itemsize * 8),
        ctypes.c_int(1 if a1.kind == "i" else 0),
        ctypes.c_int64(int(min_value)), ctypes.c_int(byte_size),
        ctypes.c_int(store_esize), _ptr(types), _ptr(exact)))
    return types, exact[:cnt * byte_size].tobytes(), cnt


def int1d_decode(types: np.ndarray, interval2: float, radius: int,
                 out_dtype, min_value: int, byte_size: int,
                 store_esize: int, exact: bytes) -> np.ndarray:
    types = np.ascontiguousarray(types, np.int32)
    dt = np.dtype(out_dtype)
    eb = (np.frombuffer(exact, np.uint8) if len(exact)
          else np.zeros(1, np.uint8))
    out = np.zeros(types.size, np.int64)
    _lib.int1d_decode(
        _ptr(types), ctypes.c_int64(types.size),
        ctypes.c_double(interval2), ctypes.c_int(radius),
        ctypes.c_int(dt.itemsize * 8),
        ctypes.c_int(1 if dt.kind == "i" else 0),
        ctypes.c_int64(int(min_value)), ctypes.c_int(byte_size),
        ctypes.c_int(store_esize), _ptr(eb), _ptr(out))
    return out.astype(out_dtype)


def msst19_build_table(pt: np.ndarray, precision: float, bits: int,
                       base_index: int, nsub: int) -> np.ndarray:
    pt = np.ascontiguousarray(pt, np.float64)
    table = np.zeros((nsub, 1 << bits), np.uint16)
    _lib.msst19_build_table(_ptr(pt), ctypes.c_int64(pt.size),
                            ctypes.c_double(precision),
                            ctypes.c_int(bits),
                            ctypes.c_int64(base_index),
                            ctypes.c_int64(nsub), _ptr(table))
    return table
