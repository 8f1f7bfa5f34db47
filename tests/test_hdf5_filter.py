"""HDF5 filter (H5Z-SZ, id 32017) equivalent via h5py direct chunk I/O."""

import pathlib
import subprocess

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode
from sz_tpu.integrations import hdf5 as szh5

REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")


def synth(shape, seed=0):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 4 * np.pi, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    field = np.sin(grids[0])
    for g in grids[1:]:
        field = field * np.cos(g)
    return (field + 0.05 * rng.standard_normal(shape)).astype(np.float32)


def test_cd_values_roundtrip():
    cfg = SZConfig(error_bound_mode=ErrorBoundMode.ABS,
                   abs_err_bound=1e-3)
    for shape in [(100000,), (30, 20), (30, 20, 10), (4, 5, 6, 7)]:
        cd = szh5.cd_values_for(shape, np.float32, cfg)
        shp, dt, pcfg = szh5.parse_cd_values(cd)
        assert shp == shape and dt == np.dtype(np.float32)
        assert pcfg.error_bound_mode == ErrorBoundMode.ABS
        assert pcfg.abs_err_bound == 1e-3


def test_write_read_roundtrip(tmp_path):
    data = synth((24, 20, 16))
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        szh5.create_dataset(f, "field", data, cfg)
    with h5py.File(tmp_path / "t.h5", "r") as f:
        out = szh5.read_dataset(f["field"])
        # filter id + cd_values present as the reference plugin writes
        dcpl = f["field"].id.get_create_plist()
        code, _f, vals, _n = dcpl.get_filter(0)
        assert code == szh5.FILTER_ID
        assert vals[0] == 3  # ndim
    assert np.abs(out - data).max() <= 1e-3 * (1 + 1e-6)


def test_write_read_chunked(tmp_path):
    data = synth((32, 24, 16), seed=3)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        szh5.create_dataset(f, "field", data, cfg, chunks=(16, 12, 16))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        out = szh5.read_dataset(f["field"])
    assert np.abs(out - data).max() <= 1e-3 * (1 + 1e-6)


@pytest.mark.skipif(not REF_BIN.exists(),
                    reason="reference binary not built")
def test_read_reference_produced_chunks(tmp_path):
    """A file whose chunk payload came from the reference binary (what
    the H5Z-SZ plugin would store) decodes bit-exactly."""
    shape = (24, 20, 16)
    data = synth(shape, seed=7)
    dpath = tmp_path / "c.dat"
    data.tofile(dpath)
    subprocess.run(
        [str(REF_BIN), "-z", "-f", "-M", "ABS", "-A", "1e-3", "-i",
         str(dpath), "-3", "16", "20", "24"],
        check=True, capture_output=True)
    ref_blob = (tmp_path / "c.dat.sz").read_bytes()
    subprocess.run(
        [str(REF_BIN), "-x", "-f", "-s", str(tmp_path / "c.dat.sz"),
         "-3", "16", "20", "24"], check=True, capture_output=True)
    ref_out = np.fromfile(tmp_path / "c.dat.sz.out",
                          dtype=np.float32).reshape(shape)

    cd = szh5.cd_values_for(shape, np.float32)
    with h5py.File(tmp_path / "ref.h5", "w") as f:
        space = h5py.h5s.create_simple(shape)
        dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
        dcpl.set_chunk(shape)
        dcpl.set_filter(szh5.FILTER_ID, h5py.h5z.FLAG_OPTIONAL, cd)
        tid = h5py.h5t.py_create(np.dtype(np.float32), logical=True)
        dsid = h5py.h5d.create(f.id, b"field", tid, space, dcpl=dcpl)
        h5py.Dataset(dsid).id.write_direct_chunk(
            (0, 0, 0), ref_blob, filter_mask=0)
    with h5py.File(tmp_path / "ref.h5", "r") as f:
        out = szh5.read_dataset(f["field"])
    assert np.array_equal(out, ref_out)


LIBSZ = pathlib.Path("/tmp/szref/build/sz/libSZ.so")


@pytest.mark.skipif(not LIBSZ.exists(), reason="reference libSZ not built")
def test_chunks_match_compiled_filter_logic(tmp_path):
    """The compiled H5Z-SZ plugin cannot be built here (no HDF5 dev
    headers in the image), so this validates its exact filter callback
    LOGIC against the live reference library instead: H5Z_filter_sz
    (H5Z_SZ.c:542) parses cd_values and calls SZ_compress_args /
    SZ_decompress on the chunk buffer.  We replay that callback via
    ctypes on the cd_values actually stored in our file: (a) the
    reference filter compressing the same chunk yields byte-identical
    chunk payloads to ours, and (b) the reference filter decompressing
    OUR stored chunks yields our decode bit-exactly."""
    import ctypes

    lib = ctypes.CDLL(str(LIBSZ))
    assert lib.SZ_Init(None) == 0
    data = synth((24, 20, 16), seed=3)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    path = tmp_path / "logic.h5"
    with h5py.File(path, "w") as f:
        szh5.create_dataset(f, "field", data, cfg)
    with h5py.File(path, "r") as f:
        dset = f["field"]
        dcpl = dset.id.get_create_plist()
        _code, _fl, cd, _n = dcpl.get_filter(0)
        shape, dtype, pcfg = szh5.parse_cd_values(cd)
        assert pcfg is not None  # withErrInfo branch of the callback
        _mask, blob = dset.id.read_direct_chunk((0, 0, 0))

    S = ctypes.c_size_t
    r = [0] * (5 - len(shape)) + list(shape)

    # (a) compress branch: SZ_compress_args(dataType, buf, &outSize,
    #     error_mode, abs, rel, pwrel, r5..r1)  [H5Z_SZ.c:677]
    f_c = lib.SZ_compress_args
    f_c.restype = ctypes.POINTER(ctypes.c_ubyte)
    outsize = S(0)
    p = f_c(ctypes.c_int(0), data.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(outsize), ctypes.c_int(int(pcfg.error_bound_mode)),
            ctypes.c_double(pcfg.abs_err_bound),
            ctypes.c_double(pcfg.rel_bound_ratio),
            ctypes.c_double(pcfg.pw_rel_bound_ratio),
            *[S(v) for v in r])
    ref_blob = bytes(bytearray(ctypes.cast(
        p, ctypes.POINTER(ctypes.c_ubyte * outsize.value)).contents))
    # INNER streams must be byte-identical; outer bytes differ only by
    # zstd encoder version (same content — the repo-wide interop gate:
    # inner parity + cross-decode, tools/ci_sweep.py)
    from sz_tpu.format import lossless as ll
    exp = data.nbytes * 2 + 64
    assert (ll.decompress(ref_blob, expected_size=exp)
            == ll.decompress(bytes(blob), expected_size=exp))

    # (b) decompress branch: SZ_decompress(dataType, bytes, nbytes,
    #     r5..r1)  [H5Z_SZ.c:580]
    f_d = lib.SZ_decompress
    f_d.restype = ctypes.POINTER(ctypes.c_float)
    buf = (ctypes.c_ubyte * len(blob)).from_buffer_copy(bytes(blob))
    q = f_d(ctypes.c_int(0), buf, S(len(blob)), *[S(v) for v in r])
    n = int(np.prod(shape))
    ref_out = np.ctypeslib.as_array(q, shape=(n,)).copy().reshape(shape)
    ours = sz_tpu.decompress(bytes(blob), shape, np.float32)
    np.testing.assert_array_equal(ref_out.view(np.uint32),
                                  ours.view(np.uint32))


def test_sz_to_hdf5_converters(tmp_path):
    """szToHDF5 / dszFromHDF5 equivalents (test/szToHDF5.c): raw file
    -> filtered .h5 -> raw file, lossless across the container step."""
    data = synth((20, 16, 12), seed=4)
    raw = tmp_path / "in.dat"
    data.tofile(raw)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    h5 = szh5.sz_to_hdf5(raw, tmp_path / "conv.h5", dtype=np.float32,
                         shape=data.shape, cfg=cfg)
    out = szh5.hdf5_to_raw(h5, tmp_path / "out.dat")
    # container step is lossless around the codec
    direct = sz_tpu.decompress(sz_tpu.compress(data, cfg), data.shape,
                               np.float32)
    np.testing.assert_array_equal(out.view(np.uint32),
                                  direct.view(np.uint32))
    assert (tmp_path / "out.dat").stat().st_size == data.nbytes


def test_tiny_chunk_passthrough(tmp_path):
    """Chunks under 20 elements are stored RAW, mirroring the plugin's
    nbEle < 20 passthrough (H5Z_SZ.c:571) so files stay bit-compatible."""
    data = np.arange(16, dtype=np.float32).reshape(4, 4)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    with h5py.File(tmp_path / "tiny.h5", "w") as f:
        szh5.create_dataset(f, "t", data, cfg)
    with h5py.File(tmp_path / "tiny.h5", "r") as f:
        _mask, blob = f["t"].id.read_direct_chunk((0, 0))
        assert bytes(blob) == data.tobytes()  # raw, not an SZ stream
        out = szh5.read_dataset(f["t"])
    np.testing.assert_array_equal(out, data)
