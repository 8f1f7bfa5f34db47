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
