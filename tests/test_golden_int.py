"""Integer codec parity vs reference testint_compress goldens
(ABS bound 4, via int.config)."""

import pathlib

import numpy as np
import pytest

from sz_tpu import api, SZConfig, ErrorBoundMode
from sz_tpu.format import lossless as ll

GOLDEN = pathlib.Path(__file__).parent / "golden"

CASES = [
    # 4D exercises the reference's stale-curValue bug at each slice's
    # position 1 (replicated bug-for-bug; see core/intc.py)
    ("int_i32_4d", np.int32, (8, 16, 8, 8)),
    ("int_i32_3d", np.int32, (32, 32, 8)),
    ("int_i8_3d", np.int8, (32, 32, 8)),
    ("int_i64_3d", np.int64, (32, 32, 8)),
    ("int_ui16_1d", np.uint16, (8192,)),
]
IDS = [c[0] for c in CASES]


def _load(case):
    name, dt, shape = case
    stem = name.rsplit("_", 1)[0]
    data = np.fromfile(GOLDEN / f"{stem}.dat", dtype=dt).reshape(shape)
    return data, (GOLDEN / f"{name}.sz").read_bytes(), \
        np.fromfile(GOLDEN / f"{name}.out", dtype=dt).reshape(shape)


def _norm(inner: bytes) -> bytes:
    b = bytearray(inner)
    b[24:32] = bytes(8)  # params fmin/fmax region: unset for ints
    return bytes(b)


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_compress_stream_bit_exact(case):
    data, golden_sz, _ = _load(case)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 4)
    ours = api.compress(data, cfg)
    cap = data.nbytes * 4 + 128
    assert _norm(ll.decompress(ours, expected_size=cap)) == \
        _norm(ll.decompress(golden_sz, expected_size=cap))


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_decompress_golden_bit_exact(case):
    data, golden_sz, golden_out = _load(case)
    out = api.decompress(golden_sz, data.shape, data.dtype)
    np.testing.assert_array_equal(out, golden_out)


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_roundtrip_bound(case):
    if case[0].endswith("_4d"):
        pytest.skip("reference 4D int kernel bug (replicated) breaks "
                    "the bound at slice position 1")
    data, _, _ = _load(case)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 4)
    blob = api.compress(data, cfg)
    out = api.decompress(blob, data.shape, data.dtype)
    err = np.abs(out.astype(np.int64) - data.astype(np.int64))
    assert err.max() <= 4


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint32,
                                   np.uint64])
def test_roundtrip_other_widths(dtype):
    # values kept well inside the dtype range: like the reference, the
    # encoder predicts in wide integers while the decoder wraps at the
    # storage width, so wraparound data diverges in both implementations
    rng = np.random.default_rng(3)
    walk = np.cumsum(rng.integers(-5, 6, 4096))
    data = (np.clip(walk, -90, 90) + 120).astype(dtype).reshape(64, 64)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 2)
    blob = api.compress(data, cfg)
    out = api.decompress(blob, data.shape, dtype)
    err = np.abs(out.astype(np.int64) - data.astype(np.int64))
    assert err.max() <= 2
