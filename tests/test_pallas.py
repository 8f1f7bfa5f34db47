"""Pallas plane-quantize kernel parity.

`sz_tpu/tpu/pallas_kernels.plane_quantize` replaces the XLA
scan-of-fixpoints in `engine._quantize_fn` with one `pallas_call`
(grid over x-planes, VMEM-resident plane carry).  These tests force
the Pallas path (interpret mode on CPU — conftest pins the platform)
and assert the full compressed stream is byte-identical to the XLA
path, which is itself golden-verified against the reference binary in
tests/test_tpu_engine.py.  The same comparison on real TPU v5e is run
by tools/tpu_timings.py.
"""

import os
import pathlib

import numpy as np
import pytest

engine = pytest.importorskip("sz_tpu.tpu.engine")
pytest.importorskip("jax.experimental.pallas")

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")

KW = dict(max_range_radius=32768, sample_distance=100,
          pred_threshold=np.float32(0.99))

CASES = [
    ("f32_3d", lambda: np.fromfile(
        REF_DATA / "testfloat_8_8_128.dat",
        dtype="<f4").reshape(128, 8, 8), 1e-4),
    # synth 64^3 exercises use_mean + many escapes
    ("f32_3d64_mean", lambda: np.fromfile(
        GOLDEN / "synth_f32_64.dat",
        dtype="<f4").reshape(64, 64, 64), 1e-3),
]


def _compress_with_mode(mode: str, data, prec):
    old = os.environ.get("SZ_TPU_PALLAS")
    os.environ["SZ_TPU_PALLAS"] = mode
    # mode is read at trace time inside the cached stage builder
    engine._quantize_fn.cache_clear()
    try:
        return engine.compress(data, prec, **KW)
    finally:
        engine._quantize_fn.cache_clear()
        if old is None:
            os.environ.pop("SZ_TPU_PALLAS", None)
        else:
            os.environ["SZ_TPU_PALLAS"] = old


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_pallas_quantize_bit_exact(case):
    _, make, prec = case
    data = make()
    ref = _compress_with_mode("0", data, prec)
    got = _compress_with_mode("force", data, prec)
    assert got.quantization_intervals == ref.quantization_intervals
    assert got.use_mean == ref.use_mean
    assert got.reg_count == ref.reg_count
    assert got.total_unpred == ref.total_unpred
    assert got.body == ref.body


def test_large_plane_falls_back_to_xla():
    """Planes whose padded size exceeds the scoped-VMEM budget must NOT
    take the Pallas kernel (Mosaic refuses ~>16 MB of plane buffers —
    seen on Hurricane-like 500x500 planes on v5e); the XLA plane-scan
    fallback keeps byte parity."""
    import numpy as np
    from sz_tpu.core import regnd

    rng = np.random.default_rng(8)
    data = (np.sin(np.linspace(0, 20, 4 * 200 * 800, dtype=np.float32))
            + 0.05 * rng.standard_normal(4 * 200 * 800)
            ).astype(np.float32).reshape(4, 200, 800)
    # padded plane = 200x896 = 179200 > the 2^17 default cap
    kw = dict(max_range_radius=32768, sample_distance=100,
              pred_threshold=np.float32(0.99))
    a = regnd.compress(data, 1e-3, **kw)
    b = _compress_with_mode("force", data, 1e-3)  # cap overrides force
    assert a.body == b.body
