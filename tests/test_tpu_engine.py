"""TPU (JAX) engine parity: identical bytes to the numpy oracle and to
reference-produced goldens.

Runs on the virtual CPU mesh in CI (conftest sets JAX_PLATFORMS=cpu);
verified bit-exact on real TPU v5 hardware as well (the fixpoint
formulation is backend-independent because every op is a separately
rounded HLO op).
"""

import pathlib

import numpy as np
import pytest

from sz_tpu.core import regnd

engine = pytest.importorskip("sz_tpu.tpu.engine")

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")

KW = dict(max_range_radius=32768, sample_distance=100,
          pred_threshold=np.float32(0.99))
KW64 = dict(max_range_radius=32768, sample_distance=100,
            pred_threshold=np.float32(0.99))


def _synth64():
    return np.fromfile(GOLDEN / "synth_f32_64.dat",
                       dtype="<f4").reshape(64, 64, 64)


CASES = [
    ("f32_3d", lambda: np.fromfile(
        REF_DATA / "testfloat_8_8_128.dat",
        dtype="<f4").reshape(128, 8, 8), 1e-4),
    # synth 64^3 exercises use_mean + many escapes
    ("f32_3d64_mean", _synth64, 1e-3),
    ("f32_2d", lambda: np.fromfile(
        REF_DATA / "testfloat_8_8_128.dat",
        dtype="<f4").reshape(128, 64), 1e-4),
    ("f64_3d", lambda: np.fromfile(
        REF_DATA / "testdouble_8_8_128.dat",
        dtype="<f8").reshape(128, 8, 8), 1e-4),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_engine_matches_oracle(case):
    _, load, eb = case
    data = load()
    kw = dict(KW)
    a = regnd.compress(data, eb, **kw)
    b = engine.compress(data, eb, **kw)
    assert a.body == b.body
    # decode side: bit-identical reconstruction lattice
    oa = regnd.decompress(a.body, data.shape, data.dtype)
    ob = engine.decompress(a.body, data.shape, data.dtype)
    u = np.uint32 if data.dtype == np.float32 else np.uint64
    np.testing.assert_array_equal(oa.view(u), ob.view(u))


def test_engine_decodes_reference_golden():
    data = _synth64()
    golden_out = np.fromfile(GOLDEN / "f32_3d64_abs1e-3.out",
                             dtype="<f4").reshape(64, 64, 64)
    from sz_tpu.format import lossless as ll
    from sz_tpu.format import metadata as md
    from sz_tpu.config import DataType
    blob = (GOLDEN / "f32_3d64_abs1e-3.sz").read_bytes()
    inner = ll.decompress(blob, expected_size=data.nbytes * 2 + 64)
    hdr = md.parse_header(inner, DataType.FLOAT)
    off = hdr.body_offset + hdr.size_type
    out = engine.decompress(inner[off:], data.shape, np.float32)
    np.testing.assert_array_equal(out.view(np.uint32),
                                  golden_out.view(np.uint32))


def test_engine_escape_overflow_path():
    """>ESC_K escapes exercises _escapes_fn (the second device call);
    its cumsum+scatter extraction must keep byte parity with the oracle."""
    rng = np.random.default_rng(3)
    data = rng.standard_normal((48, 48, 48)).astype(np.float32)
    kw = dict(KW, opt_quant_mode=0, fixed_intervals=16)
    a = regnd.compress(data, 1e-5, **kw)
    b = engine.compress(data, 1e-5, **kw)
    assert a.total_unpred > engine.ESC_K
    assert a.body == b.body


def test_engine_packed_types_decode():
    """The fixed-width packed type upload (_delattice_packed_fn +
    native.pack_wide_bits_u32) must reconstruct bit-identically to the
    raw-u16 upload path and the numpy oracle, including wide codes
    (intervals up to 2^15 -> w=15) and the w>=16 raw fallback."""
    import os
    data = _synth64()
    res = regnd.compress(data, 1e-3, **KW)
    oracle = regnd.decompress(res.body, data.shape, np.float32)
    out = engine.decompress(res.body, data.shape, np.float32)
    np.testing.assert_array_equal(out.view(np.uint32),
                                  oracle.view(np.uint32))
    old = os.environ.get("SZ_TPU_PACKED_TYPES")
    os.environ["SZ_TPU_PACKED_TYPES"] = "0"
    try:
        raw = engine.decompress(res.body, data.shape, np.float32)
    finally:
        if old is None:
            os.environ.pop("SZ_TPU_PACKED_TYPES", None)
        else:
            os.environ["SZ_TPU_PACKED_TYPES"] = old
    np.testing.assert_array_equal(out.view(np.uint32),
                                  raw.view(np.uint32))


def test_pack_wide_bits_u32():
    """Native fixed-width packer vs a pure-python bit stream, across
    widths and OpenMP chunk boundaries."""
    from sz_tpu import native
    rng = np.random.default_rng(9)
    for w in (1, 5, 9, 12, 15):
        for n in (0, 1, 7, 8, 4096, (1 << 18) + 13):
            vals = rng.integers(0, 1 << w, size=n).astype(np.int32)
            words = native.pack_wide_bits_u32(vals, w)
            stream = np.unpackbits(
                words.astype(">u4").view(np.uint8))

            def check(lo, hi):
                lo, hi = max(lo, 0), min(hi, n)
                if lo >= hi:
                    return
                ref = np.zeros((hi - lo) * w, np.uint8)
                for i, v in enumerate(vals[lo:hi]):
                    for b in range(w):
                        ref[i * w + b] = (v >> (w - 1 - b)) & 1
                np.testing.assert_array_equal(
                    stream[lo * w:hi * w], ref)

            check(0, 3000)               # head
            check((1 << 18) - 64, (1 << 18) + 64)  # OpenMP chunk seam
            check(n - 64, n)             # tail byte


def test_bitpack_tree_matches_segment_sum():
    """The log-depth concat-reduction pack (SZ_TPU_PACK_IMPL=tree) is
    byte-identical to the scatter-add pack across sizes, including
    non-pow2 streams and full-width (32-bit) codes."""
    from sz_tpu.tpu import engine as eng
    rng = np.random.default_rng(7)
    nsym = 300
    code_len = rng.integers(1, 33, nsym).astype(np.int32)
    code_hi = np.zeros(nsym, np.uint64)
    for i, ln in enumerate(code_len):
        # two 16-bit draws so 31/32-bit codes exercise every code bit
        v = (int(rng.integers(0, 1 << 16)) << 16) | int(
            rng.integers(0, 1 << 16))
        v &= (1 << int(ln)) - 1
        code_hi[i] = np.uint64(v) << np.uint64(64 - ln)
    for n in (5, 100, 4096, 100001, 1 << 17):
        t = rng.integers(0, nsym, n).astype(np.uint16)
        total_bits = int(code_len[t.astype(np.int64)].astype(np.int64).sum())
        nbytes = (total_bits + 7) // 8
        out_pad = eng._pad_pow2(nbytes + 8)
        a = np.asarray(eng._bitpack_fn(n, out_pad, "cpu")(
            t, code_hi, code_len))
        b = np.asarray(eng._bitpack_tree_fn(n, out_pad, "cpu")(
            t, code_hi, code_len))
        np.testing.assert_array_equal(a[:nbytes], b[:nbytes])


def test_bitpack_impl_env_dispatch(monkeypatch):
    """SZ_TPU_PACK_IMPL routes bitpack_fn to the matching cached
    implementation (the parity tests call the impls directly, so a
    regression in the env plumbing would otherwise go unnoticed)."""
    from sz_tpu.tpu import engine as eng
    n, out = 64, 256
    monkeypatch.setenv("SZ_TPU_PACK_IMPL", "tree")
    assert eng.bitpack_fn(n, out, "raw") is eng._bitpack_tree_fn(
        n, out, "raw")
    monkeypatch.setenv("SZ_TPU_PACK_IMPL", "pallas")
    assert eng.bitpack_fn(n, out, "raw") is eng._bitpack_pallas_fn(
        n, out, "raw")
    monkeypatch.setenv("SZ_TPU_PACK_IMPL", "segsum")
    assert eng.bitpack_fn(n, out, "raw") is eng._bitpack_fn(n, out, "raw")
    monkeypatch.delenv("SZ_TPU_PACK_IMPL")
    assert eng.bitpack_fn(n, out, "raw") is eng._bitpack_fn(n, out, "raw")
