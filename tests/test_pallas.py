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


def test_ragged_plane_pads_to_tile():
    """Ragged (non-8x128-aligned) planes are explicitly padded to the
    tile before the Pallas kernel (Mosaic's ragged-edge masking blows
    the scoped-VMEM budget — Hurricane-like 500x500 planes OOM'd on
    v5e); real cells only read -1 neighbors, so the padded kernel must
    stay byte-identical."""
    import numpy as np
    from sz_tpu.core import regnd

    rng = np.random.default_rng(8)
    data = (np.sin(np.linspace(0, 20, 4 * 200 * 800, dtype=np.float32))
            + 0.05 * rng.standard_normal(4 * 200 * 800)
            ).astype(np.float32).reshape(4, 200, 800)
    # padded plane = 200x896 = 179200 <= the cap -> Pallas via padding
    a = regnd.compress(data, 1e-3, **KW)
    b = _compress_with_mode("force", data, 1e-3)
    assert a.body == b.body


@pytest.mark.parametrize("shape,hh", [
    ((3, 40, 130), 16),   # 3 strips, ragged both plane dims
    ((2, 48, 128), 24),   # 2 strips, tile-aligned
    ((4, 24, 200), 24),   # single strip == whole plane (degenerate)
])
def test_strip_quantize_bit_exact(monkeypatch, shape, hh):
    """Planes past the whole-plane VMEM cap take the row-strip kernel
    (grid over (plane, strip), exact carried boundary rows) — streams
    must stay byte-identical.  The cap and strip height are pinned low
    to exercise multi-strip grids on small arrays."""
    import numpy as np
    from sz_tpu.core import regnd

    monkeypatch.setenv("SZ_TPU_PALLAS_MAX_PLANE", "64")
    monkeypatch.setenv("SZ_TPU_PALLAS_STRIP_H", str(hh))
    engine._quantize_fn.cache_clear()
    try:
        n = int(np.prod(shape))
        rng = np.random.default_rng(hash(shape) % 2**31)
        data = (np.sin(np.linspace(0, 20, n, dtype=np.float32))
                + 0.05 * rng.standard_normal(n)
                ).astype(np.float32).reshape(shape)
        a = regnd.compress(data, 1e-3, **KW)
        b = _compress_with_mode("force", data, 1e-3)
        assert a.body == b.body
    finally:
        engine._quantize_fn.cache_clear()


def test_strip_quantize_use_mean(monkeypatch):
    """Strip kernel parity on a field that triggers use_mean (dense
    repeated value) — the mean-flush branch crosses strip boundaries
    through the carried rows."""
    import numpy as np
    from sz_tpu.core import regnd

    monkeypatch.setenv("SZ_TPU_PALLAS_MAX_PLANE", "64")
    monkeypatch.setenv("SZ_TPU_PALLAS_STRIP_H", "16")
    engine._quantize_fn.cache_clear()
    try:
        rng = np.random.default_rng(5)
        data = np.zeros((3, 40, 132), np.float32)
        mask = rng.random(data.shape) < 0.4
        data[mask] = rng.standard_normal(int(mask.sum())).astype(
            np.float32)
        a = regnd.compress(data, 1e-3, **KW)
        assert a.use_mean  # the field must actually exercise the branch
        b = _compress_with_mode("force", data, 1e-3)
        assert a.body == b.body
    finally:
        engine._quantize_fn.cache_clear()


def test_large_plane_falls_back_to_xla(monkeypatch):
    """Planes whose padded size exceeds the scoped-VMEM cap must NOT
    take the Pallas kernel; the XLA plane-scan fallback keeps byte
    parity.  The cap is pinned low here so the test stays a fallback
    test as the hardware-measured default cap moves."""
    import numpy as np
    from sz_tpu.core import regnd

    monkeypatch.setenv("SZ_TPU_PALLAS_MAX_PLANE", str(1 << 15))
    monkeypatch.setenv("SZ_TPU_PALLAS_MAX_PLANE_STRIP", str(1 << 15))
    engine._quantize_fn.cache_clear()
    try:
        rng = np.random.default_rng(12)
        data = (np.sin(np.linspace(0, 20, 2 * 220 * 220,
                                   dtype=np.float32))
                + 0.05 * rng.standard_normal(2 * 220 * 220)
                ).astype(np.float32).reshape(2, 220, 220)
        # padded plane = 224x256 = 57344 > the pinned 2^15 cap
        a = regnd.compress(data, 1e-3, **KW)
        b = _compress_with_mode("force", data, 1e-3)  # cap beats force
        assert a.body == b.body
    finally:
        engine._quantize_fn.cache_clear()


def test_pack_kernel_matches_segment_sum(monkeypatch):
    """The Pallas chunk bit-pack (tpu/pack_kernel.py, interpret mode
    here; on hardware via tools/tpu_timings.py) is byte-identical to
    the scatter-add pack across sizes: sub-chunk, multi-chunk,
    non-pow2 tails, full-width 32-bit codes, and a tiny chunk size so
    several chunks + padding are exercised cheaply."""
    from sz_tpu.tpu import engine as eng
    from sz_tpu.tpu import pack_kernel as pk

    monkeypatch.setenv("SZ_TPU_PACK_CHUNK", "512")
    rng = np.random.default_rng(11)
    nsym = 700
    code_len = rng.integers(1, 33, nsym).astype(np.int32)
    vals = ((rng.integers(0, 1 << 16, nsym).astype(np.uint64) << 16)
            | rng.integers(0, 1 << 16, nsym).astype(np.uint64))
    vals &= (np.uint64(1) << code_len.astype(np.uint64)) - np.uint64(1)
    code_hi = vals << (np.uint64(64) - code_len.astype(np.uint64))
    for n in (5, 512, 1300, 4096, 10001):
        t = rng.integers(0, nsym, n).astype(np.uint16)
        total_bits = int(code_len[t.astype(np.int64)].astype(
            np.int64).sum())
        nbytes = (total_bits + 7) // 8
        out_pad = eng._pad_pow2(nbytes + 8)
        a = np.asarray(eng._bitpack_fn(n, out_pad, "cpu")(
            t, code_hi, code_len))
        b = np.asarray(pk.pack_bits(
            t, (code_hi >> np.uint64(32)).astype(np.uint32),
            code_len, n, out_pad, interpret=True))
        np.testing.assert_array_equal(a[:nbytes], b[:nbytes])


def test_pack2_kernel_matches_segment_sum():
    """pack2 (the fully in-kernel pack: in-kernel brev, windowed VMEM
    table lookup, SMEM offset accumulator, RMW window placement) is
    byte-identical to the scatter-add pack.  Interpret mode here;
    verified bit-exact on v5e up to 2^27 symbols (BASELINE.md).
    Covers: padded single chunk, multi-chunk, escape symbol 0, window
    not starting at 0, unused in-window symbols."""
    from types import SimpleNamespace
    from sz_tpu.tpu import engine as eng
    from sz_tpu.tpu import pack_kernel as pk

    rng = np.random.default_rng(21)
    nstate = 65536
    for n, lo_u, hi_u in ((5000, 32000, 33000), (20000, 100, 900)):
        code_len = np.zeros(nstate, np.int32)
        used = np.arange(lo_u, hi_u + 1)
        code_len[used] = rng.integers(1, 27, len(used))
        code_len[0] = int(rng.integers(1, 27))
        vals = ((rng.integers(0, 1 << 16, nstate).astype(np.uint64) << 16)
                | rng.integers(0, 1 << 16, nstate).astype(np.uint64))
        vals &= (np.uint64(1) << np.maximum(code_len, 1).astype(
            np.uint64)) - np.uint64(1)
        code_hi = np.where(
            code_len > 0,
            vals << (np.uint64(64) - np.maximum(code_len, 1).astype(
                np.uint64)), 0)
        t = rng.choice(used, size=n).astype(np.uint16)
        t[rng.random(n) < 0.1] = 0
        freq = np.bincount(t, minlength=nstate)
        total_bits = int(code_len[t].astype(np.int64).sum())
        out_bytes = ((total_bits + 31) // 32) * 4
        ref = np.asarray(eng._bitpack_fn(n, out_bytes, "cpu")(
            t, code_hi, code_len))
        w = pk.window_from_freq(freq, code_len)
        assert w is not None
        lo, K = w
        tbl = pk.build_window_table(
            SimpleNamespace(code_hi=code_hi, code_len=code_len), lo, K)
        got = np.asarray(pk.pack2_bits(
            t, tbl, lo, int(code_len[0]),
            int(code_hi[0] >> np.uint64(32)), n, out_bytes,
            interpret=True)).view(np.uint8)
        np.testing.assert_array_equal(ref, got[:len(ref)])


def test_pack2_window_fallback():
    """window_from_freq returns None when the used-symbol window is too
    wide or any code exceeds 26 bits (pack2's packed-table invariant)."""
    from sz_tpu.tpu import pack_kernel as pk
    freq = np.zeros(65536, np.int64)
    lens = np.ones(65536, np.int32)
    freq[1] = freq[60000] = 5          # 59999-wide window
    assert pk.window_from_freq(freq, lens) is None
    freq2 = np.zeros(65536, np.int64)
    freq2[100:200] = 3
    lens2 = np.ones(65536, np.int32)
    lens2[150] = 27                    # too-long code
    assert pk.window_from_freq(freq2, lens2) is None
    lens2[150] = 26
    assert pk.window_from_freq(freq2, lens2) == (100, 1)


def test_hist_kernel_matches_bincount():
    """MXU one-hot histogram kernel (tpu/hist_kernel.py) vs bincount,
    including negative (padding) symbols and a non-chunk-multiple n."""
    from sz_tpu.tpu import hist_kernel as hk
    rng = np.random.default_rng(3)
    sym = rng.integers(0, 65536, 20000).astype(np.int32)
    got = np.asarray(hk.histogram(sym, interpret=True))
    ref = np.bincount(sym, minlength=65536)
    np.testing.assert_array_equal(got, ref)
    # explicit negatives are dropped
    sym2 = sym.copy()
    sym2[::7] = -1
    got2 = np.asarray(hk.histogram(sym2, interpret=True))
    ref2 = np.bincount(sym2[sym2 >= 0], minlength=65536)
    np.testing.assert_array_equal(got2, ref2)


def test_engine_pack2_path(monkeypatch):
    """SZ_TPU_PACK2=force routes engine.compress through the v2
    epilogue (padded -1-hole stream + MXU histogram) and the pack2
    kernel (interpret mode on CPU) — byte output must stay identical
    to the numpy oracle.  Shape chosen non-block-aligned so late-block
    holes are exercised."""
    import numpy as np
    from sz_tpu.core import regnd

    monkeypatch.setenv("SZ_TPU_PACK2", "force")
    rng = np.random.default_rng(8)
    data = (np.sin(np.linspace(0, 9, 25 * 14 * 20, dtype=np.float32))
            + 0.05 * rng.standard_normal(25 * 14 * 20)
            ).astype(np.float32).reshape(25, 14, 20)
    a = regnd.compress(data, 1e-3, **KW)
    b = engine.compress(data, 1e-3, **KW)
    assert a.body == b.body
    # decode side: v2 gather-free delattice (hole insertion + inverse
    # blocked transpose + searchsorted escapes) stays bit-identical
    oa = regnd.decompress(a.body, data.shape, np.float32)
    ob = engine.decompress(a.body, data.shape, np.float32)
    np.testing.assert_array_equal(oa.view(np.uint32), ob.view(np.uint32))


def test_plane_quantize_2d(monkeypatch):
    """Rank-2 fields ride the 3-D plane kernel as a single x-plane
    (zero previous plane == the 2-D Lorenzo stencil); byte parity with
    the XLA/oracle path, including the ragged-padding branch."""
    import numpy as np
    from sz_tpu.core import regnd

    monkeypatch.setenv("SZ_TPU_PALLAS", "force")
    engine._quantize_fn.cache_clear()
    try:
        rng = np.random.default_rng(13)
        base = (np.sin(np.linspace(0, 20, 200 * 216, dtype=np.float32))
                + 0.05 * rng.standard_normal(200 * 216)
                ).astype(np.float32).reshape(200, 216)
        for d in (base, np.ascontiguousarray(base[:150, :130])):
            a = regnd.compress(d, 1e-3, **KW)
            b = _compress_with_mode("force", d, 1e-3)
            assert a.body == b.body
    finally:
        engine._quantize_fn.cache_clear()


def test_blocked_transpose_sliced(monkeypatch):
    """The blocked pad/unpad transposes slice axis-0 block groups to
    bound the tile-padded 6-D intermediate (17.6 GB OOM at 512^3).
    Forcing a tiny slice cap must not change the stream or the
    engine's bytes."""
    import numpy as np
    import jax.numpy as jnp
    from sz_tpu.core import regnd

    monkeypatch.setattr(engine, "_TRANSPOSE_SLICE_BYTES", 1 << 12)
    monkeypatch.setenv("SZ_TPU_PACK2", "force")
    shape = (25, 14, 20)
    g = engine._geom_small(shape, 6)
    x = np.arange(int(np.prod(shape)), dtype=np.int32).reshape(shape)
    tp = engine._blocked_pad_stream(jnp.asarray(x), tuple(g["dbs"]), -1)
    back = np.asarray(engine._blocked_unpad_lattice(
        tp, tuple(g["dbs"]), shape))
    np.testing.assert_array_equal(back, x)
    _, iperm = engine._host_stream_maps(shape, 6)
    np.testing.assert_array_equal(np.asarray(tp)[np.asarray(tp) >= 0],
                                  x.reshape(-1)[iperm])
    # compact corner transform: stream == take(iperm), unstream inverts,
    # and the closed-form position map matches iperm
    cs = engine._corner_stream(jnp.asarray(x), tuple(g["dbs"]), shape)
    np.testing.assert_array_equal(np.asarray(cs),
                                  x.reshape(-1)[iperm])
    np.testing.assert_array_equal(
        np.asarray(engine._corner_unstream(cs, tuple(g["dbs"]), shape)),
        x)
    pos = jnp.arange(int(np.prod(shape)) + 3, dtype=jnp.int32)
    lat = np.asarray(engine._pos_to_lat_expr(pos, tuple(g["dbs"]),
                                             shape))
    np.testing.assert_array_equal(lat[:len(iperm)], iperm)
    assert (lat[len(iperm):] == int(np.prod(shape))).all()
    rng = np.random.default_rng(17)
    data = (0.1 * rng.standard_normal(shape)).astype(np.float32)
    a = regnd.compress(data, 1e-3, **KW)
    b = engine.compress(data, 1e-3, **KW)
    assert a.body == b.body


def test_device_decode_fsm(monkeypatch):
    """SZ_TPU_DEVICE_DECODE=force routes decompress through the
    speculative chunk-parallel FSM kernel (tpu/fsm_kernel.py,
    interpret mode here; bit-exact + timed on v5e in tests/test_hw.py)
    — reconstruction identical to the host decoder; small streams take
    the documented fallback."""
    import numpy as np
    from sz_tpu.core import regnd

    monkeypatch.setenv("SZ_TPU_DEVICE_DECODE", "force")
    monkeypatch.setenv("SZ_TPU_PACK2", "force")
    rng = np.random.default_rng(23)
    # large enough to clear the FSM minimum-stream threshold (2^16 bits)
    data = (np.sin(np.linspace(0, 40, 48 ** 3, dtype=np.float32))
            + 0.2 * rng.standard_normal(48 ** 3)
            ).astype(np.float32).reshape(48, 48, 48)
    a = regnd.compress(data, 1e-3, **KW)
    oa = regnd.decompress(a.body, data.shape, np.float32)
    ob = engine.decompress(a.body, data.shape, np.float32)
    np.testing.assert_array_equal(oa.view(np.uint32), ob.view(np.uint32))


def test_fsm_decode_bits():
    """fsm_kernel.decode_bits_device recovers the exact symbol stream
    from a huffman.encode bitstream (multi-chunk, skewed distribution,
    self-sync verification on)."""
    from sz_tpu.format import huffman
    from sz_tpu.tpu import fsm_kernel as fsm

    rng = np.random.default_rng(29)
    n, nstate = 40000, 600
    p = 1.0 / np.arange(1, nstate + 1) ** 1.5
    types = rng.choice(np.arange(nstate), size=n,
                       p=p / p.sum()).astype(np.int32)
    tables = huffman.build_tables(types, nstate)
    enc = huffman.encode(tables, types)
    pad = (-len(enc)) % 4
    words = np.frombuffer(enc + b"\0" * pad, ">u4").astype(np.uint32)
    trans = fsm.build_trans(tables.L, tables.R, tables.C, tables.T)
    syms, ok = fsm.decode_bits_device(words, trans, n, len(enc) * 8,
                                      interpret=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(syms)[:n], types)


def test_wavefront_quantize_roundtrip(monkeypatch):
    """The opt-in rank-3 anti-diagonal wavefront (tpu/wf_quantize.py —
    one pass instead of ~15 fixpoint sweeps; default-off on v5e where
    the shear transposes outweigh the sweep savings) must keep byte
    parity on encode and bit parity on decode vs the numpy oracle."""
    from sz_tpu.core import regnd

    data = np.fromfile(GOLDEN / "synth_f32_64.dat",
                       dtype="<f4").reshape(64, 64, 64)
    res = regnd.compress(data, 1e-3, **KW)
    monkeypatch.setenv("SZ_TPU_QUANT_WF", "1")
    engine._quantize_fn.cache_clear()
    engine._decode_fn.cache_clear()
    try:
        blob = _compress_with_mode("force", data, 1e-3)
        assert res.body == blob.body
        monkeypatch.setenv("SZ_TPU_PALLAS", "force")
        oracle = regnd.decompress(res.body, data.shape, np.float32)
        out = engine.decompress(res.body, data.shape, np.float32)
        np.testing.assert_array_equal(np.asarray(out).view(np.uint32),
                                      oracle.view(np.uint32))
    finally:
        engine._quantize_fn.cache_clear()
        engine._decode_fn.cache_clear()


def test_fsm_decode_segmented():
    """decode_bits_segmented (the past-2^30-bit pipeline: per-segment
    record buffers, chunk-entry state carried across segments) must
    recover the exact stream — forced here with tiny seg_rows so a
    small stream crosses several segment boundaries."""
    from sz_tpu.format import huffman
    from sz_tpu.tpu import fsm_kernel as fsm

    rng = np.random.default_rng(31)
    n, nstate = 700_000, 300
    p = 1.0 / np.arange(1, nstate + 1) ** 1.4
    types = rng.choice(np.arange(nstate), size=n,
                       p=p / p.sum()).astype(np.int32)
    tables = huffman.build_tables(types, nstate)
    enc = huffman.encode(tables, types)
    pad = (-len(enc)) % 4
    words = np.frombuffer(enc + b"\0" * pad, ">u4").astype(np.uint32)
    trans = fsm.build_trans(tables.L, tables.R, tables.C, tables.T)
    total_bits = len(enc) * 8
    assert fsm.bucket_rows(total_bits) > 1   # multiple segments
    syms, ok = fsm.decode_bits_segmented(words, trans, total_bits, n,
                                         seg_rows=1, interpret=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(syms)[:n], types)
