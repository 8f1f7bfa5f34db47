"""Opt-in REAL-HARDWARE kernel tests (VERDICT r2 weak #6/#9).

The regular suite runs every Pallas kernel in interpret mode on CPU —
a Mosaic lowering regression would pass CI and only surface on
hardware.  Run this module on a machine with a TPU attached:

    SZ_TPU_HW_TESTS=1 SZ_TPU_TEST_PLATFORM=axon python -m pytest \
        tests/test_hw.py -v

(SZ_TPU_TEST_PLATFORM overrides conftest's CPU pin; "tpu" for directly
attached chips.)  Each test compiles the kernel for the chip and
asserts bit parity against the host/XLA oracle.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SZ_TPU_HW_TESTS", "") != "1",
    reason="hardware kernel tests are opt-in: SZ_TPU_HW_TESTS=1")


@pytest.fixture(scope="module")
def tpu():
    jax = pytest.importorskip("jax")
    if jax.default_backend() in ("cpu",):
        pytest.skip("no TPU attached (set SZ_TPU_TEST_PLATFORM)")
    return jax


def test_hw_pack2_parity(tpu):
    from types import SimpleNamespace
    import jax.numpy as jnp
    from sz_tpu.tpu import engine as eng
    from sz_tpu.tpu import pack_kernel as pk

    rng = np.random.default_rng(5)
    nstate = 65536
    n = 1 << 18
    code_len = np.zeros(nstate, np.int32)
    used = np.arange(30000, 31000)
    code_len[used] = rng.integers(1, 27, len(used))
    code_len[0] = 9
    vals = ((rng.integers(0, 1 << 16, nstate).astype(np.uint64) << 16)
            | rng.integers(0, 1 << 16, nstate).astype(np.uint64))
    vals &= (np.uint64(1) << np.maximum(code_len, 1).astype(
        np.uint64)) - np.uint64(1)
    code_hi = np.where(
        code_len > 0,
        vals << (np.uint64(64) - np.maximum(code_len, 1).astype(
            np.uint64)), 0)
    t = rng.choice(used, size=n).astype(np.uint16)
    t[rng.random(n) < 0.07] = 0
    freq = np.bincount(t, minlength=nstate)
    total_bits = int(code_len[t].astype(np.int64).sum())
    out_bytes = ((total_bits + 31) // 32) * 4
    lo, K = pk.window_from_freq(freq, code_len)
    tbl = jnp.asarray(pk.build_window_table(
        SimpleNamespace(code_hi=code_hi, code_len=code_len), lo, K))
    got = np.asarray(pk.pack2_bits(
        jnp.asarray(t), tbl, lo, int(code_len[0]),
        int(code_hi[0] >> np.uint64(32)), n, out_bytes)).view(np.uint8)
    ref = np.asarray(eng._bitpack_fn(n, out_bytes, "tpu")(
        jnp.asarray(t), jnp.asarray(code_hi), jnp.asarray(code_len)))
    np.testing.assert_array_equal(ref, got[:len(ref)])


def test_hw_hist_parity(tpu):
    from sz_tpu.tpu import hist_kernel as hk
    rng = np.random.default_rng(6)
    sym = rng.integers(0, 65536, 1 << 18).astype(np.int32)
    got = np.asarray(hk.histogram(sym))
    np.testing.assert_array_equal(got, np.bincount(sym, minlength=65536))


def test_hw_engine_roundtrip(tpu):
    """Full engine compress/decompress on the chip, byte/bit-exact vs
    the numpy oracle (exercises the Pallas quantize, pack2, hist, and
    the v2 delattice in compiled mode)."""
    from sz_tpu.core import regnd
    from sz_tpu.tpu import engine

    KW = dict(max_range_radius=32768, sample_distance=100,
              pred_threshold=np.float32(0.99))
    rng = np.random.default_rng(7)
    data = (np.sin(np.linspace(0, 20, 96 ** 3, dtype=np.float32))
            + 0.05 * rng.standard_normal(96 ** 3).astype(np.float32)
            ).reshape(96, 96, 96)
    a = regnd.compress(data, 1e-3, **KW)
    b = engine.compress(data, 1e-3, **KW)
    assert a.body == b.body
    oa = regnd.decompress(a.body, data.shape, np.float32)
    ob = engine.decompress(a.body, data.shape, np.float32)
    np.testing.assert_array_equal(oa.view(np.uint32), ob.view(np.uint32))


def test_hw_fsm_decode(tpu):
    """Compiled FSM decode on the chip: exact symbols + sync verify."""
    from sz_tpu.format import huffman
    from sz_tpu.tpu import fsm_kernel as fsm

    rng = np.random.default_rng(31)
    n, nstate = 1 << 20, 2000
    p = 1.0 / np.arange(1, nstate + 1) ** 1.4
    types = rng.choice(np.arange(nstate), size=n,
                       p=p / p.sum()).astype(np.int32)
    tables = huffman.build_tables(types, nstate)
    enc = huffman.encode(tables, types)
    pad = (-len(enc)) % 4
    words = np.frombuffer(enc + b"\0" * pad, ">u4").astype(np.uint32)
    trans = fsm.build_trans(tables.L, tables.R, tables.C, tables.T)
    syms, ok = fsm.decode_bits_device(words, trans, n, len(enc) * 8)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(syms)[:n], types)


def test_hw_msst19_wavefront(tpu):
    """MSST19 wavefront engine on the chip: byte-identical stream and
    bit-identical reconstruction vs the host kernels (a known-clean
    field — parity on emulated-f64 backends is empirical, see the
    engine docstring)."""
    from sz_tpu.core import pwr
    from sz_tpu.format import tdps as tdps_mod
    from sz_tpu.tpu import msst19_engine as me

    KW = dict(max_range_radius=32768, sample_distance=100,
              pred_threshold=0.99, plus_bits=3)
    n = 96
    rng = np.random.default_rng(11)
    ax = np.linspace(0.1, 12 * np.pi, n, dtype=np.float32)
    data = np.exp(np.sin(ax)[:, None, None] * np.cos(ax)[None, :, None]
                  + 0.05 * rng.standard_normal((n, n, n)).astype(
                      np.float32)).astype(np.float32)
    fmax = data.max()
    nz = np.abs(data[data != 0]).min()
    t_h = pwr.compress_msst19(data, 1e-3, fmax, nz, **KW)
    t_d = me.compress(data, 1e-3, fmax, nz, **KW)
    assert tdps_mod.to_bytes(t_h) == tdps_mod.to_bytes(t_d)
    o_h = pwr.decompress_pwrel(t_h, (n, n, n), np.float32)
    o_d = me.decompress(t_h, (n, n, n), np.float32)
    np.testing.assert_array_equal(np.asarray(o_h).view(np.uint32),
                                  np.asarray(o_d).view(np.uint32))


def test_hw_msst19_2d(tpu):
    """2D MSST19 on the chip (single-precision soft chain + line
    kernel): byte/bit parity with the host — GUARANTEED by
    construction, so any mismatch is a Mosaic lowering regression."""
    from sz_tpu.core import pwr
    from sz_tpu.format import tdps as tdps_mod
    from sz_tpu.tpu import msst19_engine as me

    KW = dict(max_range_radius=32768, sample_distance=100,
              pred_threshold=0.99, plus_bits=3)
    rng = np.random.default_rng(13)
    x = np.linspace(0.1, 9.3, 300)[:, None]
    y = np.linspace(0.2, 7.1, 420)[None, :]
    data = (np.abs(np.exp(np.sin(x) * np.cos(y))
                   * (1 + 0.05 * rng.standard_normal((300, 420))))
            + 0.01).astype(np.float32)
    fmax = data.max()
    nz = np.abs(data[data != 0]).min()
    t_h = pwr.compress_msst19(data, 1e-3, fmax, nz, **KW)
    t_d = me.compress(data, 1e-3, fmax, nz, **KW)
    assert getattr(t_d, "_device_exact", False)
    assert tdps_mod.to_bytes(t_h) == tdps_mod.to_bytes(t_d)
    o_h = pwr.decompress_pwrel(t_h, (300, 420), np.float32)
    o_d = me.decompress(t_h, (300, 420), np.float32)
    np.testing.assert_array_equal(np.asarray(o_h).view(np.uint32),
                                  np.asarray(o_d).view(np.uint32))


def test_hw_wavefront_quantize(tpu):
    """Rank-3 classic/regression wavefront quantize + decode on the
    chip: byte parity with the numpy oracle through the full engine
    (the bench's hw_parity gate covers 256^3; this is the suite-level
    gate at 96^3 with use_mean)."""
    from sz_tpu.core import regnd
    from sz_tpu.tpu import engine

    KW = dict(max_range_radius=32768, sample_distance=100,
              pred_threshold=np.float32(0.99))
    n = 96
    rng = np.random.default_rng(17)
    ax = np.linspace(0, 8 * np.pi, n)
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    data = (np.sin(xx) * np.cos(yy) * np.sin(zz)
            + 0.1 * rng.standard_normal((n, n, n))).astype(np.float32)
    res = regnd.compress(data, 1e-3, **KW)
    blob = engine.compress(data, 1e-3, **KW)
    assert res.body == blob.body
    oracle = regnd.decompress(res.body, data.shape, np.float32)
    out = engine.decompress(res.body, data.shape, np.float32)
    np.testing.assert_array_equal(np.asarray(out).view(np.uint32),
                                  oracle.view(np.uint32))
