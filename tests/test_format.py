"""Unit tests for the byte/bit/coding layers (analog of test/cunit-test)."""

import numpy as np
import pytest

from sz_tpu.format import bytes_util as bu
from sz_tpu.format import huffman
from sz_tpu.format import lossless as ll
from sz_tpu.format import metadata as md
from sz_tpu.config import SZConfig, DataType, ErrorBoundMode, Lossless


def test_bit_pack_1b_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 7, 8, 9, 64, 1000]:
        flags = rng.integers(0, 2, n).astype(np.uint8)
        packed = bu.pack_bits_1(flags)
        assert len(packed) == (n + 7) // 8
        np.testing.assert_array_equal(bu.unpack_bits_1(packed, n), flags)


def test_bit_pack_2b_roundtrip():
    rng = np.random.default_rng(1)
    for n in [1, 3, 4, 5, 1000]:
        vals = rng.integers(0, 4, n).astype(np.uint8)
        packed = bu.pack_bits_2(vals)
        np.testing.assert_array_equal(bu.unpack_bits_2(packed, n), vals)


@pytest.mark.parametrize("dist", ["uniform", "linear", "skewed", "constant"])
def test_huffman_roundtrip(dist):
    rng = np.random.default_rng(2)
    n = 20000
    if dist == "uniform":
        syms = rng.integers(0, 256, n)
    elif dist == "linear":
        syms = (np.arange(n) % 512)
    elif dist == "skewed":
        syms = np.minimum(rng.geometric(0.1, n), 300)
    else:
        syms = np.full(n, 42)
    syms = syms.astype(np.int32)
    t = huffman.build_tables(syms, 1024)
    enc = huffman.encode(t, syms)
    dec = huffman.decode(t.L, t.R, t.C, t.T, enc, n)
    np.testing.assert_array_equal(dec, syms)


def test_huffman_tree_serialization_roundtrip():
    rng = np.random.default_rng(3)
    syms = rng.integers(0, 100, 5000).astype(np.int32)
    t = huffman.build_tables(syms, 512)
    L, R, C, T = huffman.deserialize_tree(t.tree_bytes, t.node_count)
    np.testing.assert_array_equal(L, t.L)
    np.testing.assert_array_equal(C, t.C)
    enc = huffman.encode(t, syms)
    dec = huffman.decode(L, R, C, T, enc, len(syms))
    np.testing.assert_array_equal(dec, syms)


@pytest.mark.parametrize("backend", [Lossless.ZSTD, Lossless.GZIP])
def test_lossless_roundtrip_and_sniff(backend):
    data = bytes(range(256)) * 100
    blob = ll.compress(data, backend, 3)
    assert ll.sniff(blob) == backend
    assert ll.decompress(blob, expected_size=len(data)) == data


def test_metadata_header_roundtrip():
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4)
    hdr = md.make_header(cfg, DataType.FLOAT, np.float32(-1.5),
                         np.float32(2.5), regression=True)
    assert len(hdr) == 4 + 28
    p = md.parse_header(hdr, DataType.FLOAT)
    assert p.regression and not p.same and p.size_type == 8
    assert p.params.error_bound_mode == int(ErrorBoundMode.ABS)
    assert p.params.sample_distance == cfg.sample_distance
    assert np.isclose(p.params.bound1, 1e-4)
    assert p.params.fmin == np.float32(-1.5)
    assert p.params.max_quant_intervals == 65536


def test_huffman_parallel_decode_no_sync_fallback():
    """Adversarial case for the speculative chunk-parallel FSM decode:
    a uniform 8-symbol tree gives every code exactly 3 bits, so a chunk
    entered at a bit phase not divisible by 3 NEVER re-synchronizes
    with the speculative (state-0) trajectory — the decoder must detect
    this and fall back to the serial path with identical output."""
    rng = np.random.default_rng(7)
    n = 3_000_000  # > the 2^19-byte parallel threshold after encoding
    syms = rng.integers(0, 8, n).astype(np.int32)
    t = huffman.build_tables(syms, 16)
    assert int(t.code_len[t.code_len > 0].max()) == 3  # uniform tree
    enc = huffman.encode(t, syms)
    assert len(enc) >= (1 << 19)
    dec = huffman.decode(t.L, t.R, t.C, t.T, enc, n)
    np.testing.assert_array_equal(dec, syms)


def test_huffman_parallel_decode_matches_serial_large():
    """Self-syncing large stream: the chunk-parallel FSM decode must be
    bit-identical to the serial FSM walk."""
    rng = np.random.default_rng(8)
    n = 2_000_000
    syms = np.minimum(rng.geometric(0.03, n), 1000).astype(np.int32)
    t = huffman.build_tables(syms, 2048)
    enc = huffman.encode(t, syms)
    dec = huffman.decode(t.L, t.R, t.C, t.T, enc, n)
    np.testing.assert_array_equal(dec, syms)
    # truncated decode (count < full symbol stream) stays exact
    m = n // 3 + 17
    dec2 = huffman.decode(t.L, t.R, t.C, t.T, enc, m)
    np.testing.assert_array_equal(dec2, syms[:m])
