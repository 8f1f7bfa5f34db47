"""Pallas TPU kernel for the Huffman bit-pack (encode direction).

This is the TPU-native form of the reference's serial bitstream append
(Huffman.c:205-308) and the chunk-parallel C pack
(native/core.c huff_encode_chunks): MSB-first concatenation of
per-symbol variable-length codes (<= 32 bits each).

Why a kernel: at 2^27 symbols the XLA scatter-add pack
(engine._bitpack_fn) is ~5 s on v5e — scatter-add serializes on TPU —
and the measured XLA log-depth concatenation reduction
(engine._bitpack_tree_fn) is 5x worse still because every level's
(W, m) word buffer round-trips HBM (BASELINE.md session 6).  Here the
SAME reduction runs entirely in VMEM inside ONE pallas_call, and the
final placement is a pair of near-sequential GATHERS (fast on TPU,
unlike scatters):

  * stage 1 (Pallas, grid over symbol chunks of S symbols): each chunk
    reduces its S codes to one bit-string with a balanced binary
    concatenation tree ("concat two MSB-first bit strings" is
    associative).  All tree levels live in VMEM/vector registers — the
    per-level materialization that killed the XLA form never happens.
    The chunk's string is pre-shifted right by its absolute bit
    offset's word remainder (the offsets are an XLA cumsum of exact
    per-chunk bit totals — order-independent, so the intra-chunk
    bit-reversal permutation below does not disturb them) and written
    to a STATIC per-chunk block of a (C, OW) staging buffer.  No
    dynamic DMA: Mosaic rejects dynamic word-offset slices of a tiled
    output, which is what sank the direct read-modify-write variant.
  * stage 2 (XLA): output word j receives contributions from at most
    two chunks — its owner c(j) (the last chunk whose word offset
    base_w <= j; chunks span >= 8 words so overlaps are single-word
    boundaries) and c(j)-1.  c(j) is a tiny C-element scatter + cumsum;
    the two contributions are masked takes from the staging buffer,
    OR-combined.  Both gathers are near-sequential in j.

Tree layout (TPU tiling): a level holds m items of W=S/m words each.
Items are paired (j, j+m/2) — contiguous half-splits, which Mosaic
vectorizes — and the inputs are pre-permuted by intra-chunk
bit-reversal so that half-split pairing reproduces adjacent-pair
order (the standard FFT-style identity; bit-reversal is an
involution).  Early levels keep items in lanes / words in sublanes
(W, m); once m reaches 128 the state transposes to items-in-sublanes /
words-in-lanes (m, W) so lanes stay full as W grows.

The merge of (A, dA words, sA bits) ++ (B, dB, sB):
  B' = B >> sA | (B << (32-sA)) shifted one word  — two VPU ops;
  B' barrel-shifted by dA words — log2(W)+1 masked static rolls;
  out = A | B';  d = dA+dB+((sA+sB)>>5);  s = (sA+sB)&31.

Pure integer ops throughout — the output is bit-identical to
engine._bitpack_fn by construction (asserted in tests/test_pallas.py
against random code tables, and on hardware by tools/tpu_timings.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


def chunk_symbols() -> int:
    """Symbols per chunk (power of two, >= 256).  2^13 keeps the whole
    tree under ~200 KB of VMEM values; SZ_TPU_PACK_CHUNK overrides."""
    v = int(os.environ.get("SZ_TPU_PACK_CHUNK", 8192))
    assert v >= 256 and (v & (v - 1)) == 0
    return v


@functools.lru_cache(maxsize=8)
def _brev(S: int) -> np.ndarray:
    """Bit-reversal permutation of range(S)."""
    bits = int(S - 1).bit_length()
    idx = np.arange(S, dtype=np.int64)
    out = np.zeros(S, dtype=np.int64)
    for b in range(bits):
        out = (out << 1) | ((idx >> b) & 1)
    return out.astype(np.int32)


def _shiftz(arr, sh: int, axis: int):
    """Shift down/right by static sh along axis, zero fill."""
    r = pltpu.roll(arr, jnp.int32(sh), axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
    return jnp.where(idx < jnp.int32(sh), jnp.zeros_like(arr), r)


def _shl32m(x, s):
    """x << (32 - s) with s == 0 -> 0 (s int32, x uint32)."""
    return jnp.where(s == jnp.int32(0), jnp.zeros_like(x),
                     x << (jnp.int32(32) - s).astype(_U32))


def _merge_a(state, dw, sb, h: int):
    """Phase-A merge: state (W, 2h) -> (2W, h); items in lanes."""
    W = state.shape[0]
    A, B = state[:, :h], state[:, h:]
    dA, sA = dw[:, :h], sb[:, :h]
    dB, sB = dw[:, h:], sb[:, h:]
    lo = B >> sA.astype(_U32)
    hi = _shl32m(B, sA)
    z = jnp.zeros((W, h), _U32)
    Bp = (jnp.concatenate([lo, z], 0)
          | _shiftz(jnp.concatenate([hi, z], 0), 1, 0))
    for b in range(W.bit_length()):           # dA in [0, W]
        Bp = jnp.where(((dA >> b) & 1) == 1, _shiftz(Bp, 1 << b, 0), Bp)
    out = jnp.concatenate([A, z], 0) | Bp
    s2 = sA + sB
    return out, dA + dB + (s2 >> 5), s2 & 31


def _merge_b(state, dw, sb, h: int):
    """Phase-B merge: state (2h, W) -> (h, 2W); words in lanes.
    Only valid for h % 8 == 0 (row slices at sublane offsets that are
    not multiples of 8 produce layouts Mosaic cannot concatenate —
    use _merge_b8 for the final levels)."""
    W = state.shape[1]
    A, B = state[:h], state[h:]
    dA, sA = dw[:h], sb[:h]
    dB, sB = dw[h:], sb[h:]
    lo = B >> sA.astype(_U32)
    hi = _shl32m(B, sA)
    z = jnp.zeros((h, W), _U32)
    Bp = (jnp.concatenate([lo, z], 1)
          | _shiftz(jnp.concatenate([hi, z], 1), 1, 1))
    for b in range(W.bit_length()):
        Bp = jnp.where(((dA >> b) & 1) == 1, _shiftz(Bp, 1 << b, 1), Bp)
    out = jnp.concatenate([A, z], 1) | Bp
    s2 = sA + sB
    return out, dA + dB + (s2 >> 5), s2 & 31


def _merge_b8(state, dw, sb, h: int):
    """Final-levels merge (h in {4, 2, 1}) on a fixed (8, W) tile: items
    live in rows 0..2h-1, the merged result lands in rows 0..h-1.  Row
    slices at sublane offsets 4/2/1 break Mosaic layouts ("offset
    mismatch on non-concat dimension"), so B is aligned to row 0 with a
    full-tile sublane roll and the garbage rows ride along — all shifts
    here are along lanes, so rows never mix and rows >= h stay inert."""
    W = state.shape[1]
    r = jnp.int32(8 - h)
    B = pltpu.roll(state, r, 0)
    dB = pltpu.roll(dw, r, 0)
    sB = pltpu.roll(sb, r, 0)
    A, dA, sA = state, dw, sb
    lo = B >> sA.astype(_U32)
    hi = _shl32m(B, sA)
    z = jnp.zeros((8, W), _U32)
    Bp = (jnp.concatenate([lo, z], 1)
          | _shiftz(jnp.concatenate([hi, z], 1), 1, 1))
    for b in range(W.bit_length()):
        Bp = jnp.where(((dA >> b) & 1) == 1, _shiftz(Bp, 1 << b, 1), Bp)
    out = jnp.concatenate([A, z], 1) | Bp
    s2 = sA + sB
    return out, dA + dB + (s2 >> 5), s2 & 31


def _make_kernel(S: int, OW: int):
    def kernel(rem_ref, c32_ref, len_ref, out_ref):
        c = pl.program_id(0)
        state = c32_ref[0]                         # (1, S) u32
        lens = len_ref[0]                          # (1, S) i32
        dw, sb = lens >> 5, lens & 31

        # phase A: items in lanes, until 128 items remain
        h = S // 2
        while h >= 128:
            state, dw, sb = _merge_a(state, dw, sb, h)
            h //= 2
        # state (S/128, 128); move items to sublanes, words to lanes
        state = state.T                            # (128, S/128)
        dw = dw.reshape(128, 1)
        sb = sb.reshape(128, 1)
        while h >= 8:
            state, dw, sb = _merge_b(state, dw, sb, h)
            h //= 2
        # state (8, S/8): last 3 levels stay on a full 8-row tile
        while h >= 1:
            state, dw, sb = _merge_b8(state, dw, sb, h)
            h //= 2
        state = state[:1]
        # state (1, S): the chunk's bit string, MSB-first from word 0

        rem = rem_ref[c]                           # 0..31
        rem2 = jnp.full((1, 1), rem, jnp.int32)
        z1 = jnp.zeros((1, OW - S), _U32)
        w = jnp.concatenate([state, z1], 1)        # (1, OW)
        out = ((w >> jnp.full((1, 1), rem, _U32))
               | _shl32m(_shiftz(w, 1, 1), rem2))
        out_ref[0] = out

    return kernel


@functools.lru_cache(maxsize=32)
def _pack_call(C: int, S: int, interpret: bool):
    OW = S + 128
    kernel = _make_kernel(S, OW)
    z = np.int32(0)
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            # whole-(C,) SMEM array indexed by program id (per-(1,1)
            # blocks fail Mosaic's tiling check even in SMEM); C*4 B is
            # well under SMEM capacity at the chunk sizes in use.  The
            # explicit int32 index map matters: the engine enables jax
            # x64, under which the default map returns i64 and fails
            # Mosaic's func.return legalization (pallas_kernels.py:166)
            pl.BlockSpec((C,), lambda c: (z,),
                         memory_space=pltpu.SMEM),         # bit remainder
            pl.BlockSpec((1, 1, S), lambda c: (c, z, z)),  # c32 chunk
            pl.BlockSpec((1, 1, S), lambda c: (c, z, z)),  # lens chunk
        ],
        out_specs=pl.BlockSpec((1, 1, OW), lambda c: (c, z, z)),
        out_shape=jax.ShapeDtypeStruct((C, 1, OW), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def pack_bits(t_stream, code_hi32, code_len, n: int, out_bytes: int,
              *, interpret: bool = False):
    """Traceable device Huffman bit-pack: stream-ordered symbols +
    per-symbol code table -> big-endian packed byte stream, identical
    to engine._bitpack_fn(t_stream, code_hi, code_len).

    t_stream: (n,) integer symbols (any int dtype).
    code_hi32: (state,) uint32 — MSB-aligned codes ((code_hi >> 32)).
    code_len: (state,) int32 code lengths, all <= 32.
    """
    assert out_bytes % 4 == 0
    S = chunk_symbols()
    C = -(-n // S)
    n_pad = C * S
    OW = S + 128
    nwords = out_bytes // 4

    sym = t_stream.astype(jnp.int32)
    if n_pad > n:
        sym = jnp.concatenate(
            [sym, jnp.zeros((n_pad - n,), jnp.int32)])
    # intra-chunk bit-reversal (see module docstring); pad symbols get
    # zero-length zero codes via the validity mask.  The permutation is
    # built on device from an iota + the (S,) reversal table — a
    # host-side (n,) index array would embed a lattice-sized constant.
    src = (jnp.arange(C, dtype=jnp.int32)[:, None] * S
           + jnp.asarray(_brev(S))[None, :]).reshape(-1)
    sym = jnp.take(sym, src)
    lens = jnp.take(code_len, sym)
    c32 = jnp.take(code_hi32, sym)
    if n_pad > n:
        valid = src < n
        lens = jnp.where(valid, lens, 0)
        c32 = jnp.where(valid, c32, jnp.uint32(0))
    lens2 = lens.reshape(C, S)
    # per-chunk totals are exact in int32 (<= 32*S); the cross-chunk
    # cumsum can exceed 2^31 bits at >2^26 symbols -> int64 on the tiny
    # (C,) array only
    chunk_bits = jnp.sum(lens2, axis=1, dtype=jnp.int32)
    off_t = jnp.int32 if n_pad * 32 < (1 << 31) else jnp.int64
    base = jnp.cumsum(chunk_bits.astype(off_t)) - chunk_bits
    base_w = (base >> 5).astype(jnp.int32)
    rem = (base & 31).astype(jnp.int32)

    stage = _pack_call(C, S, interpret)(
        rem, c32.reshape(C, 1, S), lens2.reshape(C, 1, S))
    flat = stage.reshape(-1)  # (C * OW,)

    # placement: word j's owner chunk c(j) = (# base_w <= j) - 1.
    # base_w is strictly increasing (every non-final chunk carries
    # >= S bits >= 8 words), so a C-element scatter + cumsum finds it.
    marks = jnp.zeros((nwords,), jnp.int32).at[base_w].add(
        1, mode="drop", indices_are_sorted=True, unique_indices=True)
    c_of_j = jnp.cumsum(marks) - 1
    j = jnp.arange(nwords, dtype=jnp.int32)
    d1 = j - jnp.take(base_w, c_of_j)
    idx1 = jnp.where(d1 < OW, c_of_j * OW + d1, -1)
    v1 = jnp.take(flat, idx1, mode="fill", fill_value=0)
    c2 = c_of_j - 1
    d2 = j - jnp.take(base_w, jnp.maximum(c2, 0))
    idx2 = jnp.where((c2 >= 0) & (d2 < OW), c2 * OW + d2, -1)
    v2 = jnp.take(flat, idx2, mode="fill", fill_value=0)
    words = v1 | v2

    b = jax.lax.bitcast_convert_type(words, jnp.uint8)  # (nwords, 4) LE
    return b[:, ::-1].reshape(-1)  # big-endian byte stream
