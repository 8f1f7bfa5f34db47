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


# ---------------------------------------------------------------------------
# pack2: the fully in-kernel pack.
#
# pack_bits above still pays XLA per-element gathers for the code-table
# lookups and the placement (~9 ns/element on v5e — the measured wall
# shared by every XLA formulation, BASELINE.md session 7).  pack2 moves
# ALL per-symbol work into the kernel:
#
#   * the intra-chunk bit-reversal permutation is two constant lane
#     permutations around a (128, 128) transpose (for S = 2^14, the
#     14-bit reversal factors as rev7 x rev7: brev(r*128+c) =
#     rev7(c)*128 + rev7(r)) — no n-element XLA gather;
#   * the Huffman table lookup is K dynamic lane gathers from a
#     VMEM-resident window table ((K,128) u32, code<<(32-len) | len,
#     valid when max_len <= 26 so code and length bits cannot collide),
#     plus a select for the always-special escape symbol 0.  Dynamic
#     lane gathers measure ~0.2 ns/element in-kernel — ~50x XLA's;
#   * per-chunk absolute bit offsets accumulate in SMEM scratch across
#     the sequential grid (words + bit-remainder int32 pair, no int64);
#   * placement is a read-OR-write of an 18-row (8,128) window of the
#     HBM output at a dynamic leading-dim offset (row = 1024 words), so
#     the boundary words between chunks compose by OR and no XLA
#     placement gathers remain.
#
# The symbol window [lo, lo+128K) must cover every nonzero-frequency
# symbol except 0; the caller derives it from the Huffman frequency
# table it already has and falls back to pack_bits when the window or
# max_len does not fit.
# ---------------------------------------------------------------------------

S2 = 16384            # pack2 chunk symbols (2^14: brev factors as rev7^2)
_REV7 = np.array([int(f"{i:07b}"[::-1], 2) for i in range(128)],
                 dtype=np.int32)


def _lane_gather(x, idx):
    """out[i, j] = x[i, idx[i, j]] — Mosaic dynamic lane gather."""
    return jax.lax.gather(
        x, idx.astype(jnp.int32)[..., None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,),
            start_index_map=(1,), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,)),
        (1, 1), mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _make_kernel2(K: int, OW: int, WR: int):
    S = S2

    def kernel(zero_ref, params_ref, rev_ref, tbl_ref,
               sym_ref, out_hbm, win, acc, sem_r, sem_w):
        del zero_ref  # aliased to out_hbm; exists only to zero-init it
        c = pl.program_id(0)

        @pl.when(c == jnp.int32(0))
        def _():
            acc[0] = jnp.int32(0)   # base word offset
            acc[1] = jnp.int32(0)   # bit remainder

        base_w, rem = acc[0], acc[1]
        row0 = base_w >> 10
        rd = pltpu.make_async_copy(
            out_hbm.at[pl.ds(row0, WR)], win, sem_r)
        rd.start()

        lo = params_ref[0]
        len0 = params_ref[1]
        code0 = params_ref[2].astype(jnp.uint32)  # i32 bitcast of c32

        # brev14 permute of the chunk's symbols: two constant rev7 lane
        # permutations around a transpose
        sq = sym_ref[0].reshape(128, 128)
        rev = jnp.broadcast_to(rev_ref[...][:1], (128, 128))
        sqb = _lane_gather(_lane_gather(sq, rev).T, rev)

        # windowed table lookup (code<<(32-len) | len); the escape
        # symbol 0 is handled by a select, and NEGATIVE symbols (the
        # callers' padding/hole sentinel) match no window row and fall
        # out with a zero-length zero code, i.e. contribute no bits
        widx = sqb - lo
        wlane = widx & jnp.int32(127)
        wrow = widx >> 7
        val = jnp.zeros((128, 128), _U32)
        for k in range(K):
            g = _lane_gather(
                jnp.broadcast_to(tbl_ref[k].reshape(1, 128), (128, 128)),
                wlane)
            val = jnp.where(wrow == jnp.int32(k), g, val)
        lens = (val & jnp.uint32(63)).astype(jnp.int32)
        c32 = val & ~jnp.uint32(63)
        is0 = sqb == jnp.int32(0)
        lens = jnp.where(is0, len0, lens)
        c32 = jnp.where(is0, code0, c32)
        # two single-axis keepdims sums: Mosaic's multi-axis/scalar
        # reduce proxies re-trace jnp.sum WITHOUT promote_integers=False
        # and make an (unsupported) int64 under the engine's x64 mode.
        # <= S*26 bits fits int32.
        cb = jnp.sum(lens, axis=1, keepdims=True, promote_integers=False)
        chunk_bits = jnp.sum(cb, axis=0, keepdims=True,
                             promote_integers=False)[0, 0]

        # balanced concat-tree reduction (same phases as _make_kernel)
        state = c32.reshape(1, S)
        dw, sb = lens.reshape(1, S) >> 5, lens.reshape(1, S) & 31
        h = S // 2
        while h >= 128:
            state, dw, sb = _merge_a(state, dw, sb, h)
            h //= 2
        state = state.T
        dw = dw.reshape(128, 1)
        sb = sb.reshape(128, 1)
        while h >= 8:
            state, dw, sb = _merge_b(state, dw, sb, h)
            h //= 2
        while h >= 1:
            state, dw, sb = _merge_b8(state, dw, sb, h)
            h //= 2
        state = state[:1]                           # (1, S) bit string

        # shift by the absolute offset's bit remainder, place at the
        # offset's word position within the aligned window, OR-merge
        rem2 = jnp.full((1, 1), rem, jnp.int32)
        z1 = jnp.zeros((1, OW - S), _U32)
        w = jnp.concatenate([state, z1], 1)         # (1, OW)
        out = ((w >> jnp.full((1, 1), rem, _U32))
               | _shl32m(_shiftz(w, 1, 1), rem2))
        wide = jnp.concatenate(
            [out, jnp.zeros((1, WR * 1024 - OW), _U32)], 1)
        wide = pltpu.roll(wide, base_w & jnp.int32(1023), 1)
        rd.wait()
        win[...] = win[...] | wide.reshape(WR, 8, 128)
        wr = pltpu.make_async_copy(
            win, out_hbm.at[pl.ds(row0, WR)], sem_w)
        wr.start()

        t = rem + chunk_bits
        acc[0] = base_w + (t >> 5)
        acc[1] = t & jnp.int32(31)
        wr.wait()

    return kernel


@functools.lru_cache(maxsize=32)
def _pack2_call(C: int, K: int, R8: int, interpret: bool):
    S = S2
    OW = S + 128
    WR = (OW + 1023) // 1024 + 1                    # roll adds < 1024 w
    kernel = _make_kernel2(K, OW, WR)
    z = np.int32(0)
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # zeros -> out alias
            pl.BlockSpec((4,), lambda c: (z,),
                         memory_space=pltpu.SMEM),  # lo, len0, code0
            pl.BlockSpec((8, 128), lambda c: (z, z)),   # rev7 rows
            pl.BlockSpec((K, 128), lambda c: (z, z)),   # window table
            pl.BlockSpec((1, 1, S), lambda c: (c, z, z)),  # symbols
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((R8, 8, 128), jnp.uint32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((WR, 8, 128), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


MAX_WINDOW_ROWS = 32     # 4096-symbol window; wider falls back


def window_from_freq(freq, code_len) -> tuple | None:
    """Host-side window derivation: [lo, lo+128*K) covering every
    nonzero-frequency symbol except 0.  None if pack2 cannot apply
    (window too wide, or a code longer than 26 bits)."""
    freq = np.asarray(freq)
    code_len = np.asarray(code_len)
    m = min(len(freq), len(code_len))
    # symbol 0 bypasses the 6-bit-packed window table via the
    # len0/code0 select (top-32 code bits), so it tolerates codes up
    # to 32 bits; only window symbols are capped at 26
    if int(code_len[1:m][freq[1:m] > 0].max(initial=0)) > 26:
        return None
    if freq[0] > 0 and int(code_len[0]) > 32:
        return None
    used = np.flatnonzero(freq[1:m]) + 1
    lo = int(used.min()) if used.size else 1
    hi = int(used.max()) if used.size else 1
    K = -(-(hi - lo + 1) // 128)
    if K > MAX_WINDOW_ROWS:
        return None
    return lo, K


def build_window_table(tables, lo: int, K: int) -> np.ndarray:
    """(K, 128) uint32 table: (code_hi >> 32) | code_len for symbols
    [lo, lo + 128K); zero (len 0) where no code exists."""
    hi32 = (np.asarray(tables.code_hi) >> np.uint64(32)).astype(np.uint32)
    lens = np.asarray(tables.code_len).astype(np.uint32)
    out = np.zeros(K * 128, np.uint32)
    end = min(lo + K * 128, len(lens))
    if end > lo:
        out[:end - lo] = hi32[lo:end] | lens[lo:end]
    return out.reshape(K, 128)


def pack2_bits(t_stream, window_tbl, lo: int, len0: int, code0_c32: int,
               n: int, out_bytes: int, *, interpret: bool = False):
    """Fully in-kernel device Huffman bit-pack (see module comment).

    t_stream: (n,) integer symbols.  window_tbl: (K,128) uint32 from
    build_window_table.  len0/code0_c32: code for symbol 0 — length and
    the MSB-aligned top-32 code bits (code_hi >> 32) as a python int;
    pass 0,0 if symbol 0 never occurs.  Output: (out_bytes//4,) uint32
    whose little-endian host bytes (np.asarray(...).view(np.uint8)) are
    the big-endian packed stream, bit-identical to engine._bitpack_fn.
    """
    assert out_bytes % 4 == 0
    S = S2
    C = -(-n // S)
    n_pad = C * S
    nwords = out_bytes // 4
    K = window_tbl.shape[0]
    WR = (S + 128 + 1023) // 1024 + 1
    R8 = (nwords + 1023) // 1024 + WR

    sym = t_stream.astype(jnp.int32)
    if n_pad > n:
        # -1 sentinel: matches no window row in-kernel -> zero-length
        # code -> contributes no bits (callers may likewise embed -1
        # holes anywhere in the stream, e.g. ragged-block padding)
        sym = jnp.concatenate(
            [sym, jnp.full((n_pad - n,), -1, jnp.int32)])
    code0_i32 = int(np.uint32(code0_c32).view(np.int32))
    params = jnp.asarray([lo, len0, code0_i32, 0], jnp.int32)
    rev = jnp.asarray(np.broadcast_to(_REV7, (8, 128)))
    words = _pack2_call(C, K, R8, interpret)(
        jnp.zeros((R8, 8, 128), jnp.uint32), params, rev,
        window_tbl.astype(jnp.uint32), sym.reshape(C, 1, S))
    # byte-swap in u32 space: a bitcast to (nwords, 4) u8 would get a
    # T(8,128)-tiled layout whose dim-1 pads 4 -> 128 (32x HBM blow-up
    # at 2^27 symbols).  The returned u32 array holds the big-endian
    # byte stream in host memory order: np.asarray(...).view(np.uint8)
    # IS the packed stream.
    w = words.reshape(-1)[:nwords]
    return ((w >> jnp.uint32(24))
            | ((w >> jnp.uint32(8)) & jnp.uint32(0xFF00))
            | ((w & jnp.uint32(0xFF00)) << jnp.uint32(8))
            | (w << jnp.uint32(24)))
