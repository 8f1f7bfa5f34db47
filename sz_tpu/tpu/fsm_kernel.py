"""Pallas TPU Huffman DECODE: speculative chunk-parallel bit-FSM.

TPU-native form of the C speculative byte-FSM decoder
(native/core.c huff_fsm_decode_par, itself the parallel form of the
reference's serial tree walk, Huffman.c decode/szd_float.c replay):

  * the bitstream splits into F-bit chunks, ONE CHUNK PER LANE of a
    (R,128) tile.  Every lane consumes exactly one bit per step, so the
    bit cursor stays uniform across lanes: bit extraction is a static
    shift of the current word tile, and the tree-walk transition is a
    windowed VMEM table lookup (trans[2*state+bit] via K dynamic lane
    gathers + selects — the pack2 lookup machinery).  Huffman streams
    self-synchronize, so decoding every chunk speculatively from the
    ROOT converges to the true state trajectory within a few codewords.
  * kernel A (speculative sweep): all chunks decode from root,
    emitting per-bit records (symbol | emit-flag, 0 when no leaf) at
    STATIC output rows, plus per-chunk (state, count) snapshots at bit
    P and at the chunk end.
  * reconciliation (XLA, O(L)): chunk c's true entry state is chunk
    c-1's speculative exit state (chunk 0 starts at root, which is
    exact; induction holds when every chunk verifies).
  * kernel B (prefix fix): re-decodes only the first P bits of each
    chunk from its true entry, emitting corrected records and
    verifying state(P) matches the speculative snapshot — if ANY chunk
    fails to self-sync within P bits (never observed on real streams;
    the C code keeps the same bail-out) the caller falls back to the
    host decoder.
  * compaction (kernel C): the corrected record rows are concatenated
    per chunk with the pack2 merge tree — an emitting record is a
    32-bit field holding the symbol, a non-emitting record contributes
    ZERO bits — so the tree's output words ARE the dense u32 symbol
    stream, placed at the chunk's true output offset by the same SMEM
    running accumulator + read-OR-write window DMA as pack2.

Everything reuses kernel machinery proven bit-exact in pack2
(tpu/pack_kernel.py): window lane-gather lookups, the balanced concat
tree, in-kernel brev, SMEM accumulators, RMW placement.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sz_tpu.tpu import pack_kernel as _pk

_U32 = jnp.uint32

F_BITS = 16384          # bits per lane-chunk (= pack2's S2 for kernel C)
P_BITS = 2048           # speculative sync window (C uses 4096 BYTES)
MAX_NODES = 8192        # transition window cap: K = 2*nodes/128 <= 128


def build_trans(L, R, C, T) -> np.ndarray:
    """(K,128) uint32 transition window: trans[2s+b] = child of node s
    on bit b; leaves encode (0x80000000 | symbol) and reset to root."""
    nc = len(L)
    s = np.arange(nc, dtype=np.int64)
    out = np.zeros(((2 * nc + 127) // 128) * 128, np.uint32)
    for b, kid in ((0, np.asarray(L)), (1, np.asarray(R))):
        kid = kid.astype(np.int64)
        leaf = np.asarray(T)[kid] != 0
        val = np.where(leaf,
                       np.uint32(0x80000000)
                       | np.asarray(C)[kid].astype(np.uint32),
                       kid.astype(np.uint32))
        out[2 * s + b] = val
    return out.reshape(-1, 128)


def _make_fsm_kernel(K: int, R: int, steps: int, pc: int):
    """FSM sweep kernel: grid over 32-bit word steps; one chunk per
    lane.  pc = snapshot step (state/count at bit 32*pc).  The stream
    bit length arrives as an SMEM scalar so one compiled kernel serves
    every stream in a (K, R) size bucket."""

    def kernel(tb_ref, trans_ref, entry_ref, words_ref, rec_ref,
               snap_ref, end_ref, state, cnt):
        g = pl.program_id(0)
        total_bits = tb_ref[0]

        @pl.when(g == jnp.int32(0))
        def _():
            state[...] = entry_ref[...]
            cnt[...] = jnp.zeros((R, 128), jnp.int32)

        w = words_ref[0]                              # (R,128) u32
        chunk = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                 + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
        base_bit = chunk * jnp.int32(F_BITS) + g * jnp.int32(32)
        st = state[...]
        c = cnt[...]
        for b in range(32):
            bit = ((w >> jnp.uint32(31 - b)) & jnp.uint32(1)).astype(
                jnp.int32)
            idx = 2 * st + bit
            wrow = idx >> 7
            wlane = idx & jnp.int32(127)
            val = jnp.zeros((R, 128), _U32)
            for k in range(K):
                gth = _pk._lane_gather(
                    jnp.broadcast_to(trans_ref[k].reshape(1, 128),
                                     (R, 128)), wlane)
                val = jnp.where(wrow == jnp.int32(k), gth, val)
            emit = ((val >> jnp.uint32(31)) != jnp.uint32(0)) & (
                (base_bit + jnp.int32(b)) < total_bits)
            rec_ref[0, b] = jnp.where(
                emit, (val & jnp.uint32(0xFFFF)) | jnp.uint32(0x10000),
                jnp.uint32(0))
            c = c + emit.astype(jnp.int32)
            st = jnp.where(emit, jnp.int32(0),
                           (val & jnp.uint32(0x7FFFFFFF)).astype(
                               jnp.int32))
        state[...] = st
        cnt[...] = c

        @pl.when(g == jnp.int32(pc - 1))
        def _():
            snap_ref[0] = st
            snap_ref[1] = c

        @pl.when(g == jnp.int32(steps - 1))
        def _():
            end_ref[0] = st
            end_ref[1] = c

    return kernel


@functools.lru_cache(maxsize=32)
def _fsm_call(K: int, R: int, steps: int, pc: int, interpret: bool):
    kernel = _make_fsm_kernel(K, R, steps, pc)
    z = np.int32(0)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1,), lambda g: (z,),
                         memory_space=pltpu.SMEM),          # total_bits
            pl.BlockSpec((K, 128), lambda g: (z, z)),       # trans
            pl.BlockSpec((R, 128), lambda g: (z, z)),       # entry
            pl.BlockSpec((1, R, 128), lambda g: (g, z, z)),  # words
        ],
        out_specs=[
            pl.BlockSpec((1, 32, R, 128), lambda g: (g, z, z, z)),
            pl.BlockSpec((2, R, 128), lambda g: (z, z, z)),  # snap
            pl.BlockSpec((2, R, 128), lambda g: (z, z, z)),  # end
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, 32, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((2, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((R, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _fsm_call_b(K: int, R: int, steps: int, pc: int, interpret: bool):
    """Kernel B (true-entry re-decode of each chunk's first pc word
    steps) writing its record rows IN PLACE into kernel A's record
    buffer (input_output_aliases) — the merged buffer needs no
    concatenation copy, halving the ~4 B/coded-bit transient that
    previously capped streams at 2^30 bits."""
    inner = _make_fsm_kernel(K, R, pc, pc)

    def kernel(tb_ref, trans_ref, entry_ref, words_ref, rec_in_ref,
               rec_ref, snap_ref, end_ref, state, cnt):
        del rec_in_ref  # aliased storage only; blocks >= pc keep A's rows
        inner(tb_ref, trans_ref, entry_ref, words_ref, rec_ref,
              snap_ref, end_ref, state, cnt)

    z = np.int32(0)
    return pl.pallas_call(
        kernel,
        grid=(pc,),
        in_specs=[
            pl.BlockSpec((1,), lambda g: (z,),
                         memory_space=pltpu.SMEM),          # total_bits
            pl.BlockSpec((K, 128), lambda g: (z, z)),       # trans
            pl.BlockSpec((R, 128), lambda g: (z, z)),       # entry
            pl.BlockSpec((1, R, 128), lambda g: (g, z, z)),  # words
            pl.BlockSpec(memory_space=pltpu.ANY),           # rec_a
        ],
        out_specs=[
            pl.BlockSpec((1, 32, R, 128), lambda g: (g, z, z, z)),
            pl.BlockSpec((2, R, 128), lambda g: (z, z, z)),  # snap
            pl.BlockSpec((2, R, 128), lambda g: (z, z, z)),  # end
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, 32, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((2, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((R, 128), jnp.int32),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _make_compact_kernel(OW: int, WR: int, R8: int):
    """pack2's merge-tree kernel over decode records: emitting records
    are 32-bit fields holding the symbol, others contribute no bits;
    the packed words ARE the dense symbol stream."""
    S = F_BITS

    def kernel(zero_ref, rev_ref, rec_ref, out_hbm, win, acc,
               sem_r, sem_w):
        del zero_ref
        c = pl.program_id(0)

        @pl.when(c == jnp.int32(0))
        def _():
            acc[0] = jnp.int32(0)
            acc[1] = jnp.int32(0)

        base_w, rem = acc[0], acc[1]
        # clamp: a corrupted/adversarial stream can emit far more
        # symbols than the caller-sized output; the window must never
        # walk past the (R8,8,128) allocation (the caller's ok flag
        # rejects the result, but only after the kernel ran)
        row0 = jnp.minimum(base_w >> 10, jnp.int32(R8 - WR))
        rd = pltpu.make_async_copy(
            out_hbm.at[pl.ds(row0, WR)], win, sem_r)
        rd.start()

        sq = rec_ref[0].reshape(128, 128)
        rev = jnp.broadcast_to(rev_ref[...][:1], (128, 128))
        sqb = _pk._lane_gather(_pk._lane_gather(sq, rev).T, rev)
        lens = ((sqb >> jnp.uint32(16)) << jnp.uint32(5)).astype(
            jnp.int32)                                # 0 or 32
        c32 = sqb & jnp.uint32(0xFFFF)                # 32-bit field

        cb = jnp.sum(lens, axis=1, keepdims=True, promote_integers=False)
        chunk_bits = jnp.sum(cb, axis=0, keepdims=True,
                             promote_integers=False)[0, 0]

        state = c32.reshape(1, S)
        dw, sb = lens.reshape(1, S) >> 5, lens.reshape(1, S) & 31
        h = S // 2
        while h >= 128:
            state, dw, sb = _pk._merge_a(state, dw, sb, h)
            h //= 2
        state = state.T
        dw = dw.reshape(128, 1)
        sb = sb.reshape(128, 1)
        while h >= 8:
            state, dw, sb = _pk._merge_b(state, dw, sb, h)
            h //= 2
        while h >= 1:
            state, dw, sb = _pk._merge_b8(state, dw, sb, h)
            h //= 2
        state = state[:1]

        # all fields are 32-bit aligned: rem is always 0, placement is
        # a pure word-offset OR into the window
        z1 = jnp.zeros((1, OW - S), _U32)
        w = jnp.concatenate([state, z1], 1)
        wide = jnp.concatenate(
            [w, jnp.zeros((1, WR * 1024 - OW), _U32)], 1)
        wide = pltpu.roll(
            wide, jnp.minimum(base_w - (row0 << 10),
                              jnp.int32(WR * 1024 - OW)), 1)
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
def _compact_call(C: int, R8: int, interpret: bool):
    S = F_BITS
    OW = S + 128
    WR = (OW + 1023) // 1024 + 1
    kernel = _make_compact_kernel(OW, WR, R8)
    z = np.int32(0)
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # zeros -> out alias
            pl.BlockSpec((8, 128), lambda c: (z, z)),       # rev7
            pl.BlockSpec((1, 1, S), lambda c: (c, z, z)),   # records
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


def bucket_rows(total_bits: int) -> int:
    """Pow2-bucketed chunk-tile row count for a stream length."""
    L = -(-total_bits // F_BITS)
    R = max(-(-L // 128), 1)
    return 1 << (R - 1).bit_length()


def pad_words_to_bucket(words: np.ndarray, R: int) -> np.ndarray:
    """Zero-pad a host u32 word stream to its (R,F) bucket size (the
    decode_bits_core input contract); shared by the engine wrapper and
    decode_bits_device."""
    need = R * 128 * (F_BITS // 32)
    if len(words) < need:
        words = np.concatenate(
            [words, np.zeros(need - len(words), np.uint32)])
    return words[:need]


def decode_bits_core(words, trans, tb, n_sym: int, R: int,
                     *, interpret: bool = False,
                     p_bits: int = P_BITS):
    """Traceable device Huffman decode (jit-cacheable: shapes depend
    only on the (K, R, n_sym) bucket; the exact bit length `tb` is a
    traced scalar).

    words: (R*128*F_BITS//32,) uint32 — the big-endian coded bitstream,
    zero-padded (host: np.frombuffer(encoded + pad, '>u4')).  trans:
    (K,128) uint32 from build_trans.  Returns (syms, ok): syms (n_sym,)
    int32, valid when ok (a scalar bool: every chunk self-synced
    within p_bits and the count reaches n_sym; callers should retry
    with p_bits=F_BITS — one full chain-repair pass, which accepts any
    chunk that merges ANYWHERE inside its own chunk — then fall back
    to the host decoder when still not ok)."""
    K = trans.shape[0]
    Lp = R * 128
    Fw = F_BITS // 32
    steps = Fw
    pc = p_bits // 32
    need = Lp * Fw
    w = words.astype(jnp.uint32)
    wt = w[:need].reshape(Lp, Fw).T.reshape(Fw, R, 128)
    tb = tb.reshape(1).astype(jnp.int32)
    total_bits = tb[0]

    zero_entry = jnp.zeros((R, 128), jnp.int32)
    rec_a, snap, end = _fsm_call(K, R, steps, pc, interpret)(
        tb, trans, zero_entry, wt)
    exit_state = end[0].reshape(-1)
    # true entry of chunk c = speculative exit of chunk c-1
    entry = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), exit_state[:-1]]).reshape(R, 128)
    # kernel B writes its rows in place into A's record buffer
    # (input_output_aliases): rec IS the merged record set
    rec, _snap_b, end_b = _fsm_call_b(K, R, steps, pc, interpret)(
        tb, trans, entry, wt, rec_a)
    # verification: state at bit P from the true entry must equal the
    # speculative snapshot (self-sync within the window).  Chunks whose
    # REAL bits end at or before P need no check: kernel B decodes them
    # exactly from the true entry and the speculative tail contributes
    # nothing (emits past total_bits are masked) — this also covers the
    # zero-padded virtual chunks, whose zero-walks cycle through the
    # left spine at arbitrary phase and never "sync".
    live = (jnp.arange(Lp, dtype=jnp.int32) * jnp.int32(F_BITS)
            + jnp.int32(p_bits)) < total_bits
    ok = jnp.all(jnp.where(live.reshape(R, 128),
                           end_b[0] == snap[0], True))
    true_cnt = (end_b[1] + end[1] - snap[1]).reshape(-1)
    # trailing byte-pad bits of the stream may emit junk symbols after
    # the last real one (callers pass total_bits rounded up to bytes);
    # each junk symbol consumes >= 1 of the <= 7 pad bits, so the
    # emitted count must land in [n_sym, n_sym + 7].  NOTE: `ok` is a
    # SELF-CONSISTENCY check (sync + plausible count), not stream
    # authentication — a corrupted stream that happens to sync and emit
    # a count in range still returns wrong data with ok=True, matching
    # the reference decoder's GIGO behavior (Huffman.c:310).
    total = jnp.sum(true_cnt, promote_integers=False)
    ok = ok & (total >= jnp.int32(n_sym)) & (total <= jnp.int32(n_sym + 7))

    rec = rec.reshape(F_BITS, Lp).T                  # (Lp, F)

    # + F_BITS//8 margin: trailing byte-pad junk symbols land past
    # n_sym and must stay inside the RMW windows; R8 rounds to a power
    # of two so the compaction kernel is shape-bucketed too
    WR = (F_BITS + 128 + 1023) // 1024 + 1
    R8 = (n_sym + F_BITS // 8 + 1023) // 1024 + WR
    R8 = 1 << (R8 - 1).bit_length()
    rev = jnp.asarray(np.broadcast_to(_pk._REV7, (8, 128)))
    wordsout = _compact_call(Lp, R8, interpret)(
        jnp.zeros((R8, 8, 128), jnp.uint32), rev,
        rec.reshape(Lp, 1, F_BITS))
    syms = wordsout.reshape(-1)[:n_sym].astype(jnp.int32)
    return syms, ok


def decode_bits_device(words, trans, n_sym: int, total_bits: int,
                       *, interpret: bool = False,
                       p_bits: int = P_BITS):
    """Host-convenience wrapper around decode_bits_core: pads the word
    stream to its (R, F) bucket and passes the exact bit length."""
    R = bucket_rows(total_bits)
    w = pad_words_to_bucket(np.asarray(words, np.uint32), R)
    return decode_bits_core(jnp.asarray(w), jnp.asarray(trans),
                            jnp.asarray([total_bits], jnp.int32),
                            n_sym, R, interpret=interpret,
                            p_bits=p_bits)


# ---------------------------------------------------------------------------
# Segment-pipelined decode: streams past the single-allocation record-
# buffer envelope (~2^30 coded bits: two pow2-bucketed 4 B/bit-slot
# buffers OOM a 16 GB part at the next bucket) decode in SEGMENTS of
# SEG_ROWS chunk-tile rows.  Huffman decoding is sequential only
# through the chunk-entry STATES: segment s's first true entry is
# segment s-1's last speculative exit (verified by the same in-window
# sync check), so each segment runs the ordinary A/reconcile/B/compact
# pipeline on its own bounded buffers and appends its symbols at the
# running output offset.
# ---------------------------------------------------------------------------

SEG_ROWS = 64     # 64*128 chunks * F_BITS = 2^27 bits/segment:
                  # record buffer + transpose stay ~0.5 GB each


@functools.lru_cache(maxsize=16)
def _seg_core_jit(K: int, R: int, out_cap_rows: int, interpret: bool,
                  p_bits: int):
    """Jitted _seg_core for a (K, R, cap) bucket: one compiled program
    serves every segment (the eager form paid per-op dispatch for the
    0.5 GB record-buffer transposes on every segment)."""
    import jax as _jax

    def f(words_seg, trans, tb_local, carry_entry):
        return _seg_core(words_seg, trans, tb_local, carry_entry, R,
                         out_cap_rows, interpret=interpret,
                         p_bits=p_bits)

    return _jax.jit(f)


def _seg_core(words_seg, trans, tb_local, carry_entry, R: int,
              out_cap_rows: int, *, interpret: bool, p_bits: int):
    """One segment's A/reconcile/B/compact over LOCAL bit indices.
    Returns (seg_syms u32 flat, seg_count i32, last_exit i32, ok)."""
    K = trans.shape[0]
    Lp = R * 128
    Fw = F_BITS // 32
    steps = Fw
    pc = p_bits // 32
    wt = words_seg.reshape(Lp, Fw).T.reshape(Fw, R, 128)
    tb = tb_local.reshape(1).astype(jnp.int32)
    total_bits = tb[0]

    zero_entry = jnp.zeros((R, 128), jnp.int32)
    rec_a, snap, end = _fsm_call(K, R, steps, pc, interpret)(
        tb, trans, zero_entry, wt)
    exit_state = end[0].reshape(-1)
    entry = jnp.concatenate(
        [carry_entry.reshape(1), exit_state[:-1]]).reshape(R, 128)
    rec, _snap_b, end_b = _fsm_call_b(K, R, steps, pc, interpret)(
        tb, trans, entry, wt, rec_a)
    live = (jnp.arange(Lp, dtype=jnp.int32) * jnp.int32(F_BITS)
            + jnp.int32(p_bits)) < total_bits
    ok = jnp.all(jnp.where(live.reshape(R, 128),
                           end_b[0] == snap[0], True))
    true_cnt = (end_b[1] + end[1] - snap[1]).reshape(-1)
    count = jnp.sum(true_cnt, promote_integers=False)

    rec = rec.reshape(F_BITS, Lp).T
    rev = jnp.asarray(np.broadcast_to(_pk._REV7, (8, 128)))
    wordsout = _compact_call(Lp, out_cap_rows, interpret)(
        jnp.zeros((out_cap_rows, 8, 128), jnp.uint32), rev,
        rec.reshape(Lp, 1, F_BITS))
    return wordsout.reshape(-1), count, exit_state[-1], ok


def decode_bits_segmented(words, trans, total_bits: int, n_sym: int,
                          *, seg_rows: int = SEG_ROWS,
                          interpret: bool = False,
                          p_bits: int = P_BITS):
    """Chunk-segment-pipelined device Huffman decode for streams past
    the single-allocation envelope.  total_bits is a HOST int (the
    caller always knows len(encoded)), so per-segment local bit budgets
    stay in int32 regardless of stream size.  Returns (syms (n_sym,)
    i32 device, ok bool device) like decode_bits_core."""
    R = bucket_rows(total_bits)
    assert R > seg_rows, "use decode_bits_core inside the envelope"
    w = pad_words_to_bucket(np.asarray(words, np.uint32), R)
    seg_bits = seg_rows * 128 * F_BITS
    seg_words = seg_rows * 128 * (F_BITS // 32)
    n_seg = -(-R // seg_rows)
    # per-segment output bucket: a valid stream emits <= n_sym total,
    # and any segment's emissions are also bounded by its bit budget
    WR = (F_BITS + 128 + 1023) // 1024 + 1
    per_cap = min(n_sym + F_BITS // 8, seg_bits)
    R8 = (per_cap + 1023) // 1024 + WR
    R8 = 1 << (R8 - 1).bit_length()
    out = jnp.zeros(n_sym + R8 * 1024 + 8, jnp.uint32)
    offset = jnp.zeros((), jnp.int32)
    carry = jnp.zeros((), jnp.int32)          # root
    total_cnt = jnp.zeros((), jnp.int32)
    ok_all = jnp.asarray(True)
    trans_d = jnp.asarray(trans)
    for s in range(n_seg):
        start_bits = s * seg_bits
        if start_bits >= total_bits:
            break
        tb_local = np.int32(min(total_bits - start_bits, seg_bits))
        wseg = jnp.asarray(w[s * seg_words:(s + 1) * seg_words])
        syms_s, cnt_s, exit_s, ok_s = _seg_core_jit(
            trans.shape[0], seg_rows, R8, interpret, p_bits)(
            wseg, trans_d, jnp.asarray([tb_local], jnp.int32), carry)
        out = jax.lax.dynamic_update_slice(out, syms_s, (offset,))
        offset = offset + cnt_s
        total_cnt = total_cnt + cnt_s
        carry = exit_s
        ok_all = ok_all & ok_s
    ok = (ok_all & (total_cnt >= jnp.int32(n_sym))
          & (total_cnt <= jnp.int32(n_sym + 7)))
    return out[:n_sym].astype(jnp.int32), ok
