"""Classic SZ1.4 MDQ codec (1D), with the exact-value escape encoding.

Reference: SZ_compress_float_1D_MDQ (sz_float.c:353-524),
SZ_compress_double_1D_MDQ (sz_double.c:260-395), decompressors
decompressDataSeries_float_1D (szd_float.c:185) / _double_1D.

The 1D predictor is previous *reconstructed* value; escapes store the
value's truncated binary representation (median-offset, reqLength bits)
with leading-byte dedup against the previous escape (CompressElement.c).

Subtle float/double asymmetries preserved:
  * float:  state = ((int)(err*recip + 1)) >> 1, plus a machine-epsilon
    recheck that can demote to escape (sz_float.c:441-454);
  * double: state = (int)((err*recip + 1) * 0.5), NO recheck
    (sz_double.c:348-365).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sz_tpu.config import DataType
from sz_tpu.format import huffman
from sz_tpu.format import bytes_util as bu
from sz_tpu.format.tdps import TDPS


# ---------------------------------------------------------------------------
# reqLength / exponent helpers (ByteToolkit.c:308-360, sz_float.c:44-56)
# ---------------------------------------------------------------------------

def get_exponent(value, T) -> int:
    if T is np.float32:
        bits = np.float32(value).view(np.int32)
        return int((int(bits) & 0x7F800000) >> 23) - 127
    bits = np.float64(value).view(np.int64)
    return int((int(bits) & 0x7FF0000000000000) >> 52) - 1023


def compute_req_length(real_precision: float, rad_expo: int, T):
    """Returns (req_length, median_zeroed)."""
    req_expo = get_exponent(np.float64(real_precision), np.float64)
    if T is np.float32:
        req = 9 + rad_expo - req_expo + 1
        lo, hi = 9, 32
    else:
        req = 12 + rad_expo - req_expo
        lo, hi = 12, 64
    median_zeroed = False
    if req < lo:
        req = lo
    if req > hi:
        req = hi
        median_zeroed = True
    return req, median_zeroed


class ExactEncoder:
    """Escape-value stream builder (addExactData dataCompression.c:575,
    updateLossyCompElement CompressElement.c:230)."""

    def __init__(self, req_length: int, median, T, raw: bool = False):
        self.T = T
        self.raw = raw  # MSST19 variant: no median offset
        self.esize = 4 if T is np.float32 else 8
        self.req_bytes = req_length // 8
        self.resi_bits_len = req_length % 8
        self.req_length = req_length
        self.median = T(median)
        self.prev = bytes(self.esize)
        ign = self.esize * 8 - req_length
        if ign < 0:
            ign = 0
        self._mask = (~((1 << ign) - 1)) & ((1 << (self.esize * 8)) - 1)
        self.lead_nums = []      # scalar staging (ints, add())
        self._lead_arrays = []   # committed numpy chunks (add_batch())
        self.mid_bytes = bytearray()
        self.resi_bits = []
        self._resi_arrays = []

    def _flush_scalars(self):
        if self.lead_nums:
            self._lead_arrays.append(np.array(self.lead_nums, np.uint8))
            self.lead_nums = []
        if self.resi_bits:
            self._resi_arrays.append(np.array(self.resi_bits, np.uint8))
            self.resi_bits = []

    def exact_count(self) -> int:
        return (sum(len(a) for a in self._lead_arrays)
                + len(self.lead_nums))

    def add(self, value):
        """Returns the reconstructed (truncated) value."""
        T = self.T
        norm = T(value) if self.raw else T(value - self.median)
        if T is np.float32:
            ival = int(np.float32(norm).view(np.uint32))
            cur = ival.to_bytes(4, "big")
            recon_bits = ival & self._mask
            recon = T(np.uint32(recon_bits).view(np.float32))
            if not self.raw:
                recon = T(recon + self.median)
        else:
            ival = int(np.float64(norm).view(np.uint64))
            cur = ival.to_bytes(8, "big")
            recon_bits = ival & self._mask
            recon = T(np.uint64(recon_bits).view(np.float64))
            if not self.raw:
                recon = T(recon + self.median)
        lead = 0
        for a, b in zip(cur, self.prev):
            if a == b and lead < 3:
                lead += 1
            else:
                break
        if lead > 3:
            lead = 3
        self.lead_nums.append(lead)
        if lead < self.req_bytes:
            self.mid_bytes += cur[lead:self.req_bytes]
        if self.resi_bits_len != 0 and self.req_bytes < self.esize:
            self.resi_bits.append(cur[self.req_bytes]
                                  >> (8 - self.resi_bits_len))
        self.prev = cur
        return recon

    def add_batch(self, values) -> np.ndarray:
        """Batched adds via the native stream (bit-identical to add());
        returns the reconstruction array."""
        vals = np.ascontiguousarray(values, dtype=self.T)
        if vals.size == 0:
            return vals
        try:
            from sz_tpu.native import exact_stream
        except ImportError:  # pragma: no cover - native unavailable
            return np.array([self.add(v) for v in vals], dtype=self.T)
        lead, mid, resi, recon, prev = exact_stream(
            vals, self.req_length, self.median, self.raw, self.prev)
        self._flush_scalars()
        self._lead_arrays.append(lead)
        self.mid_bytes += mid
        if resi.size:
            self._resi_arrays.append(resi)
        self.prev = prev
        return recon

    def _lead_cat(self) -> np.ndarray:
        self._flush_scalars()
        if not self._lead_arrays:
            return np.zeros(0, np.uint8)
        if len(self._lead_arrays) == 1:
            return np.asarray(self._lead_arrays[0], np.uint8)
        return np.concatenate(
            [np.asarray(a, np.uint8) for a in self._lead_arrays])

    def lead_packed(self) -> bytes:
        return bu.pack_bits_2(self._lead_cat())

    def resi_packed(self) -> bytes:
        """convertIntArray2ByteArray_fast_dynamic (TypeManager.c:377):
        MSB-first fixed-width bitstream."""
        w = self.resi_bits_len
        self._flush_scalars()
        if w == 0 or not self._resi_arrays:
            return b""
        vals = (self._resi_arrays[0] if len(self._resi_arrays) == 1
                else np.concatenate([np.asarray(a, np.uint8)
                                     for a in self._resi_arrays]))
        try:
            from sz_tpu.native import pack_w_bits
            return pack_w_bits(vals, w)
        except ImportError:  # pragma: no cover - native unavailable
            vals = np.asarray(vals, np.uint8)
            bits = ((vals[:, None]
                     >> np.arange(w - 1, -1, -1)[None, :]) & 1)
            return np.packbits(bits.reshape(-1).astype(np.uint8)).tobytes()


class ExactDecoder:
    """Inverse of ExactEncoder, streaming."""

    def __init__(self, tdps: TDPS, T, raw: bool = False):
        self.T = T
        self.raw = raw
        self.esize = 4 if T is np.float32 else 8
        self.req_bytes = tdps.req_length // 8
        self.resi_bits_len = tdps.req_length % 8
        self.median = T(tdps.median_value)
        self.prev = bytearray(self.esize)
        self.lead = bu.unpack_bits_2(tdps.lead_num, tdps.exact_data_num)
        self.mid = tdps.exact_mid_bytes
        self.mid_pos = 0
        if self.resi_bits_len:
            self.resi = np.unpackbits(
                np.frombuffer(tdps.residual_mid_bits, dtype=np.uint8))
        self.resi_raw = tdps.residual_mid_bits
        self.req_length = tdps.req_length
        self.resi_pos = 0
        self.n = 0

    def next_batch(self, k: int) -> np.ndarray:
        """Drain all k == exact_data_num escape values at once (native);
        only valid as the decoder's first and only read."""
        if k == 0:
            return np.zeros(0, dtype=self.T)
        if self.n == 0 and k == len(self.lead):
            try:
                from sz_tpu.native import classic1d_decode
                self.n = k
                return classic1d_decode(
                    np.zeros(k, np.int32), self.T(0), 0, self.req_length,
                    self.median, self.raw, self.lead, self.mid,
                    self.resi_raw, self.T)
            except ImportError:  # pragma: no cover
                self.n = 0
        return np.array([self.next() for _ in range(k)], dtype=self.T)

    def next(self):
        T = self.T
        cur = bytearray(self.esize)
        ln = int(self.lead[self.n])
        self.n += 1
        cur[:ln] = self.prev[:ln]
        take = self.req_bytes - ln
        if take > 0:
            cur[ln:self.req_bytes] = \
                self.mid[self.mid_pos:self.mid_pos + take]
            self.mid_pos += take
        if self.resi_bits_len and self.req_bytes < self.esize:
            w = self.resi_bits_len
            bits = self.resi[self.resi_pos:self.resi_pos + w]
            self.resi_pos += w
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            cur[self.req_bytes] = (v << (8 - w)) & 0xFF
        self.prev = cur
        if T is np.float32:
            val = np.frombuffer(bytes(cur), dtype=">f4")[0]
        else:
            val = np.frombuffer(bytes(cur), dtype=">f8")[0]
        if self.raw:
            return T(val)
        return T(T(val) + self.median)


def optimize_intervals_1d(flat: np.ndarray, real_precision: float,
                          max_range_radius: int, sample_distance: int,
                          pred_threshold: float) -> int:
    """optimize_intervals_float_1D_opt (sz_float.c:5070)."""
    rp = float(real_precision)
    sidx = np.arange(2, len(flat), sample_distance, dtype=np.int64)
    pred_err = np.abs((flat[sidx - 1] - flat[sidx]).astype(np.float64))
    radius_index = ((pred_err / rp + 1.0) / 2.0).astype(np.int64)
    np.minimum(radius_index, max_range_radius - 1, out=radius_index)
    # C casts the quotient through (uint64_t): negatives (possible
    # when a tiny PW_REL ratio makes realPrecision negative) wrap to
    # huge values and clamp to the last bin
    radius_index[radius_index < 0] = max_range_radius - 1
    intervals = np.bincount(radius_index, minlength=max_range_radius)
    target = int(len(sidx) * pred_threshold)
    csum = np.cumsum(intervals)
    over = np.flatnonzero(csum > target)
    i = int(over[0]) if len(over) else max_range_radius - 1
    from sz_tpu.core.optimizer import round_up_to_power_of_2

    pow2 = round_up_to_power_of_2(2 * (i + 1))
    return max(pow2, 32)


@dataclasses.dataclass
class Classic1DResult:
    tdps: TDPS
    intervals: int


def _optimize_intervals_1d_subblock(flat, rp, max_range_radius,
                                    sample_distance, pred_threshold):
    """optimize_intervals_float_1D_subblock (sz_float.c:3231): local
    modular sampling from index 2, linear 2a-b predictor."""
    n = len(flat)
    sidx = np.arange(2, n)
    sidx = sidx[sidx % sample_distance == 0]
    pred = 2 * flat[sidx - 1] - flat[sidx - 2]
    pred_err = np.abs((pred - flat[sidx]).astype(np.float64))
    radius_index = ((pred_err / rp + 1.0) / 2.0).astype(np.int64)
    np.minimum(radius_index, max_range_radius - 1, out=radius_index)
    # C casts the quotient through (uint64_t): negatives (possible
    # when a tiny PW_REL ratio makes realPrecision negative) wrap to
    # huge values and clamp to the last bin
    radius_index[radius_index < 0] = max_range_radius - 1
    hist = np.bincount(radius_index, minlength=max_range_radius)
    target = int((n // sample_distance) * pred_threshold)
    csum = np.cumsum(hist)
    over = np.flatnonzero(csum > target)
    i0 = int(over[0]) if len(over) else max_range_radius - 1
    from sz_tpu.core.optimizer import round_up_to_power_of_2
    return max(round_up_to_power_of_2(2 * (i0 + 1)), 32)


def compress_1d(data: np.ndarray, real_precision: float, value_range,
                median, *, max_range_radius: int, sample_distance: int,
                pred_threshold: float, opt_quant_mode: int = 1,
                fixed_intervals: int = 0, subblock: bool = False) -> TDPS:
    T = np.float32 if data.dtype == np.float32 else np.float64
    dt = DataType.FLOAT if T is np.float32 else DataType.DOUBLE
    flat = np.ascontiguousarray(data, dtype=T).reshape(-1)
    n = len(flat)
    rp = T(real_precision)  # float kernel receives float precision

    if opt_quant_mode == 1:
        if subblock:
            intervals = _optimize_intervals_1d_subblock(
                flat, float(real_precision), max_range_radius,
                sample_distance, pred_threshold)
        else:
            intervals = optimize_intervals_1d(
                flat, float(rp), max_range_radius, sample_distance,
                pred_threshold)
    else:
        intervals = fixed_intervals
    radius = intervals // 2

    median = T(median)
    rad_expo = get_exponent(T(value_range) / T(2), T)
    req_length, median_zeroed = compute_req_length(
        float(real_precision) if subblock else float(rp), rad_expo, T)
    if median_zeroed:
        median = T(0)

    enc = ExactEncoder(req_length, median, T)

    native_1d = None
    if n >= 2:
        try:
            from sz_tpu.native import classic1d_encode
            native_1d = classic1d_encode(
                flat, rp, float(real_precision), int(intervals), radius,
                req_length, median, subblock)
        except ImportError:  # pragma: no cover - native unavailable
            native_1d = None
    if native_1d is not None:
        types, lead, mid, resi, cnt = native_1d
        enc._lead_arrays = [lead]
        enc.mid_bytes = bytearray(mid)
        enc._resi_arrays = [resi] if resi.size else []
        type_array = huffman.encode_with_tree(types, 2 * intervals)
        return TDPS(
            data_type=dt, ds_length=n, intervals=intervals,
            median_value=float(median), req_length=req_length,
            real_precision=float(real_precision) if subblock
            else float(rp),
            type_array=type_array,
            lead_num=enc.lead_packed(),
            exact_mid_bytes=bytes(enc.mid_bytes),
            residual_mid_bits=enc.resi_packed(),
            exact_data_num=cnt,
            max_quant_intervals=max_range_radius * 2)

    types = np.zeros(n, dtype=np.int32)

    # first two values are always exact
    pred = last1 = None
    for i in (0, 1):
        rec = enc.add(flat[i])
        last1 = pred  # last3CmprsData[1]
        pred = rec  # last3CmprsData[0] after two adds = second recon

    check_radius = T(T(intervals - 1) * rp)
    interval2 = T(2 * rp)
    recip = T(T(1) / rp)

    if subblock:
        # SZ_compress_float_1D_MDQ_subblock (sz_float.c:3444): linear
        # 2a-b predictor, double division, <= radius compare, no
        # epsilon recheck.  (The standard 1D decoder replays a
        # previous-value predictor — upstream inconsistency kept as-is.)
        rp64 = np.float64(real_precision)
        check64 = (intervals - 1) * rp64
        interval64 = 2.0 * rp64
        last0 = pred
        for i in range(2, n):
            cur = flat[i]
            p = T(T(2) * last0 - last1)
            pae = T(abs(T(cur - p)))
            if np.float64(pae) <= check64:
                state = int((np.float64(pae) / rp64 + 1.0) / 2.0)
                if cur >= p:
                    types[i] = radius + state
                    p = T(np.float64(p) + state * interval64)
                else:
                    types[i] = radius - state
                    p = T(np.float64(p) - state * interval64)
                last1, last0 = last0, p
            else:
                types[i] = 0
                last1, last0 = last0, enc.add(cur)
    elif T is np.float32:
        for i in range(2, n):
            cur = flat[i]
            err = T(abs(T(cur - pred)))
            if err < check_radius:
                state = int(T(err * recip + T(1))) >> 1
                if cur >= pred:
                    types[i] = radius + state
                    pred = T(pred + T(state) * interval2)
                else:
                    types[i] = radius - state
                    pred = T(pred - T(state) * interval2)
                if T(abs(T(cur - pred))) > rp:
                    types[i] = 0
                    pred = enc.add(cur)
            else:
                types[i] = 0
                pred = enc.add(cur)
    else:
        for i in range(2, n):
            cur = flat[i]
            err = T(abs(T(cur - pred)))
            if err < check_radius:
                state = int(T(err * recip + T(1)) * T(0.5))
                if cur >= pred:
                    types[i] = radius + state
                    pred = T(pred + T(state) * interval2)
                else:
                    types[i] = radius - state
                    pred = T(pred - T(state) * interval2)
            else:
                types[i] = 0
                pred = enc.add(cur)

    type_array = huffman.encode_with_tree(types, 2 * intervals)
    return TDPS(
        data_type=dt, ds_length=n, intervals=intervals,
        median_value=float(median), req_length=req_length,
        # the subblock kernel serializes the unnarrowed double precision
        real_precision=float(real_precision) if subblock else float(rp),
        type_array=type_array,
        lead_num=enc.lead_packed(), exact_mid_bytes=bytes(enc.mid_bytes),
        residual_mid_bits=enc.resi_packed(),
        exact_data_num=enc.exact_count(),
        max_quant_intervals=max_range_radius * 2)


def decompress_1d(tdps: TDPS, n: int, dtype) -> np.ndarray:
    T = np.float32 if np.dtype(dtype) == np.float32 else np.float64
    types = huffman.decode_with_tree(tdps.type_array, n)
    radius = tdps.intervals // 2
    interval2 = T(tdps.real_precision * 2) if T is np.float64 \
        else T(np.float32(tdps.real_precision) * np.float32(2))
    try:
        from sz_tpu.native import classic1d_decode
        lead = bu.unpack_bits_2(tdps.lead_num, tdps.exact_data_num)
        return classic1d_decode(
            types, interval2, radius, tdps.req_length,
            T(tdps.median_value), False, lead, tdps.exact_mid_bytes,
            tdps.residual_mid_bits, T)
    except ImportError:  # pragma: no cover - native unavailable
        pass
    dec = ExactDecoder(tdps, T)
    out = np.zeros(n, dtype=T)
    prev = T(0)
    for i in range(n):
        t = int(types[i])
        if t == 0:
            prev = dec.next()
        else:
            prev = T(prev + T(t - radius) * interval2)
        out[i] = prev
    return out
