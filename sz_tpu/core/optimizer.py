"""Quantization-interval optimizer (sampled error histogram).

Replicates optimize_intervals_float_3D_with_freq_and_dense_pos
(sz_float.c:6396-6523): a strided sampling walk whose index sequence is
pure integer arithmetic (independent of the data), a histogram of Lorenzo
prediction errors in units of 2*eb, and a value-frequency histogram that
locates the densest value ("dense_pos") for the mean-flush optimization.

The walk indices are data-independent, so we precompute them (cached per
shape) and evaluate the histograms vectorized — on numpy here and on the
TPU for large arrays (the two histograms are trivially data-parallel).
"""

from __future__ import annotations

import functools

import numpy as np


def round_up_to_power_of_2(v: int) -> int:
    """roundUpToPowerOf2 (conf.c:35)."""
    if v <= 1:
        return v
    return 1 << (v - 1).bit_length()


@functools.lru_cache(maxsize=64)
def _mean_walk_indices(r1: int, r2: int, r3: int) -> np.ndarray:
    """First sampling walk of the optimizer (sz_float.c:6399-6419):
    stride ~sqrt(len) with -1 adjustments at r3 / r2*r3 boundaries."""
    length = r1 * r2 * r3
    mean_distance = int(np.sqrt(length))
    idx = []
    pos = 0
    offset_count = 0
    offset_count_2 = 0
    while pos < length:
        idx.append(pos)
        pos += mean_distance
        offset_count += mean_distance
        offset_count_2 += mean_distance
        if offset_count >= r3:
            offset_count = 0
            pos -= 1
        if offset_count_2 >= r2 * r3:
            offset_count_2 = 0
            pos -= 1
    return np.array(idx, dtype=np.int64)


@functools.lru_cache(maxsize=64)
def _sample_walk_indices(r1: int, r2: int, r3: int,
                         sample_distance: int) -> np.ndarray:
    """Second sampling walk (sz_float.c:6442-6485).  The index update
    depends only on counters, never on data, so it is precomputable."""
    length = r1 * r2 * r3
    r23 = r2 * r3
    offset_count = sample_distance - 2
    pos = r23 + r3 + offset_count
    n1_count = 1
    n2_count = 1
    idx = []
    while pos < length:
        idx.append(pos)
        offset_count += sample_distance
        if offset_count >= r3:
            n2_count += 1
            if n2_count == r2:
                n1_count += 1
                n2_count = 1
                pos += r3
            offset_count_2 = (n1_count + n2_count) % sample_distance
            pos += (r3 + sample_distance - offset_count) + \
                   (sample_distance - offset_count_2)
            offset_count = sample_distance - offset_count_2
            if offset_count == 0:
                offset_count += 1
        else:
            pos += sample_distance
    return np.array(idx, dtype=np.int64)


def optimize_intervals_3d_freq_dense(flat: np.ndarray, r1: int, r2: int,
                                     r3: int, real_precision: float,
                                     max_range_radius: int,
                                     sample_distance: int,
                                     pred_threshold: float):
    """Returns (quantization_intervals, dense_pos, max_freq, mean_freq).

    ``flat`` is the float32 array flattened row-major; real_precision is the
    double-precision bound (the optimizer works in double, sz_float.c:6396).
    """
    r23 = r2 * r3
    length = r1 * r2 * r3
    rp = float(real_precision)

    # -- mean over the sqrt-stride walk: sequential float32 accumulation
    midx = _mean_walk_indices(r1, r2, r3)
    mean = _seq_sum_f32(flat[midx])
    if len(midx) > 0:
        mean = np.float32(mean / np.float32(len(midx)))

    # -- sampled Lorenzo-error histogram + value-frequency histogram
    sidx = _sample_walk_indices(r1, r2, r3, sample_distance)
    sample_count = len(sidx)
    d = flat
    cur = d[sidx]
    # 7-point Lorenzo predictor, exact float32 left-to-right order
    pred = d[sidx - 1] + d[sidx - r3]
    pred = pred + d[sidx - r23]
    pred = pred - d[sidx - 1 - r23]
    pred = pred - d[sidx - r3 - 1]
    pred = pred - d[sidx - r3 - r23]
    pred = pred + d[sidx - r3 - r23 - 1]
    # C: fabs(pred_value - *data_pos) — float32 subtraction, then the
    # double-typed fabs; replicate the promotion order exactly
    pred_err = np.abs((pred - cur).astype(np.float64))
    freq_count = int(np.count_nonzero(pred_err < rp))

    radius_index = ((pred_err / rp + 1.0) / 2.0).astype(np.int64)
    np.minimum(radius_index, max_range_radius - 1, out=radius_index)
    intervals = np.bincount(radius_index, minlength=max_range_radius)

    # value-frequency histogram around the sampled mean
    range_ = 8192
    radius = 4096
    mean_diff = (cur - mean).astype(np.float64)
    trunc = np.trunc(mean_diff / rp).astype(np.int64)
    freq_index = np.where(mean_diff > 0, trunc + radius, trunc - 1 + radius)
    freq_index = np.clip(freq_index, 0, range_ - 1)
    freq_intervals = np.bincount(freq_index, minlength=range_)

    max_freq = np.float32(freq_count * 1.0 / sample_count)

    # pick smallest 2*(i+1) covering predThreshold of samples
    target = int(sample_count * pred_threshold)
    csum = np.cumsum(intervals)
    over = np.flatnonzero(csum > target)
    i = int(over[0]) if len(over) else max_range_radius - 1
    acc = 2 * (i + 1)
    pow2 = round_up_to_power_of_2(acc)
    if pow2 < 32:
        pow2 = 32

    # densest adjacent pair (sz_float.c:6505-6517): scan i in [1, range-3],
    # summing freq[i]+freq[i+1]
    pair = freq_intervals[1:range_ - 2] + freq_intervals[2:range_ - 1]
    if len(pair):
        max_index = int(np.argmax(pair)) + 1
        max_sum = int(pair[max_index - 1])
    else:  # pragma: no cover
        max_index, max_sum = 0, 0
    dense_pos = np.float32(np.float64(mean) + rp * (max_index + 1 - radius))
    mean_freq = np.float32(max_sum * 1.0 / sample_count)
    return int(pow2), dense_pos, max_freq, mean_freq


def _seq_sum_f32(vals: np.ndarray) -> np.float32:
    """Strictly sequential float32 accumulation (C `float mean += ...`).

    numpy's reduce is pairwise, so emulate the serial order.  Uses the
    native helper when available; pure-python fallback otherwise.
    """
    try:
        from sz_tpu.native import seq_sum_f32 as _native

        return _native(vals)
    except Exception:
        acc = np.float32(0.0)
        for v in np.asarray(vals, dtype=np.float32):
            acc = np.float32(acc + v)
        return acc
