"""ExaFEL app codec: ROI losslessness + background tolerance."""

import numpy as np

from sz_tpu.apps import exafel


def _setup():
    rng = np.random.default_rng(8)
    panels, rows, cols = 2, 64, 48
    data = (100 + 10 * rng.standard_normal(
        (3, panels, rows, cols))).astype(np.float32)
    # calibPanel semantics (exafelSZ.c:135): 0 => ROI kept lossless;
    # nonzero => background. Mark a bad-pixel edge strip as ROI.
    calib = np.ones((panels, rows, cols), dtype=np.uint8)
    calib[:, :2, :] = 0
    pr = exafel.ExaFELConfig(
        calib_panel=calib,
        peaks_segs=np.array([0, 1, 1], dtype=np.uint16),
        peaks_rows=np.array([10, 30, 62], dtype=np.uint16),
        peaks_cols=np.array([12, 40, 2], dtype=np.uint16),
        bin_size=2, tolerance=0.5, sz_dim=3, peak_size=5)
    # make the peaks bright
    for p, r, c in zip(pr.peaks_segs, pr.peaks_rows, pr.peaks_cols):
        data[:, p, max(r - 2, 0):r + 3, max(c - 2, 0):c + 3] += 500
    return pr, data


def test_roundtrip():
    pr, data = _setup()
    blob = exafel.compress(pr, data)
    out = exafel.decompress(pr, blob, *data.shape)
    assert out.shape == data.shape
    mask = exafel._roi_mask(pr, *data.shape)
    # ROI pixels (mask==0): bit-exact
    np.testing.assert_array_equal(out[mask == 0], data[mask == 0])
    # background: within tolerance of the *binned mean* (the codec's
    # contract is tolerance on the binned field, exafelSZ.c:246)
    binned, br, bc = exafel._bin(data, pr.bin_size, data.shape[2],
                                 data.shape[3])
    up = np.repeat(np.repeat(binned, pr.bin_size, axis=2),
                   pr.bin_size, axis=3)[:, :, :data.shape[2],
                                        :data.shape[3]]
    bg = mask != 0
    assert np.abs(out[bg] - up[bg]).max() <= pr.tolerance * 1.0001
    assert len(blob) < data.nbytes
