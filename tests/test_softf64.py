"""Bit-exactness of the software-f64 magnitude arithmetic
(sz_tpu/tpu/softf64.py) against numpy's IEEE binary64/binary32.

Contract under test (the MSST19 chain's op mix, sz_float.c `double
temp` chains): exact widening products of float32 magnitudes, RN53
multiply/divide of the running double by widened floats, the final
(float) cast of an RN53 double, and the correctly rounded float32
ratio division — all magnitudes (the chain is sign-free).  Chain
intermediates stay inside the f64 normal range (products/quotients of
<= 7 float32s), so random inputs here are drawn within it; f32-level
subnormal/overflow behavior IS contractual and directed-tested."""

import numpy as np
import pytest

from sz_tpu.tpu import softf64 as sf

jnp = sf.jnp


def _canon64(vals: np.ndarray):
    """Canonical (e, mh, ml) triples of positive-finite f64 values."""
    e, mh, ml, _nf = sf.unpack_f64_host(np.abs(vals))
    return e, mh, ml


def _from_triple(e, mh, ml):
    e = np.asarray(e, np.int64)
    M = (np.asarray(mh, np.uint64) << np.uint64(32)) | np.asarray(
        ml, np.uint64)
    out = np.ldexp(M.astype(np.float64), e - 52)
    return np.where(M == 0, 0.0, out)


def _rand_f32_bits(rng, n, emin=1, emax=254, sub_frac=0.0):
    """Random positive-finite f32 bit patterns."""
    e = rng.integers(emin, emax + 1, n).astype(np.uint32)
    m = rng.integers(0, 1 << 23, n).astype(np.uint32)
    bits = (e << np.uint32(23)) | m
    if sub_frac:
        k = int(n * sub_frac)
        bits[:k] = rng.integers(1, 1 << 23, k).astype(np.uint32)
    return bits


def _rand_f64(rng, n, emin=-900, emax=900):
    """Random positive f64 with full random 52-bit mantissas."""
    e = rng.integers(emin + 1023, emax + 1023, n).astype(np.uint64)
    m = rng.integers(0, 1 << 52, n, dtype=np.int64).astype(np.uint64)
    return ((e << np.uint64(52)) | m).view(np.float64)


N = 200_000


def test_unpack_f32_roundtrip():
    rng = np.random.default_rng(0)
    bits = _rand_f32_bits(rng, N, sub_frac=0.2)
    bits[:16] = [0, 1, 2, 0x7FFFFF, 0x800000, 0x800001, 0x7F7FFFFF,
                 0x00400000, 3, 0x7F000000, 0x0B000000, 4, 5, 6, 7, 8]
    e, m, zero, nonfin = sf.unpack_f32_mag(jnp.asarray(bits))
    # value check against numpy
    v = np.asarray(_from_triple(*sf.widen24(e, m)))
    assert np.array_equal(v.astype(np.float32),
                          bits.view(np.float32))
    assert not np.asarray(zero).any() or (bits == 0).any()
    # exact repack: RN24 of an exact f32 value is the identity
    back = np.asarray(sf.pack_f32_rn(*sf.widen24(e, m)))
    assert np.array_equal(back, bits)


def test_mul24_exact():
    rng = np.random.default_rng(1)
    a = _rand_f32_bits(rng, N, sub_frac=0.1)
    b = _rand_f32_bits(rng, N, sub_frac=0.1)
    ea, ma, _, _ = sf.unpack_f32_mag(jnp.asarray(a))
    eb, mb, _, _ = sf.unpack_f32_mag(jnp.asarray(b))
    e, mh, ml = sf.mul24_exact(ea, ma, eb, mb)
    got = _from_triple(np.asarray(e), np.asarray(mh), np.asarray(ml))
    want = (a.view(np.float32).astype(np.float64)
            * b.view(np.float32).astype(np.float64))
    assert np.array_equal(got, want)


def _chain_rand_f64_triples(rng, n, emin=-500, emax=500):
    v = _rand_f64(rng, n, emin, emax)
    e, mh, ml = _canon64(v)
    return v, jnp.asarray(e), jnp.asarray(mh), jnp.asarray(ml)


def test_mul53x24_rn():
    rng = np.random.default_rng(2)
    v, e, mh, ml = _chain_rand_f64_triples(rng, N)
    b = _rand_f32_bits(rng, N, sub_frac=0.05)
    eb, mb, _, _ = sf.unpack_f32_mag(jnp.asarray(b))
    eo, mho, mlo = sf.mul53x24_rn(e, mh, ml, eb, mb)
    want = v * b.view(np.float32).astype(np.float64)
    we, wh, wl = _canon64(want)
    assert np.array_equal(np.asarray(eo), we)
    assert np.array_equal(np.asarray(mho), wh)
    assert np.array_equal(np.asarray(mlo), wl)
    # multiplying by exactly 1.0 must be the identity
    one = np.full(N, 0x3F800000, np.uint32)
    e1, m1, _, _ = sf.unpack_f32_mag(jnp.asarray(one))
    eo, mho, mlo = sf.mul53x24_rn(e, mh, ml, e1, m1)
    assert (np.array_equal(np.asarray(eo), np.asarray(e))
            and np.array_equal(np.asarray(mho), np.asarray(mh))
            and np.array_equal(np.asarray(mlo), np.asarray(ml)))


def test_mul53x24_ties():
    """Directed round-to-nearest-even ties: products landing exactly
    halfway at bit 53."""
    # M = 2^52 + 1 times mb = 2^23 + 2^22 -> product has a trailing
    # pattern exercising the tie logic; also scan small odd mantissas
    Ms = np.array([(1 << 52) + 1, (1 << 52) + 3, (1 << 53) - 1,
                   (1 << 52) + (1 << 29) - 1], np.uint64)
    mbs = np.array([0x800001, 0xC00000, 0xFFFFFF, 0x800003], np.uint32)
    M_all = np.repeat(Ms, len(mbs))
    mb_all = np.tile(mbs, len(Ms))
    v = np.ldexp(M_all.astype(np.float64), -52)
    e = jnp.asarray(np.zeros(len(M_all), np.int32))
    mh = jnp.asarray((M_all >> np.uint64(32)).astype(np.uint32))
    ml = jnp.asarray((M_all & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    fb = (mb_all | np.uint32(127 << 23)) - np.uint32(0x800000)
    ebv, mbv, _, _ = sf.unpack_f32_mag(jnp.asarray(fb))
    eo, mho, mlo = sf.mul53x24_rn(e, mh, ml, ebv, mbv)
    want = v * fb.view(np.float32).astype(np.float64)
    got = _from_triple(np.asarray(eo), np.asarray(mho), np.asarray(mlo))
    assert np.array_equal(got, want)


def test_div53_rn():
    rng = np.random.default_rng(3)
    nv, ne, nh, nl = _chain_rand_f64_triples(rng, N)
    dv, de, dh, dl = _chain_rand_f64_triples(rng, N)
    eo, mho, mlo = sf.div53_rn(ne, nh, nl, de, dh, dl)
    want = nv / dv
    we, wh, wl = _canon64(want)
    assert np.array_equal(np.asarray(eo), we)
    assert np.array_equal(np.asarray(mho), wh)
    assert np.array_equal(np.asarray(mlo), wl)


def test_div53_directed():
    """Exact quotients, N == D, near-tie quotients, extreme mantissas."""
    pairs = []
    for d in [1.0, 1.5, 1.0 + 2**-52, 2.0 - 2**-52, 1.9999999,
              1.0 + 2**-26]:
        for q in [1.0, 1.0 + 2**-52, 0.5 + 2**-53, 1.0 - 2**-53,
                  1.5, 2.0 - 2**-52, 0.75]:
            pairs.append((q * d, d))      # may round; compare vs numpy
    n_np = np.array([p[0] for p in pairs])
    d_np = np.array([p[1] for p in pairs])
    ne, nh, nl = (jnp.asarray(x) for x in _canon64(n_np))
    de, dh, dl = (jnp.asarray(x) for x in _canon64(d_np))
    eo, mho, mlo = sf.div53_rn(ne, nh, nl, de, dh, dl)
    want = n_np / d_np
    got = _from_triple(np.asarray(eo), np.asarray(mho), np.asarray(mlo))
    assert np.array_equal(got, want)


def test_div53_chunk_boundaries():
    """Adversarial long-division stress: quotients whose 18-bit chunk
    digits sit at their extremes (0, 1, 0x3FFFF) with remainders at
    {0, 1, D-1} — the cases where the f32 digit estimate's error could
    cross a floor boundary if the _N_FIX correction budget were ever
    insufficient."""
    rng = np.random.default_rng(8)
    qs = []
    for d0 in (0, 1, 0x3FFFF, 0x20000):
        for d1 in (0, 1, 0x3FFFF, 0x1FFFF):
            for d2 in (0, 1, 0x3FFFF):
                q = (1 << 54) | (d0 << 36) | (d1 << 18) | d2
                qs.append(q >> 2)          # 53-bit quotient mantissas
    qs = np.array(qs, np.uint64)
    Ds = np.concatenate([
        rng.integers(1 << 52, 1 << 53, 64, dtype=np.int64),
        np.array([1 << 52, (1 << 53) - 1, (1 << 52) + 1], np.int64),
    ]).astype(np.uint64)
    # N = round(q_mant * D * 2^-52) +- {0, 1}: quotients land just
    # above/below representable boundaries
    pairs_n = []
    pairs_d = []
    for D in Ds:
        vd = np.ldexp(D.astype(np.float64), -52)
        for q in qs:
            vq = np.ldexp(q.astype(np.float64), -52)
            for eps in (0.0, 2.0 ** -52, -(2.0 ** -52)):
                pairs_n.append(vq * vd * (1.0 + eps))
                pairs_d.append(vd)
    n_np = np.array(pairs_n)
    d_np = np.array(pairs_d)
    fin = np.isfinite(n_np) & (n_np > 0)
    n_np = n_np[fin]
    d_np = d_np[fin]
    ne, nh, nl = (jnp.asarray(x) for x in _canon64(n_np))
    de, dh, dl = (jnp.asarray(x) for x in _canon64(d_np))
    eo, mho, mlo = sf.div53_rn(ne, nh, nl, de, dh, dl)
    want = n_np / d_np
    got = _from_triple(np.asarray(eo), np.asarray(mho), np.asarray(mlo))
    assert np.array_equal(got, want)


def test_pack_f32_rn():
    rng = np.random.default_rng(4)
    # spread across the f32 range including subnormal/overflow bands
    v = np.concatenate([
        _rand_f64(rng, N // 2, -130, 130),
        _rand_f64(rng, N // 4, -155, -120),   # deep subnormal band
        _rand_f64(rng, N // 8, 120, 135),     # overflow band
        _rand_f64(rng, N // 8, -1000, 1000),
    ])
    e, mh, ml = _canon64(v)
    got = np.asarray(sf.pack_f32_rn(jnp.asarray(e), jnp.asarray(mh),
                                    jnp.asarray(ml)))
    want = v.astype(np.float32).view(np.uint32)
    assert np.array_equal(got, want)


def test_pack_f32_directed_ties():
    vals = []
    # halfway cases at the f32 boundary: m24 + exactly 0.5 ulp
    for m24 in [0x800000, 0x800001, 0xFFFFFE, 0xFFFFFF, 0xABCDEF]:
        for e in [-3, 0, 10, -126, -127, -130, -148, -149, 127]:
            base = np.ldexp(np.float64(m24), e - 23)
            half = np.ldexp(np.float64(1), e - 24)
            vals += [base, base + half, base + half * 1.0000001,
                     base + half * 0.9999999]
    # minimum subnormal half-ties
    vals += [2.0**-150, 2.0**-150 * 1.001, 2.0**-150 * 0.999,
             2.0**-149, 2.0**-149 * 1.5, 3 * 2.0**-150,
             np.ldexp(1.0, 128), np.ldexp(1.9999999, 127),
             float(np.float64(3.4028235e38)), np.ldexp(1.0, -151)]
    v = np.array(vals, np.float64)
    e, mh, ml = _canon64(v)
    got = np.asarray(sf.pack_f32_rn(jnp.asarray(e), jnp.asarray(mh),
                                    jnp.asarray(ml)))
    want = v.astype(np.float32).view(np.uint32)
    assert np.array_equal(got, want)


def test_div24_f32_rn():
    rng = np.random.default_rng(5)
    a = _rand_f32_bits(rng, N, sub_frac=0.1)
    b = _rand_f32_bits(rng, N, sub_frac=0.1)
    ea, ma, _, _ = sf.unpack_f32_mag(jnp.asarray(a))
    eb, mb, _, _ = sf.unpack_f32_mag(jnp.asarray(b))
    got = np.asarray(sf.div24_f32_rn(ea, ma, eb, mb))
    with np.errstate(all="ignore"):
        want = (a.view(np.float32) / b.view(np.float32)).view(np.uint32)
    assert np.array_equal(got, want)


def test_div24_f32_specials():
    a = np.array([0x3F800000, 0x00000000, 0x3F800000, 0x00000001,
                  0x7F7FFFFF, 0x00000001], np.uint32)
    b = np.array([0x00000000, 0x3F800000, 0x00000001, 0x7F7FFFFF,
                  0x00000001, 0x00000001], np.uint32)
    ea, ma, _, _ = sf.unpack_f32_mag(jnp.asarray(a))
    eb, mb, _, _ = sf.unpack_f32_mag(jnp.asarray(b))
    got = np.asarray(sf.div24_f32_rn(ea, ma, eb, mb))
    with np.errstate(all="ignore"):
        want = (a.view(np.float32) / b.view(np.float32)).view(np.uint32)
    assert np.array_equal(got, want)


def test_full_predictor_chain():
    """The interior 7-factor MSST19 predictor through the soft path:
    pred = f32( ((A*B)*C)*G / ((D*E)*F) ) with per-op f64 rounding —
    must match the numpy f64 chain bit for bit, including the f64->f32
    double rounding."""
    rng = np.random.default_rng(6)
    n = N
    ops = [_rand_f32_bits(rng, n, emin=100, emax=160, sub_frac=0.02)
           for _ in range(7)]
    A, B, C, G, D, E, F = [o.view(np.float32).astype(np.float64)
                           for o in ops]
    with np.errstate(all="ignore"):
        want = (((A * B) * C) * G / ((D * E) * F)).astype(
            np.float32).view(np.uint32)
    up = [sf.unpack_f32_mag(jnp.asarray(o))[:2] for o in ops]
    num = sf.mul24_exact(up[0][0], up[0][1], up[1][0], up[1][1])
    num = sf.mul53x24_rn(*num, up[2][0], up[2][1])
    num = sf.mul53x24_rn(*num, up[3][0], up[3][1])
    den = sf.mul24_exact(up[4][0], up[4][1], up[5][0], up[5][1])
    den = sf.mul53x24_rn(*den, up[6][0], up[6][1])
    q = sf.div53_rn(*num, *den)
    got = np.asarray(sf.pack_f32_rn(*q))
    assert np.array_equal(got, want)


def test_rec_chain():
    """rec = f32( f64(|pred|) * ptable[state] ): a widened f32 times an
    arbitrary f64 with the RN53 -> RN24 double rounding."""
    rng = np.random.default_rng(7)
    p = _rand_f32_bits(rng, N, sub_frac=0.05)
    t = _rand_f64(rng, N, -60, 60)
    ep, mp, _, _ = sf.unpack_f32_mag(jnp.asarray(p))
    et, th, tl = (jnp.asarray(x) for x in _canon64(t))
    prod = sf.mul53x24_rn(et, th, tl, ep, mp)
    got = np.asarray(sf.pack_f32_rn(*prod))
    want = ((p.view(np.float32).astype(np.float64) * t)
            .astype(np.float32).view(np.uint32))
    assert np.array_equal(got, want)
