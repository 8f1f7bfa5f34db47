/* sz_tpu native host runtime.
 *
 * The TPU engine (sz_tpu/tpu/engine.py) does the data-parallel heavy
 * lifting on-device; this small C library covers the strictly-serial
 * host-side pieces where Python/numpy would dominate the wall clock:
 *   - ordered float accumulation (C `acc += x` semantics, needed for
 *     bit-exact means; reference e.g. sz_float.c:6658-6669)
 *   - Huffman bitstream pack (reference encode(), Huffman.c:205-308)
 *   - byte-level FSM Huffman decode (reference decode(), Huffman.c:310)
 *   - the coefficient delta-quantization chain (sz_float.c:6787-6814)
 *
 * Exposed via ctypes (no pybind11 in this environment).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <math.h>

/* ------------------------------------------------------------------ */
/* Ordered accumulation                                                */
/* ------------------------------------------------------------------ */

float seq_sum_f32(const float *x, int64_t n) {
    float acc = 0.0f;
    for (int64_t i = 0; i < n; i++) acc += x[i];
    return acc;
}

double seq_sum_f64(const double *x, int64_t n) {
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) acc += x[i];
    return acc;
}

/* ------------------------------------------------------------------ */
/* Huffman bitstream pack (MSB-first, codes <= 128 bits)               */
/* ------------------------------------------------------------------ */

/* Append `len` (<=64) MSB-aligned bits of `word` to the stream.
 * Invariant: accbits < 8 on entry and exit of the caller's loop body. */
static inline int64_t put_bits(uint64_t word, int len, uint64_t *acc,
                               int *accbits, uint8_t *out, int64_t ob) {
    int room = 64 - *accbits;
    int placed = len < room ? len : room;
    *acc |= word >> *accbits;
    *accbits += placed;
    while (*accbits >= 8) {
        out[ob++] = (uint8_t)(*acc >> 56);
        *acc <<= 8;
        *accbits -= 8;
    }
    int rem = len - placed;
    if (rem > 0) {
        *acc |= (word << placed) >> *accbits;
        *accbits += rem;
        while (*accbits >= 8) {
            out[ob++] = (uint8_t)(*acc >> 56);
            *acc <<= 8;
            *accbits -= 8;
        }
    }
    return ob;
}

/* Returns number of bytes written.  out must hold ceil(total_bits/8). */
int64_t huff_encode(const int32_t *syms, int64_t n,
                    const uint64_t *code_hi, const uint64_t *code_lo,
                    const uint8_t *code_len, uint8_t *out) {
    uint64_t acc = 0;       /* pending bits, MSB-aligned */
    int accbits = 0;
    int64_t ob = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t s = syms[i];
        int len = code_len[s];
        if (len <= 64) {
            ob = put_bits(code_hi[s], len, &acc, &accbits, out, ob);
        } else {
            ob = put_bits(code_hi[s], 64, &acc, &accbits, out, ob);
            ob = put_bits(code_lo[s], len - 64, &acc, &accbits, out, ob);
        }
    }
    if (accbits > 0) out[ob++] = (uint8_t)(acc >> 56);
    return ob;
}

/* total bit count helper */
int64_t huff_total_bits(const int32_t *syms, int64_t n,
                        const uint8_t *code_len) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += code_len[syms[i]];
    return total;
}

/* ------------------------------------------------------------------ */
/* Byte-level FSM Huffman decode                                       */
/* ------------------------------------------------------------------ */

/* next_state: [n_states][256] int32; emit_cnt: [n_states][256] int8;
 * emit_syms: [n_states][256][8] int32.  Decodes `count` symbols. */
int64_t huff_fsm_decode(const int32_t *next_state, const int8_t *emit_cnt,
                        const int32_t *emit_syms, const uint8_t *data,
                        int64_t nbytes, int32_t *out, int64_t count) {
    int64_t k = 0;
    int32_t s = 0;
    for (int64_t i = 0; i < nbytes; i++) {
        uint8_t b = data[i];
        int64_t base = ((int64_t)s << 8) | b;
        int cnt = emit_cnt[base];
        if (cnt) {
            const int32_t *sy = emit_syms + base * 8;
            for (int j = 0; j < cnt && k < count; j++) out[k++] = sy[j];
            if (k >= count) return k;
        }
        s = next_state[base];
    }
    return k;
}

/* Bit-walk decode over the flat serialized tree (fallback, and used for
 * the coefficient streams where building an FSM is not worth it). */
int64_t huff_tree_decode(const int32_t *L, const int32_t *R,
                         const int32_t *C, const uint8_t *T,
                         const uint8_t *data, int64_t nbytes,
                         int32_t *out, int64_t count) {
    int64_t k = 0;
    int32_t n = 0;
    for (int64_t i = 0; i < nbytes && k < count; i++) {
        uint8_t byte = data[i];
        for (int bit = 7; bit >= 0; bit--) {
            n = (byte >> bit) & 1 ? R[n] : L[n];
            if (T[n]) {
                out[k++] = C[n];
                if (k >= count) break;
                n = 0;
            }
        }
    }
    return k;
}

/* ------------------------------------------------------------------ */
/* Coefficient delta-quantization chain (float / double)               */
/* ------------------------------------------------------------------ */

/* For each reg block (rows of coeffs[nreg][nc]), quantize each coeff
 * against the previous reconstructed value.  Outputs:
 *   ctypes[nc][nreg]   type codes
 *   unpred[nc][nreg]   escape values (compacted per coeff; counts out)
 *   qcoeffs[nreg][nc]  reconstructed coefficients
 * use_mean selects the multiply-by-reciprocal form (sz_float.c:6699). */
void coeff_chain_f32(const float *coeffs, int64_t nreg, int nc,
                     const float *precision, int use_mean,
                     int32_t *ctypes, float *unpred, int64_t *unpred_cnt,
                     float *qcoeffs, int capacity, int radius) {
    float last[8] = {0};
    float recip[8];
    for (int e = 0; e < nc; e++) {
        recip[e] = 1.0f / precision[e];
        unpred_cnt[e] = 0;
    }
    float cap = (float)capacity;
    for (int64_t n = 0; n < nreg; n++) {
        for (int e = 0; e < nc; e++) {
            float cur = coeffs[n * nc + e];
            float diff = cur - last[e];
            float itv = use_mean ? fabsf(diff) * recip[e] + 1.0f
                                 : fabsf(diff) / precision[e] + 1.0f;
            int32_t t = 0;
            if (itv < cap) {
                if (diff < 0) itv = -itv;
                t = (int32_t)(itv / 2.0f) + radius;
                float rec = last[e] + (float)(2 * (t - radius)) * precision[e];
                if (fabsf(cur - rec) > precision[e]) {
                    t = 0;
                    last[e] = cur;
                    unpred[e * nreg + unpred_cnt[e]++] = cur;
                } else {
                    last[e] = rec;
                }
            } else {
                last[e] = cur;
                unpred[e * nreg + unpred_cnt[e]++] = cur;
            }
            ctypes[e * nreg + n] = t;
            qcoeffs[n * nc + e] = last[e];
        }
    }
}

void coeff_chain_f64(const double *coeffs, int64_t nreg, int nc,
                     const double *precision, int use_mean,
                     int32_t *ctypes, double *unpred, int64_t *unpred_cnt,
                     double *qcoeffs, int capacity, int radius) {
    double last[8] = {0};
    double recip[8];
    for (int e = 0; e < nc; e++) {
        recip[e] = 1.0 / precision[e];
        unpred_cnt[e] = 0;
    }
    double cap = (double)capacity;
    for (int64_t n = 0; n < nreg; n++) {
        for (int e = 0; e < nc; e++) {
            double cur = coeffs[n * nc + e];
            double diff = cur - last[e];
            double itv = use_mean ? fabs(diff) * recip[e] + 1.0
                                  : fabs(diff) / precision[e] + 1.0;
            int32_t t = 0;
            if (itv < cap) {
                if (diff < 0) itv = -itv;
                t = (int32_t)(itv / 2.0) + radius;
                double rec = last[e] + (double)(2 * (t - radius)) * precision[e];
                if (fabs(cur - rec) > precision[e]) {
                    t = 0;
                    last[e] = cur;
                    unpred[e * nreg + unpred_cnt[e]++] = cur;
                } else {
                    last[e] = rec;
                }
            } else {
                last[e] = cur;
                unpred[e * nreg + unpred_cnt[e]++] = cur;
            }
            ctypes[e * nreg + n] = t;
            qcoeffs[n * nc + e] = last[e];
        }
    }
}

/* Decode side of the chain (szd_float.c:3376-3414). */
void coeff_chain_decode_f32(const int32_t *ctypes, int64_t nreg, int nc,
                            const float *precision, const int32_t *cradius,
                            const float *unpred, const int64_t *stride,
                            float *qcoeffs) {
    float last[8] = {0};
    int64_t ucnt[8] = {0};
    for (int64_t n = 0; n < nreg; n++) {
        for (int e = 0; e < nc; e++) {
            int32_t t = ctypes[e * nreg + n];
            if (t != 0)
                last[e] = last[e] + (float)(2 * (t - cradius[e])) * precision[e];
            else
                last[e] = unpred[e * stride[0] + ucnt[e]++];
            qcoeffs[n * nc + e] = last[e];
        }
    }
}

void coeff_chain_decode_f64(const int32_t *ctypes, int64_t nreg, int nc,
                            const double *precision, const int32_t *cradius,
                            const double *unpred, const int64_t *stride,
                            double *qcoeffs) {
    double last[8] = {0};
    int64_t ucnt[8] = {0};
    for (int64_t n = 0; n < nreg; n++) {
        for (int e = 0; e < nc; e++) {
            int32_t t = ctypes[e * nreg + n];
            if (t != 0)
                last[e] = last[e] + (double)(2 * (t - cradius[e])) * precision[e];
            else
                last[e] = unpred[e * stride[0] + ucnt[e]++];
            qcoeffs[n * nc + e] = last[e];
        }
    }
}

/* uint16 symbol variant of huff_encode (type streams are uint16 on the
 * device side; avoids a 2x-size int32 conversion on slow hosts). */
int64_t huff_encode_u16(const uint16_t *syms, int64_t n,
                        const uint64_t *code_hi, const uint64_t *code_lo,
                        const uint8_t *code_len, uint8_t *out) {
    uint64_t acc = 0;
    int accbits = 0;
    int64_t ob = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t s = syms[i];
        int len = code_len[s];
        if (len <= 64) {
            ob = put_bits(code_hi[s], len, &acc, &accbits, out, ob);
        } else {
            ob = put_bits(code_hi[s], 64, &acc, &accbits, out, ob);
            ob = put_bits(code_lo[s], len - 64, &acc, &accbits, out, ob);
        }
    }
    if (accbits > 0) out[ob++] = (uint8_t)(acc >> 56);
    return ob;
}

int64_t huff_total_bits_u16(const uint16_t *syms, int64_t n,
                            const uint8_t *code_len) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += code_len[syms[i]];
    return total;
}

/* libm-vectorized transcendentals: the PW_REL pre-log transform maps
 * through log2()/exp2() whose numpy SIMD implementations differ from
 * glibc libm in the last ulp — double streams multiply by these values
 * directly (sz_double_pwr.c pre_log), so parity requires the same libm
 * the reference binary links. */
void v_log2_f64(const double *x, double *out, int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = log2(x[i]);
}

void v_exp2_f64(const double *x, double *out, int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = exp2(x[i]);
}
