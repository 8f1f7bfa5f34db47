"""Pallas TPU histogram via MXU one-hot matmuls.

The encode path needs a 65536-bin histogram of the quantization type
codes (the Huffman frequency table, Huffman.c tree build input).  XLA
formulations are bound by per-element index work on TPU (measured on
v5e at 2^24 symbols, forced sync: scatter-add ~170 ms, the sort+
searchsorted form engine._sorted_histogram ~2.6x better but still
>60 ms).  Here each chunk computes its histogram as an integer matmul
on the MXU:

    hist2d[r, c] = #{ t : sym[t] >> 7 == r  and  sym[t] & 127 == c }
                 = sum_t onehot_hi[r, t] * onehot_lo[t, c]

i.e. a (512, S) x (S, 128) bf16 matmul accumulated in f32 — exact:
products are 0/1 and per-chunk counts are <= S << 2^24.  The grid
accumulates chunk results into the single (512, 128) int32 output
block (constant out index -> revisiting accumulation).  Measured on
v5e: 2^24 symbols -> ~11 ms device time (vs ~170 ms scatter-add).

Out-of-range marker: symbols < 0 (padding) match no row and silently
drop out — callers pad partial chunks with -1.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SH = 8192          # symbols per chunk: one-hot (512, 8192) bf16 = 8 MB


def _kernel(sym_ref, o_ref):
    c = pl.program_id(0)
    s = sym_ref[0].astype(jnp.int32)                  # (1, SH)
    hi = s >> 7
    lo = s & jnp.int32(127)
    rows = jax.lax.broadcasted_iota(jnp.int32, (512, SH), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, SH), 0)
    A = (rows == hi).astype(jnp.bfloat16)             # (512, SH)
    # padding symbols are negative: hi < 0 matches no row of A, so they
    # contribute nothing even though lo = s & 127 is in range
    B = (cols == lo).astype(jnp.bfloat16)             # (128, SH)
    h = jax.lax.dot_general(A, B, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    @pl.when(c == jnp.int32(0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += h.astype(jnp.int32)


@functools.lru_cache(maxsize=32)
def _hist_call(C: int, interpret: bool):
    z = np.int32(0)
    return pl.pallas_call(
        _kernel,
        grid=(C,),
        in_specs=[pl.BlockSpec((1, 1, SH), lambda c: (c, z, z))],
        out_specs=pl.BlockSpec((512, 128), lambda c: (z, z)),
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def histogram(sym_flat, *, interpret: bool = False):
    """Traceable 65536-bin histogram of a flat integer symbol array.
    Symbols must be in [0, 65536); negative values are ignored
    (padding).  Returns (65536,) int32."""
    n = sym_flat.shape[0]
    C = max(-(-n // SH), 1)
    s = sym_flat.astype(jnp.int32)
    if C * SH > n:
        s = jnp.concatenate(
            [s, jnp.full((C * SH - n,), -1, jnp.int32)])
    out = _hist_call(C, interpret)(s.reshape(C, 1, SH))
    return out.reshape(-1)
