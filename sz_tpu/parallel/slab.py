"""Slab-parallel (data-parallel) compression over a device mesh.

This is the TPU-native re-expression of the reference's two scaling
mechanisms (SURVEY §2.3):

  * OpenMP block-parallel codec (`SZ_compress_float_3D_MDQ_openmp`,
    sz_omp.c:63): blocks are compressed independently per thread; the
    Huffman histogram is computed in parallel and merged into ONE shared
    tree (Huffman_init_openmp, sz_omp.c:1049); per-block streams are
    concatenated by exclusive-scan offsets.
  * MPI-rank-independent chunk compression (the HDF5 filter pattern,
    hdf5-filter/H5Z-SZ/test/test_mpio.c): each rank compresses its chunk
    independently; the container orders the streams.

Here the grid is sharded into slabs along the slowest axis over a
`jax.sharding.Mesh`; each device runs the full device-side encode on its
slab (coefficient sums -> plane coefficients -> predictor selection ->
fixpoint predict+quantize), and the per-bin type histogram is `psum`-ed
over the mesh (ICI) so the host can build one shared Huffman table —
exactly the two-phase scheme of sz_omp.c, with XLA collectives instead
of OpenMP barriers.

Each slab is a self-contained SZ stream boundary (no halo exchange —
matching the reference's random-access blockwise format, where
cross-block prediction stops at chunk borders), so decode of any slab
needs only that slab's bytes: this is the random-access container.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sz_tpu.core import blocks as B
from sz_tpu.core import regnd
from sz_tpu.tpu import engine

AXIS = "slabs"


def slab_shapes(global_shape, n_devices: int):
    """Split the slowest axis into n_devices equal slabs (must divide)."""
    r0 = global_shape[0]
    if r0 % n_devices:
        raise ValueError(f"axis 0 ({r0}) must divide by mesh size "
                         f"{n_devices}")
    return (r0 // n_devices, *global_shape[1:])


def _finalize_coeffs_dev(sums, shape, block_size, T):
    """On-device coefficient finalization (turbo profile: XLA division is
    used directly; the parity engine finalizes on host instead —
    engine._finalize_coeffs)."""
    dbs = [B.dim_blocks(r, block_size) for r in shape]
    rank = len(shape)
    grids = np.meshgrid(*[db.counts() for db in dbs], indexing="ij")
    lens = [jnp.asarray(g.ravel().astype(np.float64).astype(T))
            for g in grids]
    six = jnp.asarray(6, T)
    two = jnp.asarray(2, T)
    if rank == 3:
        fx, fy, fz, f = (sums[:, i] for i in range(4))
        cbx, cby, cbz = lens
        coeff = 1 / (cbx * cby * cbz)
        a = (2 * fx / (cbx - 1) - f) * six * coeff / (cbx + 1)
        b = (2 * fy / (cby - 1) - f) * six * coeff / (cby + 1)
        c = (2 * fz / (cbz - 1) - f) * six * coeff / (cbz + 1)
        d = f * coeff - ((cbx - 1) * a / two + (cby - 1) * b / two
                         + (cbz - 1) * c / two)
        return jnp.stack([a, b, c, d], axis=1)
    fx, fy, f = (sums[:, i] for i in range(3))
    cbx, cby = lens
    coeff = 1 / (cbx * cby)
    a = (2 * fx / (cbx - 1) - f) * six * coeff / (cbx + 1)
    b = (2 * fy / (cby - 1) - f) * six * coeff / (cby + 1)
    c = f * coeff - ((cbx - 1) * a / two + (cby - 1) * b / two)
    return jnp.stack([a, b, c], axis=1)


@functools.lru_cache(maxsize=8)
def make_encode_step(mesh_shape: int, global_shape: tuple, dtype_str: str,
                     block_size: int = 6, nbins: int = 65536,
                     backend: str = "cpu"):
    """Build the jitted sharded encode step.

    Returns step(data, rp, recip, intervals, noise) ->
      (types [global, sharded], recon [global, sharded],
       hist [nbins, replicated — psum over the mesh]).

    The caller supplies the mesh via `with mesh:` ... no — the mesh is
    created here from the first `mesh_shape` devices.
    """
    devices = jax.devices()[:mesh_shape]
    mesh = Mesh(np.array(devices), (AXIS,))
    lshape = slab_shapes(global_shape, mesh_shape)
    rank = len(lshape)
    T = jnp.dtype(dtype_str)

    sums_f = engine._coeff_sums_fn(lshape, dtype_str, block_size, "raw")
    select_f = engine._select_fn(lshape, dtype_str, block_size, False,
                                 "raw")
    quant_f = engine._quantize_fn(lshape, dtype_str, block_size, False,
                                  "raw")
    g = engine._geom_small(lshape, block_size)
    loc_c = tuple(g["loc"])

    def local_encode(data, rp, recip, intervals, noise):
        data = data.reshape(lshape)
        bflat, pos, iperm = engine.lattices(lshape, block_size)
        sums = sums_f(data)
        coeffs = _finalize_coeffs_dev(sums, lshape, block_size, T)
        use_reg = select_f(data, coeffs, noise, jnp.asarray(0, T))
        lc_full = jnp.where(use_reg[:, None], coeffs,
                            jnp.zeros_like(coeffs))
        t_stream, hist64, _esc, R, _ = quant_f(
            data, lc_full, use_reg, bflat,
            tuple(jnp.asarray(l) for l in loc_c), iperm, rp, recip,
            intervals, jnp.asarray(0, T))
        hist = jax.lax.psum(hist64[:nbins], AXIS)
        t = jnp.take(t_stream.astype(jnp.int32),
                     pos.reshape(-1)).reshape(lshape)
        return t[None], R[None], hist

    spec_in = P(AXIS, *([None] * (rank - 1)))
    # check_vma=False: the per-slab scan carries start from unvarying
    # zeros and pick up the slab-varying axis inside the body, which the
    # vma checker rejects even though the computation is slab-local.
    sharded = shard_map(
        local_encode, mesh=mesh,
        in_specs=(spec_in, P(), P(), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P()), check_vma=False)

    def step(data, rp, recip, intervals, noise):
        t, R, hist = sharded(data, rp, recip, intervals, noise)
        return (t.reshape(global_shape), R.reshape(global_shape), hist)

    return jax.jit(step), mesh


def encode_sharded(data: np.ndarray, real_precision, n_devices: int,
                   intervals: int = 256, block_size: int = 6):
    """Data-parallel encode of a global array over n_devices slabs.

    Device side: one jitted sharded step (quantize + global histogram).
    Host side: one shared Huffman table from the psum-ed histogram
    (sz_omp.c:1049 analog), then per-slab streams assembled independently
    and concatenated with an offset table (random-access container).
    """
    spec = regnd._spec(data.ndim, data.dtype)
    T = spec.T
    data = np.ascontiguousarray(data, dtype=T)
    rp = T(real_precision)
    recip = T(T(1) / rp)
    noise = T(np.float64(rp) * spec.noise_factor)
    dstr = np.dtype(T).str.lstrip("<>=")

    step, mesh = make_encode_step(
        n_devices, tuple(data.shape), dstr, block_size,
        backend=jax.default_backend())
    t, R, hist = step(jax.device_put(data), T(rp), T(recip),
                      jnp.asarray(intervals, jnp.int32), T(noise))
    return np.asarray(t), np.asarray(R), np.asarray(hist)
