"""Env-var routing policy (README "Runtime configuration").

The auto defaults differ by backend on purpose: kernel-path knobs
(SZ_TPU_PALLAS / SZ_TPU_PACK2 / SZ_TPU_DEVICE_DECODE) follow the
backend, transfer-shape knobs (SZ_TPU_DEVICE_BITPACK /
SZ_TPU_PACKED_TYPES) do not.  These tests pin the selection matrix so
a refactor cannot silently misroute a backend.
"""

import pytest

from sz_tpu.tpu import engine


@pytest.mark.parametrize("backend,expect", [
    ("cpu", False), ("raw", False), ("tpu", True), ("axon", True)])
def test_pack2_auto_follows_backend(monkeypatch, backend, expect):
    monkeypatch.delenv("SZ_TPU_PACK2", raising=False)
    assert engine.pack2_policy(backend) is expect


@pytest.mark.parametrize("backend,expect", [
    ("cpu", False), ("raw", False), ("tpu", True), ("axon", True)])
def test_device_decode_auto_follows_backend(monkeypatch, backend, expect):
    monkeypatch.delenv("SZ_TPU_DEVICE_DECODE", raising=False)
    assert engine.device_decode_policy(backend) is expect


@pytest.mark.parametrize("var,fn", [
    ("SZ_TPU_PACK2", engine.pack2_policy),
    ("SZ_TPU_DEVICE_DECODE", engine.device_decode_policy)])
def test_force_and_off_override_backend(monkeypatch, var, fn):
    monkeypatch.setenv(var, "force")
    assert fn("cpu") is True
    monkeypatch.setenv(var, "0")
    assert fn("tpu") is False


def test_transfer_knobs_are_backend_independent(monkeypatch):
    monkeypatch.delenv("SZ_TPU_DEVICE_BITPACK", raising=False)
    assert engine.device_bitpack_policy() is True
    monkeypatch.setenv("SZ_TPU_DEVICE_BITPACK", "0")
    assert engine.device_bitpack_policy() is False
    monkeypatch.delenv("SZ_TPU_PACKED_TYPES", raising=False)
    assert engine.packed_types_enabled() is True
    monkeypatch.setenv("SZ_TPU_PACKED_TYPES", "0")
    assert engine.packed_types_enabled() is False


@pytest.mark.parametrize("val,expect", [
    (None, "auto"), ("force", "force"), ("0", "off"), ("off", "off")])
def test_pallas_mode(monkeypatch, val, expect):
    if val is None:
        monkeypatch.delenv("SZ_TPU_PALLAS", raising=False)
    else:
        monkeypatch.setenv("SZ_TPU_PALLAS", val)
    assert engine._pallas_mode() == expect


def test_msst19_device_ok_policy():
    """The MSST19 engine's routing contract: never on for host-only
    requests, always honors explicit engine="jax" for f32 2/3-D."""
    import numpy as np

    from sz_tpu.tpu import msst19_engine as me
    assert me.device_ok("numpy", np.float32, 3, 1 << 20) is False
    assert me.device_ok("jax", np.float32, 3, 64) is True
    assert me.device_ok("jax", np.float32, 1, 1 << 20) is False
    assert me.device_ok("jax", np.float32, 4, 1 << 20) is False


def test_msst19_device_size_envelope(monkeypatch):
    """On accelerator backends the f32 routes (softf64 wavefronts —
    f64 chains for 3D, the single-precision chain for 2D — bit-exact
    by construction) cover the 512^3 flagship (SOFT_MAX_POINTS); with
    the soft path disabled, the empirical float wavefront keeps its
    smaller certified envelope (DEVICE_MAX_POINTS) with
    verify-and-fallback."""
    import numpy as np

    from sz_tpu.tpu import msst19_engine as me
    monkeypatch.setattr(me.jax, "default_backend", lambda: "tpu")
    assert me.device_ok("jax", np.float32, 3, me.SOFT_MAX_POINTS)
    assert not me.device_ok("jax", np.float32, 3,
                            me.SOFT_MAX_POINTS + 1)
    assert me.device_ok("jax", np.float32, 2, me.SOFT_MAX_POINTS)
    monkeypatch.setenv("SZ_TPU_MSST19_SOFT", "0")
    assert me.device_ok("jax", np.float32, 3, me.DEVICE_MAX_POINTS)
    assert not me.device_ok("jax", np.float32, 3,
                            me.DEVICE_MAX_POINTS + 1)
    assert not me.device_ok("jax", np.float32, 2,
                            me.DEVICE_MAX_POINTS + 1)


def test_msst19_auto_routing(monkeypatch):
    """engine="auto" picks the MSST19 device engine on accelerator
    backends for large 3D f32 arrays via the guaranteed-parity softf64
    route (measured 1.5-2.8 GB/s/chip vs ~100 MB/s host), under the
    same link-bound guard as the other engines."""
    import numpy as np

    from sz_tpu import api
    from sz_tpu.tpu import msst19_engine as me

    # CPU backend: auto never routes to the device
    assert not me.device_ok("auto", np.float32, 3, 1 << 24)
    monkeypatch.setattr(me.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(api, "_link_bound_accelerator", lambda: False)
    assert me.device_ok("auto", np.float32, 3, 1 << 24)
    assert not me.device_ok("auto", np.float32, 3,
                            me.AUTO_MIN_SIZE - 1)
    # 2D f32 auto-routes too (the line kernel measured ~0.96 GB/s/chip
    # vs ~260 MB/s host on an 1800x3600 field)
    assert me.device_ok("auto", np.float32, 2, 1 << 22)
    # link-bound tunnel: host-resident IO stays on the host codec,
    # device-resident IO still routes
    monkeypatch.setattr(api, "_link_bound_accelerator", lambda: True)
    assert not me.device_ok("auto", np.float32, 3, 1 << 24)
    assert me.device_ok("auto", np.float32, 3, 1 << 24,
                        device_out=True)


def test_msst19_auto_interval_envelope_bail(monkeypatch):
    """Tight PW bounds (<= ~1e-4) drive the optimizer to 65536
    intervals — past the Pallas counting-search envelope, where only
    the dispatch-bound XLA scan could serve.  auto must hand those
    configs BACK to the host codec (me.compress returns None before
    touching the device); explicit engine="jax" keeps the device scan."""
    import numpy as np

    from sz_tpu.tpu import msst19_engine as me

    monkeypatch.setattr(me.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(0)
    data = np.abs(rng.standard_normal((8, 9, 10))
                  ).astype(np.float32) + np.float32(0.01)
    out = me.compress(data, 1e-4, data.max(), np.abs(data).min(),
                      max_range_radius=32768, sample_distance=100,
                      pred_threshold=0.99, plus_bits=3,
                      opt_quant_mode=0, fixed_intervals=65536,
                      engine="auto")
    assert out is None
    # a covered interval count proceeds past the bail (backend is
    # really CPU here, so stop at the policy decision only)
    from sz_tpu.tpu import msst19_kernel as mk
    assert mk.kernel_tables(65536, 1e-4, 3) is None
    assert mk.kernel_tables(2048, 1e-3, 3) is not None
    # decode-side: device_ok with the stream's stair_key declines
    # oversized-interval streams for auto (and only for auto)
    from sz_tpu import api
    monkeypatch.setattr(api, "_link_bound_accelerator", lambda: False)
    assert not me.device_ok("auto", np.float32, 3, 1 << 24,
                            stair_key=(65536, 1e-4, 3))
    assert me.device_ok("auto", np.float32, 3, 1 << 24,
                        stair_key=(2048, 1e-3, 3))
    assert me.device_ok("jax", np.float32, 3, 1 << 24,
                        stair_key=(65536, 1e-4, 3))
