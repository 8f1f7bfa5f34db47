"""Real-TPU timing + parity harness for the jax engine.

Runs engine.compress on the attached TPU (the driver env's axon tunnel)
for each requested SZ_TPU_PALLAS mode, asserts the stream is
byte-identical to the host (regnd) engine, and prints per-stage trace
spans.  Run ONE instance at a time (the tunnel serializes poorly) and
timeout-guard the invocation:

    timeout 1800 python tools/tpu_timings.py --n 256 --modes 0,auto

Results land on stdout as JSON lines (one per mode x repeat).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="cube edge")
    ap.add_argument("--prec", type=float, default=1e-3)
    ap.add_argument("--modes", default="0,auto",
                    help="comma list of SZ_TPU_PALLAS modes to time")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-host-check", action="store_true",
                    help="skip the host-engine byte-parity check")
    ap.add_argument("--noise", action="store_true",
                    help="pure-noise field: worst-case fixpoint sweep "
                         "count (~ny+nz sweeps/plane vs ~15 for smooth)")
    ap.add_argument("--device-input", action="store_true",
                    help="also time compress-from-device (jax.Array "
                         "input: upload skipped, optimizer gathers on "
                         "device)")
    ap.add_argument("--decode", action="store_true",
                    help="also time decompress-to-device with the "
                         "device FSM Huffman decode on and off")
    args = ap.parse_args()

    import numpy as np

    import jax
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": str(jax.devices())}), flush=True)

    from sz_tpu.core import regnd
    from sz_tpu.tpu import engine
    from sz_tpu.utils import trace as tr

    n = args.n
    rng = np.random.default_rng(7)
    if args.noise:
        data = rng.standard_normal((n, n, n)).astype(np.float32)
    else:
        x = np.linspace(0, 6 * np.pi, n, dtype=np.float32)
        data = (np.sin(x)[:, None, None] * np.cos(x)[None, :, None]
                * np.cos(0.5 * x)[None, None, :]
                + 0.05 * rng.standard_normal((n, n, n))).astype(np.float32)
    kw = dict(max_range_radius=32768, sample_distance=100,
              pred_threshold=np.float32(0.99))

    host_body = None
    if not args.no_host_check:
        t0 = time.perf_counter()
        host = regnd.compress(data, args.prec, **kw)
        print(json.dumps({"engine": "host", "mode": "-",
                          "t": time.perf_counter() - t0,
                          "MBps": data.nbytes / 1e6 / (time.perf_counter() - t0),
                          "len": len(host.body)}), flush=True)
        host_body = host.body

    tr.enable(True)
    for mode in args.modes.split(","):
        os.environ["SZ_TPU_PALLAS"] = mode
        engine._quantize_fn.cache_clear()
        for rep in range(args.repeats):
            tr.reset()
            t0 = time.perf_counter()
            out = engine.compress(data, args.prec, **kw)
            dt = time.perf_counter() - t0
            spans = {}
            for name, s in tr.last_spans():
                spans[name] = round(spans.get(name, 0.0) + s, 4)
            ok = (host_body is None) or (out.body == host_body)
            print(json.dumps({"engine": "jax", "mode": mode, "rep": rep,
                              "t": round(dt, 3),
                              "MBps": round(data.nbytes / 1e6 / dt, 1),
                              "parity": ok, "len": len(out.body),
                              "spans": spans}), flush=True)
            if not ok:
                print("PARITY FAILURE", file=sys.stderr)
                sys.exit(1)

    if args.device_input:
        import jax
        # pin the kernel choice (the modes loop above leaves whatever
        # mode ran last) and record it in the output
        di_mode = args.modes.split(",")[-1]
        os.environ["SZ_TPU_PALLAS"] = di_mode
        engine._quantize_fn.cache_clear()
        dev_data = jax.device_put(data)
        dev_data.block_until_ready()
        for rep in range(args.repeats):
            tr.reset()
            t0 = time.perf_counter()
            out = engine.compress(dev_data, args.prec, **kw)
            dt = time.perf_counter() - t0
            spans = {}
            for name, s in tr.last_spans():
                spans[name] = round(spans.get(name, 0.0) + s, 4)
            ok = (host_body is None) or (out.body == host_body)
            print(json.dumps({"engine": "jax", "mode": "device-input",
                              "pallas": di_mode,
                              "rep": rep, "t": round(dt, 3),
                              "MBps": round(data.nbytes / 1e6 / dt, 1),
                              "parity": ok, "len": len(out.body),
                              "spans": spans}), flush=True)
            if not ok:
                print("PARITY FAILURE", file=sys.stderr)
                sys.exit(1)

    if args.decode:
        import jax
        import jax.numpy as jnp
        body = host_body if host_body is not None else out.body
        ref = regnd.decompress(body, data.shape, np.float32)
        for dd in ("auto", "0"):
            os.environ["SZ_TPU_DEVICE_DECODE"] = dd
            for rep in range(args.repeats):
                tr.reset()
                t0 = time.perf_counter()
                rec = engine.decompress(body, data.shape, np.float32,
                                        as_jax=True)
                float(jnp.sum(rec.reshape(-1)[:8]))  # force completion
                dt = time.perf_counter() - t0
                spans = {}
                for name, s in tr.last_spans():
                    spans[name] = round(spans.get(name, 0.0) + s, 4)
                ok = np.array_equal(
                    np.asarray(rec).view(np.uint32), ref.view(np.uint32))
                print(json.dumps({
                    "engine": "jax-decode", "device_decode": dd,
                    "rep": rep, "t": round(dt, 3),
                    "MBps": round(data.nbytes / 1e6 / dt, 1),
                    "parity": bool(ok), "spans": spans}), flush=True)
                if not ok:
                    print("DECODE PARITY FAILURE", file=sys.stderr)
                    sys.exit(1)


if __name__ == "__main__":
    main()
