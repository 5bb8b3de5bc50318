"""Relay transport diagnostic: attribute the restore_tree throughput floor.

The r5 batch sweep (readings/r5/restore_ab_v0.jsonl) showed restore_tree
img/s FALLING with batch size (82 -> 46 from batch 64 to 384) — the
opposite of dispatch-RTT amortization — pointing at the host<->device
link itself. This driver isolates each transport component on the live
backend so the end-to-end number has a measured decomposition:

  up        host->device bandwidth (device_put, forced by an on-device
            reduction + scalar fetch)
  down      device->host bandwidth (np.asarray of a device buffer)
  duplex    aggregate when one thread uploads while another downloads
            (is the link full-duplex or serialized?)
  rtt       round-trip of a dispatch+scalar-fetch of a trivial graph

Prints one JSON line per buffer size plus a summary with the implied
img/s ceilings for the restore_tree traffic patterns (3 units/img with
on-device metrics, 2 units/img with host metrics).

Usage: python benchmarks/relay_diag.py [--sizes 8,32,64] [--reps 3]
(sizes are batch counts of 224x224x3 uint8 images per buffer)
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", default="8,32,64,256")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--hw", type=int, default=224)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(json.dumps({"backend": dev.platform,
                      "device": str(dev)}), flush=True)

    @jax.jit
    def touch(x):  # tiny scalar: forces materialization through the relay
        return jnp.sum(x[..., 0, 0, 0].astype(jnp.int32))

    @jax.jit
    def tiny(x):
        return x + 1

    @jax.jit
    def bump(x):  # fresh device buffer each call (uint8 wrap is fine):
        return x + 1  # jax Arrays cache np.asarray results, so download
        # timing MUST use a new buffer per rep or rep 2+ times a no-op

    # dispatch RTT on a scalar graph
    s = jax.device_put(np.int32(1))
    int(tiny(s))
    t0 = time.perf_counter()
    n_rtt = 20
    for _ in range(n_rtt):
        int(tiny(s))
    rtt_ms = (time.perf_counter() - t0) / n_rtt * 1e3
    print(json.dumps({"rtt_ms": round(rtt_ms, 2)}), flush=True)

    img_bytes = args.hw * args.hw * 3
    rows = []
    for b in [int(x) for x in args.sizes.split(",")]:
        host = np.random.default_rng(0).integers(
            0, 256, (b, args.hw, args.hw, 3), dtype=np.uint8)
        mb = b * img_bytes / 1e6

        # warm the shapes (compile touch/bump for this shape)
        d = jax.device_put(host)
        int(touch(d))
        int(touch(bump(d)))

        def up_once():
            t0 = time.perf_counter()
            buf = jax.device_put(host)
            int(touch(buf))  # completion barrier (async relay)
            return time.perf_counter() - t0

        def fresh():
            out = bump(d)
            int(touch(out))  # materialized on device before timing
            return out

        def down_once():
            out = fresh()
            t0 = time.perf_counter()
            np.asarray(out)
            return time.perf_counter() - t0

        up = min(up_once() for _ in range(args.reps))
        down = min(down_once() for _ in range(args.reps))

        # duplex: one thread uploads, one downloads, same wall-clock
        def run_duplex():
            res = {}
            out = fresh()

            def u():
                t0 = time.perf_counter()
                buf = jax.device_put(host)
                int(touch(buf))
                res["up"] = time.perf_counter() - t0

            def dn():
                t0 = time.perf_counter()
                np.asarray(out)
                res["down"] = time.perf_counter() - t0

            ts = [threading.Thread(target=u), threading.Thread(target=dn)]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            res["wall"] = time.perf_counter() - t0
            return res

        dup = min((run_duplex() for _ in range(args.reps)),
                  key=lambda r: r["wall"])
        # aggregate MB/s moved during the duplex window
        dup_mbs = 2 * mb / dup["wall"]

        rows.append({
            "batch": b, "mb": round(mb, 1),
            "up_mbs": round(mb / up, 1),
            "down_mbs": round(mb / down, 1),
            "duplex_aggregate_mbs": round(dup_mbs, 1),
            "duplex_ratio": round(dup_mbs / (mb / up + mb / down), 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    best = max(rows, key=lambda r: r["duplex_aggregate_mbs"])
    up_mbs, down_mbs = best["up_mbs"], best["down_mbs"]
    # img/s ceilings from transport alone (no compute, perfect overlap):
    # serial link: total bytes / min(up,down... actually sum paths);
    # duplex link: max(up bytes, down bytes) paths in parallel.
    ser_3 = 1.0 / (2 * img_bytes / 1e6 / up_mbs + img_bytes / 1e6 / down_mbs)
    ser_2 = 1.0 / (img_bytes / 1e6 / up_mbs + img_bytes / 1e6 / down_mbs)
    dup_2 = min(up_mbs, down_mbs) / (img_bytes / 1e6)
    print(json.dumps({
        "summary": {
            "rtt_ms": round(rtt_ms, 2),
            "best": best,
            "ceiling_img_s_3units_serial": round(ser_3, 1),
            "ceiling_img_s_2units_serial": round(ser_2, 1),
            "ceiling_img_s_2units_duplex": round(dup_2, 1),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
