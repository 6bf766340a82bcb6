"""Streamed-vs-in-memory ingest benchmark: peak host RSS + wall-clock.

Generates a synthetic gzipped Beagle file once (reused across runs), then
measures two child processes on the CPU backend (so "device" placement cost
is identical and only host-side behavior differs):

  in-memory : read_beagle (full host matrix) -> to_device
  streamed  : stream_to_device (block parse -> donated device updates)

The streamed path's peak RSS must stay O(block + device arrays) while the
in-memory path pays the full host matrix plus parser copies on top
(VERDICT r01 item 4; the reference holds all of M resident,
reader_cy.pyx:71).

Usage: python benchmarks/stream_ingest_bench.py [--m 1000000] [--n 180]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, resource, sys, time
sys.path.insert(0, __REPO__)
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
from wgsassign_tpu.parallel.mesh import make_runtime

mode, path = sys.argv[1], sys.argv[2]
rt = make_runtime()
t0 = time.perf_counter()
if mode == "stream":
    from wgsassign_tpu.models.common import stream_to_device
    cohort, meta, _ = stream_to_device(path, rt)
else:
    from wgsassign_tpu.io.beagle import read_beagle
    from wgsassign_tpu.models.common import to_device
    cohort = to_device(read_beagle(path), rt)
cohort.g0.block_until_ready()
dt = time.perf_counter() - t0
peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(json.dumps({"mode": mode, "seconds": round(dt, 2),
                  "peak_rss_gb": round(peak_gb, 2),
                  "m": int(cohort.m_real), "n": int(cohort.n_inds)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1_000_000)
    ap.add_argument("--n", type=int, default=180)
    ap.add_argument("--file", default=None)
    args = ap.parse_args()

    path = args.file or f"/tmp/wgsa_synth_{args.m}x{args.n}.beagle.gz"
    if not os.path.exists(path):
        sys.path.insert(0, REPO)
        from wgsassign_tpu.io.synth import synth_beagle_file

        print(f"generating {path} ({args.m} x {args.n})...", file=sys.stderr)
        t0 = time.time()
        synth_beagle_file(path, args.m, args.n)
        print(f"generated in {time.time() - t0:.0f}s "
              f"({os.path.getsize(path) / 1e9:.2f} GB)", file=sys.stderr)

    results = {}
    for mode in ("stream", "inmemory"):
        out = subprocess.run(
            [sys.executable, "-c", CHILD.replace("__REPO__", repr(REPO)),
             mode, path],
            capture_output=True, text=True, check=True,
        )
        results[mode] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(results[mode]), file=sys.stderr)

    gl_gb = args.m * args.n * 2 * 4 / 1e9
    print(json.dumps({
        "workload": "stream_ingest",
        "m": args.m, "n": args.n,
        "gl_matrix_gb": round(gl_gb, 2),
        "file_gb": round(os.path.getsize(path) / 1e9, 2),
        "stream_peak_rss_gb": results["stream"]["peak_rss_gb"],
        "inmemory_peak_rss_gb": results["inmemory"]["peak_rss_gb"],
        "stream_seconds": results["stream"]["seconds"],
        "inmemory_seconds": results["inmemory"]["seconds"],
        "host_overhead_stream_gb": round(
            results["stream"]["peak_rss_gb"] - gl_gb, 2),
        "host_overhead_inmemory_gb": round(
            results["inmemory"]["peak_rss_gb"] - gl_gb, 2),
    }))


if __name__ == "__main__":
    main()
