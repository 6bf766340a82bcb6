"""Cold-start breakdown: where a fresh process's first headline run goes.

Round 4 cut first-ever cold start 629 s -> ~150-350 s with the persistent
compile cache, but the residual was unattributed (VERDICT r4 weak #5 /
next #6).  This benchmark runs the LOO headline pipeline in a fresh
subprocess and logs wall timestamps at every cold-start stage:

  import         python + jax + package imports
  backend        first tiny device op (tunnel session + runtime init)
  mosaic_warmup  first Mosaic kernel compile of the process (the one-time
                 backend init a trivial 8x128 kernel absorbs)
  data           synthetic cohort build + H2D upload
  ref_af         reference-AF EM: first compile + dispatch of the fused
                 chunk kernels at the target shape
  loo            the K LOO EMs + LL columns (per-np_pad compiles)
  total          end-to-end

Run it twice back-to-back and the difference between the first and second
subprocess separates cache-miss compile cost from the per-process floor
(backend init + executable deserialization) that no cache removes.

``--fresh_cache`` points the subprocess at an empty temp cache directory —
the true first-ever-on-this-machine number.

Prints one JSON line per subprocess run.

Usage:
  python benchmarks/cold_start_bench.py [--m 5000000] [--n 180] [--runs 2]
      [--fresh_cache]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_WORKER = r"""
import json, os, sys, time
t0 = time.perf_counter()
stages = {}

import numpy as np                      # noqa: E402
sys.path.insert(0, sys.argv[1])
m, n, k = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])

import jax                              # noqa: E402
import jax.numpy as jnp                 # noqa: E402

from wgsassign_tpu.parallel.mesh import (  # noqa: E402
    enable_compilation_cache, make_runtime,
)

enable_compilation_cache()
stages["import"] = time.perf_counter() - t0

t = time.perf_counter()
np.asarray(jnp.ones(8).sum())           # tunnel session + backend init
stages["backend"] = time.perf_counter() - t

t = time.perf_counter()
from wgsassign_tpu.ops.pallas_emmaf import _mosaic_warmup  # noqa: E402
rt = make_runtime(jax.devices()[:1])
_mosaic_warmup(rt.pallas_interpret())
stages["mosaic_warmup"] = time.perf_counter() - t

t = time.perf_counter()
from wgsassign_tpu.io.beagle import BeagleData      # noqa: E402
from wgsassign_tpu.io.ids import population_map     # noqa: E402
from wgsassign_tpu.io.synth import synth_cohort     # noqa: E402
from wgsassign_tpu.models.common import to_device   # noqa: E402
from wgsassign_tpu.models.loo import leave_one_out  # noqa: E402
from wgsassign_tpu.models.reference_af import (     # noqa: E402
    estimate_reference_af,
)

gl, labels, _ = synth_cohort(m, n, k, seed=0)
beagle = BeagleData(
    gl=gl,
    sample_names=[f"Ind{i}" for i in range(n)],
    site_names=[f"s{i}" for i in range(m)],
)
popmap = population_map(np.asarray(beagle.sample_names), labels)
cohort = to_device(beagle, rt)
jax.block_until_ready(cohort.g0)
stages["data"] = time.perf_counter() - t

t = time.perf_counter()
ref = estimate_reference_af(beagle, popmap, cohort=cohort)
np.asarray(ref.af[:8])
stages["ref_af"] = time.perf_counter() - t

t = time.perf_counter()
res = leave_one_out(
    beagle, ref.af, popmap, cohort=cohort, af_t_dev=ref.af_t_dev
)
np.asarray(res.ll)
stages["loo"] = time.perf_counter() - t

stages["total"] = time.perf_counter() - t0
print("STAGES " + json.dumps(stages), flush=True)
"""


def run_once(m, n, k, cache_dir=None):
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(_WORKER)
        worker = f.name
    env = dict(os.environ)
    if cache_dir is not None:
        env["WGSA_COMPILE_CACHE"] = cache_dir
    try:
        proc = subprocess.run(
            [sys.executable, worker, str(REPO), str(m), str(n), str(k)],
            capture_output=True, text=True, timeout=3600, env=env,
        )
    finally:
        os.unlink(worker)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
        raise SystemExit(f"worker failed rc={proc.returncode}")
    for line in proc.stdout.splitlines():
        if line.startswith("STAGES "):
            return json.loads(line[len("STAGES "):])
    raise SystemExit("no STAGES line in worker output")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=5_000_000)
    ap.add_argument("--n", type=int, default=180)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--fresh_cache", action="store_true",
                    help="empty temp compile cache (true first-ever run)")
    args = ap.parse_args()

    cache_dir = None
    tmp = None
    if args.fresh_cache:
        tmp = tempfile.TemporaryDirectory()
        cache_dir = tmp.name
    for r in range(args.runs):
        stages = run_once(args.m, args.n, args.k, cache_dir)
        print(json.dumps({
            "metric": "cold_start_breakdown",
            "m": args.m, "n": args.n, "k": args.k,
            "run": r,
            "cache": "fresh_temp" if args.fresh_cache else "persistent",
            "stages_s": {k_: round(v, 1) for k_, v in stages.items()},
        }), flush=True)
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
