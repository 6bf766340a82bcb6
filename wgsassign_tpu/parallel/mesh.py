"""Device mesh / sharding runtime.

Parallelism model (replacing the reference's OpenMP ``prange`` over the SNP
axis, emMAF_cy.pyx:16 etc.): a 1-D device mesh over axis ``"snp"``.  Genotype
likelihood panels ``[M, N]`` and AF panels ``[M, K]`` are sharded on their
site axis; membership matrices and per-pop scalars are replicated.  Every EM
update is pointwise in M, so the only cross-device traffic is the tiny
per-iteration convergence reduction and final log-likelihood sums — GSPMD
inserts the ``psum`` collectives from the sharding annotations.

Multi-host: ``jax.distributed.initialize`` + per-host shard loading composes
with the same mesh (each process contributes its local devices).  Single
device is the degenerate 1-mesh case — same code path throughout.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SNP_AXIS = "snp"

# Pad values forming a valid, numerically safe GL triple / AF.
PAD_G0 = 1.0
PAD_G1 = 0.0
PAD_AF = 0.5

# Per-device site shards feeding the fused Pallas EM must be divisible by a
# power of two >= 128 (lane width of the transposed AF blocks).  256 keeps
# the padding overhead negligible while guaranteeing a valid tile.
PALLAS_SITE_TILE = 256


@dataclass
class Runtime:
    """Holds the mesh and sharding helpers for one engine instance."""

    mesh: Mesh
    use_pallas: Optional[bool] = None  # None = auto (TPU only)
    debug_checks: bool = False  # checkify sanitizers on the hot paths
    # algebraically-reduced EM update in the fused kernels (~1.2x measured
    # on v5e), DEFAULT ON: the rewrite only scales operands/fractions by
    # powers of two, which commute with IEEE-754 rounding for normal-range
    # operands, so it is bit-identical to the canonical form there
    # (subnormal/flush-to-zero corner cases are unreachable with the
    # _EM_EPS clamp; argument + empirical check in
    # ops/pallas_emmaf.py::_em_w).  --no_fast_em is the kill switch.
    fast_math: bool = True

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    # -- shardings ---------------------------------------------------------
    def sites_sharding(self, ndim: int) -> NamedSharding:
        """Shard dim 0 (sites) over the mesh; replicate the rest."""
        spec = P(SNP_AXIS, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_sites(self, x) -> jax.Array:
        x = np.asarray(x)
        return _put_global(x, self.sites_sharding(x.ndim))

    def replicate(self, x) -> jax.Array:
        return _put_global(np.asarray(x), self.replicated_sharding())

    def shard_axis(self, x, axis: int) -> jax.Array:
        """Shard an arbitrary axis (e.g. the site axis of a batched
        ``[B, S, ...]`` block) over the SNP mesh; replicate the rest.
        On a multi-process mesh the (identical-everywhere) host array is
        placed shard-by-shard, so the helpers work from every process."""
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[axis] = SNP_AXIS
        return _put_global(x, NamedSharding(self.mesh, P(*spec)))

    # -- padding -----------------------------------------------------------
    def site_multiple(self, extra: int = 1) -> int:
        """Sites must be padded to a multiple of (n_devices * extra),
        times the Pallas site tile when the fused-kernel path is active —
        the per-device shard must offer a >=128 divisor for the lane
        dimension of the ``[K, tile]`` AF blocks (ops/pallas_emmaf.py)."""
        base = self.n_devices * extra
        if self.pallas_enabled():
            base *= PALLAS_SITE_TILE
        return base

    def _probe_device(self):
        """A device of this mesh that is addressable from this process (the
        probe does a device_put; on a multi-host mesh ``devices.flat[0]``
        belongs to process 0 and would fail the probe everywhere else,
        silently diverging the engine path across processes)."""
        pid = jax.process_index()
        for d in self.mesh.devices.flat:
            if d.process_index == pid:
                return d
        return self.mesh.devices.flat[0]

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        return _probe_pallas(self._probe_device())

    def pallas_interpret(self) -> bool:
        """Whether Pallas kernels must run in interpret mode here (no Mosaic
        backend — e.g. forced on via ``use_pallas`` on a CPU test mesh)."""
        return not _probe_pallas(self._probe_device())


# Capability probe result per device kind (a platform-name test would
# silently flip the engine to the slow path under plugin backends that
# report their own platform string, e.g. "axon" fronting a real TPU chip).
_PALLAS_PROBE_CACHE: dict = {}


def _probe_pallas(device) -> bool:
    """True iff a trivial Mosaic (non-interpret) Pallas kernel compiles and
    runs on ``device``.  Probed once per device kind and logged, so the
    chosen engine path is always visible in the run log."""
    key = (device.platform, getattr(device, "device_kind", ""))
    hit = _PALLAS_PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    import logging

    log = logging.getLogger("wgsassign_tpu")
    try:
        import jax.experimental.pallas as pl

        def _copy(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        x = jax.device_put(np.zeros((8, 128), np.float32), device)
        out = pl.pallas_call(
            _copy, out_shape=jax.ShapeDtypeStruct((8, 128), np.float32)
        )(x)
        ok = bool(np.asarray(out)[0, 0] == 1.0)
    except Exception as e:  # noqa: BLE001 — any failure means "no Mosaic"
        log.info("pallas probe failed on %s (%s): %s", key, type(e).__name__, e)
        ok = False
    log.info(
        "engine path on %s: %s",
        key, "fused Pallas kernels" if ok else "pure-XLA kernels",
    )
    _PALLAS_PROBE_CACHE[key] = ok
    return ok


def _put_global(x: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """device_put that also works when ``sharding`` spans processes this
    host cannot address: every process holds the full (identical) host
    array and contributes its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    from jax import make_array_from_callback

    return make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def pad_sites(arr: np.ndarray, multiple: int, pad_value: float) -> np.ndarray:
    """Pad dim 0 up to a multiple; returns the padded array."""
    m = arr.shape[0]
    m_pad = math.ceil(m / multiple) * multiple if multiple > 1 else m
    if m_pad == m:
        return arr
    pad_width = [(0, m_pad - m)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width, constant_values=pad_value)


def site_weight_vector(m_real: int, m_pad: int) -> np.ndarray:
    w = np.zeros(m_pad, dtype=np.float32)
    w[:m_real] = 1.0
    return w


def make_runtime(
    devices: Optional[Sequence] = None,
    use_pallas: Optional[bool] = None,
    debug_checks: bool = False,
    fast_math: bool = True,
) -> Runtime:
    """Build a 1-D SNP-axis mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    mesh = Mesh(np.asarray(devices), (SNP_AXIS,))
    return Runtime(mesh=mesh, use_pallas=use_pallas,
                   debug_checks=debug_checks, fast_math=fast_math)


def process_row_range(m_total: int, multiple: int = 1) -> tuple:
    """Contiguous SNP row range owned by this process.

    Multi-host data loading: each host parses only its own row range of the
    Beagle file (the format is row-streamable), then the global ``[M, ...]``
    device array is assembled from per-process shards with
    :func:`make_global_sites_array`.  Ranges are block-contiguous so they
    line up with a 1-D SNP mesh whose devices are ordered by process.
    """
    nproc = jax.process_count()
    pid = jax.process_index()
    m_pad = math.ceil(m_total / (multiple * nproc)) * (multiple * nproc)
    per = m_pad // nproc
    lo = pid * per
    hi = min(m_total, lo + per)
    return lo, max(hi, lo), per


def make_global_sites_array(runtime: Runtime, local_rows: np.ndarray, m_global: int):
    """Assemble a site-sharded global array from this process's block of
    rows (padded to the per-process size).  Single-process meshes fall back
    to a plain sharded device_put."""
    if jax.process_count() == 1:
        return runtime.shard_sites(local_rows)
    from jax import make_array_from_process_local_data

    sharding = runtime.sites_sharding(local_rows.ndim)
    global_shape = (m_global,) + tuple(local_rows.shape[1:])
    return make_array_from_process_local_data(sharding, local_rows, global_shape)


def fetch_to_host(x) -> np.ndarray:
    """Bring a device array to host memory, working for *any* sharding.

    Single-process (and replicated multi-process) arrays are fully
    addressable and copy directly; site-sharded arrays in a multi-process
    run are first all-gathered to every host (process_allgather replicates
    via a jit identity).  Every model's host-side result download goes
    through this, so the same code path serves 1 chip and a pod slice.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    # tiled=True is the (required) global-array mode: the array is
    # replicated via a jit identity and returned with its global shape
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def is_primary() -> bool:
    """True on the process that owns user-facing output (files, stdout)."""
    return jax.process_index() == 0


def enable_compilation_cache() -> Optional[str]:
    """Point JAX's persistent compilation cache at a per-user directory so
    per-shape compiles (and the one-time Mosaic backend init) are paid once
    per machine, not once per process.  Without this, cold-start of the
    5M-site headline run re-compiles every program in each fresh process.

    Directory: ``$WGSA_COMPILE_CACHE``, defaulting to
    ``~/.cache/wgsassign_tpu/jax_cache``; set ``WGSA_COMPILE_CACHE=off`` to
    disable.  Returns the directory in use (None when disabled)."""
    path = os.environ.get("WGSA_COMPILE_CACHE", "")
    if path.lower() in ("off", "0", "none"):
        return None
    if not path:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "wgsassign_tpu", "jax_cache"
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the tunneled-TPU RTT makes every
        # recompile user-visible, and entries are tiny
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        return None
    return path


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched under a multi-host
    coordinator (env-var driven; no-op for single-process runs)."""
    if os.environ.get("WGSA_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["WGSA_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["WGSA_NUM_PROCESSES"]),
            process_id=int(os.environ["WGSA_PROCESS_ID"]),
        )
