"""Gzipped-Beagle genotype-likelihood ingest.

File contract (ANGSD Beagle output; see reference reader_cy.pyx:16-77 for the
behavior being reproduced):

- header row: ``marker  allele1  allele2`` then 3 columns per individual, each
  triple labelled with the individual's sample name;
- each data row: site name (``chr_pos``), two allele codes, then the three
  genotype likelihoods ``P(D|g=0), P(D|g=1), P(D|g=2)`` per individual,
  normalized to sum to 1.

In-memory model: we keep ``gl`` as float32 ``[M_sites, N_inds, 2]`` holding
GL(g=0) and GL(g=1); GL(g=2) is reconstructed in-register as ``1 - g0 - g1``
everywhere downstream (same 2-of-3 contract as the reference's ``[M, 2N]``
matrix, laid out for TPU-friendly batched ops).

Two parsers are provided:

- a native C++ streaming parser (``wgsassign_tpu._native``): zlib inflate +
  overlapped chunked tokenization, used when the extension is built;
- a pure-Python/pandas fallback with identical results.
"""

from __future__ import annotations

import gzip
import io as _io
import os
from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class BeagleData:
    """Parsed Beagle matrix.

    Attributes:
      gl: float32 ``[M, N, 2]`` — GL(g=0), GL(g=1) per (site, individual).
      sample_names: length-N list (may contain duplicates, as in ANGSD output).
      site_names: length-M list of ``chr_pos`` marker names.
    """

    gl: np.ndarray
    sample_names: List[str]
    site_names: List[str]

    @property
    def n_sites(self) -> int:
        return self.gl.shape[0]

    @property
    def n_inds(self) -> int:
        return self.gl.shape[1]

    def filter_sites(self, keep_mask: np.ndarray) -> "BeagleData":
        """Row-subset by boolean mask, preserving order."""
        keep_mask = np.asarray(keep_mask, dtype=bool)
        sites = [s for s, k in zip(self.site_names, keep_mask) if k]
        return BeagleData(self.gl[keep_mask], list(self.sample_names), sites)


@dataclass
class BeagleShard:
    """This process's contiguous row block of a Beagle file (multi-host).

    Each host parses only its own window (``read_beagle_sharded``); the
    global device arrays are assembled shard-by-shard in
    :func:`wgsassign_tpu.models.common.to_device` via
    ``make_global_sites_array`` — no host ever materializes the full
    ``[M, N, 2]`` matrix.  Replaces the reference's full-parse-everywhere
    ingest (reader_cy.pyx:16-77) at pod scale.

    ``site_names`` are the *local* window's markers; operations needing the
    global site list (downsampled-LOO intersection) are unsupported in
    sharded mode and raise in the CLI.
    """

    local: BeagleData        # rows [lo, hi) of the file
    m_global: int            # total data rows in the file
    lo: int
    hi: int
    rows_per_process: int    # padded per-process block size

    @property
    def n_sites(self) -> int:
        return self.m_global

    @property
    def n_inds(self) -> int:
        return self.local.n_inds

    @property
    def sample_names(self) -> List[str]:
        return self.local.sample_names

    @property
    def site_names(self) -> List[str]:
        return self.local.site_names


def read_beagle_sharded(path: str, runtime, site_multiple: int = 1,
                        use_native: bool = True,
                        n_threads=None) -> BeagleShard:
    """Multi-host ingest: dimension scan, then parse only this process's
    contiguous row window.

    ``runtime`` is the :class:`wgsassign_tpu.parallel.mesh.Runtime` whose
    mesh the cohort will live on — the window size is padded so each
    process's block divides evenly over its local devices (and the Pallas
    site tile, when active).
    """
    import jax

    from wgsassign_tpu.parallel.mesh import process_row_range

    m_global, _n = beagle_dims(path, use_native=use_native)
    nproc = jax.process_count()
    mult_total = runtime.site_multiple(site_multiple)
    if mult_total % nproc != 0:
        # site_multiple always contains a factor of n_devices (= nproc *
        # local devices), so this only trips on asymmetric meshes
        raise ValueError(
            f"site multiple {mult_total} does not divide over {nproc} processes"
        )
    lo, hi, per = process_row_range(m_global, multiple=mult_total // nproc)
    local = read_beagle(path, use_native=use_native, row_range=(lo, hi),
                        n_threads=n_threads)
    return BeagleShard(local=local, m_global=m_global, lo=lo, hi=hi,
                       rows_per_process=per)


def _open_maybe_gzip(path: str) -> _io.BufferedReader:
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f)  # type: ignore[return-value]
    return f


def _read_beagle_python(path: str, row_range=None) -> BeagleData:
    """Pure-Python parser (pandas C engine for the float block).

    ``row_range=(lo, hi)`` parses only data rows lo..hi-1 — the per-host
    shard-loading path for multi-host runs (each host reads its own
    contiguous block; see parallel.mesh.process_row_range).
    """
    import pandas as pd

    with _open_maybe_gzip(path) as f:
        header = f.readline().decode()
        tokens = header.split()
        n_cols = len(tokens)
        if n_cols < 3 or (n_cols - 3) % 3 != 0:
            raise ValueError(
                f"Malformed Beagle header in {path}: {n_cols} columns "
                "(expected 3 + 3*N_individuals)"
            )
        sample_names = tokens[3::3]
        n_inds = len(sample_names)
        kwargs = {}
        if row_range is not None:
            lo, hi = row_range
            kwargs = {"skiprows": lo, "nrows": max(hi - lo, 0)}
        df = pd.read_csv(
            f,
            sep="\t",
            header=None,
            dtype={0: str},
            na_filter=False,
            **kwargs,
        )
    if df.shape[1] != n_cols:
        raise ValueError(
            f"Malformed Beagle body in {path}: rows have {df.shape[1]} columns, "
            f"header has {n_cols}"
        )
    site_names = df.iloc[:, 0].tolist()
    body = df.iloc[:, 3:].to_numpy(dtype=np.float32)
    m = body.shape[0]
    gl3 = body.reshape(m, n_inds, 3)
    gl = np.ascontiguousarray(gl3[:, :, :2])
    return BeagleData(gl, sample_names, site_names)


def read_beagle(path: str, use_native: bool = True, row_range=None,
                n_threads=None) -> BeagleData:
    """Parse a (gzipped) Beagle file into a :class:`BeagleData`.

    Prefers the native C++ streaming parser when available; falls back to the
    pure-Python implementation.  ``row_range=(lo, hi)`` restricts parsing to
    a contiguous data-row block (the per-host shard-loading window for
    multi-host runs — supported by both parsers; the native one stops
    decompressing at the end of the window).  ``n_threads`` caps the native
    parser's tokenizer thread pool (the CLI's ``--threads``; None = all
    cores).
    """
    if not os.path.isfile(path):
        raise FileNotFoundError(f"Beagle file doesn't exist: {path}")
    if use_native:
        try:
            from wgsassign_tpu._native import read_beagle_native

            result = read_beagle_native(
                path, n_threads=n_threads, row_range=row_range
            )
            if result is not None:
                return result
        except ImportError:
            pass
    return _read_beagle_python(path, row_range=row_range)


def beagle_dims(path: str, use_native: bool = True):
    """Dimensions ``(m_sites, n_inds)`` of a Beagle file without parsing any
    genotype likelihoods — header column count + data-row count.  Multi-host
    startup uses this to compute each process's row window."""
    if not os.path.isfile(path):
        raise FileNotFoundError(f"Beagle file doesn't exist: {path}")
    if use_native:
        try:
            from wgsassign_tpu._native import beagle_dims_native

            dims = beagle_dims_native(path)
            if dims is not None:
                return dims
        except ImportError:
            pass
    with _open_maybe_gzip(path) as f:
        tokens = f.readline().decode().split()
        n_cols = len(tokens)
        if n_cols < 6 or (n_cols - 3) % 3 != 0:
            raise ValueError(
                f"Malformed Beagle header in {path}: {n_cols} columns "
                "(expected 3 + 3*N_individuals)"
            )
        m = sum(1 for line in f if line.strip())
    return m, (n_cols - 3) // 3


def filter_sites_to_common(data: BeagleData, target_site_names) -> BeagleData:
    """Keep only sites whose name appears in ``target_site_names`` (order
    preserved).  Mirrors reference utils.py:22-42."""
    target = set(target_site_names)
    mask = np.fromiter((s in target for s in data.site_names), dtype=bool, count=data.n_sites)
    num_filtered = int((~mask).sum())
    if num_filtered > 0:
        print(f"\tFiltered out {num_filtered} sites not present in the target site list.")
    return data.filter_sites(mask)


def to_legacy_matrix(data: BeagleData) -> np.ndarray:
    """Return the reference's ``[M, 2N]`` float32 layout (columns alternate
    GL(g=0), GL(g=1) per individual) — used only for compat checks/tests."""
    m, n, _ = data.gl.shape
    return np.ascontiguousarray(data.gl.reshape(m, 2 * n))
