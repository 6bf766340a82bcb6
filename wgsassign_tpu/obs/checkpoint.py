"""Checkpoint/resume for long-running analyses.

The reference's only between-run state is its output files (SURVEY §5);
multi-million-SNP multi-host runs additionally want intra-run restart
points.  Two mechanisms:

- EM state checkpoints: ``(f panel, per-pop iters/active, iteration)``
  saved every ``interval`` chunks by the chunked Pallas EM driver and the
  LOO driver (one file per population group), resumable mid-run;
- the z-score ``--ind_start/--ind_end`` range restart (the reference's own
  manual sharding knob) is preserved at the CLI level.

Format: plain ``.npz`` next to the output prefix — small (``[M, K]``
float32), atomic via temp-file rename, no external dependencies.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_npz_atomic(path: str, **arrays) -> None:
    """Write an npz atomically (temp file + rename)."""
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz when missing
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


class EMCheckpoint:
    """Atomic npz checkpoint for a chunked EM run."""

    def __init__(self, path: Optional[str], interval_chunks: int = 4):
        self.path = path
        self.interval = max(interval_chunks, 1)
        self._chunk_count = 0

    def maybe_save(self, f, iters, active, it: int) -> None:
        if self.path is None:
            return
        self._chunk_count += 1
        if self._chunk_count % self.interval != 0:
            return
        self.save(f, iters, active, it)

    def save(self, f, iters, active, it: int) -> None:
        if self.path is None:
            return
        from wgsassign_tpu.parallel.mesh import fetch_to_host, is_primary

        f = fetch_to_host(f)  # may be SNP-sharded across processes
        if not is_primary():
            return  # one writer per shared filesystem
        save_npz_atomic(
            self.path,
            f=np.asarray(f),
            iters=np.asarray(iters),
            active=np.asarray(active),
            it=np.asarray(it),
        )

    def load(self):
        """Returns ``(f, iters, active, it)`` or None when absent."""
        if self.path is None or not os.path.exists(self.path):
            return None
        with np.load(self.path) as z:
            return z["f"], z["iters"], z["active"], int(z["it"])

    def clear(self) -> None:
        if self.path and os.path.exists(self.path):
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass  # another process on a shared filesystem won the race
