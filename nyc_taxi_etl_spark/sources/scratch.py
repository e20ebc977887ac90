"""Ephemeral per-run scratch directories, preferring tmpfs.

Catalog entries that demonstrate storage-backed operators (versioned
tables, materialized views, stream checkpoints) create small
throwaway table roots that live exactly as long as one invocation.
Those writes are pure fixed cost on a disk-backed ``/tmp``; placing
them on tmpfs (``/dev/shm``) when the host has one removes the disk
round-trip without changing a single byte of the computed result.

Production callers pass their own durable roots to the operators —
this helper only serves the catalog's self-contained demos and the
finite ``Trigger.AvailableNow`` drains.
"""

from __future__ import annotations

import os
import tempfile

__all__ = ["scratch_dir"]


def scratch_dir(prefix: str) -> str:
    """mkdtemp on tmpfs when ``/dev/shm`` exists, else the default
    temp root. Caller owns cleanup (or leaves it to process exit —
    these roots hold megabytes, not data)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)
