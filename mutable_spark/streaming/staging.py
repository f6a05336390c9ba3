"""File-stream staging helpers shared by the streaming sources.

Spark's FileStreamSource needs a *directory*, while the testdata dir
mixes every table's parquet — so each source stages a symlink-only dir
holding just its file. The stage path is keyed by a hash of the FULL
source path (two sf roots with the same leaf name must not collide),
and a dangling or re-targeted symlink is re-created rather than trusted
(`Path.exists()` follows symlinks, so a removed source used to leave a
dangling link that crashed the next symlink_to with FileExistsError).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path


def _stage_dir(prefix: str, src: Path) -> Path:
    key = hashlib.sha256(str(src.resolve()).encode()).hexdigest()[:16]
    stage = Path(tempfile.gettempdir()) / prefix / key
    stage.mkdir(parents=True, exist_ok=True)
    return stage


def _ensure_link(link: Path, src: Path) -> None:
    """Idempotent and concurrency-tolerant: two sessions staging the same
    source may race on unlink/symlink — each tolerates the other's moves
    as long as the surviving link targets the right file."""
    import shutil

    target = str(src.resolve())
    if os.path.lexists(link):
        if link.is_symlink() and os.path.realpath(link) == target:
            return
        if link.is_dir() and not link.is_symlink():
            shutil.rmtree(link, ignore_errors=True)
        else:
            try:
                link.unlink()
            except FileNotFoundError:
                pass  # a concurrent stager removed it first
    try:
        link.symlink_to(src)
    except FileExistsError:
        # a concurrent stager won the race — accept its link iff it
        # points at the same source
        if not (link.is_symlink() and os.path.realpath(link) == target):
            raise
