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
    if os.path.lexists(link):
        if link.is_symlink() and os.path.realpath(link) == str(src.resolve()):
            return
        link.unlink()
    link.symlink_to(src)
