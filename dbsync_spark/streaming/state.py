"""Shared helpers for parquet-state streaming services."""

from __future__ import annotations

_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose directory is removed at interpreter exit. The demo
    queries build per-invocation index state under a temp root; a bare
    mkdtemp leaks one directory per sweep/bench invocation (round-4
    ADVICE), so every query-site temp root goes through here."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH_DIRS:
        atexit.register(lambda: [shutil.rmtree(p, ignore_errors=True)
                                 for p in _SCRATCH_DIRS])
    _SCRATCH_DIRS.append(path)
    return path


def next_epoch(root: str, sub: str) -> int:
    """Auto-assign the next epoch id for a direct (non-foreachBatch)
    process_batch call: one past the highest epoch=N subdir under
    <root>/<sub>, 0 when none exist. foreachBatch callers keep passing
    Spark's epoch_id; the checkpoint guarantees those never repeat."""
    import os
    import re as _re

    try:
        entries = os.listdir(os.path.join(root, sub))
    except FileNotFoundError:
        return 0
    best = -1
    for e in entries:
        m = _re.fullmatch(r"epoch=(\d+)", e)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def list_epochs(root: str, sub: str) -> list[int]:
    """Sorted epoch ids of the epoch=N subdirs under <root>/<sub> —
    the single definition of the listing the epoch-scoped services
    (bloom/search/simhash/cms/...) previously each re-implemented."""
    import os
    import re as _re

    try:
        entries = os.listdir(os.path.join(root, sub))
    except FileNotFoundError:
        return []
    return sorted(int(m.group(1)) for e in entries
                  if (m := _re.fullmatch(r"epoch=(\d+)", e)))
