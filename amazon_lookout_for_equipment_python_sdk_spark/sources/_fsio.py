"""Executor-side storage seam for the shard sinks (r12 verdict #3).

The WARC/WebDataset shard writers run inside ``mapInPandas`` /
``applyInPandas`` tasks — Python workers with NO py4j gateway, so the
driver-only Hadoop ``FileSystem`` walk that ``schema.py`` S2 uses is
out of reach there.  ``pyarrow.fs`` is the executor-safe equivalent:
it ships with the baked-in pyarrow wheel, resolves ``file://`` /
``hdfs://`` / object-store URIs (any scheme ``pyarrow.fs`` knows) to a
filesystem + path pair, and streams bytes without touching the JVM.  Plain (scheme-less) paths
keep the original ``open()`` fast path — behavior unchanged for local
runs.

One sharp edge is handled here so callers can't hit it:
``open_output_stream`` defaults to ``compression='detect'`` and would
TRANSPARENTLY gzip anything written to a ``*.gz`` path — double-
compressing WARC shards whose records are already per-record gzip
members.  Every stream opened here pins ``compression=None``.
"""

from __future__ import annotations

import os
import re
from typing import BinaryIO

#: RFC 3986 scheme prefix — requires "://" so a Windows drive letter or a
#: colon inside a relative path never routes to pyarrow.
_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def has_scheme(path: str) -> bool:
    """True when ``path`` is URI-schemed (``file://``, ``hdfs://``, an
    object-store scheme, ...)."""
    return bool(_URI_RE.match(path))


def _resolve(uri: str):
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(uri)


def join_path(base: str, name: str) -> str:
    """Join a shard file name onto a directory that may be a URI (POSIX
    separator either way — object-store keys and Hadoop paths use '/')."""
    if has_scheme(base):
        return base.rstrip("/") + "/" + name
    return os.path.join(base, name)


def ensure_dir(path: str) -> None:
    """mkdir -p across the seam (no-op where the store has no dirs)."""
    if has_scheme(path):
        fs, p = _resolve(path)
        fs.create_dir(p, recursive=True)
    else:
        os.makedirs(path, exist_ok=True)


def open_output(path: str) -> BinaryIO:
    """Binary write stream; raw bytes regardless of extension (see
    module doc on the ``compression='detect'`` hazard)."""
    if has_scheme(path):
        fs, p = _resolve(path)
        return fs.open_output_stream(p, compression=None)
    return open(path, "wb")


def file_size(path: str) -> int:
    if has_scheme(path):
        fs, p = _resolve(path)
        return fs.get_file_info(p).size
    return os.path.getsize(path)
