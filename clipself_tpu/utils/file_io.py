"""Checkpoint file IO: fsspec remote loading, background remote sync,
latest-checkpoint discovery.

Equivalent of the reference `src/training/file_utils.py:10-86` +
`main.py:39-52` (remote_sync loop in a background process, fsspec `pt_load`,
natural-sort latest-checkpoint discovery incl. remote paths). The sync loop
covers Orbax checkpoint directories rather than single `.pt` files.
"""

from __future__ import annotations

import logging
import multiprocessing
import os
import re
import subprocess
import time
from typing import Optional

log = logging.getLogger(__name__)


def fsspec_open(path: str, mode: str = "rb"):
    import fsspec

    return fsspec.open(path, mode).open()


def pt_load(path: str, map_location="cpu"):
    """Load a torch checkpoint from a local or remote (fsspec) path
    (reference `file_utils.py:71-77`)."""
    import torch

    if path.startswith(("s3://", "gs://", "http://", "https://")):
        with fsspec_open(path) as f:
            return torch.load(f, map_location=map_location, weights_only=False)
    return torch.load(path, map_location=map_location, weights_only=False)


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    """One-shot recursive upload of new/changed files (reference
    `remote_sync_fsspec`, `file_utils.py:21-41`)."""
    import fsspec

    try:
        fs, remote_root = fsspec.core.url_to_fs(remote_dir)
        for root, _, files in os.walk(local_dir):
            for name in files:
                lpath = os.path.join(root, name)
                rel = os.path.relpath(lpath, local_dir)
                rpath = os.path.join(remote_root, rel)
                try:
                    if fs.exists(rpath) and fs.size(rpath) == os.path.getsize(lpath):
                        continue
                except Exception:
                    pass
                fs.makedirs(os.path.dirname(rpath), exist_ok=True)
                fs.put(lpath, rpath)
        return True
    except Exception as e:  # pragma: no cover
        log.error(f"remote sync failed: {e}")
        return False


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    """aws-cli based sync (reference `remote_sync_s3`, `file_utils.py:10-18`)."""
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir, "--exclude", "*epoch_latest*"],
        capture_output=True,
    )
    if result.returncode != 0:
        log.error(f"aws s3 sync failed: {result.stderr.decode()[:500]}")
        return False
    return True


def remote_sync(local_dir: str, remote_dir: str, protocol: str = "fsspec") -> bool:
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    return remote_sync_fsspec(local_dir, remote_dir)


def keep_running_remote_sync(
    sync_every: float, local_dir: str, remote_dir: str, protocol: str = "fsspec"
):  # pragma: no cover - infinite loop
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(
    sync_every: float, local_dir: str, remote_dir: str, protocol: str = "fsspec"
) -> multiprocessing.Process:
    """Background process syncing `local_dir` -> `remote_dir` every
    `sync_every` seconds (reference `start_sync_process`, `file_utils.py:59-61`).
    Caller starts/terminates it."""
    return multiprocessing.Process(
        target=keep_running_remote_sync,
        args=(sync_every, local_dir, remote_dir, protocol),
        daemon=True,
    )


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]


def latest_checkpoint(path: str, pattern: str = r".*epoch.*") -> Optional[str]:
    """Most recent checkpoint file/dir under a local or remote path
    (reference `get_latest_checkpoint`, `main.py:39-52`)."""
    rx = re.compile(pattern)
    if path.startswith(("s3://", "gs://")):
        import fsspec

        fs, root = fsspec.core.url_to_fs(path)
        try:
            entries = fs.ls(root)
        except Exception:
            return None
        proto = path.split("://")[0]
        names = [f"{proto}://{e}" if "://" not in str(e) else str(e) for e in entries]
    else:
        if not os.path.isdir(path):
            return None
        names = [os.path.join(path, n) for n in os.listdir(path)]
    cands = [n for n in names if rx.fullmatch(os.path.basename(n))]
    if not cands:
        return None
    return sorted(cands, key=_natural_key)[-1]
