"""Index manifest + per-partition checkpoints (generation protocol).

Mirrors the reference's generation-numbered ``segments_N`` commit +
deleter protocol (c/src/index.c:735-960, 3683-3860) with the cloud-native
equivalents: per-partition checkpoint JSON records keyed by a deterministic
input fingerprint, and an atomic ``manifest.json`` rename as the commit
point.  A build that is killed and re-run skips every partition whose
checkpoint matches and produces byte-identical outputs (docids are pure
functions of (fragment, row) — never of time or scheduling).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True, separators=(",", ":"))
        os.replace(tmp, path)  # atomic commit point
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_json(path: str) -> Any | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def checkpoint_path(index_dir: str, kind: str, key: str) -> str:
    return os.path.join(index_dir, "checkpoints", f"{kind}-{key}.json")


def checkpoint_done(
    index_dir: str, kind: str, key: str, fingerprint: str
) -> bool:
    """True if this partition already completed with the same inputs."""
    rec = read_json(checkpoint_path(index_dir, kind, key))
    if not rec or rec.get("fingerprint") != fingerprint:
        return False
    for out in rec.get("outputs", []):
        if not os.path.exists(os.path.join(index_dir, out)):
            return False
    return True


def write_checkpoint(
    index_dir: str,
    kind: str,
    key: str,
    fingerprint: str,
    outputs: list[str],
    metrics: dict[str, Any],
) -> None:
    atomic_write_json(
        checkpoint_path(index_dir, kind, key),
        {
            "kind": kind,
            "key": key,
            "fingerprint": fingerprint,
            "outputs": outputs,
            "metrics": metrics,
        },
    )


def write_manifest(index_dir: str, manifest: dict[str, Any]) -> None:
    atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)


def read_manifest(index_dir: str) -> dict[str, Any] | None:
    return read_json(os.path.join(index_dir, "manifest.json"))
