"""Index manifest + per-partition checkpoints (generation protocol).

Mirrors the reference's generation-numbered ``segments_N`` commit +
deleter protocol (c/src/index.c:735-960, 3683-3860) with the cloud-native
equivalents: per-partition checkpoint JSON records keyed by a deterministic
input fingerprint, and an atomic ``manifest.json`` rename as the commit
point.  A build that is killed and re-run skips every partition whose
checkpoint matches and produces byte-identical outputs (docids are pure
functions of (fragment, row) — never of time or scheduling).

All paths may be URIs (``file://``, ``s3://``, any fsspec scheme) —
resolved through :mod:`ferret_ray.state.fs` so the commit protocol works
on shared cluster storage.
"""

from __future__ import annotations

from typing import Any

from .fs import (
    fs_exists,
    fs_read_json,
    fs_write_json_atomic,
    join,
    resolve_fs,
)


def atomic_write_json(path: str, obj: Any) -> None:
    fs, p = resolve_fs(path)
    fs_write_json_atomic(fs, p, obj)


def read_json(path: str) -> Any | None:
    fs, p = resolve_fs(path)
    return fs_read_json(fs, p)


def checkpoint_path(index_dir: str, kind: str, key: str) -> str:
    return join(index_dir, "checkpoints", f"{kind}-{key}.json")


def seg_gc_marker_path(index_dir: str, bucket: int) -> str:
    """Marker recording that a segment bucket dir was GC'd after its
    hash shard's merge checkpoint became durable (streaming-disk mode,
    ``IndexConfig.gc_segments_during_merge``)."""
    return join(index_dir, "checkpoints", f"segGC-{bucket:04d}.json")


def _gc_covers(fs, root: str, out: str, cache: dict) -> bool:
    """A missing output under ``segments/bucket=NNNN/`` still counts as
    done when bucket NNNN carries a segGC marker: the files were merged
    into their shard pair and deliberately released.  Stale markers
    cannot survive a fingerprint change (_clear_stale_build wipes the
    checkpoints dir wholesale)."""
    if not out.startswith("segments/bucket="):
        return False
    bucket = out[len("segments/bucket="):].split("/", 1)[0]
    if bucket not in cache:
        cache[bucket] = fs_exists(
            fs, join(root, "checkpoints", f"segGC-{bucket}.json")
        )
    return cache[bucket]


def checkpoint_done(
    index_dir: str, kind: str, key: str, fingerprint: str
) -> bool:
    """True if this partition already completed with the same inputs."""
    fs, root = resolve_fs(index_dir)
    rec = fs_read_json(
        fs, join(root, "checkpoints", f"{kind}-{key}.json")
    )
    if not rec or rec.get("fingerprint") != fingerprint:
        return False
    gc_cache: dict = {}
    for out in rec.get("outputs", []):
        if not fs_exists(fs, join(root, out)):
            if _gc_covers(fs, root, out, gc_cache):
                continue
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
    atomic_write_json(join(index_dir, "manifest.json"), manifest)


def read_manifest(index_dir: str) -> dict[str, Any] | None:
    return read_json(join(index_dir, "manifest.json"))
