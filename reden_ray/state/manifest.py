"""Resumable partitioned output: per-partition lineage manifests.

The reference's checkpointing idiom is skip-if-file-exists at shard
granularity (crawler letter shards,
src/fr/lip6/reden/ldextractor/per/QueryAuthorBNF.java:60-66; N3 cache
GraphHandlerNEL.java:353-356). We lift the same idiom to partition
granularity for a distributed run (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"):

* The input is split into ``n_partitions`` deterministic partitions by
  ``hash(url) % n`` (reused partitioning key — same axis the linker
  groups on).
* Each partition writes its Parquet under ``out/part=<i>/`` and then a
  ``_manifest.json`` (input partition id, row count, output files,
  content checksum, wall time) — written AFTER the data, atomically
  (temp file + rename), so a manifest's existence proves the
  partition's data is complete (SURVEY.md §7.5 note 7: no double-emit).
* ``resume``: partitions whose manifest exists and verifies are
  SKIPPED; only missing/incomplete partitions recompute.

``run_partitioned`` drives any ``pipeline_fn: Dataset -> Dataset``.
Each partition executes as an independent streaming job over a
``read_parquet`` filtered to its hash bucket — partition failure
isolates, partial progress persists.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path

import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd


def url_bucket_expr(n_partitions: int, part: int):
    """Pushdown-friendly partition predicate is not expressible for
    hash(url); we filter post-read instead (narrow column)."""

    def fltr(batch):
        urls = batch.column("url").to_pylist()
        mask = [int(hashlib.md5(u.encode()).hexdigest(), 16) % n_partitions == part for u in urls]
        import pyarrow as pa

        return batch.filter(pa.array(mask))

    return fltr


def _checksum_dir(part_dir: Path) -> str:
    h = hashlib.md5()
    for f in sorted(part_dir.glob("*.parquet")):
        h.update(f.name.encode())
        h.update(str(f.stat().st_size).encode())
    return h.hexdigest()


def manifest_path(out_dir: str | Path, part: int) -> Path:
    return Path(out_dir) / f"part={part}" / "_manifest.json"


def partition_complete(out_dir: str | Path, part: int) -> bool:
    mp = manifest_path(out_dir, part)
    if not mp.exists():
        return False
    try:
        m = json.loads(mp.read_text())
        return m.get("checksum") == _checksum_dir(mp.parent)
    except (json.JSONDecodeError, OSError):
        return False


def run_partitioned(
    pages_path: str,
    out_dir: str | Path,
    pipeline_fn,
    n_partitions: int = 8,
    resume: bool = True,
) -> dict:
    """Run ``pipeline_fn(pages_ds) -> Dataset`` per hash partition with
    manifest checkpointing. Returns run metrics."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    metrics = {"partitions": n_partitions, "skipped": 0, "ran": 0, "rows": 0, "sec": 0.0}
    t0 = time.perf_counter()
    for part in range(n_partitions):
        part_dir = out / f"part={part}"
        if resume and partition_complete(out, part):
            metrics["skipped"] += 1
            continue
        # incomplete partial output -> rebuild from scratch (atomic unit)
        if part_dir.exists():
            for f in part_dir.glob("*"):
                f.unlink()
        t1 = time.perf_counter()
        pages = rd.read_parquet(pages_path).map_batches(
            url_bucket_expr(n_partitions, part), batch_format="pyarrow"
        )
        result = pipeline_fn(pages)
        part_dir.mkdir(parents=True, exist_ok=True)
        result.write_parquet(str(part_dir))
        n_rows = sum(pq.read_metadata(f).num_rows for f in part_dir.glob("*.parquet"))
        manifest = {
            "partition": part,
            "n_partitions": n_partitions,
            "input": str(pages_path),
            "rows": n_rows,
            "files": sorted(f.name for f in part_dir.glob("*.parquet")),
            "checksum": _checksum_dir(part_dir),
            "wall_sec": round(time.perf_counter() - t1, 3),
            "ts": int(time.time()),
        }
        tmp = part_dir / "_manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, manifest_path(out, part))  # atomic publish
        metrics["ran"] += 1
        metrics["rows"] += n_rows
    metrics["sec"] = round(time.perf_counter() - t0, 3)
    (out / "_run_metrics.json").write_text(json.dumps(metrics, indent=1))
    return metrics


def read_output(out_dir: str | Path):
    """Read all completed partitions as one Dataset."""
    parts = [
        str(p / "")
        for p in sorted(Path(out_dir).glob("part=*"))
        if (p / "_manifest.json").exists()
    ]
    files: list[str] = []
    for p in sorted(Path(out_dir).glob("part=*")):
        if (p / "_manifest.json").exists():
            files.extend(str(f) for f in sorted(p.glob("*.parquet")))
    del parts
    return rd.read_parquet(files)


_ = pc  # reserved for future row-group pushdown predicates
