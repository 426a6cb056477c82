"""Resumable partitioned output: per-partition lineage manifests.

The reference's checkpointing idiom is skip-if-file-exists at shard
granularity (crawler letter shards,
src/fr/lip6/reden/ldextractor/per/QueryAuthorBNF.java:60-66; N3 cache
GraphHandlerNEL.java:353-356). We lift the same idiom to partition
granularity for a distributed run (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"):

* The input is split into ``n_partitions`` partitions at FILE
  granularity: input Parquet files are deterministically assigned
  round-robin (sorted order) to partitions, and each partition's job
  reads ONLY its own files — resuming n partitions costs n partial
  reads, never n full-corpus scans. A url never spans partitions
  because the pages table carries one row per url.
* When the input has fewer files than partitions (e.g. one big file),
  a ONE-TIME split pass (guarded by ``_input/_split_manifest.json``)
  rewrites it as hash(url)-partitioned Parquet; every later run —
  including every resume — reads only per-partition files.
* Each partition writes its Parquet under ``out/part=<i>/`` and then a
  ``_manifest.json`` (input files, row count, output files, content
  checksum, wall time) — written AFTER the data, atomically
  (temp file + rename), so a manifest's existence proves the
  partition's data is complete (SURVEY.md §7.5 note 7: no double-emit).
* ``resume``: partitions whose manifest exists and verifies are
  SKIPPED; only missing/incomplete partitions recompute.

``run_partitioned`` drives any ``pipeline_fn: Dataset -> Dataset``.
Each partition executes as an independent streaming job — partition
failure isolates, partial progress persists.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd


# ---------------------------------------------------------------------------
# Input partitioning (file-granular)
# ---------------------------------------------------------------------------


def list_parquet_files(pages_path: str | Path) -> list[Path]:
    p = Path(pages_path)
    if p.is_dir():
        return sorted(q for q in p.rglob("*.parquet") if q.is_file())
    return [p]


def assign_files(files: list[Path], n_partitions: int) -> list[list[str]]:
    """Deterministic round-robin assignment over the sorted file list."""
    parts: list[list[str]] = [[] for _ in range(n_partitions)]
    for i, f in enumerate(sorted(files)):
        parts[i % n_partitions].append(str(f))
    return parts


def _file_stats(files: list[str] | list[Path]) -> list[list]:
    """[path, size, mtime_ns] per file — the staleness signature.
    Size alone misses same-size in-place rewrites; mtime_ns catches
    them (the same signature the IVF index cache uses)."""
    out = []
    for f in sorted(str(f) for f in files):
        st = os.stat(f)
        out.append([f, st.st_size, st.st_mtime_ns])
    return out


def _input_fingerprint(files: list[Path]) -> str:
    h = hashlib.md5()
    for f, size, mtime_ns in _file_stats(files):
        h.update(f.encode())
        h.update(str(size).encode())
        h.update(str(mtime_ns).encode())
    return h.hexdigest()


def _split_single_input(files: list[Path], split_dir: Path, n_partitions: int) -> None:
    """One-time full pass: rewrite a few-files input as
    hash(url)-partitioned Parquet under ``split_dir/__part=<i>/``."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (
            pd.util.hash_pandas_object(df["url"], index=False) % n_partitions
        ).astype("int64")
        return df

    ds = rd.read_parquet([str(f) for f in files]).map_batches(
        add_part, batch_format="pandas"
    )
    split_dir.mkdir(parents=True, exist_ok=True)
    ds.write_parquet(str(split_dir), partition_cols=["__part"])


def prepare_input_partitions(
    pages_path: str | Path, out_dir: str | Path, n_partitions: int,
    url_partitioned: bool = False,
) -> list[list[str]]:
    """File lists per partition; splits the input once if it has fewer
    files than partitions (idempotent, manifest-guarded).

    ``url_partitioned=True`` forces the hash(url) split pass even for
    many-file inputs. File-granular assignment does NOT co-locate a
    url re-crawled into a different input file, so a pipeline_fn that
    collapses re-crawls (``latest_page_per_url``) only sees one of the
    two rows per partition; the url-hash split restores the one-
    context-per-url invariant at the cost of one full input rewrite."""
    files = list_parquet_files(pages_path)
    if len(files) >= n_partitions and not url_partitioned:
        return assign_files(files, n_partitions)

    split_dir = Path(out_dir) / "_input"
    sm_path = split_dir / "_split_manifest.json"
    fp = _input_fingerprint(files)
    ok = False
    if sm_path.exists():
        try:
            sm = json.loads(sm_path.read_text())
            ok = sm.get("fingerprint") == fp and sm.get("n_partitions") == n_partitions
        except (json.JSONDecodeError, OSError):
            ok = False
    if not ok:
        import shutil

        if split_dir.exists():
            shutil.rmtree(split_dir)
        _split_single_input(files, split_dir, n_partitions)
        tmp = split_dir / "_split_manifest.json.tmp"
        tmp.write_text(json.dumps({
            "fingerprint": fp,
            "n_partitions": n_partitions,
            "input": str(pages_path),
        }, indent=1))
        os.replace(tmp, sm_path)
    return [
        sorted(str(f) for f in (split_dir / f"__part={i}").glob("*.parquet"))
        for i in range(n_partitions)
    ]


# ---------------------------------------------------------------------------
# Manifests
# ---------------------------------------------------------------------------


def _checksum_dir(part_dir: Path) -> str:
    h = hashlib.md5()
    for f in sorted(part_dir.glob("*.parquet")):
        h.update(f.name.encode())
        h.update(str(f.stat().st_size).encode())
    return h.hexdigest()


def manifest_path(out_dir: str | Path, part: int) -> Path:
    return Path(out_dir) / f"part={part}" / "_manifest.json"


def partition_complete(out_dir: str | Path, part: int,
                       expected_input_files: list[str] | None = None) -> bool:
    """A partition is complete iff its manifest verifies against the
    output files AND (when given) against the CURRENT input assignment
    and input file stats: adding/removing input files re-shuffles the
    round-robin assignment, and an in-place rewrite of an input file
    (even same-size) changes its mtime_ns — both must invalidate the
    stale partition rather than silently skipping rows."""
    mp = manifest_path(out_dir, part)
    if not mp.exists():
        return False
    try:
        m = json.loads(mp.read_text())
        if m.get("checksum") != _checksum_dir(mp.parent):
            return False
        if expected_input_files is not None:
            if m.get("input_files") != list(expected_input_files):
                return False
            if "input_stat" not in m:
                # legacy manifest (written before input stats were
                # recorded): the input-file LIST matched, so accept it
                # instead of recomputing every pre-existing checkpoint;
                # log once so the migration is visible.
                import logging

                logging.getLogger(__name__).info(
                    "partition %s: legacy manifest without input_stat — "
                    "accepted on input_files match (will be upgraded on "
                    "next recompute)", part)
            elif m["input_stat"] != _file_stats(expected_input_files):
                return False
        return True
    except (json.JSONDecodeError, OSError):
        return False


def run_partitioned(
    pages_path: str,
    out_dir: str | Path,
    pipeline_fn,
    n_partitions: int = 8,
    resume: bool = True,
    url_partitioned: bool = False,
) -> dict:
    """Run ``pipeline_fn(pages_ds) -> Dataset`` per file partition with
    manifest checkpointing. Returns run metrics.

    ``url_partitioned=True``: partition on hash(url) instead of input
    files — required when the corpus may contain re-crawls (the same
    url in different input files) and ``pipeline_fn`` collapses them
    with ``latest_page_per_url``: a url's rows must share a partition
    for the collapse to see both."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    parts_files = prepare_input_partitions(pages_path, out, n_partitions,
                                           url_partitioned=url_partitioned)
    metrics = {"partitions": n_partitions, "skipped": 0, "ran": 0, "rows": 0, "sec": 0.0}
    t0 = time.perf_counter()
    for part, files in enumerate(parts_files):
        part_dir = out / f"part={part}"
        if resume and partition_complete(out, part, expected_input_files=files):
            metrics["skipped"] += 1
            continue
        # incomplete partial output -> rebuild from scratch (atomic unit)
        if part_dir.exists():
            for f in part_dir.glob("*"):
                f.unlink()
        t1 = time.perf_counter()
        part_dir.mkdir(parents=True, exist_ok=True)
        if files:  # this partition's files ONLY — no corpus re-scan
            result = pipeline_fn(rd.read_parquet(files))
            result.write_parquet(str(part_dir))
        n_rows = sum(pq.read_metadata(f).num_rows for f in part_dir.glob("*.parquet"))
        manifest = {
            "partition": part,
            "n_partitions": n_partitions,
            "input": str(pages_path),
            "input_files": [str(f) for f in files],
            "input_stat": _file_stats(files),
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
    files: list[str] = []
    for p in sorted(Path(out_dir).glob("part=*")):
        if (p / "_manifest.json").exists():
            files.extend(str(f) for f in sorted(p.glob("*.parquet")))
    return rd.read_parquet(files)
