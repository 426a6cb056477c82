"""Tests for resumable partitioned output (manifests + resume)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from reden_ray.state.manifest import (
    manifest_path,
    partition_complete,
    read_output,
    run_partitioned,
)


def _make_pages(tmp_path, n=40):
    t = pa.table({
        "url": pa.array([f"https://x/{i}" for i in range(n)], pa.string()),
        "val": pa.array(list(range(n)), pa.int64()),
    })
    p = tmp_path / "pages.parquet"
    pq.write_table(t, p)
    return str(p)


def _double(ds):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: pa.table({"url": b["url"], "val2": pc.multiply(b["val"], 2)}),
        batch_format="pyarrow",
    )


class TestRunPartitioned:
    def test_full_run_covers_all_rows(self, tmp_path):
        pages = _make_pages(tmp_path)
        out = tmp_path / "out"
        m = run_partitioned(pages, out, _double, n_partitions=4)
        assert m["ran"] == 4 and m["skipped"] == 0 and m["rows"] == 40
        got = read_output(out).to_pandas()
        assert sorted(got["val2"]) == [2 * i for i in range(40)]

    def test_resume_skips_completed_partitions(self, tmp_path):
        pages = _make_pages(tmp_path)
        out = tmp_path / "out"
        run_partitioned(pages, out, _double, n_partitions=4)
        m2 = run_partitioned(pages, out, _double, n_partitions=4)
        assert m2["skipped"] == 4 and m2["ran"] == 0

    def test_incomplete_partition_recomputed_and_output_identical(self, tmp_path):
        pages = _make_pages(tmp_path)
        out = tmp_path / "out"
        run_partitioned(pages, out, _double, n_partitions=4)
        before = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
        # simulate a crash mid-partition: delete partition 2's manifest
        manifest_path(out, 2).unlink()
        m = run_partitioned(pages, out, _double, n_partitions=4)
        assert m["ran"] == 1 and m["skipped"] == 3
        after = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
        assert before.equals(after)

    def test_partitioned_nel_run_matches_gold(self, tmp_path, unit_fixture):
        """Two-phase partitioned run (per-partition links checkpoint +
        GLOBAL canonicalization) must match gold exactly — canonical
        labels computed per partition would diverge (regression for the
        bug found by driving the CLI)."""
        import pyarrow.parquet as pq

        from reden_ray.pipelines.nel import NELPipeline
        from reden_ray.stages.canonicalize import canonical_labels, emit_triples
        from reden_ray.stages.evaluate import triple_prf
        from reden_ray.state.manifest import read_output, run_partitioned

        p = NELPipeline(unit_fixture)

        def links_fn(pages_ds):
            return p.links(mentions_ds=p.mentions(p.texts(pages_ds)))

        links_dir = tmp_path / "links"
        run_partitioned(f"{unit_fixture}/pages.parquet", links_dir, links_fn,
                        n_partitions=4)
        links = read_output(links_dir)
        triples = emit_triples(links, canonical_labels(links), p.kb_ref,
                               p.sameas_ref, global_dedup=True)
        m = triple_prf(triples, pq.read_table(f"{unit_fixture}/gold_triples.parquet"))
        assert m["precision"] == 1.0 and m["recall"] == 1.0, m

    def test_multi_file_input_is_file_partitioned(self, tmp_path):
        """>= n_partitions input files: each partition reads ONLY its
        assigned files (disjoint cover, ~1/n of the bytes) — no split
        pass, no full-corpus re-scan per partition."""
        from reden_ray.state.manifest import prepare_input_partitions

        in_dir = tmp_path / "pages"
        in_dir.mkdir()
        for f in range(8):
            t = pa.table({
                "url": pa.array([f"https://x/{f}/{i}" for i in range(10)], pa.string()),
                "val": pa.array([f * 10 + i for i in range(10)], pa.int64()),
            })
            pq.write_table(t, in_dir / f"shard-{f}.parquet")
        out = tmp_path / "out"
        parts = prepare_input_partitions(in_dir, out, 4)
        # disjoint cover of all files, 2 per partition
        flat = [f for p in parts for f in p]
        assert len(flat) == 8 and len(set(flat)) == 8
        assert all(len(p) == 2 for p in parts)
        assert not (out / "_input").exists()  # no split pass happened
        sizes = [sum(__import__("os").path.getsize(f) for f in p) for p in parts]
        assert max(sizes) <= 2 * min(sizes)
        m = run_partitioned(str(in_dir), out, _double, n_partitions=4)
        assert m["ran"] == 4 and m["rows"] == 80
        got = read_output(out).to_pandas()
        assert sorted(got["val2"]) == [2 * i for i in range(80)]

    def test_single_file_split_once_then_partial_reads(self, tmp_path):
        """Single-file input: ONE split pass creates per-partition
        files; resume re-reads only the resumed partition's files."""
        import json as _json

        pages = _make_pages(tmp_path)
        out = tmp_path / "out"
        run_partitioned(pages, out, _double, n_partitions=4)
        split = out / "_input"
        assert (split / "_split_manifest.json").exists()
        split_mtime = (split / "_split_manifest.json").stat().st_mtime_ns
        # every partition's manifest records ONLY its own input files
        all_inputs = []
        for part in range(4):
            man = _json.loads(manifest_path(out, part).read_text())
            assert all("_input" in f for f in man["input_files"])
            all_inputs.extend(man["input_files"])
        assert len(all_inputs) == len(set(all_inputs))  # disjoint
        # resume: split NOT redone, only the broken partition recomputes
        manifest_path(out, 1).unlink()
        m = run_partitioned(pages, out, _double, n_partitions=4)
        assert m["ran"] == 1 and m["skipped"] == 3
        assert (split / "_split_manifest.json").stat().st_mtime_ns == split_mtime

    def test_changed_input_assignment_invalidates_partitions(self, tmp_path):
        """Adding an input file re-shuffles the round-robin assignment;
        stale manifests must NOT be trusted (silently skipping the new
        file's rows would under-count)."""
        in_dir = tmp_path / "pages"
        in_dir.mkdir()

        def shard(f, n=10):
            t = pa.table({
                "url": pa.array([f"https://x/{f}/{i}" for i in range(n)], pa.string()),
                "val": pa.array([f * 100 + i for i in range(n)], pa.int64()),
            })
            pq.write_table(t, in_dir / f"shard-{f}.parquet")

        for f in range(4):
            shard(f)
        out = tmp_path / "out"
        m1 = run_partitioned(str(in_dir), out, _double, n_partitions=2)
        assert m1["rows"] == 40
        shard(4)  # new input file arrives
        m2 = run_partitioned(str(in_dir), out, _double, n_partitions=2)
        assert m2["ran"] >= 1  # affected partitions recomputed
        got = read_output(out).to_pandas()
        assert len(got) == 50  # nothing silently skipped
        assert sorted(got["val2"]) == sorted(
            2 * (f * 100 + i) for f in range(5) for i in range(10))

    def test_inplace_rewrite_of_input_invalidates_partition(self, tmp_path):
        """Same path, same byte size, new content: the manifest records
        (size, mtime_ns) per input file, so an in-place rewrite must
        trigger recompute, not a silent skip of the stale output."""
        in_dir = tmp_path / "pages"
        in_dir.mkdir()

        def shard(f, base):
            t = pa.table({
                "url": pa.array([f"https://x/{f}/{i}" for i in range(10)], pa.string()),
                "val": pa.array([base + i for i in range(10)], pa.int64()),
            })
            pq.write_table(t, in_dir / f"shard-{f}.parquet")

        for f in range(4):
            shard(f, f * 100)
        out = tmp_path / "out"
        run_partitioned(str(in_dir), out, _double, n_partitions=2)
        shard(2, 9000)  # same schema/row-count -> near-identical size
        m2 = run_partitioned(str(in_dir), out, _double, n_partitions=2)
        assert m2["ran"] >= 1
        got = read_output(out).to_pandas()
        assert sorted(got["val2"])[-10:] == [2 * (9000 + i) for i in range(10)]

    def test_cross_file_recrawl_collapses_with_url_partitioning(self, tmp_path):
        """A url re-crawled into a DIFFERENT input file: file-granular
        partitions put the two rows in different partitions, so a
        per-partition latest_page_per_url cannot collapse them.
        url_partitioned=True hash-splits on url first — both rows share
        a partition and exactly the newest survives."""
        from reden_ray.stages.extract import latest_page_per_url

        in_dir = tmp_path / "pages"
        in_dir.mkdir()
        for f in range(4):
            t = pa.table({
                "url": pa.array(
                    [f"https://x/{f}/{i}" for i in range(9)] + ["https://x/dup"],
                    pa.string()),
                "warc_ts": pa.array([f * 10 + i for i in range(10)], pa.int64()),
                "val": pa.array([f * 100 + i for i in range(10)], pa.int64()),
            })
            pq.write_table(t, in_dir / f"shard-{f}.parquet")

        def collapse(ds):
            return latest_page_per_url(ds, num_buckets=4)

        out = tmp_path / "out"
        m = run_partitioned(str(in_dir), out, collapse, n_partitions=4,
                            url_partitioned=True)
        got = read_output(out).to_pandas()
        dup = got[got["url"] == "https://x/dup"]
        assert len(dup) == 1  # one context per url across ALL partitions
        assert int(dup["warc_ts"].iloc[0]) == 39  # newest re-crawl wins
        assert len(got) == 4 * 9 + 1

    def test_legacy_manifest_without_input_stat_accepted(self, tmp_path):
        """Checkpoints written before input_stat existed must not be
        invalidated wholesale: when input_files still match, a missing
        input_stat is a legacy pass, not a recompute."""
        pages = _make_pages(tmp_path)
        out = tmp_path / "out"
        run_partitioned(pages, out, _double, n_partitions=2)
        for part in range(2):
            mp = manifest_path(out, part)
            m = json.loads(mp.read_text())
            del m["input_stat"]  # simulate pre-upgrade manifest
            mp.write_text(json.dumps(m))
        m2 = run_partitioned(pages, out, _double, n_partitions=2)
        assert m2["skipped"] == 2 and m2["ran"] == 0

    def test_corrupt_manifest_detected(self, tmp_path):
        pages = _make_pages(tmp_path)
        out = tmp_path / "out"
        run_partitioned(pages, out, _double, n_partitions=2)
        mp = manifest_path(out, 0)
        m = json.loads(mp.read_text())
        m["checksum"] = "bogus"
        mp.write_text(json.dumps(m))
        assert not partition_complete(out, 0)
        m2 = run_partitioned(pages, out, _double, n_partitions=2)
        assert m2["ran"] == 1
