"""Incremental-vs-full KG construction benchmark.

Builds a 600k-page snapshot A (bench.py's replica-salted corpus), a
mutated snapshot B (delete hash%11 urls, revise hash%7), then times

  * FULL:        from-scratch links+triples on B
  * INCREMENTAL: snapshot diff -> re-link only the delta -> carry the
                 rest forward from A's materialized link checkpoint ->
                 merged triples (pipelines/incremental.py)

Correctness of incremental == full is gated elsewhere (the
nel_triples_incremental oracle + tests/test_incremental.py); this
script measures the COST of the incremental path at the bench corpus
size. Prints one JSON line; run:  python tools/bench_incremental.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "120"))


def main() -> int:
    import ray

    total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=int(total * 0.5))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    import ray.data as rd
    from bench import _host_calibration, _replicated_pages
    from reden_ray.pipelines.incremental import incremental_triples
    from reden_ray.pipelines.nel import NELConfig, NELPipeline
    from reden_ray.pipelines.webdemo import vocab_fixture

    a_dir = f"/tmp/reden_incr_a_{REPLICATE}x"
    b_dir = f"/tmp/reden_incr_b_{REPLICATE}x"
    if not os.path.exists(os.path.join(a_dir, "_done")):
        _replicated_pages(SF_DIR, REPLICATE).write_parquet(a_dir)
        open(os.path.join(a_dir, "_done"), "w").close()
    if not os.path.exists(os.path.join(b_dir, "_done")):
        def mutate(t: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            from reden_ray.functions.bucket import hash_column

            h = hash_column(t, "url")
            keep = pa.array((h % np.uint64(11)) != 0)
            t = t.filter(keep)
            h = h[(h % np.uint64(11) != 0)]
            rev = pa.array((h % np.uint64(7)) == 0)
            from reden_ray.functions.text import text_to_html

            texts = t["text"].to_pylist()
            revm = rev.to_pylist()
            new_texts, new_htmls = [], []
            for x, r in zip(texts, revm):
                xr = x + "\nrevision two" if r else x
                new_texts.append(xr)
                new_htmls.append(text_to_html(xr))
            return (t.set_column(t.schema.get_field_index("text"), "text",
                                 pa.array(new_texts, pa.large_string()))
                    .set_column(t.schema.get_field_index("html"), "html",
                                pa.array(new_htmls, pa.binary())))

        rd.read_parquet(a_dir).map_batches(
            mutate, batch_format="pyarrow").write_parquet(b_dir)
        open(os.path.join(b_dir, "_done"), "w").close()

    pool = max(2, NUM_CPUS // 2)
    # GRAFT_INCR_MEASURE=betweenness raises the per-page linking cost to
    # a realistic level (real NER models / big KBs); at the gazetteer
    # default ("degree") linking is nearly free and the diff overhead
    # dominates — report BOTH regimes.
    measure = os.environ.get("GRAFT_INCR_MEASURE", "degree")
    cfg = NELConfig(ner_concurrency=(1, pool), cand_concurrency=(1, pool),
                    measure=measure)
    p = NELPipeline(vocab_fixture(), cfg)

    def pages(d):
        return rd.read_parquet(d)

    n_a = pages(a_dir).count()
    n_b = pages(b_dir).count()

    # untimed: A's link checkpoint + its content-fingerprint table (the
    # state an incremental run starts from) + worker warm-up
    from reden_ray.pipelines.webops import page_content_hashes

    prev_links = p.links(
        mentions_ds=p.mentions(p.texts(pages(a_dir)))).materialize()
    prev_hashes = page_content_hashes(
        rd.read_parquet(a_dir, columns=["url", "text"])).materialize()

    t0 = time.perf_counter()
    full = p.triples(p.links(
        mentions_ds=p.mentions(p.texts(pages(b_dir)))))
    n_full = full.count()
    full_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    incr = incremental_triples(
        p, prev_links, pages(a_dir), pages(b_dir),
        prev_hashes_ds=prev_hashes,
        pages_b_narrow_ds=rd.read_parquet(b_dir, columns=["url", "text"]))
    n_incr = incr.count()
    incr_sec = time.perf_counter() - t0

    out = {
        "metric": "incremental vs full KG construction on mutated snapshot",
        "pages_a": n_a,
        "pages_b": n_b,
        "deleted_pages": n_a - n_b,
        # revised pages are the hash%7 slice of survivors; the delta the
        # incremental path re-links is exactly (revised + added=0)
        "approx_revised_fraction": round(1 / 7, 4),
        "full_sec": round(full_sec, 3),
        "incremental_sec": round(incr_sec, 3),
        "speedup": round(full_sec / incr_sec, 3) if incr_sec else None,
        "triples_full": n_full,
        "triples_incremental": n_incr,
        "triples_equal": n_full == n_incr,
        "num_cpus": NUM_CPUS,
        "measure": measure,
        "host_calibration": _host_calibration(),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
