"""CLI entry for ``ray job submit`` style runs.

Usage:
  python -m reden_ray run --fixture DIR --pages PATH --out DIR \
      [--partitions N] [--measure degree] [--no-resume]
  python -m reden_ray eval --fixture DIR --links DIR
  python -m reden_ray fixture --out DIR [--pages N] [--entities N] [--seed S]

``run`` executes the full KG-construction pipeline per hash partition
of the input with per-partition lineage manifests; rerunning after a
failure skips completed partitions (checkpoint resume). This script
OWNS its Ray session (guarded init), unlike the library.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="reden_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run KG construction with resume")
    runp.add_argument("--fixture", required=True, help="dir with dictionary/kb/sameas/gazetteer parquet")
    runp.add_argument("--pages", required=True, help="pages parquet path")
    runp.add_argument("--out", required=True)
    runp.add_argument("--partitions", type=int, default=8)
    runp.add_argument("--measure", default="degree",
                      choices=["degree", "closeness", "eigenvector", "betweenness"])
    runp.add_argument("--no-resume", action="store_true")
    runp.add_argument("--num-cpus", type=int, default=None)

    evalp = sub.add_parser("eval", help="evaluate links vs gold")
    evalp.add_argument("--fixture", required=True)
    evalp.add_argument("--links", required=True, help="links parquet path/dir")

    fxp = sub.add_parser("fixture", help="generate a synthetic corpus fixture")
    fxp.add_argument("--out", required=True)
    fxp.add_argument("--pages", type=int, default=1000)
    fxp.add_argument("--entities", type=int, default=200)
    fxp.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)

    if args.cmd == "fixture":
        from .fixtures import generate_fixture

        paths = generate_fixture(args.out, args.pages, args.entities, args.seed)
        print(json.dumps({"written": paths}))
        return 0

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if getattr(args, "num_cpus", None) else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
    try:
        if args.cmd == "run":
            import ray.data as rd

            from .pipelines.nel import NELConfig, NELPipeline
            from .stages.canonicalize import canonical_labels, emit_triples
            from .state.manifest import read_output, run_partitioned

            p = NELPipeline(args.fixture, NELConfig(measure=args.measure))

            # Phase 1 (resumable, per url-hash partition): link documents
            # and checkpoint the links. Canonical labels are a GLOBAL
            # aggregate — computing them per partition would let one
            # entity receive different labels in different partitions —
            # so canonicalization runs in phase 2 over all link
            # partitions (cheap: narrow rows, combiner-first groupby).
            def links_fn(pages_ds):
                return p.links(mentions_ds=p.mentions(p.texts(pages_ds)))

            links_dir = f"{args.out}/links"
            metrics = run_partitioned(args.pages, links_dir, links_fn,
                                      n_partitions=args.partitions,
                                      resume=not args.no_resume)

            # Phase 2 (global): canonicalize + materialize triples.
            links = read_output(links_dir)
            labels = canonical_labels(links)
            triples = emit_triples(links, labels, p.kb_ref, p.sameas_ref,
                                   global_dedup=True)
            triples_dir = f"{args.out}/triples"
            import shutil

            shutil.rmtree(triples_dir, ignore_errors=True)
            triples.write_parquet(triples_dir)
            n_triples = rd.read_parquet(triples_dir).count()
            metrics["triples"] = n_triples
            print(json.dumps(metrics))
            return 0

        if args.cmd == "eval":
            from pathlib import Path

            import pyarrow.parquet as pq

            import ray.data as rd

            from .stages.evaluate import evaluate_links
            from .state.manifest import read_output

            if any(Path(args.links).glob("part=*/_manifest.json")):
                links = read_output(args.links)
            else:
                links = rd.read_parquet(args.links)
            gold = pq.read_table(f"{args.fixture}/gold_links.parquet")
            print(json.dumps(evaluate_links(links, gold)))
            return 0
    finally:
        ray.shutdown()
    return 1


if __name__ == "__main__":
    sys.exit(main())
