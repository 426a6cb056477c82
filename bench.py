"""Benchmark: headline KG-construction pipeline + operator queries.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "pages": P, "triples": T, "triples_per_sec": ...}

Env:
  GRAFT_SF_DIR     input dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS   num_cpus for ray.init (default 32)
  GRAFT_REPLICATE  page replication factor (default 120 -> sf0.1 gives
                   600k pages; same corpus at every CPU level). Sized so
                   compute dominates the ~4s fixed per-run overhead —
                   the N-vs-4N efficiency ratio needs w >> f.

`python bench.py --scaling` runs the headline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports throughputs plus
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "120"))

# The sandbox host is SHARED: /proc/loadavg regularly shows 10+ of
# external load with zero processes of ours running, and a burst
# landing on one timed leg skews the N-vs-4N ratio by 2-3x. Each timed
# run therefore (a) waits for the host to go quiet (bounded), and
# (b) records loadavg + host CPU-busy around the run so contaminated
# samples are visible in the output instead of silently wrong.
QUIET_LOAD = float(os.environ.get("GRAFT_QUIET_LOAD", "2.0"))
QUIET_WAIT_S = float(os.environ.get("GRAFT_QUIET_WAIT_S", "300"))


def _cpu_busy_s() -> float:
    """Host-wide busy CPU seconds since boot (user+nice+sys+irq+softirq+steal)."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    jiffies = int(f[1]) + int(f[2]) + int(f[3]) + int(f[6]) + int(f[7]) + int(f[8])
    return jiffies / os.sysconf("SC_CLK_TCK")


def _busy_cpus_now(window_s: float = 2.0) -> float:
    """Average busy CPUs over a short window (instantaneous, unlike
    loadavg, which takes minutes to decay after our own runs)."""
    b0 = _cpu_busy_s()
    time.sleep(window_s)
    return (_cpu_busy_s() - b0) / window_s


def _wait_quiet() -> float:
    """Block until the host's busy-CPU rate drops under QUIET_LOAD
    (bounded wait); returns the rate seen at release. Between our runs
    all Ray workers idle, so the sample measures EXTERNAL tenants."""
    deadline = time.monotonic() + QUIET_WAIT_S
    busy = _busy_cpus_now()
    while busy > QUIET_LOAD and time.monotonic() < deadline:
        time.sleep(8.0)
        busy = _busy_cpus_now()
    return busy


def _host_calibration() -> dict:
    """Cheap synthetic compute probe recorded alongside each bench run.

    The sandbox host's effective per-core speed drifts across reboots
    (turbo state, co-tenants on the physical box): the identical
    headline measured 8.4 s on one boot and 14-20 s on the next with
    zero code change on the path. Recording a fixed-work calibration
    rate with every bench JSON lets cross-round comparisons separate
    "the code got slower" from "the host got slower" honestly —
    numbers, not vibes. Costs ~3 s.

    - single_core_gflops: 1-thread numpy matmul (subprocess pins BLAS
      threads via env — in-process it's too late, BLAS pools are live).
    - all_core_loop_mops: sum of fixed-work Python-loop rates across
      one process per CPU (measures scheduler + all-core clock under
      full subscription, the regime the headline runs in).
    """
    import multiprocessing as mp

    code = (
        "import time,numpy as np;"
        "a=np.random.default_rng(0).random((1024,1024));t0=time.perf_counter();\n"
        "for _ in range(4): a=a@a*1e-3\n"
        "print(4*2*1024**3/(time.perf_counter()-t0)/1e9)"
    )
    env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=60)
        single = round(float(r.stdout.strip().splitlines()[-1]), 2)
    except Exception:
        single = None
    ncpu = os.cpu_count() or 1
    try:
        with mp.Pool(ncpu) as pool:
            rates = pool.map(_loop_rate, range(ncpu))
        all_core = round(sum(rates) / 1e6, 1)
    except Exception:
        all_core = None
    return {"single_core_gflops": single, "all_core_loop_mops": all_core}


def _loop_rate(_seed: int) -> float:
    """Fixed-work Python loop; returns ops/sec (module-level for Pool)."""
    n = 2_000_000
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i
    return n / (time.perf_counter() - t0)


def _replicated_pages(sf_dir: str, factor: int, num_blocks: int = 64):
    """documents -> pages, replicated ``factor``x with distinct urls.

    The single-file documents read yields ~1 input block; repartition
    BEFORE the expensive map so replication/extract/NER parallelize
    (input parallelism, not CPU count, was the scaling bottleneck)."""
    import pyarrow as pa

    import ray.data as rd

    from reden_ray.functions.text import text_to_html
    from reden_ray.pipelines.webdemo import GAZETTEER_WORDS, VOCAB_AMBIGUOUS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).repartition(num_blocks)

    # Unambiguous words only: salting must not flip a NoAmbiguity page
    # onto the graph path, or the corpus gets harder as factor grows
    salt_words = [w for w in GAZETTEER_WORDS if w not in VOCAB_AMBIGUOUS]

    def salt(r: int) -> str:
        # Unique word sequence per replica index (its base-len(salt_words)
        # digits mapped to words): every replica of a doc gets a DISTINCT
        # mention sequence, so the linker's per-worker page memo
        # (stages/linker.py:_CTX_MEMOS) can never hit across replicas.
        # Without this the 480x-replicated corpus measured memo lookups,
        # not linking (~99% hit rate, and it skewed N-vs-4N legs: fewer
        # workers -> higher per-worker hit rate -> inflated 8-CPU leg).
        ws = []
        while True:
            ws.append(salt_words[r % len(salt_words)])
            r //= len(salt_words)
            if r == 0:
                return " ".join(ws)

    def to_pages(t: pa.Table) -> pa.Table:
        urls, ts, htmls, texts, langs = [], [], [], [], []
        for i, x, lang in zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                              t["lang"].to_pylist()):
            for r in range(factor):
                xr = f"{x}\n{salt(r)}"
                urls.append(f"https://docs.example/{r}/{i}")
                ts.append(1_700_000_000_000 + i * 1000 + r)
                htmls.append(text_to_html(xr, title=f"Doc {i}"))
                texts.append(xr)
                langs.append(lang)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=256)


def run_bench() -> dict:
    import ray

    # Half of physical RAM for the object store: Ray's default (~40% of
    # *available*) left ~37 GiB, and each headline run materializes
    # ~10 GiB of link rows — by the 2nd-3rd run LRU eviction pressure
    # stalled allocations (measured 61 -> 78 -> 101 s for the identical
    # stage; flat at 64 GiB). A production cluster sizes the store the
    # same way.
    total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=int(total * 0.5))
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from reden_ray.pipelines import relational as R
    from reden_ray.pipelines.nel import NELConfig, NELPipeline
    from reden_ray.pipelines.webdemo import vocab_fixture

    timings: dict[str, float] = {}

    # Materialize the replicated corpus ONCE to partitioned Parquet
    # (untimed, cached across processes) — the timed run then reads it
    # like a production job, with real source parallelism, and warms the
    # OS page cache with one untimed pass.
    # "u2" = replica-salted (unique unambiguous mention tail per replica)
    # corpus format — keep distinct from earlier cached corpora.
    # Layout note (measured round 3): 16 larger files (u2) beat a
    # 64-small-file re-layout by ~20% end-to-end — Ray already splits
    # the read into ~200 blocks either way (row-range splitting), so
    # extra files only add per-file read overhead. Production-like
    # ~GB-scale shards are the right shape; do NOT shrink files to
    # "add parallelism".
    pages_dir = f"/tmp/reden_bench_pages_{os.path.basename(SF_DIR)}_x{REPLICATE}_u2"
    marker = os.path.join(pages_dir, "_complete")
    if not os.path.exists(marker):
        _replicated_pages(SF_DIR, REPLICATE).write_parquet(pages_dir)
        with open(marker, "w") as fh:
            fh.write("ok")
    import ray.data as rd

    def pages():
        return rd.read_parquet(pages_dir, file_extensions=["parquet"])

    n_pages = pages().count()  # untimed warm read

    pool_max = max(2, NUM_CPUS // 2)
    cfg = NELConfig(ner_concurrency=(1, pool_max), cand_concurrency=(1, pool_max))
    fx = vocab_fixture()
    p = NELPipeline(fx, cfg)

    def headline() -> int:
        links = p.links(mentions_ds=p.mentions(p.texts(pages())))
        return p.triples(links).count()

    # Untimed warm-up run: Ray spawns one Python worker per CPU and each
    # pays module imports on its first task — a cost proportional to
    # num_cpus that would otherwise poison the N-vs-4N scaling ratio.
    # Production streams run warm; we measure steady state.
    headline()

    # headline: full KG construction, read -> extract -> ... -> triples
    # (best of N timed runs to damp residual scheduler variance;
    # scaling legs use N=1 to fit the 2.4M-page corpus in a round's
    # wall budget — the warm-up already absorbed cold-start effects)
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "3"))
    best, n_triples = None, 0
    run_evidence = []
    for _ in range(n_runs):
        load0 = _wait_quiet()
        busy0 = _cpu_busy_s()
        t0 = time.perf_counter()
        n_triples = headline()
        dt = time.perf_counter() - t0
        # busy CPUs averaged over the run, minus our own budget ->
        # roughly the external load that ran concurrently
        busy_cpus = (_cpu_busy_s() - busy0) / dt
        run_evidence.append({
            "sec": round(dt, 3), "ext_busy_at_start": round(load0, 2),
            "busy_cpus_avg": round(busy_cpus, 1),
        })
        best = dt if best is None else min(best, dt)
    timings["nel_kg_construction"] = round(best, 3)

    # component benchmarks
    t0 = time.perf_counter()
    p.texts(pages()).count()
    timings["extract_text"] = round(time.perf_counter() - t0, 3)

    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    qs = E.queries()
    component_names = [] if os.environ.get("GRAFT_BENCH_COMPONENTS", "1") == "0" else [
        "q1_pricing_summary",        # filter + grouped aggregate
        "q4_order_priority_revenue", # large-large hash join
        "q10_topk_cosine",           # similarity search
        "q15_running_user_value",    # per-key window
        "q17b_minhash_exact_clusters",  # LSH dedup machinery
        "q27_tumbling_window",       # event-time windows
        "q30_quality_filter",        # corpus quality filter
        "q41_url_canonical_dedup",   # URL canonicalization dedup
        "q42b_host_pagerank",        # link graph + PageRank
        "q43_snapshot_diff",         # crawl snapshot diff
        "q49_semantic_dedup",        # k-means cells + exact int L2
        "q50_bpe_merges",            # BPE training (word-freq pass)
        "q56_dsir_sample",           # DSIR importance resampling
        "q63_funnel",                # sequential-pattern funnel
        "q66_skew_join",             # skew-mitigated hash join
        "q67_ranked_retrieval",      # quantized-idf top-k retrieval
        "q74_boilerplate_removal",   # per-host boilerplate line strip
        "q79_attribute_fusion",      # majority-vote truth discovery
        "q83_random_walks",          # DeepWalk corpus over doc links
    ]
    for name in component_names:
        t0 = time.perf_counter()
        qs[name](SF_DIR)
        timings[name] = round(time.perf_counter() - t0, 3)
    del R

    headline = timings["nel_kg_construction"]
    out = {
        "metric": "end-to-end KG-construction seconds (replicated corpus)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / headline, 1) if headline else None,
        "pages_per_sec": round(n_pages / headline, 1) if headline else None,
        "runs": run_evidence,
        # explicit best-of-N methodology marker (ADVICE r04: the default
        # changed 2->3 mid-series in round 4; record it so cross-round
        # comparisons can see the protocol, not just len(runs))
        "n_runs": n_runs,
        "best_of": n_runs,
        "host_calibration": _host_calibration(),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    # Larger corpus for the scaling evidence: the efficiency ratio
    # needs per-level work to dwarf the ~3-8s fixed overhead, and the
    # sandbox host shows bursty ±20% noise. Raised 240 -> 480 (2.4M
    # pages) in round 2: the fused+memoized linker roughly halved
    # compute, so the 1.2M corpus no longer dwarfed the overhead
    # (measured 0.71 at 1.2M vs 0.811 at 2.4M with identical code).
    replicate = os.environ.get("GRAFT_REPLICATE",
                               os.environ.get("GRAFT_SCALING_REPLICATE", "480"))

    def one(ncpu: int) -> dict:
        # each leg: quiet-gated timed runs (see _wait_quiet) in a fresh
        # process; component queries are skipped — only the headline
        # matters here
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_REPLICATE=replicate,
                   GRAFT_BENCH_RUNS=os.environ.get("GRAFT_BENCH_RUNS", "2"),
                   GRAFT_BENCH_COMPONENTS=os.environ.get(
                       "GRAFT_BENCH_COMPONENTS", "0"))
        res = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=False,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        if res.returncode != 0:
            # surface the child's stderr — a swallowed leg failure is
            # undiagnosable after the fact
            raise RuntimeError(
                f"scaling leg (num_cpus={ncpu}) exited {res.returncode}; "
                f"stderr tail:\n{res.stderr[-4000:]}")
        return json.loads(res.stdout.strip().splitlines()[-1])

    # CPU pair: N and 4N (default 8 vs 32). The host caps measurable
    # 8-vs-32 efficiency: per-task CPU time INFLATES ~35% when 32
    # workers run concurrently (measured 622 s vs 842 s of remote CPU
    # for the IDENTICAL 208-task link stage at 8 vs 32 workers, both
    # >=88% slot-utilized) — single-box memory-bandwidth / all-core
    # clock contention, not scheduling. A real N->4N NODE scale-up
    # keeps per-node worker count constant, so the honest sandbox
    # proxy is a pair below the saturation knee (GRAFT_SCALING_CPUS
    # "4,16"); both series are reported in BASELINE.md.
    lo_n, hi_n = (int(x) for x in
                  os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
    factor = hi_n / lo_n
    # Legs run INTERLEAVED in (lo, hi) pairs so a host-noise burst hits
    # adjacent legs rather than one whole side of the comparison; the
    # reported ratio uses the best leg of each side (a noise burst can
    # only ever SLOW a leg, so per-side best is the least-contaminated
    # estimate of the true throughput at that parallelism).
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "2"))
    lo_runs, hi_runs, pair_effs = [], [], []
    for _ in range(n_pairs):
        lo, hi = one(lo_n), one(hi_n)
        lo_runs.append(lo)
        hi_runs.append(hi)
        pair_effs.append(round(lo["value"] / hi["value"] / factor, 3))
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    speedup = lo["value"] / hi["value"] if hi["value"] else 0.0
    eff = speedup / factor
    return {
        "metric": f"N->4N scaling (num_cpus {lo_n} vs {hi_n}, same input)",
        "cpus": [lo_n, hi_n],
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "sec_8": lo["value"] if lo_n == 8 else None,
        "sec_32": hi["value"] if hi_n == 32 else None,
        "pages_per_sec_lo": lo["pages_per_sec"],
        "pages_per_sec_hi": hi["pages_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "pages": lo["pages"],
        "pair_efficiencies": pair_effs,
        "runs_lo": [r["runs"] for r in lo_runs],
        "runs_hi": [r["runs"] for r in hi_runs],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
