"""Graph-statistics pipelines over a sparse deterministic host graph.

The q42 family ranks the DENSE nav-link host graph (31 hosts, nearly
complete — every distance is 0 or 1, every edge reciprocated), which is
the right fixture for PageRank mass flow but degenerate for hop-based
and directionality-based statistics. This module mints a SPARSE
functional graph from ``documents`` instead — each node gets exactly
two arithmetic out-edges — so BFS distances spread over many hops and
reciprocity genuinely varies per node. Both oracles recompute the mint
arithmetically (the q42/q71 precedent): the check verifies the
distributed algorithm, not a copy of the fixture.

Graph mint (shared by q96/q98):
    node k   = doc_id % N_NODES                      (labels "n<k>")
    edges    = k -> (k*31 + 7) % N_NODES
               k -> (k*17 + 3) % N_NODES             (distinct pairs)

Reference tie-in: the reference ranks candidate URIs by centrality
over per-context fusion graphs (CentralityHandler.java:64-230); these
are the corpus-level graph signals a web-scale crawl adds on top —
seed-distance (TrustRank-style trust horizon) and reciprocity (link-
farm detection) over the host graph that q42 extracts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.bucket import add_bucket

N_NODES = 997          # prime: the functional maps k*31+7, k*17+3 are bijections
_MULT_A, _OFF_A = 31, 7
_MULT_B, _OFF_B = 17, 3
SEED_STEP = 131        # seeds = nodes with k % 131 == 0 (8 of 997)
BFS_ROUNDS = 8


def sparse_host_edges(sf_dir: str):
    """documents -> per-batch DISTINCT (s, d) int64 edge partials.

    ≤ 2×N_NODES rows leave each block regardless of corpus size (the
    combiner-first bound); consumers that need GLOBAL distinctness
    (q98) co-locate on the unordered pair key — BFS (q96) is min-
    idempotent, so duplicate edges across blocks are harmless there
    and the global dedup exchange is skipped entirely.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def mint(t: pa.Table) -> pa.Table:
        k = np.unique(t.column("doc_id").to_numpy(zero_copy_only=False)
                      % N_NODES)
        s = np.concatenate([k, k])
        d = np.concatenate([(k * _MULT_A + _OFF_A) % N_NODES,
                            (k * _MULT_B + _OFF_B) % N_NODES])
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.table({
            "s": pa.array(pairs[:, 0], pa.int64()),
            "d": pa.array(pairs[:, 1], pa.int64()),
        })

    return ds.map_batches(mint, batch_format="pyarrow")


_EDGES_CTE = f"""e AS (
  SELECT DISTINCT doc_id % {N_NODES} AS s,
         ((doc_id % {N_NODES}) * {_MULT_A} + {_OFF_A}) % {N_NODES} AS d
  FROM documents
  UNION
  SELECT DISTINCT doc_id % {N_NODES},
         ((doc_id % {N_NODES}) * {_MULT_B} + {_OFF_B}) % {N_NODES}
  FROM documents
)"""


# ---------------------------------------------------------------------------
# Q96 — multi-source BFS hop distance (TrustRank-style seed horizon)
# ---------------------------------------------------------------------------

def q96_seed_distance(sf_dir: str) -> pd.DataFrame:
    """Hop distance from the seed set over the sparse host graph,
    bounded at BFS_ROUNDS hops; unreached nodes omitted. The heavy
    lifting is stages/graphrank.seed_distance (size-gated local solve
    vs the cc.py min-propagation exchange pair)."""
    from ..stages.graphrank import seed_distance

    def label(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.binary_join_element_wise(
                "n", pc.cast(t["s"], pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                "n", pc.cast(t["d"], pa.string()), ""),
        })

    edges = sparse_host_edges(sf_dir).map_batches(
        label, batch_format="pyarrow")
    seeds = [f"n{k}" for k in range(0, N_NODES, SEED_STEP)]
    out = seed_distance(edges, seeds, src_col="src", dst_col="dst",
                        max_rounds=BFS_ROUNDS)
    df = out.to_pandas()
    if df.empty:  # Ray drops the schema of an all-empty Dataset
        df = pd.DataFrame({"node": pd.Series(dtype=object),
                           "dist": pd.Series(dtype="int64")})
    return df


def _q96_sql(n_rounds: int = BFS_ROUNDS) -> str:
    parts = [
        _EDGES_CTE,
        "nodes AS (SELECT DISTINCT k FROM "
        "(SELECT s AS k FROM e UNION ALL SELECT d FROM e))",
        f"d0 AS (SELECT k, CAST(0 AS BIGINT) AS dist FROM nodes "
        f"WHERE k % {SEED_STEP} = 0)",
    ]
    for i in range(1, n_rounds + 1):
        prev = f"d{i - 1}"
        parts.append(
            f"d{i} AS (SELECT k, MIN(dist) AS dist FROM (\n"
            f"  SELECT k, dist FROM {prev}\n"
            f"  UNION ALL\n"
            f"  SELECT e.d AS k, p.dist + 1 AS dist\n"
            f"  FROM e JOIN {prev} p ON p.k = e.s) GROUP BY k)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT 'n' || CAST(k AS VARCHAR) AS node, dist"
              f" FROM d{n_rounds}")


Q96_SQL = _q96_sql()


# ---------------------------------------------------------------------------
# Q98 — per-node edge reciprocity (link-farm signal)
# ---------------------------------------------------------------------------

_PAIR_BUCKETS = 32


def reciprocity(edges_ds, num_buckets: int = _PAIR_BUCKETS):
    """Distinct-edge Dataset partials -> (node, n_out, n_recip,
    recip_ppm). ONE exchange: (s,d) and (d,s) share the unordered pair
    key, so in-bucket logic sees both directions of every pair AND all
    duplicates of each directed edge (global dedup falls out of the
    same exchange). Per-src counts leave each bucket pre-reduced; the
    final groupby is vocabulary-sized. recip_ppm is an integer floor-
    div so the ratio itself hash-verifies."""

    def pair_key(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return t.append_column(
            "pk", pa.array(lo * N_NODES + hi, pa.int64()))

    def bucket_counts(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates(["s", "d"])
        s = u["s"].to_numpy()
        d = u["d"].to_numpy()
        fwd = set(zip(s.tolist(), d.tolist()))
        rec = np.fromiter(((dd, ss) in fwd for ss, dd in zip(s, d)),
                          dtype=np.int64, count=len(s))
        g = pd.DataFrame({"node": s, "n_out_p": 1, "n_recip_p": rec}) \
            .groupby("node", as_index=False).sum()
        return pa.table({
            "node": pa.array(g["node"].to_numpy(), pa.int64()),
            "n_out_p": pa.array(g["n_out_p"].to_numpy(), pa.int64()),
            "n_recip_p": pa.array(g["n_recip_p"].to_numpy(), pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        edges_ds.map_batches(pair_key, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "pk", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: bucket_counts(
            df.drop(columns=["__bucket", "pk"])), batch_format="pandas")
        .groupby("node")
        .aggregate(Sum("n_out_p", alias_name="n_out"),
                   Sum("n_recip_p", alias_name="n_recip"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        n_out = t.column("n_out").to_numpy(zero_copy_only=False)
        n_rec = t.column("n_recip").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pc.binary_join_element_wise(
                "n", pc.cast(t["node"], pa.string()), ""),
            "n_out": t["n_out"],
            "n_recip": t["n_recip"],
            "recip_ppm": pa.array(1_000_000 * n_rec // n_out, pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def q98_reciprocity(sf_dir: str) -> pd.DataFrame:
    return reciprocity(sparse_host_edges(sf_dir)).to_pandas()


Q98_SQL = f"""
WITH {_EDGES_CTE}
SELECT 'n' || CAST(a.s AS VARCHAR) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_recip,
       CAST(1000000 * SUM(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END)
            // COUNT(*) AS BIGINT) AS recip_ppm
FROM e a LEFT JOIN e b ON b.s = a.d AND b.d = a.s
GROUP BY a.s
"""


# ---------------------------------------------------------------------------
# Q101 — synchronous label-propagation communities
# ---------------------------------------------------------------------------

LPA_ROUNDS = 4


def _labeled_edges(sf_dir: str):
    def label(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.binary_join_element_wise(
                "n", pc.cast(t["s"], pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                "n", pc.cast(t["d"], pa.string()), ""),
        })

    return sparse_host_edges(sf_dir).map_batches(
        label, batch_format="pyarrow")


def q101_label_propagation(sf_dir: str) -> pd.DataFrame:
    """Synchronous LPA communities over the sparse host graph; fixed
    LPA_ROUNDS rounds keep the result deterministic and give the
    oracle a finite unroll (stages/graphrank.label_propagation)."""
    from ..stages.graphrank import label_propagation

    out = label_propagation(_labeled_edges(sf_dir),
                            n_rounds=LPA_ROUNDS).to_pandas()
    if out.empty:  # Ray drops the schema of an all-empty Dataset
        out = pd.DataFrame({"node": pd.Series(dtype=object),
                            "label": pd.Series(dtype=object)})
    return out


def _q101_sql(n_rounds: int = LPA_ROUNDS) -> str:
    parts = [
        _EDGES_CTE,
        ("und AS (SELECT DISTINCT u, v FROM "
         "(SELECT s AS u, d AS v FROM e UNION ALL SELECT d, s FROM e))"),
        ("l0 AS (SELECT DISTINCT u AS k, "
         "'n' || CAST(u AS VARCHAR) AS lab FROM und)"),
    ]
    for i in range(1, n_rounds + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"t{i} AS (SELECT und.v AS k, p.lab, COUNT(*) AS c\n"
            f"  FROM und JOIN {prev} p ON p.k = und.u GROUP BY und.v, p.lab)")
        parts.append(
            f"w{i} AS (SELECT k, lab FROM t{i} QUALIFY ROW_NUMBER() OVER "
            f"(PARTITION BY k ORDER BY c DESC, lab ASC) = 1)")
        parts.append(
            f"l{i} AS (SELECT p.k, COALESCE(w.lab, p.lab) AS lab\n"
            f"  FROM {prev} p LEFT JOIN w{i} w ON w.k = p.k)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT 'n' || CAST(k AS VARCHAR) AS node, lab AS label"
              f" FROM l{n_rounds}")


Q101_SQL = _q101_sql()


# ---------------------------------------------------------------------------
# Q104 — TrustRank (seed-biased damped mass over the sparse host graph)
# ---------------------------------------------------------------------------

TRUST_ITERS = 4
TRUST_ALPHA = 0.85


def q104_trustrank(sf_dir: str) -> pd.DataFrame:
    """TrustRank from the q96 seed set; trust projected to e6 ints for
    hash-stable comparison (float partial-sum order differs between
    engines in the low bits only — the q42b precedent)."""
    from ..stages.graphrank import trustrank

    def label(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.binary_join_element_wise(
                "n", pc.cast(t["s"], pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                "n", pc.cast(t["d"], pa.string()), ""),
            "w": pa.array(np.ones(t.num_rows), pa.float64()),
        })

    # duplicate (s, d) partials across blocks would ADD weight (legal
    # for trustrank but not what the oracle's DISTINCT edges compute):
    # dedup through the unordered-pair bucket once, like q98
    edges = sparse_host_edges(sf_dir)

    def pair_key(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array(np.minimum(s, d) * N_NODES + np.maximum(s, d),
                           pa.int64()))

    def dedup(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates(["s", "d"])
        return pa.table({
            "s": pa.array(u["s"].to_numpy(), pa.int64()),
            "d": pa.array(u["d"].to_numpy(), pa.int64()),
        })

    distinct = (
        edges.map_batches(pair_key, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "pk", 16),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup(df.drop(columns=["__bucket", "pk"])),
                    batch_format="pandas")
        .map_batches(label, batch_format="pyarrow")
    )

    seeds = [f"n{k}" for k in range(0, N_NODES, SEED_STEP)]
    ranks = trustrank(distinct, seeds, n_iters=TRUST_ITERS,
                      alpha=TRUST_ALPHA)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "trust_e6": pc.cast(pc.round(pc.multiply(
                t["trust"], pa.scalar(1_000_000.0))), pa.int64()),
        })

    df = ranks.map_batches(project, batch_format="pyarrow").to_pandas()
    if df.empty:
        df = pd.DataFrame({"node": pd.Series(dtype=object),
                           "trust_e6": pd.Series(dtype="int64")})
    return df


def _q104_sql(n_iters: int = TRUST_ITERS) -> str:
    parts = [
        _EDGES_CTE,
        "nodes AS (SELECT DISTINCT k FROM "
        "(SELECT s AS k FROM e UNION ALL SELECT d FROM e))",
        (f"nsd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM nodes "
         f"WHERE k % {SEED_STEP} = 0)"),
        (f"ev AS MATERIALIZED (SELECT k, CASE WHEN k % {SEED_STEP} = 0 "
         f"THEN 1.0 / (SELECT c FROM nsd) ELSE 0.0 END AS e FROM nodes)"),
        "wout AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS DOUBLE) AS w "
        "FROM e GROUP BY s)",
        "r0 AS MATERIALIZED (SELECT k, e AS r FROM ev)",
    ]
    # MATERIALIZED: each round references the previous one twice
    # (contribution join + dangling scan); inlined CTEs would expand
    # the chain exponentially and never finish (the q62 kcore lesson)
    for i in range(1, n_iters + 1):
        prev = f"r{i - 1}"
        parts.append(f"""r{i} AS MATERIALIZED (
  SELECT n.k,
         (1.0 - {TRUST_ALPHA}) * n.e
         + {TRUST_ALPHA} * (COALESCE(c.c, 0)
                   + (SELECT COALESCE(SUM(p.r), 0) FROM {prev} p
                      LEFT JOIN wout w ON w.s = p.k
                      WHERE w.s IS NULL) * n.e) AS r
  FROM ev n LEFT JOIN (
    SELECT e.d AS k, SUM(p.r * (1.0 / w.w)) AS c
    FROM e
    JOIN {prev} p ON p.k = e.s
    JOIN wout w ON w.s = e.s
    GROUP BY e.d) c ON c.k = n.k
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT 'n' || CAST(k AS VARCHAR) AS node,"
              f" CAST(ROUND(r * 1000000) AS BIGINT) AS trust_e6"
              f" FROM r{n_iters}")


Q104_SQL = _q104_sql()


# ---------------------------------------------------------------------------
# Q105 — HITS hubs/authorities over the sparse host graph
# ---------------------------------------------------------------------------

HITS_ITERS = 4


def _distinct_labeled_edges(sf_dir: str):
    """Globally-distinct (src, dst) labeled edges: the q98/q104
    unordered-pair-bucket dedup, then 'n<k>' labels."""
    def pair_key(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array(np.minimum(s, d) * N_NODES + np.maximum(s, d),
                           pa.int64()))

    def dedup(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates(["s", "d"])
        return pa.table({
            "s": pa.array(u["s"].to_numpy(), pa.int64()),
            "d": pa.array(u["d"].to_numpy(), pa.int64()),
        })

    def label(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.binary_join_element_wise(
                "n", pc.cast(t["s"], pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                "n", pc.cast(t["d"], pa.string()), ""),
        })

    return (
        sparse_host_edges(sf_dir)
        .map_batches(pair_key, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "pk", 16),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup(df.drop(columns=["__bucket", "pk"])),
                    batch_format="pandas")
        .map_batches(label, batch_format="pyarrow")
    )


def q105_hits(sf_dir: str) -> pd.DataFrame:
    from ..stages.graphrank import hits

    ranks = hits(_distinct_labeled_edges(sf_dir), n_iters=HITS_ITERS)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "hub_e6": pc.cast(pc.round(pc.multiply(
                t["hub"], pa.scalar(1_000_000.0))), pa.int64()),
            "auth_e6": pc.cast(pc.round(pc.multiply(
                t["auth"], pa.scalar(1_000_000.0))), pa.int64()),
        })

    df = ranks.map_batches(project, batch_format="pyarrow").to_pandas()
    if df.empty:
        df = pd.DataFrame({"node": pd.Series(dtype=object),
                           "hub_e6": pd.Series(dtype="int64"),
                           "auth_e6": pd.Series(dtype="int64")})
    return df


def _q105_sql(n_iters: int = HITS_ITERS) -> str:
    parts = [
        _EDGES_CTE,
        "nodes AS (SELECT DISTINCT k FROM "
        "(SELECT s AS k FROM e UNION ALL SELECT d FROM e))",
        ("h0 AS (SELECT k, 1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) "
         "FROM nodes) AS r FROM nodes)"),
    ]
    for i in range(1, n_iters + 1):
        hp = f"h{i - 1}"
        parts.append(
            f"araw{i} AS MATERIALIZED (SELECT e.d AS k, SUM(h.r) AS v "
            f"FROM e JOIN {hp} h ON h.k = e.s GROUP BY e.d)")
        parts.append(
            f"at{i} AS MATERIALIZED (SELECT SUM(v) AS t FROM araw{i})")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT n.k, COALESCE(ar.v, 0) / "
            f"(SELECT t FROM at{i}) AS r FROM nodes n "
            f"LEFT JOIN araw{i} ar ON ar.k = n.k)")
        parts.append(
            f"hraw{i} AS MATERIALIZED (SELECT e.s AS k, SUM(a.r) AS v "
            f"FROM e JOIN a{i} a ON a.k = e.d GROUP BY e.s)")
        parts.append(
            f"ht{i} AS MATERIALIZED (SELECT SUM(v) AS t FROM hraw{i})")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT n.k, COALESCE(hr.v, 0) / "
            f"(SELECT t FROM ht{i}) AS r FROM nodes n "
            f"LEFT JOIN hraw{i} hr ON hr.k = n.k)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT 'n' || CAST(h.k AS VARCHAR) AS node,"
              f" CAST(ROUND(h.r * 1000000) AS BIGINT) AS hub_e6,"
              f" CAST(ROUND(a.r * 1000000) AS BIGINT) AS auth_e6"
              f" FROM h{n_iters} h JOIN a{n_iters} a ON a.k = h.k")


Q105_SQL = _q105_sql()


# ---------------------------------------------------------------------------
# Q109 — degree assortativity moments (degree-correlation signal)
# ---------------------------------------------------------------------------

def degree_assortativity_moments(edges_ds) -> pd.DataFrame:
    """Distinct directed edges -> ONE row of exact integer moments for
    the out-degree(src) vs in-degree(dst) Pearson correlation:
    (n_edges, sx, sy, sxy, sx2, sy2). The coefficient
    r = (n·sxy − sx·sy) / sqrt((n·sx2 − sx²)(n·sy2 − sy²)) is
    derivable downstream; reporting raw moments keeps both engines in
    integer arithmetic (no sqrt — the q53/q108 discipline).
    Assortativity < 0 on the web graph = hubs link to leaves (the
    link-farm / nav-template signature).

    Shape: two vocabulary-sized degree reduces (host graphs), both
    broadcast; a stateless edge scan emits per-block moment partials
    (6 ints per block); ONE tiny final reduce — the q53 moment-matrix
    pattern."""
    import ray

    from ray.data.aggregate import Sum as _Sum

    from ..state.broadcast import get_broadcast

    dedup = _distinct_int_edges(edges_ds)
    out_deg = dedup.groupby("s").aggregate(_Sum("one", alias_name="deg")) \
        .to_pandas()
    in_deg = dedup.groupby("d").aggregate(_Sum("one", alias_name="deg")) \
        .to_pandas()
    od = np.zeros(N_NODES, dtype=np.int64)
    od[out_deg["s"].to_numpy()] = out_deg["deg"].to_numpy()
    idg = np.zeros(N_NODES, dtype=np.int64)
    idg[in_deg["d"].to_numpy()] = in_deg["deg"].to_numpy()
    od_ref = ray.put(od)
    id_ref = ray.put(idg)

    def partial(t: pa.Table) -> pa.Table:
        x = get_broadcast(od_ref)[t.column("s").to_numpy(
            zero_copy_only=False)]
        y = get_broadcast(id_ref)[t.column("d").to_numpy(
            zero_copy_only=False)]
        return pa.table({
            "n_p": pa.array([len(x)], pa.int64()),
            "sx_p": pa.array([int(x.sum())], pa.int64()),
            "sy_p": pa.array([int(y.sum())], pa.int64()),
            "sxy_p": pa.array([int((x * y).sum())], pa.int64()),
            "sx2_p": pa.array([int((x * x).sum())], pa.int64()),
            "sy2_p": pa.array([int((y * y).sum())], pa.int64()),
        })

    agg = dedup.map_batches(
        lambda t: t.select(["s", "d"]), batch_format="pyarrow") \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "n_edges": int(agg["n_p"].sum()),
        "sx": int(agg["sx_p"].sum()),
        "sy": int(agg["sy_p"].sum()),
        "sxy": int(agg["sxy_p"].sum()),
        "sx2": int(agg["sx2_p"].sum()),
        "sy2": int(agg["sy2_p"].sum()),
    }])


def _distinct_int_edges(edges_ds):
    """(s, d) int edges -> globally distinct, with a constant ``one``
    column for degree counting (unordered-pair-bucket dedup)."""
    def pair_key(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array(np.minimum(s, d) * N_NODES + np.maximum(s, d),
                           pa.int64()))

    def dedup(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates(["s", "d"])
        return pa.table({
            "s": pa.array(u["s"].to_numpy(), pa.int64()),
            "d": pa.array(u["d"].to_numpy(), pa.int64()),
            "one": pa.array(np.ones(len(u), dtype=np.int64), pa.int64()),
        })

    return (
        edges_ds.map_batches(pair_key, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "pk", 16),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup(df.drop(columns=["__bucket", "pk"])),
                    batch_format="pandas")
        .materialize()
    )


def q109_assortativity(sf_dir: str) -> pd.DataFrame:
    return degree_assortativity_moments(sparse_host_edges(sf_dir))


Q109_SQL = f"""
WITH {_EDGES_CTE},
od AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY s),
idg AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY d),
j AS (
  SELECT od.deg AS x, idg.deg AS y
  FROM e JOIN od ON od.s = e.s JOIN idg ON idg.d = e.d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(x) AS BIGINT) AS sx,
       CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x * y) AS BIGINT) AS sxy,
       CAST(SUM(x * x) AS BIGINT) AS sx2,
       CAST(SUM(y * y) AS BIGINT) AS sy2
FROM j
"""


# ---------------------------------------------------------------------------
# Q111 — modularity of the LPA communities (partition-quality metric)
# ---------------------------------------------------------------------------

def q111_modularity(sf_dir: str) -> pd.DataFrame:
    """Newman modularity of the q101 label-propagation partition over
    the undirected sparse host graph, in EXACT integer arithmetic:

        Q = (4m * sum_c e_c - sum_c d_c^2) / (4 m^2)

    (e_c = intra-community edges, d_c = community degree sum, m =
    undirected edge count; self-loops excluded from the edge set,
    while the LABELS keep q101's semantics exactly — the two CTE
    chains share only the raw edge mint). Output is one row
    (m, q_num, q_den, modularity_ppm) with the ppm a TOWARD-ZERO
    integer division (Q can be negative; DuckDB's ``//`` truncates
    while Python's floors — the q92 lesson).

    Scale shape: labels, degrees and community aggregates are all
    vocabulary-sized (host-graph bounded); the only corpus-scale work
    is the edge dedup exchange shared with q98/q104. For graphs whose
    label table outgrows a broadcast, the label attach becomes two
    hash joins (the q57 degree-attach pattern).
    """
    from ..stages.graphrank import label_propagation

    labels_df = label_propagation(
        _labeled_edges(sf_dir), n_rounds=LPA_ROUNDS).to_pandas()
    lab = {int(n[1:]): l for n, l in
           zip(labels_df["node"], labels_df["label"])}

    und = _distinct_int_edges(sparse_host_edges(sf_dir)).to_pandas()
    und = und[und["s"] != und["d"]]
    # unordered: (a<b) distinct — _distinct_int_edges dedups DIRECTED
    # pairs, so (u,v) and (v,u) may both remain; collapse them
    a = np.minimum(und["s"].to_numpy(), und["d"].to_numpy())
    b = np.maximum(und["s"].to_numpy(), und["d"].to_numpy())
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    m = len(pairs)
    if m == 0:
        return pd.DataFrame([{"m": 0, "q_num": 0, "q_den": 0,
                              "modularity_ppm": 0}])
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    e_c, d_c = {}, {}
    for u, v in pairs:
        if lab[int(u)] == lab[int(v)]:
            e_c[lab[int(u)]] = e_c.get(lab[int(u)], 0) + 1
    for v, dv in deg.items():
        d_c[lab[int(v)]] = d_c.get(lab[int(v)], 0) + dv
    q_num = 4 * m * sum(e_c.values()) - sum(d * d for d in d_c.values())
    q_den = 4 * m * m
    ppm = (abs(q_num) * 1_000_000 // q_den) * (1 if q_num >= 0 else -1)
    return pd.DataFrame([{
        "m": m, "q_num": q_num, "q_den": q_den, "modularity_ppm": ppm,
    }])


def _q111_sql(n_rounds: int = LPA_ROUNDS) -> str:
    # reuse q101's label chain verbatim, then aggregate modularity
    # over the self-loop-free unordered edge set
    label_cte = _q101_sql(n_rounds)
    body = label_cte[len("WITH "):label_cte.index("\nSELECT")]
    return f"""WITH {body},
labs AS (SELECT k, lab FROM l{n_rounds}),
ue AS (
  SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
  FROM e WHERE s <> d
),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ue),
deg AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS dv FROM (
    SELECT a AS k FROM ue UNION ALL SELECT b FROM ue) GROUP BY k
),
ec AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS e_in
  FROM ue JOIN labs la ON la.k = ue.a JOIN labs lb ON lb.k = ue.b
),
dc AS (
  SELECT CAST(COALESCE(SUM(ds * ds), 0) AS BIGINT) AS d2 FROM (
    SELECT l.lab, SUM(deg.dv) AS ds
    FROM deg JOIN labs l ON l.k = deg.k GROUP BY l.lab)
),
fin AS (
  SELECT mm.m,
         4 * mm.m * ec.e_in - dc.d2 AS q_num,
         4 * mm.m * mm.m AS q_den
  FROM mm, ec, dc
)
SELECT m, q_num, q_den,
       CAST(CASE WHEN q_num >= 0
            THEN (q_num * 1000000) // q_den
            ELSE -((-q_num * 1000000) // q_den) END AS BIGINT)
         AS modularity_ppm
FROM fin"""


Q111_SQL = _q111_sql()
