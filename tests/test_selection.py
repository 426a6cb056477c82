"""Selection & sketch operator tests (q56-q62): DSIR importance
resampling, triangle counting, single-pass ROLLUP, Bloom membership,
Misra-Gries heavy hitters, bottom-k sampling, k-core decomposition."""

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _assert_matches_oracle(got: pd.DataFrame, sql: str):
    con = _con()  # keep the connection referenced until .df() completes
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


class TestDSIR:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q56_SQL, q56_dsir_sample

        _assert_matches_oracle(q56_dsir_sample(SF), Q56_SQL)

    def test_model_counts_match_duckdb(self):
        """The per-bucket (target, raw) counts — the distribution
        estimate itself — agree with a relational recount."""
        import pyarrow.compute as pc

        from reden_ray.pipelines.selection import (_DSIR_BUCKETS,
                                                   _DSIR_SCALE, dsir_model)

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text", "lang"])
        marked = ds.map_batches(
            lambda t: t.append_column(
                "__is_target", pc.equal(t["lang"], pa.scalar("en"))),
            batch_format="pyarrow")
        w = dsir_model(marked)
        con = _con()
        m = con.sql(f"""
            WITH wds AS (
              SELECT lang, unnest(string_split(text, ' ')) AS word
              FROM documents
            ), wf AS (
              SELECT lang,
                (length(word)*131 + ascii(word)*31 + ascii(reverse(word)))
                  % {_DSIR_BUCKETS} AS b
              FROM wds WHERE word <> ''
            )
            SELECT b, SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS ct,
                   COUNT(*) AS cr
            FROM wf GROUP BY b ORDER BY b""").df()
        expect = np.ones(_DSIR_BUCKETS, dtype=np.int64) * _DSIR_SCALE
        expect[m["b"].to_numpy()] = (
            (m["ct"].to_numpy() + 1) * _DSIR_SCALE // (m["cr"].to_numpy() + 1))
        np.testing.assert_array_equal(w, expect)

    def test_selection_prefers_target_like_docs(self):
        """Sanity: the mean score of selected docs exceeds the corpus
        mean (resampling tilts toward the target distribution)."""
        from reden_ray.pipelines.selection import (_DSIR_BUCKETS,
                                                   _DSIR_SCALE,
                                                   q56_dsir_sample)

        sel = q56_dsir_sample(SF)
        con = _con()
        corpus_mean = con.sql(f"""
            WITH w AS (
              SELECT doc_id, lang, unnest(string_split(text,' ')) AS word
              FROM documents
            ), wf AS (
              SELECT doc_id, lang,
                (length(word)*131 + ascii(word)*31 + ascii(reverse(word)))
                  % {_DSIR_BUCKETS} AS b
              FROM w WHERE word <> ''
            ), model AS (
              SELECT b, SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS ct,
                     COUNT(*) AS cr
              FROM wf GROUP BY b
            ), scored AS (
              SELECT wf.doc_id,
                SUM(((m.ct+1) * {_DSIR_SCALE}) // (m.cr+1)) AS s
              FROM wf JOIN model m USING (b) GROUP BY wf.doc_id
            )
            SELECT AVG(s) AS m FROM scored""").df()["m"][0]
        assert sel["dsir_score"].mean() > corpus_mean


class TestTriangles:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import (_q57_sql,
                                                   q57_triangle_counts)

        _assert_matches_oracle(q57_triangle_counts(SF), _q57_sql())

    def test_hand_built_graph(self):
        """Two triangles sharing edge (a,b) plus a pendant edge; the
        directed/weighted/duplicated input exercises canonicalization."""
        from reden_ray.pipelines.selection import triangle_counts

        edges = pd.DataFrame({
            "src_host": ["a", "b", "c", "a", "d", "b", "a", "e", "a"],
            "dst_host": ["b", "c", "a", "d", "b", "a", "b", "a", "a"],
            "n_links": [1] * 9,
        })
        got = (triangle_counts(rd.from_pandas(edges))
               .set_index("host")["n_triangles"].to_dict())
        # triangles: (a,b,c) and (a,b,d); e-a is pendant; a-a self-loop
        # dropped; duplicate/reversed a-b edges collapse
        assert got == {"a": 2, "b": 2, "c": 1, "d": 1}

    def test_random_graphs_match_duckdb(self):
        from reden_ray.pipelines.selection import triangle_counts

        rng = random.Random(7)
        for trial in range(3):
            n = rng.randint(6, 14)
            rows = [(f"h{rng.randrange(n)}", f"h{rng.randrange(n)}")
                    for _ in range(40)]
            df = pd.DataFrame(rows, columns=["src_host", "dst_host"])
            df["n_links"] = 1
            got = triangle_counts(rd.from_pandas(df))
            con = duckdb.connect()
            con.register("edges", df)
            want = con.sql("""
                WITH und AS (
                  SELECT DISTINCT LEAST(src_host, dst_host) AS u,
                         GREATEST(src_host, dst_host) AS v
                  FROM edges WHERE src_host <> dst_host
                ), tri AS (
                  SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM und e1
                  JOIN und e2 ON e2.u = e1.v
                  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
                ), hosts AS (
                  SELECT a AS host FROM tri UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
                SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM hosts GROUP BY host""").df()
            g = got.sort_values("host").reset_index(drop=True)
            w = want.sort_values("host").reset_index(drop=True)
            pd.testing.assert_frame_equal(g, w, check_dtype=False)


class TestRollup:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q58_SQL, q58_rollup

        _assert_matches_oracle(q58_rollup(SF), Q58_SQL)

    def test_levels_are_consistent(self):
        """Rolled-up levels must equal the sum of their children —
        the invariant the single-pass derivation relies on."""
        from reden_ray.pipelines.selection import q58_rollup

        df = q58_rollup(SF)
        detail = df[df["gid"] == 0]
        by_month = df[df["gid"] == 1].set_index("month")
        grand = df[df["gid"] == 3]
        for m, g in detail.groupby("month"):
            assert by_month.loc[m, "n_events"] == g["n_events"].sum()
            assert (by_month.loc[m, "sum_floor_value"]
                    == g["sum_floor_value"].sum())
        assert grand["n_events"].iloc[0] == detail["n_events"].sum()


class TestBloom:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import (Q59_SQL,
                                                   q59_bloom_membership)

        _assert_matches_oracle(q59_bloom_membership(SF), Q59_SQL)

    def test_no_false_negatives(self):
        from reden_ray.pipelines.selection import q59_bloom_membership

        df = q59_bloom_membership(SF)
        exact = df["exact_member"].to_numpy().astype(bool)
        bloom = df["bloom_member"].to_numpy().astype(bool)
        assert bloom[exact].all()          # membership is never missed
        # false positives exist in principle but must stay bounded:
        # k=3, m=4096, n≈200 -> (1 - e^{-kn/m})^k ≈ 0.2% per probe
        fp = (bloom & ~exact).mean()
        assert fp < 0.05

    def test_registers_match_single_threaded_reference(self):
        from reden_ray.pipelines.selection import (_bloom_positions,
                                                   _BLOOM_WORDS,
                                                   bloom_registers)

        keys = np.array([3, 17, 99, 1024, 77777], dtype=np.int64)
        ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(3)
        got = bloom_registers(ds, "k")
        ref = np.zeros(_BLOOM_WORDS, dtype=np.int64)
        for pos in _bloom_positions(keys).ravel():
            ref[pos // 32] |= np.int64(1) << (pos % 32)
        np.testing.assert_array_equal(got, ref)


class TestMisraGries:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q60_SQL, q60_heavy_hitters

        _assert_matches_oracle(q60_heavy_hitters(SF), Q60_SQL)

    def test_guarantees_under_capacity(self):
        """Random streams, random block boundaries, capacity 8:
        (a) estimates never exceed truth, (b) undercount <= N/(cap+1),
        (c) every item with freq > N/(cap+1) is retained."""
        from reden_ray.pipelines.selection import heavy_hitters

        rng = random.Random(23)
        cap = 8
        for trial in range(3):
            # zipf-ish stream over 40 distinct items
            items = [f"t{min(int(rng.paretovariate(1.2)), 40)}"
                     for _ in range(5000)]
            n = len(items)
            true = pd.Series(items).value_counts()
            ds = rd.from_pandas(pd.DataFrame({"k": items})).repartition(
                rng.randint(2, 9))
            got = heavy_hitters(ds, "k", capacity=cap).set_index("k")[
                "mg_count"]
            bound = n / (cap + 1)
            for it, est in got.items():
                assert est <= true[it]
                assert true[it] - est <= bound + 1e-9
            for it, cnt in true.items():
                if cnt > bound:
                    assert it in got.index, (it, cnt, bound)

    def test_exact_when_capacity_covers_vocab(self):
        from reden_ray.pipelines.selection import heavy_hitters

        items = ["a"] * 10 + ["b"] * 5 + ["c"] * 2
        ds = rd.from_pandas(pd.DataFrame({"k": items})).repartition(4)
        got = heavy_hitters(ds, "k", capacity=16).set_index("k")["mg_count"]
        assert got.to_dict() == {"a": 10, "b": 5, "c": 2}


class TestBottomK:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q61_SQL, q61_bottomk_sample

        _assert_matches_oracle(q61_bottomk_sample(SF), Q61_SQL)

    def test_mergeable_and_block_invariant(self):
        """bottom-k of a union == bottom-k of bottom-k's: the sample is
        identical under any repartitioning of the input."""
        from reden_ray.pipelines.selection import bottom_k_per_group

        df = pd.DataFrame({
            "g": [f"g{i % 4}" for i in range(400)],
            "i": list(range(400)),
        })
        a = bottom_k_per_group(rd.from_pandas(df).repartition(2), "g", "i")
        b = bottom_k_per_group(rd.from_pandas(df).repartition(17), "g", "i")
        key = ["g", "smp_rank", "i"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True)[key],
            b.sort_values(key).reset_index(drop=True)[key])
        assert (a.groupby("g").size() == 5).all()


class TestWeightedBottomK:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q77_SQL, q77_weighted_sample

        _assert_matches_oracle(q77_weighted_sample(SF), Q77_SQL)

    def test_mergeable_and_block_invariant(self):
        from reden_ray.pipelines.selection import weighted_bottom_k_per_group

        rng = random.Random(7)
        df = pd.DataFrame({
            "g": [f"g{i % 4}" for i in range(400)],
            "i": list(range(400)),
            "w": [rng.randint(1, 40) for _ in range(400)],
        })
        a = weighted_bottom_k_per_group(
            rd.from_pandas(df).repartition(2), "g", "i", "w")
        b = weighted_bottom_k_per_group(
            rd.from_pandas(df).repartition(17), "g", "i", "w")
        key = ["g", "smp_rank", "i", "rk"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True)[key],
            b.sort_values(key).reset_index(drop=True)[key])
        assert (a.groupby("g").size() == 5).all()

    def test_weight_biases_inclusion(self):
        """Items with a much larger weight are sampled far more often
        than uniform: the integer rank hv // w preserves the
        Efraimidis-Spirakis property directionally."""
        from reden_ray.pipelines.selection import weighted_bottom_k_per_group

        n = 2000
        heavy = set(range(0, n, 100))              # 20 of 2000 get w=1000
        df = pd.DataFrame({
            "g": ["x"] * n,
            "i": list(range(n)),
            "w": [1000 if i in heavy else 1 for i in range(n)],
        })
        smp = weighted_bottom_k_per_group(
            rd.from_pandas(df).repartition(5), "g", "i", "w", k=10)
        got_heavy = sum(1 for i in smp["i"] if i in heavy)
        # uniform would give ~0.1 heavy picks in expectation; the
        # weighted rank should make heavy items dominate the sample
        assert got_heavy >= 8, smp

    def test_weight_floor_guards_nonpositive(self):
        from reden_ray.pipelines.selection import weighted_bottom_k_per_group

        df = pd.DataFrame({"g": ["x"] * 3, "i": [1, 2, 3],
                           "w": [0, -5, 1]})
        out = weighted_bottom_k_per_group(rd.from_pandas(df), "g", "i", "w")
        assert len(out) == 3  # no div-by-zero; all rows rank


class TestKCore:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import _q62_sql, q62_kcore

        _assert_matches_oracle(q62_kcore(SF), _q62_sql())

    def test_peeling_actually_fires_on_fixture(self):
        """The chosen k must exercise at least one peel round at the
        fixture scale (guards against a degenerate always-converged
        driver query)."""
        from reden_ray.pipelines.selection import _q62_sql, q62_kcore

        got = q62_kcore(SF)
        con = _con()
        n_hosts = 31
        assert 0 < len(got) < n_hosts

    def test_random_graphs_match_reference_peeler(self):
        from reden_ray.pipelines.selection import k_core

        rng = random.Random(31)
        for trial in range(3):
            n = rng.randint(8, 16)
            rows = [(f"h{rng.randrange(n)}", f"h{rng.randrange(n)}")
                    for _ in range(30)]
            df = pd.DataFrame(rows, columns=["src_host", "dst_host"])
            df["n_links"] = 9  # above any sparsify threshold
            k = rng.randint(2, 4)
            got = k_core(rd.from_pandas(df), k=k, max_rounds=40)

            # pure-python reference peeler
            e = {tuple(sorted(p)) for p in rows if p[0] != p[1]}
            while True:
                deg = {}
                for u, v in e:
                    deg[u] = deg.get(u, 0) + 1
                    deg[v] = deg.get(v, 0) + 1
                keep = {x for x, d in deg.items() if d >= k}
                if len(keep) == len(deg):
                    break
                e = {(u, v) for u, v in e if u in keep and v in keep}
            want = sorted(deg.items())
            assert list(map(tuple, got.to_numpy())) == [
                (h, d) for h, d in want], (trial, k)


class TestKMVEstimate:
    def test_tracks_exact_distinct(self):
        """Group distinct-count estimates from the bottom-k hashes land
        within KMV error (~1/sqrt(k-1)) of the truth."""
        from reden_ray.pipelines.selection import (_KNUTH, _M32,
                                                   bottom_k_per_group,
                                                   kmv_estimate)

        k = 64
        rng = random.Random(5)
        ids = [rng.randrange(10**9) for _ in range(4000)]
        df = pd.DataFrame({"g": ["x"] * len(ids), "i": ids})
        n_distinct = df["i"].nunique()
        smp = bottom_k_per_group(rd.from_pandas(df).repartition(7),
                                 "g", "i", k=k)
        hv = (smp["i"].to_numpy().astype(np.int64) * _KNUTH) % _M32
        est = kmv_estimate(hv, k)
        assert abs(est / n_distinct - 1.0) < 0.5, (est, n_distinct)

    def test_exact_below_k(self):
        from reden_ray.pipelines.selection import kmv_estimate

        assert kmv_estimate(np.array([5, 9, 2]), 10) == 3.0


class TestFunnel:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q63_SQL, q63_funnel

        _assert_matches_oracle(q63_funnel(SF), Q63_SQL)

    def test_hand_built_sequences(self):
        """Strict-order semantics: same-timestamp later steps don't
        count; out-of-order steps don't count; repeats are fine."""
        from reden_ray.pipelines.selection import funnel_counts

        t0 = pd.Timestamp("2024-01-01")

        def ev(u, typ, minutes):
            return {"user_id": u, "event_type": typ,
                    "ts": t0 + pd.Timedelta(minutes=minutes)}

        rows = [
            # u1: full funnel in order
            ev(1, "view", 0), ev(1, "click", 1), ev(1, "purchase", 2),
            # u2: click at the SAME ts as view -> strict > rejects it
            ev(2, "view", 0), ev(2, "click", 0),
            # u3: purchase before click -> stops at click
            ev(3, "view", 0), ev(3, "purchase", 1), ev(3, "click", 2),
            # u4: never views (click/purchase only) -> stage 0
            ev(4, "click", 0), ev(4, "purchase", 1),
            # u5: view only
            ev(5, "view", 3),
        ]
        got = funnel_counts(rd.from_pandas(pd.DataFrame(rows))
                            ).set_index("stage")["n_users"].to_dict()
        assert got == {1: 4, 2: 2, 3: 1}

    def test_block_split_invariance(self):
        """The DISTINCT (key,type,ts) pre-reduce must keep results
        identical under any partitioning."""
        from reden_ray.pipelines.selection import funnel_counts

        rng = random.Random(77)
        t0 = pd.Timestamp("2024-01-01")
        rows = [{"user_id": rng.randrange(30),
                 "event_type": rng.choice(["view", "click", "purchase",
                                           "signup"]),
                 "ts": t0 + pd.Timedelta(minutes=rng.randrange(50))}
                for _ in range(600)]
        df = pd.DataFrame(rows)
        a = funnel_counts(rd.from_pandas(df).repartition(2))
        b = funnel_counts(rd.from_pandas(df).repartition(23))
        pd.testing.assert_frame_equal(a, b)


class TestReviewRegressions:
    """Regression coverage for the round-5 code-review findings."""

    def test_kcore_converging_in_exactly_max_rounds(self):
        """Triangle + 2-pendant chain under k=2 needs exactly 2 peels;
        max_rounds=2 must return the triangle, not raise."""
        from reden_ray.pipelines.selection import k_core

        rows = [("t1", "t2"), ("t2", "t3"), ("t3", "t1"),
                ("t1", "c1"), ("c1", "c2")]
        df = pd.DataFrame(rows, columns=["src_host", "dst_host"])
        df["n_links"] = 1
        got = k_core(rd.from_pandas(df), k=2, max_rounds=2)
        assert got["host"].tolist() == ["t1", "t2", "t3"]
        assert got["core_degree"].tolist() == [2, 2, 2]

    def test_rollup_null_values_count_rows(self):
        """COUNT(*) semantics: a null `value` still counts its row;
        an all-null group sums to 0 (both mirror the oracle)."""
        from reden_ray.pipelines.selection import Q58_SQL, rollup_events

        t0 = pd.Timestamp("2024-03-01")
        df = pd.DataFrame({
            "ts": [t0, t0, t0 + pd.Timedelta(days=40)],
            "event_type": ["view", "view", "error"],
            "value": [2.5, None, None],   # error group is ALL null
        })
        got = rollup_events(rd.from_pandas(df))
        con = duckdb.connect()
        con.register("events", df)
        want = con.sql(Q58_SQL).df()
        cols = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            want[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False)

    def test_bloom_empty_member_set(self):
        """Zero members: every probe is bloom- and exact-negative;
        nothing crashes on the empty sorted-id array."""
        from reden_ray.pipelines.selection import (bloom_probe,
                                                   bloom_registers)

        empty = rd.from_pandas(pd.DataFrame({"k": pd.array([],
                                                           dtype="int64")}))
        regs = bloom_registers(empty, "k")
        assert (regs == 0).all()
        probes = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
        out = bloom_probe(probes, regs, "k").to_pandas()
        assert (out["bloom_member"] == 0).all()

    def test_funnel_no_matching_events_still_emits_stages(self):
        """An event stream with none of the funnel types must yield
        stages 1-3 with zero counts (oracle COUNT-over-empty parity)."""
        from reden_ray.pipelines.selection import funnel_counts

        t0 = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({"user_id": [1, 2], "event_type":
                           ["signup", "error"], "ts": [t0, t0]})
        got = funnel_counts(rd.from_pandas(df))
        assert got["stage"].tolist() == [1, 2, 3]
        assert got["n_users"].tolist() == [0, 0, 0]

    def test_kcore_join_route_equivalent(self):
        """Forcing node_broadcast_limit=0 routes every peel round
        through the left_semi Dataset joins; results must be identical
        to the broadcast route on random graphs."""
        from reden_ray.pipelines.selection import k_core

        rng = random.Random(101)
        for trial in range(2):
            n = rng.randint(8, 14)
            rows = [(f"h{rng.randrange(n)}", f"h{rng.randrange(n)}")
                    for _ in range(28)]
            df = pd.DataFrame(rows, columns=["src_host", "dst_host"])
            df["n_links"] = 1
            a = k_core(rd.from_pandas(df), k=2, max_rounds=40)
            b = k_core(rd.from_pandas(df), k=2, max_rounds=40,
                       node_broadcast_limit=0)
            pd.testing.assert_frame_equal(a, b)

    def test_triangles_join_route_equivalent(self):
        """Forcing node_broadcast_limit=0 routes the degree attach
        through hash joins; per-host counts must match the broadcast
        route on random graphs."""
        from reden_ray.pipelines.selection import triangle_counts

        rng = random.Random(202)
        for trial in range(2):
            n = rng.randint(6, 12)
            rows = [(f"h{rng.randrange(n)}", f"h{rng.randrange(n)}")
                    for _ in range(35)]
            df = pd.DataFrame(rows, columns=["src_host", "dst_host"])
            df["n_links"] = 1
            a = triangle_counts(rd.from_pandas(df))
            b = triangle_counts(rd.from_pandas(df), node_broadcast_limit=0)
            key = ["host", "n_triangles"]
            pd.testing.assert_frame_equal(
                a.sort_values("host").reset_index(drop=True)[key],
                b.sort_values("host").reset_index(drop=True)[key])

    def test_kcore_raises_when_empty_needs_extra_round(self):
        """Peeling to empty BEYOND max_rounds must raise (the oracle's
        unroll would still see live nodes), not silently return empty."""
        import pytest

        from reden_ray.pipelines.selection import k_core

        # path a-b-c-d, k=2: round 1 peels a,d; round 2 peels b,c
        rows = [("a", "b"), ("b", "c"), ("c", "d")]
        df = pd.DataFrame(rows, columns=["src_host", "dst_host"])
        df["n_links"] = 1
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(rd.from_pandas(df), k=2, max_rounds=1)
        # with the bound high enough the empty core is legitimate
        got = k_core(rd.from_pandas(df), k=2, max_rounds=3)
        assert len(got) == 0


class TestProfile:
    def test_matches_oracle(self):
        from reden_ray.pipelines.selection import Q64_SQL, q64_profile

        _assert_matches_oracle(q64_profile(SF), Q64_SQL)

    def test_nulls_and_numeric_minmax(self):
        """Null accounting and NATIVE-type min/max: an int column whose
        stringified min would sort lexicographically wrong ('10' < '9')
        must still report the numeric min; nulls count per column."""
        from reden_ray.pipelines.selection import profile_table

        df = pd.DataFrame({
            "a": [10, 9, 1000, None],
            "b": ["x", None, None, "aa"],
        }).astype({"a": "Int64"})
        got = profile_table(rd.from_pandas(df).repartition(3), ("a", "b"))
        ga = got.set_index("column")
        assert ga.loc["a", "n_null"] == 1
        assert ga.loc["a", "min_v"] == "9" and ga.loc["a", "max_v"] == "1000"
        assert ga.loc["a", "n_distinct"] == 3
        assert ga.loc["b", "n_null"] == 2
        assert ga.loc["b", "min_v"] == "aa" and ga.loc["b", "max_v"] == "x"
