"""Equivalence test: distributed-join linking (J3) vs broadcast path."""

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from reden_ray.pipelines.nel import NELPipeline
from reden_ray.stages.linker_join import link_documents_via_join


@pytest.fixture(scope="module")
def both_links(unit_fixture):
    p = NELPipeline(unit_fixture)
    cands = p.candidates().materialize()
    broadcast = p.links(cands).to_pandas()
    kb = rd.read_parquet(f"{unit_fixture}/kb_triples.parquet")
    sameas = rd.read_parquet(f"{unit_fixture}/sameas.parquet")
    joined = link_documents_via_join(cands, kb, sameas_ds=sameas,
                                     num_partitions=2).to_pandas()
    return broadcast, joined


class TestCandidatesViaJoin:
    def test_join_path_equals_broadcast_candidates(self, unit_fixture):
        """Scale-path J1 join must emit EXACTLY the broadcast
        CandidateGen rows — same D1 dedup, same K2 cap, same
        deterministic ranks (via the carried dict_row order)."""
        from reden_ray.stages.candidates import (
            candidates_via_join,
            dictionary_with_order,
        )

        p = NELPipeline(unit_fixture)
        mentions = p.mentions().materialize()
        broadcast = p.candidates(mentions).to_pandas()
        dico = dictionary_with_order(f"{unit_fixture}/dictionary.parquet")
        joined = candidates_via_join(mentions, dico, num_partitions=2,
                                     num_buckets=4).to_pandas()
        key = ["url", "mention_id", "cand_rank"]
        b = broadcast.sort_values(key).reset_index(drop=True)
        j = joined.sort_values(key).reset_index(drop=True)
        assert len(b) == len(j)
        for col in ["url", "mention_id", "cand_rank", "entity_id", "uris_str",
                    "surface", "surface_norm"]:
            assert (b[col].values == j[col].values).all(), col

    def test_join_path_deterministic(self, unit_fixture):
        from reden_ray.stages.candidates import (
            candidates_via_join,
            dictionary_with_order,
        )

        p = NELPipeline(unit_fixture)
        mentions = p.mentions().materialize()
        dico = dictionary_with_order(f"{unit_fixture}/dictionary.parquet")
        key = ["url", "mention_id", "cand_rank"]
        a = candidates_via_join(mentions, dico, num_partitions=2).to_pandas()
        b = candidates_via_join(mentions, dico, num_partitions=2).to_pandas()
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    def test_dict_row_spans_row_groups_and_files(self, tmp_path):
        """dictionary_with_order reads only Parquet footers on the
        driver; dict_row must be the GLOBAL file-order index across
        row groups and across sorted files."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.stages.candidates import dictionary_with_order

        def mk(n, start):
            return pa.table({
                "surface_norm": [f"s{i}" for i in range(start, start + n)],
                "entity_id": [f"http://e/{i}" for i in range(start, start + n)],
                "uris": pa.array([[f"http://e/{i}", "http://alt/x"]
                                  for i in range(start, start + n)],
                                 pa.list_(pa.string())),
            })

        d = tmp_path / "dico"
        d.mkdir()
        # file 1: 7 rows in row groups of 3 (3 groups); file 2: 5 rows
        pq.write_table(mk(7, 0), d / "a.parquet", row_group_size=3)
        pq.write_table(mk(5, 7), d / "b.parquet", row_group_size=2)
        out = dictionary_with_order(str(d)).to_pandas()
        out = out.sort_values("dict_row").reset_index(drop=True)
        assert out["dict_row"].tolist() == list(range(12))
        assert out["surface_norm"].tolist() == [f"s{i}" for i in range(12)]
        assert out["uris_str"].iloc[3] == "http://e/3 http://alt/x"


class TestAutoSelectedJoinMode:
    """NELPipeline's measured-size gate: broadcast limits forced to 0
    must route the WHOLE pipeline (candidates J1 join, linking J3 join,
    entity-triple join emitter) through the distributed paths — and the
    output must be identical to the broadcast pipeline's."""

    def test_gate_defaults_to_broadcast_on_small_kb(self, unit_fixture):
        p = NELPipeline(unit_fixture)
        assert p.kb_broadcastable and p.dico_broadcastable
        assert p.kb_ref is not None and p.dico_ref is not None

    def test_dico_only_gate_links_match_broadcast(self, unit_fixture):
        """Dictionary over its gate with a BROADCASTABLE KB (huge
        surface dictionary, modest KB): candidates must route through
        the J1 join and linking through the broadcast-KB row path —
        previously this combination crashed (dico_ref is None on the
        fused path)."""
        from reden_ray.pipelines.nel import NELConfig

        cfg = NELConfig(dico_broadcast_limit_bytes=0, join_partitions=2)
        pd_ = NELPipeline(unit_fixture, cfg)
        assert pd_.kb_broadcastable and not pd_.dico_broadcastable
        assert pd_.dico_ref is None and pd_.kb_ref is not None
        got = pd_.links().to_pandas()

        want = NELPipeline(unit_fixture).links().to_pandas()
        key = ["url", "mention_id"]
        g = got.sort_values(key).reset_index(drop=True)
        w = want.sort_values(key).reset_index(drop=True)
        assert len(g) == len(w)
        assert (g["uri"].values == w["uri"].values).all()

    def test_rels_override_vectorized(self):
        """apply_rels_weights must match the broadcast path's
        rels.get(pred, w) semantics element-wise."""
        import pyarrow as pa

        from reden_ray.stages.linker_join import apply_rels_weights

        pred = pa.chunked_array([["p1", "p2"], ["p1", "p3"]])
        weight = pa.chunked_array([[1.0, 2.0], [3.0, 4.0]])
        rels = {"p1": 9.0, "p3": 0.5}
        out = apply_rels_weights(pred, weight, rels)
        assert out.to_pylist() == [9.0, 2.0, 9.0, 0.5]
        assert apply_rels_weights(pred, weight, None).to_pylist() == \
            [1.0, 2.0, 3.0, 4.0]

    def test_join_path_accepts_rels(self, unit_fixture):
        """cfg.rels changes weighted-degree scoring (sna DegreeCentrality
        sums edge weights) — both paths must apply the SAME weights and
        agree with each other (cross-path equivalence under -relsFile)."""
        from reden_ray.pipelines.nel import NELConfig

        rels = {"http://example.org/kb/member": 7.0}
        p = NELPipeline(unit_fixture, NELConfig(rels=rels))
        cands = p.candidates().materialize()
        kb = rd.read_parquet(f"{unit_fixture}/kb_triples.parquet")
        sameas = rd.read_parquet(f"{unit_fixture}/sameas.parquet")
        got = link_documents_via_join(
            cands, kb, sameas_ds=sameas, rels=rels,
            num_partitions=2).to_pandas()
        want = p.links(cands).to_pandas()
        key = ["url", "mention_id"]
        g = got.sort_values(key).reset_index(drop=True)
        w = want.sort_values(key).reset_index(drop=True)
        assert (g["uri"].values == w["uri"].values).all()
        # and the weighted scores themselves agree where defined
        import numpy as np

        gs, ws = g["score"].values, w["score"].values
        both = ~(np.isnan(gs) | np.isnan(ws))
        assert np.allclose(gs[both], ws[both])

    def test_sameas_join_fallback_matches_broadcast_hop(self, unit_fixture):
        """sameAs over its row gate must route through the distributed
        equivalence join and produce the same links as the (default)
        broadcast map-side hop."""
        p = NELPipeline(unit_fixture)
        cands = p.candidates().materialize()
        kb = rd.read_parquet(f"{unit_fixture}/kb_triples.parquet")
        sameas = rd.read_parquet(f"{unit_fixture}/sameas.parquet")
        got = link_documents_via_join(
            cands, kb, sameas_ds=sameas, num_partitions=2,
            sameas_broadcast_row_limit=0).to_pandas()
        want = link_documents_via_join(
            cands, kb, sameas_ds=sameas, num_partitions=2).to_pandas()
        key = ["url", "mention_id"]
        g = got.sort_values(key).reset_index(drop=True)
        w = want.sort_values(key).reset_index(drop=True)
        assert len(g) == len(w)
        assert (g["uri"].values == w["uri"].values).all()
        assert g["score"].fillna(-1.0).equals(w["score"].fillna(-1.0))

    def test_forced_join_mode_end_to_end_matches_broadcast(self, unit_fixture):
        from reden_ray.pipelines.nel import NELConfig

        cfg = NELConfig(kb_broadcast_limit_bytes=0,
                        dico_broadcast_limit_bytes=0, join_partitions=2)
        pj = NELPipeline(unit_fixture, cfg)
        assert not pj.kb_broadcastable and not pj.dico_broadcastable
        assert pj.kb_ref is None and pj.dico_ref is None
        joined = pj.triples().to_pandas()

        pb = NELPipeline(unit_fixture)
        broadcast = pb.triples().to_pandas()

        key = ["subj", "pred", "obj"]
        j = joined.sort_values(key).reset_index(drop=True)
        b = broadcast.sort_values(key).reset_index(drop=True)
        assert len(j) == len(b)
        assert j.equals(b)

        # and both match the fixture gold
        from reden_ray.stages.evaluate import triple_prf

        gold = pq.read_table(f"{unit_fixture}/gold_triples.parquet")
        import pyarrow as pa

        m = triple_prf(pa.Table.from_pandas(joined), gold)
        assert m["precision"] == 1.0 and m["recall"] == 1.0, m


class TestJoinPathEquivalence:
    def test_same_links_as_broadcast(self, both_links):
        broadcast, joined = both_links
        key = ["url", "mention_id"]
        b = broadcast.sort_values(key).reset_index(drop=True)
        j = joined.sort_values(key).reset_index(drop=True)
        assert len(b) == len(j)
        assert (b["uri"].values == j["uri"].values).all()
        assert (b["surface"].values == j["surface"].values).all()

    def test_scores_match(self, both_links):
        broadcast, joined = both_links
        key = ["url", "mention_id"]
        b = broadcast.sort_values(key).reset_index(drop=True)
        j = joined.sort_values(key).reset_index(drop=True)
        import numpy as np

        bn = b["score"].isna()
        assert (bn.values == j["score"].isna().values).all()
        assert np.allclose(b["score"][~bn], j["score"][~bn.values])


class TestSemiJoinReduction:
    """kb_join_probe_filter: the KB side of the J3 link join and the
    entity-triple join is filtered map-side to the dictionary-derived
    probe universe before its shuffle — lossless for the inner join,
    so links AND triples must be byte-identical to the broadcast path
    even when the KB is padded with millions of never-matching rows."""

    def _padded_fixture(self, unit_fixture, tmp_path, n_pad: int = 20_000):
        """Copy the unit fixture; pad kb_triples with rows whose
        subjects are outside the probe universe (unique namespace)."""
        import shutil

        import pyarrow as pa

        fx = tmp_path / "padded"
        fx.mkdir()
        for f in ("dictionary", "gazetteer", "sameas", "pages",
                  "gold_links", "gold_triples"):
            src = f"{unit_fixture}/{f}.parquet"
            shutil.copy(src, fx / f"{f}.parquet")
        kb_dir = fx / "kb_triples.parquet"
        kb_dir.mkdir()
        shutil.copy(f"{unit_fixture}/kb_triples.parquet",
                    kb_dir / "part-000.parquet")
        pad = pa.table({
            "subj": [f"http://pad.example/e/{i}" for i in range(n_pad)],
            "pred": ["http://pad.example/p/rel"] * n_pad,
            "obj": [f"http://pad.example/e/{(i * 7) % n_pad}"
                    for i in range(n_pad)],
            "obj_is_literal": [False] * n_pad,
            "weight": [1.0] * n_pad,
        })
        pq.write_table(pad, kb_dir / "part-001.parquet")
        return str(fx)

    def test_probe_universe_gating(self, unit_fixture):
        from reden_ray.pipelines.nel import NELConfig

        # dico broadcastable -> universe available
        p = NELPipeline(unit_fixture, NELConfig(kb_broadcast_limit_bytes=0))
        assert p.probe_universe_ref() is not None
        # cached second call returns the same ref
        assert p.probe_universe_ref() is p.probe_universe_ref()
        # dico over ITS gate -> no driver-side universe -> filter off
        p2 = NELPipeline(unit_fixture, NELConfig(
            kb_broadcast_limit_bytes=0, dico_broadcast_limit_bytes=0))
        assert p2.probe_universe_ref() is None
        # explicit opt-out
        p3 = NELPipeline(unit_fixture, NELConfig(
            kb_broadcast_limit_bytes=0, kb_join_probe_filter=False))
        assert p3.probe_universe_ref() is None

    def test_universe_is_superset_of_probes(self, unit_fixture):
        """Soundness: every URI compact_probes can emit (entity_id,
        equivalence list, broadcast sameAs hop) is in the universe."""
        import ray

        from reden_ray.pipelines.nel import NELConfig
        from reden_ray.state.broadcast import load_sameas_index

        p = NELPipeline(unit_fixture, NELConfig(kb_broadcast_limit_bytes=0))
        universe = set(ray.get(p.probe_universe_ref()).to_pylist())
        cands = p.candidates().to_pandas()
        samap = load_sameas_index(f"{unit_fixture}/sameas.parquet")
        for ent, uris in zip(cands["entity_id"], cands["uris_str"]):
            assert ent in universe
            for u in uris.split(" "):
                assert u in universe
            for eq in samap.get(ent, []):
                assert eq in universe

    def test_padded_kb_links_and_triples_match_broadcast(
            self, unit_fixture, tmp_path):
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded_fixture(unit_fixture, tmp_path)
        cfg = NELConfig(kb_broadcast_limit_bytes=0, join_partitions=2)
        pj = NELPipeline(fx, cfg)
        assert not pj.kb_broadcastable and pj.dico_broadcastable
        assert pj.probe_universe_ref() is not None

        pb = NELPipeline(unit_fixture)
        key = ["url", "mention_id"]
        got = pj.links().to_pandas().sort_values(key).reset_index(drop=True)
        want = pb.links().to_pandas().sort_values(key).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["uri"].values == want["uri"].values).all()
        bn = want["score"].isna()
        assert (bn.values == got["score"].isna().values).all()

        tkey = ["subj", "pred", "obj"]
        gt = pj.triples().to_pandas().sort_values(tkey).reset_index(drop=True)
        wt = pb.triples().to_pandas().sort_values(tkey).reset_index(drop=True)
        assert gt.equals(wt)

    def test_filter_off_still_correct_on_padded_kb(
            self, unit_fixture, tmp_path):
        """The unfiltered join path (universe unavailable) must also be
        exact over a padded KB — the padding just rides the exchange."""
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded_fixture(unit_fixture, tmp_path, n_pad=5_000)
        cfg = NELConfig(kb_broadcast_limit_bytes=0, join_partitions=2,
                        kb_join_probe_filter=False)
        pj = NELPipeline(fx, cfg)
        assert pj.probe_universe_ref() is None
        got = pj.links().to_pandas()
        want = NELPipeline(unit_fixture).links().to_pandas()
        key = ["url", "mention_id"]
        g = got.sort_values(key).reset_index(drop=True)
        w = want.sort_values(key).reset_index(drop=True)
        assert (g["uri"].values == w["uri"].values).all()


class TestReducedBroadcastReGate:
    """kb_reduced_broadcast: an over-gate KB whose semi-join-reduced
    candidate neighborhoods re-pass the gate must route back onto the
    fused broadcast path — with links and triples byte-identical to
    the whole-KB broadcast run."""

    def _padded(self, unit_fixture, tmp_path, n_pad=20_000, only_pad=False):
        import shutil

        import pyarrow as pa

        fx = tmp_path / "regate"
        fx.mkdir()
        for f in ("dictionary", "gazetteer", "sameas", "pages",
                  "gold_links", "gold_triples"):
            shutil.copy(f"{unit_fixture}/{f}.parquet", fx / f"{f}.parquet")
        kb_dir = fx / "kb_triples.parquet"
        kb_dir.mkdir()
        if not only_pad:
            shutil.copy(f"{unit_fixture}/kb_triples.parquet",
                        kb_dir / "part-000.parquet")
        pad = pa.table({
            "subj": [f"http://pad.example/e/{i}" for i in range(n_pad)],
            "pred": ["http://pad.example/p/rel"] * n_pad,
            "obj": [f"http://pad.example/e/{(i * 7) % n_pad}"
                    for i in range(n_pad)],
            "obj_is_literal": [False] * n_pad,
            "weight": [1.0] * n_pad,
        })
        pq.write_table(pad, kb_dir / "part-001.parquet")
        return str(fx)

    def _regate_limit(self, unit_fixture) -> int:
        # a gate the WHOLE padded KB fails but the reduced rows pass:
        # reduced rows are a subset of the original unit KB, whose
        # in-memory Arrow bytes bound the reduced measurement from above
        return pq.read_table(f"{unit_fixture}/kb_triples.parquet").nbytes + 8192

    def test_regate_routes_to_broadcast_and_matches(
            self, unit_fixture, tmp_path):
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded(unit_fixture, tmp_path)
        limit = self._regate_limit(unit_fixture)
        pj = NELPipeline(fx, NELConfig(kb_broadcast_limit_bytes=limit))
        assert not pj.kb_broadcastable, \
            "padded KB must exceed the test gate on disk"
        assert pj.kb_route is None  # lazy until links()/triples()

        key = ["url", "mention_id"]
        got = pj.links().to_pandas().sort_values(key).reset_index(drop=True)
        assert pj.kb_route == "reduced-broadcast"
        assert pj.kb_ref is not None and pj.sameas_ref is not None
        want = (NELPipeline(unit_fixture).links().to_pandas()
                .sort_values(key).reset_index(drop=True))
        assert len(got) == len(want)
        assert (got["uri"].values == want["uri"].values).all()
        bn = want["score"].isna()
        assert (bn.values == got["score"].isna().values).all()

        tkey = ["subj", "pred", "obj"]
        gt = pj.triples().to_pandas().sort_values(tkey).reset_index(drop=True)
        wt = (NELPipeline(unit_fixture).triples().to_pandas()
              .sort_values(tkey).reset_index(drop=True))
        assert gt.equals(wt)

    def test_failed_regate_reuses_filtered_kb_on_join_path(
            self, unit_fixture, tmp_path):
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded(unit_fixture, tmp_path, n_pad=5_000)
        pj = NELPipeline(fx, NELConfig(kb_broadcast_limit_bytes=1,
                                       join_partitions=2))
        key = ["url", "mention_id"]
        got = pj.links().to_pandas().sort_values(key).reset_index(drop=True)
        assert pj.kb_route == "join"
        assert pj._reduced_kb_ds is not None  # stash reused by _join_kb_ds
        # the stashed rows are exactly the universe-filtered KB
        assert pj._reduced_kb_ds.count() == pq.read_table(
            f"{unit_fixture}/kb_triples.parquet").num_rows
        want = (NELPipeline(unit_fixture).links().to_pandas()
                .sort_values(key).reset_index(drop=True))
        assert (got["uri"].values == want["uri"].values).all()

    def test_forced_zero_gate_skips_reduction(self, unit_fixture, tmp_path):
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded(unit_fixture, tmp_path, n_pad=2_000)
        pj = NELPipeline(fx, NELConfig(kb_broadcast_limit_bytes=0,
                                       join_partitions=2))
        pj.links().materialize()
        assert pj.kb_route == "join"
        assert pj._reduced_kb_ds is None  # no scan was spent on a 0 gate

    def test_opt_out_flag(self, unit_fixture, tmp_path):
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded(unit_fixture, tmp_path, n_pad=2_000)
        limit = self._regate_limit(unit_fixture)
        pj = NELPipeline(fx, NELConfig(kb_broadcast_limit_bytes=limit,
                                       kb_reduced_broadcast=False,
                                       join_partitions=2))
        pj.links().materialize()
        assert pj.kb_route == "join"

    def test_fully_filtered_kb_regates_to_empty_index(
            self, unit_fixture, tmp_path):
        """A KB with ZERO candidate subjects reduces to an empty index;
        the broadcast path must still link from candidates alone —
        matching the join path's empty-KB short-circuit."""
        from reden_ray.pipelines.nel import NELConfig

        fx = self._padded(unit_fixture, tmp_path, n_pad=20_000, only_pad=True)
        limit = self._regate_limit(unit_fixture)
        pr = NELPipeline(fx, NELConfig(kb_broadcast_limit_bytes=limit))
        assert not pr.kb_broadcastable
        key = ["url", "mention_id"]
        got = pr.links().to_pandas().sort_values(key).reset_index(drop=True)
        assert pr.kb_route == "reduced-broadcast"
        pj = NELPipeline(fx, NELConfig(kb_broadcast_limit_bytes=0,
                                       join_partitions=2))
        want = pj.links().to_pandas().sort_values(key).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["uri"].values == want["uri"].values).all()
