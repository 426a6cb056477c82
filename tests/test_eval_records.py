"""EvalInfo per-mention record parity: the A7 scalar metric suite must
recompute exactly from the records table (reference EvalInfo.java)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from reden_ray.pipelines.nel import NELPipeline
from reden_ray.stages.evaluate import (
    eval_records,
    evaluate_links,
    metrics_from_records,
)


@pytest.fixture(scope="module")
def fixture_run(unit_fixture):
    p = NELPipeline(unit_fixture)
    cands = p.candidates().materialize()
    links = p.links(cands)
    gold = pq.read_table(f"{unit_fixture}/gold_links.parquet").to_pandas()
    return links.to_pandas(), cands.to_pandas(), gold


class TestEvalRecords:
    def test_one_row_per_gold_mention(self, fixture_run):
        links, cands, gold = fixture_run
        r = eval_records(links, gold, cands)
        assert len(r) == len(gold)
        assert set(["url", "mention_id", "surface", "gold_uri", "chosen_uri",
                    "emitted_uris", "n_candidates", "cand_uris",
                    "choice_is_correct", "gold_in_candidates"]) <= set(r.columns)

    def test_metrics_recompute_exactly_from_records(self, fixture_run):
        links, cands, gold = fixture_run
        direct = evaluate_links(links, gold, cands)
        from_rec = metrics_from_records(eval_records(links, gold, cands))
        for k, v in from_rec.items():
            assert direct[k] == pytest.approx(v), k

    def test_correct_flags_match_substring_rule(self):
        links = pd.DataFrame({
            "url": ["u1", "u1"], "mention_id": [0, 1],
            "surface": ["X", "Y"], "uri": ["http://kb/x", "http://kb/w"],
            "all_uris": [["http://kb/x", "http://eq/x"], ["http://kb/w"]],
            "score": [1.0, 1.0],
        })
        gold = pd.DataFrame({
            "url": ["u1", "u1", "u1"], "mention_id": [0, 1, 2],
            "surface": ["X", "Y", "Z"],
            "gold_uri": ["http://eq/x", "http://kb/y", None],  # Z is NIL
        })
        r = eval_records(links, gold).set_index("mention_id")
        assert bool(r.loc[0, "choice_is_correct"])      # substring in list
        assert not bool(r.loc[1, "choice_is_correct"])  # wrong link
        assert bool(r.loc[2, "choice_is_correct"])      # NIL + no link

    def test_dataset_input_prefilters_to_gold(self, fixture_run):
        """Dataset-typed links path (broadcast gold-key prefilter)."""
        links, cands, gold = fixture_run
        links_ds = rd.from_arrow(pa.Table.from_pandas(links, preserve_index=False))
        half_gold = gold.iloc[: len(gold) // 2]
        r = eval_records(links_ds, half_gold)
        assert len(r) == len(half_gold)
