"""Reference-corpus parity gates (VERDICT r04 Next-round #3).

Verifies, against the reference's own committed thibaudet run
(output/thibaudet_reflexions-resEvalV3.txt, 2,980 mentions), that this
engine's J5 verdict rules, A8 correct-mention counts, S1-S3 TEI
extraction, and M1+J1 candidate generation reproduce the artifact
mention-by-mention. Skipped when /root/reference is absent.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pytest

from tools.thibaudet_parity import (
    CORRECT_TXT,
    EVAL_TXT,
    INPUT_TEI,
    parse_contexts,
    parse_res_eval,
    rederive_verdict,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(EVAL_TXT), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def records():
    return parse_res_eval(EVAL_TXT)


def test_verdict_parity_all_2980(records):
    assert len(records) == 2980
    assert Counter(r.verdict for r in records) == {
        "good": 906, "wrong": 961, "nil": 1065, "nochoice": 48}
    for r in records:
        v, right = rederive_verdict(r)
        assert v == r.verdict, (r.mention, r.verdict, v)
        assert right == r.right_in_candset_line, r.mention


def test_a8_correct_mention_counts(records):
    ref = {}
    for line in open(CORRECT_TXT, encoding="utf-8"):
        m = re.match(r"mention: (.*) count: (\d+)$", line.rstrip("\n"))
        if m:
            ref[m.group(1)] = int(m.group(2))
    ours = Counter(r.mention for r in records if r.verdict == "good")
    assert dict(ours) == ref


def test_extraction_sequence_parity(records):
    from reden_ray.sources.tei import tei_mentions

    contexts = parse_contexts(EVAL_TXT)
    mt = tei_mentions(INPUT_TEI).to_pandas()
    assert len(mt) == len(records) == 2980
    per_div: dict[int, list[str]] = {}
    for url, surface in zip(mt["url"], mt["surface"]):
        per_div.setdefault(int(url.rsplit("#div", 1)[1]), []).append(surface)
    assert len(per_div) == len(contexts) == 28
    for d, ctx in enumerate(contexts):
        assert per_div[d] == ctx, f"div {d}"


def test_a7_metrics_anchor(records):
    import pandas as pd

    from reden_ray.stages.evaluate import metrics_from_records

    df = pd.DataFrame({
        "url": [f"p{r.portion}" for r in records],
        "mention_id": range(len(records)),
        "surface": [r.mention for r in records],
        "gold_uri": [r.manual or None for r in records],
        "emitted_uris": [r.chosen or None for r in records],
        "n_candidates": [len(r.cand_sets) for r in records],
        "cand_uris": [" ".join(u for cs in r.cand_sets for u in cs)
                      for r in records],
        "choice_is_correct": [
            (r.verdict == "good") if r.manual else not r.chosen
            for r in records],
        "gold_in_candidates": [
            bool(r.manual) and any(
                r.manual.lower() in u.lower()
                for cs in r.cand_sets for u in cs)
            for r in records],
    })
    m = metrics_from_records(df)
    assert int(m["n_gold_linkable"]) == 1915
    assert int(m["n_gold_nil"]) == 1065
    # 906 good / 2753 system links; candidate recall as in the artifact
    assert abs(m["link_precision"] - 906 / 2753) < 1e-9
    assert abs(m["link_recall"] - 906 / 1915) < 1e-9
    assert abs(m["candidate_recall"] - 0.950392) < 1e-4
