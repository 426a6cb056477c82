"""Evaluation harness (J5 + A7): links vs gold, triples vs gold.

Parity rules ported from the reference:
* correctness of a link = the gold URI is SUBSTRING-contained in the
  emitted URI list (src/fr/lip6/reden/nelinker/ResultsAndEvaluationNEL.java:291);
  candidate recall uses case-insensitive containment (:282).
* alignment is on the stable (url, mention_id) key instead of the
  reference's positional DOM alignment (:251-257).
* metric families follow computeFinalResults (:393-557; Hachey et al.
  2011): candidate cardinality, candidate precision/recall, NIL
  precision/recall, disambiguation accuracy, overall linking accuracy.

Gold sets are evaluation-sized (the reference's largest is 3,404
mentions), so the join + scalar aggregation run driver-side in pandas
after materializing the two small frames.
"""

from __future__ import annotations

import pandas as pd


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def filter_to_gold_keys(ds_or_df, gold: pd.DataFrame) -> pd.DataFrame:
    """Pre-filter a (possibly corpus-scale) links/candidates Dataset to
    the gold (url, mention_id) keys BEFORE materializing: the gold side
    is evaluation-sized (reference max 3,404 mentions), so its key set
    broadcasts; only the matching rows ever reach the driver."""
    if isinstance(ds_or_df, pd.DataFrame):
        keys = set(zip(gold["url"], gold["mention_id"]))
        mask = [
            (u, m) in keys
            for u, m in zip(ds_or_df["url"], ds_or_df["mention_id"])
        ]
        return ds_or_df[pd.Series(mask, index=ds_or_df.index)]

    import ray

    from ..state.broadcast import get_broadcast

    keys_ref = ray.put(set(zip(gold["url"], gold["mention_id"])))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        keys = get_broadcast(keys_ref)
        mask = [(u, m) in keys for u, m in zip(df["url"], df["mention_id"])]
        return df[pd.Series(mask, index=df.index)]

    return ds_or_df.map_batches(pick, batch_format="pandas").to_pandas()


def eval_records(links, gold_links, candidates=None) -> pd.DataFrame:
    """Per-mention eval verdict table — the reference's EvalInfo rows
    (src/fr/lip6/reden/nelinker/EvalInfo.java:11-57, written by
    ResultsAndEvaluationNEL.java:269-307): one row per gold mention with
    the candidate set, the chosen URI, and the correctness flags. This
    is the artifact you debug a bad link with; the A7 scalar metrics
    recompute exactly from it (metrics_from_records, tested).

    Columns: url, mention_id, surface, gold_uri (manualURI; null=NIL),
    chosen_uri, emitted_uris (space-joined equivalence list), n_candidates,
    cand_uris (space-joined), choice_is_correct, gold_in_candidates.
    """
    gold = _to_pandas(gold_links)
    links = filter_to_gold_keys(links, gold).copy()
    links["emitted_uris"] = links["all_uris"].map(lambda us: " ".join(us))
    if "uri" not in links.columns:  # minimal links tables (reports path)
        links["uri"] = links["all_uris"].map(lambda us: us[0] if len(us) else None)
    merged = gold.merge(
        links[["url", "mention_id", "uri", "emitted_uris"]],
        on=["url", "mention_id"], how="left",
    ).rename(columns={"uri": "chosen_uri"})

    has_link = merged["emitted_uris"].notna()
    is_nil = merged["gold_uri"].isna()
    # J5 substring rule (ResultsAndEvaluationNEL.java:291); a NIL gold
    # is correct exactly when the system emitted no link.
    correct = pd.Series(
        [
            (not h) if n else (h and isinstance(e, str) and g in e)
            for g, e, h, n in zip(
                merged["gold_uri"], merged["emitted_uris"], has_link, is_nil
            )
        ],
        index=merged.index,
    )
    merged["choice_is_correct"] = correct

    if candidates is not None:
        cands = filter_to_gold_keys(_to_pandas(candidates), gold)
        uris_col = "uris_str" if "uris_str" in cands.columns else "uris"
        joiner = (
            (lambda s: " ".join(s))
            if uris_col == "uris_str"
            else (lambda s: " ".join(u for us in s for u in us))
        )
        per_mention = (
            cands.groupby(["url", "mention_id"])
            .agg(n_candidates=("cand_rank", "size"), cand_uris=(uris_col, joiner))
            .reset_index()
        )
        merged = merged.merge(per_mention, on=["url", "mention_id"], how="left")
        merged["n_candidates"] = merged["n_candidates"].fillna(0).astype("int64")
        merged["cand_uris"] = merged["cand_uris"].fillna("")
        # case-insensitive containment (:282)
        merged["gold_in_candidates"] = [
            bool(g) and isinstance(g, str) and g.lower() in c.lower()
            for g, c in zip(merged["gold_uri"].fillna(""), merged["cand_uris"])
        ]
    else:
        merged["n_candidates"] = 0
        merged["cand_uris"] = ""
        merged["gold_in_candidates"] = False

    cols = ["url", "mention_id", "surface", "gold_uri", "chosen_uri",
            "emitted_uris", "n_candidates", "cand_uris",
            "choice_is_correct", "gold_in_candidates"]
    out = merged[[c for c in cols if c in merged.columns]]
    return out.sort_values(["url", "mention_id"], kind="stable").reset_index(drop=True)


def metrics_from_records(records: pd.DataFrame) -> dict[str, float]:
    """Recompute the A7 Hachey metric families from the EvalInfo rows —
    identical to ``evaluate_links`` output (asserted in tests)."""
    r = records
    is_nil = r["gold_uri"].isna()
    has_link = r["emitted_uris"].notna()
    n_gold_linkable = int((~is_nil).sum())
    n_gold_nil = int(is_nil.sum())
    n_correct_links = int((r["choice_is_correct"] & ~is_nil & has_link).sum())
    n_sys_links = int(has_link.sum())
    n_correct_nil = int((is_nil & ~has_link).sum())
    n_sys_nil = int((~has_link).sum())
    metrics = {
        "n_gold_mentions": float(len(r)),
        "n_gold_linkable": float(n_gold_linkable),
        "n_gold_nil": float(n_gold_nil),
        "n_sys_links": float(n_sys_links),
        "link_precision": n_correct_links / n_sys_links if n_sys_links else 0.0,
        "link_recall": n_correct_links / n_gold_linkable if n_gold_linkable else 0.0,
        "nil_precision": n_correct_nil / n_sys_nil if n_sys_nil else 0.0,
        "nil_recall": n_correct_nil / n_gold_nil if n_gold_nil else 0.0,
        "linking_accuracy": (n_correct_links + n_correct_nil) / len(r) if len(r) else 0.0,
    }
    if (r["n_candidates"] > 0).any() or r["cand_uris"].astype(bool).any():
        linkable = r[~is_nil]
        metrics["candidate_count_mean"] = (
            float(r["n_candidates"].mean()) if len(r) else 0.0)
        metrics["candidate_recall"] = (
            float(linkable["gold_in_candidates"].sum()) / len(linkable)
            if len(linkable) else 0.0)
        ambig = linkable[(linkable["n_candidates"] >= 2)
                         & linkable["gold_in_candidates"]]
        metrics["disambiguation_accuracy"] = (
            float((ambig["choice_is_correct"]).sum()) / len(ambig)
            if len(ambig) else 1.0)
    return metrics


def evaluate_links(links, gold_links, candidates=None) -> dict[str, float]:
    """A7 metric suite. ``links``/``gold_links``/``candidates`` are
    Datasets or DataFrames; gold rows with null gold_uri are NIL."""
    links = _to_pandas(links)
    gold = _to_pandas(gold_links)
    links = links.copy()
    links["emitted"] = links["all_uris"].map(lambda us: " ".join(us))
    merged = gold.merge(
        links[["url", "mention_id", "uri", "emitted"]],
        on=["url", "mention_id"],
        how="left",
    )
    is_nil_gold = merged["gold_uri"].isna()
    has_link = merged["emitted"].notna()

    def contains(row) -> bool:
        return isinstance(row["emitted"], str) and row["gold_uri"] in row["emitted"]

    correct_link = merged[~is_nil_gold & has_link].apply(contains, axis=1)
    n_gold_linkable = int((~is_nil_gold).sum())
    n_gold_nil = int(is_nil_gold.sum())
    n_correct_links = int(correct_link.sum()) if len(correct_link) else 0
    n_sys_links = int(has_link.sum())
    n_correct_nil = int((is_nil_gold & ~has_link).sum())
    n_sys_nil = int((~has_link).sum())

    metrics: dict[str, float] = {
        "n_gold_mentions": float(len(merged)),
        "n_gold_linkable": float(n_gold_linkable),
        "n_gold_nil": float(n_gold_nil),
        "n_sys_links": float(n_sys_links),
        "link_precision": n_correct_links / n_sys_links if n_sys_links else 0.0,
        "link_recall": n_correct_links / n_gold_linkable if n_gold_linkable else 0.0,
        "nil_precision": n_correct_nil / n_sys_nil if n_sys_nil else 0.0,
        "nil_recall": n_correct_nil / n_gold_nil if n_gold_nil else 0.0,
        "linking_accuracy": (n_correct_links + n_correct_nil) / len(merged)
        if len(merged)
        else 0.0,
    }

    if candidates is not None:
        cands = _to_pandas(candidates)
        uris_col = "uris_str" if "uris_str" in cands.columns else "uris"
        joiner = (
            (lambda s: " ".join(s))
            if uris_col == "uris_str"
            else (lambda s: " ".join(u for us in s for u in us))
        )
        per_mention = (
            cands.groupby(["url", "mention_id"])
            .agg(n_cand=("cand_rank", "size"), cand_uris=(uris_col, joiner))
            .reset_index()
        )
        cm = gold.merge(per_mention, on=["url", "mention_id"], how="left")
        cm["n_cand"] = cm["n_cand"].fillna(0)
        linkable = cm[cm["gold_uri"].notna()]
        in_cand = linkable.apply(
            lambda r: isinstance(r["cand_uris"], str)
            and r["gold_uri"].lower() in r["cand_uris"].lower(),
            axis=1,
        )
        metrics["candidate_count_mean"] = float(cm["n_cand"].mean()) if len(cm) else 0.0
        metrics["candidate_recall"] = (
            float(in_cand.sum()) / len(linkable) if len(linkable) else 0.0
        )
        # disambiguation accuracy: among >=2-candidate mentions whose
        # candidate set contains gold, fraction linked correctly.
        ambig = linkable[(linkable["n_cand"] >= 2) & in_cand]
        if len(ambig):
            am = ambig.merge(
                links[["url", "mention_id", "emitted"]], on=["url", "mention_id"], how="left"
            )
            ok = am.apply(
                lambda r: isinstance(r["emitted"], str) and r["gold_uri"] in r["emitted"],
                axis=1,
            )
            metrics["disambiguation_accuracy"] = float(ok.sum()) / len(am)
        else:
            metrics["disambiguation_accuracy"] = 1.0
    return metrics


def triple_prf(emitted, gold) -> dict[str, float]:
    """Exact-set precision / recall / F1 over (subj, pred, obj)."""
    e = _to_pandas(emitted)
    g = _to_pandas(gold)
    eset = set(zip(e["subj"], e["pred"], e["obj"]))
    gset = set(zip(g["subj"], g["pred"], g["obj"]))
    inter = len(eset & gset)
    p = inter / len(eset) if eset else 0.0
    r = inter / len(gset) if gset else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "n_emitted": float(len(eset)), "n_gold": float(len(gset))}
