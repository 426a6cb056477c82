"""Reference-corpus parity: this engine's eval semantics vs REDEN's own
committed thibaudet run (VERDICT r04 "Next round" #3).

The reference checkout commits the full per-mention evaluation record of
a real REDEN run over input/thibaudet_reflexions.xml
(output/thibaudet_reflexions-resEvalV3.txt, written by
ResultsAndEvaluationNEL.java:244-346: 2,980 mentions with gold URI,
chosen URIs, verdict class, and the complete candidate sets) plus the
A8 correct-mention counts (-resCorrectMentionsV3.txt). The dictionary
TSVs and the N3 RDF cache that produced that run are NOT committed, so
the centrality *choices* cannot be recomputed offline — but everything
downstream of the choice can be verified mention-by-mention:

1. **Verdict parity (J5)**: re-derive every Good/Wrong/No-annotation
   verdict and every "Right referent in candidate set" line from the
   raw (gold, chosen, candidates) triples with THIS repo's rules
   (substring containment, case-insensitive candidate recall) and
   compare to the verdict REDEN printed. Expect 2,980/2,980.
2. **A8 parity**: recompute -resCorrectMentionsV3.txt (per-mention
   good-choice counts) and compare exactly.
3. **A7 metric suite** over the real run's records via
   stages/evaluate.metrics_from_records (the committed run predates the
   reference's stdout-only Hachey printout, so the values are recorded
   here as the authoritative numbers for this corpus).
4. **Extraction parity (S1-S3)**: tei_mentions() over the committed
   input TEI must reproduce, per //body/div context, the exact ordered
   mention sequence REDEN logged in each "Context was:" line.
5. **Candidate-generation parity (M1+J1)**: rebuild the dictionary from
   the artifact's own candidate sets, run THIS repo's
   generate_candidates over the tei_mentions, and compare the per-
   mention candidate sets against the artifact's.

Usage: python tools/thibaudet_parity.py [--out bench_evidence/r05_thibaudet_parity.json]
Requires /root/reference; exits 1 on any parity failure.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter
from dataclasses import dataclass, field

REF = os.environ.get("REDEN_REFERENCE", "/root/reference")
EVAL_TXT = f"{REF}/output/thibaudet_reflexions-resEvalV3.txt"
CORRECT_TXT = f"{REF}/output/thibaudet_reflexions-resCorrectMentionsV3.txt"
INPUT_TEI = f"{REF}/input/thibaudet_reflexions.xml"
OUT_TEI = f"{REF}/output/thibaudet_reflexions-outV3.xml"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class Record:
    portion: int
    mention: str
    manual: str          # "" = no manual annotation (NIL)
    chosen: str          # "" = REDEN chose nothing; else space-joined URIs
    verdict: str         # "good" | "wrong" | "nil" | "nochoice"
    right_in_candset_line: bool
    cand_sets: list[list[str]] = field(default_factory=list)


_REC_RE = re.compile(
    r"Mention: (?P<mention>.*?)\n"
    r"Manual was: (?P<manual>.*?)\n"
    r"REDEN chose: (?P<chosen>.*?)\n"
    r"(?P<verdict>Good choice\n|Wrong choice\n|No manual annotation\n)?"
    r"(?P<right>Right referent in candidate set but REDEN choose the wrong one\n)?"
    r"The candidate set is: \n"
    r"(?P<cands>(?:\[.*?\]\n)*)",
    re.S,
)


def parse_res_eval(path: str) -> list[Record]:
    text = open(path, encoding="utf-8").read()
    records: list[Record] = []
    portions = text.split("______________")
    for pi, chunk in enumerate(portions):
        for m in _REC_RE.finditer(chunk):
            v = (m.group("verdict") or "").strip()
            verdict = {"Good choice": "good", "Wrong choice": "wrong",
                       "No manual annotation": "nil", "": "nochoice"}[v]
            cands = [
                [u.strip() for u in line[1:-1].split(",")] if line != "[]" else []
                for line in m.group("cands").splitlines()
            ]
            records.append(Record(
                portion=pi,
                mention=" ".join(m.group("mention").split()),
                manual=m.group("manual").strip(),
                chosen=m.group("chosen").strip(),
                verdict=verdict,
                right_in_candset_line=bool(m.group("right")),
                cand_sets=cands,
            ))
    return records


def parse_contexts(path: str) -> list[list[str]]:
    """Ordered mention surfaces per text portion, from the
    'Context was:' trailer REDEN writes for every portion
    (ResultsAndEvaluationNEL.java:263,337). The trailer is the raw
    getTextContent of each mention comma-joined, so a mention whose TEI
    element contains an internal line break (e.g. 'François Ier' in
    thibaudet div 1) spans physical lines — parse per portion chunk,
    not per line, and collapse whitespace like tei_mentions does."""
    out = []
    for chunk in open(path, encoding="utf-8").read().split("______________"):
        i = chunk.find("Context was: ")
        if i < 0:
            continue
        body = chunk[i + len("Context was: "):]
        out.append([" ".join(s.split()) for s in body.split(",") if s.strip()])
    return out


def rederive_verdict(rec: Record) -> tuple[str, bool]:
    """THIS repo's J5 rules applied to the raw triple — mirrors both
    stages/evaluate.eval_records and the reference's writer logic
    (ResultsAndEvaluationNEL.java:276-321)."""
    if not rec.manual:
        return "nil", False
    in_candset = any(
        rec.manual.lower() in u.lower() for cs in rec.cand_sets for u in cs
    )
    if not rec.chosen:
        return "nochoice", in_candset  # Java prints the 'Right referent'
        # line for no-choice records too (the flag check is outside the
        # chosen-branch, :318-320)
    correct = rec.manual in rec.chosen
    return ("good" if correct else "wrong"), (in_candset and not correct)


def main() -> int:
    out_path = "bench_evidence/r05_thibaudet_parity.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if not os.path.exists(EVAL_TXT):
        print(f"reference artifact missing: {EVAL_TXT}")
        return 1

    import pandas as pd

    from reden_ray.sources.tei import tei_mentions
    from reden_ray.stages.evaluate import metrics_from_records

    report: dict = {"what": __doc__.splitlines()[0], "date": "2026-08-19",
                    "reference_artifacts": [EVAL_TXT, CORRECT_TXT, INPUT_TEI]}
    failures: list[str] = []

    # ---- 1. verdict parity -------------------------------------------------
    recs = parse_res_eval(EVAL_TXT)
    n = len(recs)
    verdict_mism, right_mism = [], []
    for i, r in enumerate(recs):
        v, rl = rederive_verdict(r)
        if v != r.verdict:
            verdict_mism.append((i, r.mention, r.verdict, v))
        if rl != r.right_in_candset_line:
            right_mism.append((i, r.mention, r.right_in_candset_line, rl))
    by_class = Counter(r.verdict for r in recs)
    report["verdict_parity"] = {
        "n_records_parsed": n,
        "by_class": dict(by_class),
        "verdict_mismatches": len(verdict_mism),
        "right_referent_line_mismatches": len(right_mism),
        "examples": [list(x) for x in (verdict_mism + right_mism)[:5]],
    }
    if n != 2980:
        failures.append(f"parsed {n} records, expected 2980")
    if verdict_mism or right_mism:
        failures.append(
            f"verdict mismatches: {len(verdict_mism)}, "
            f"right-referent-line mismatches: {len(right_mism)}")

    # ---- 2. A8 correct-mention counts -------------------------------------
    ref_counts: dict[str, int] = {}
    for line in open(CORRECT_TXT, encoding="utf-8"):
        m = re.match(r"mention: (.*) count: (\d+)$", line.rstrip("\n"))
        if m:
            ref_counts[m.group(1)] = int(m.group(2))
    ours = Counter(r.mention for r in recs if r.verdict == "good")
    a8_equal = dict(ours) == ref_counts
    report["a8_correct_mentions_parity"] = {
        "n_reference_mentions": len(ref_counts),
        "n_ours": len(ours),
        "exact_match": a8_equal,
        "diff": {k: [ref_counts.get(k), ours.get(k)]
                 for k in (set(ref_counts) ^ set(ours))
                 | {k for k in set(ref_counts) & set(ours)
                    if ref_counts[k] != ours[k]}},
    }
    if not a8_equal:
        failures.append("A8 correct-mention counts differ")

    # ---- 3. A7 metric suite over the real run -----------------------------
    df = pd.DataFrame({
        "url": [f"portion{r.portion}" for r in recs],
        "mention_id": range(n),
        "surface": [r.mention for r in recs],
        "gold_uri": [r.manual or None for r in recs],
        "chosen_uri": [r.chosen.split()[0] if r.chosen else None for r in recs],
        "emitted_uris": [r.chosen or None for r in recs],
        "n_candidates": [len(r.cand_sets) for r in recs],
        "cand_uris": [" ".join(u for cs in r.cand_sets for u in cs) for r in recs],
    })
    df["choice_is_correct"] = [
        (r.verdict == "good") if r.manual else not r.chosen for r in recs
    ]
    df["gold_in_candidates"] = [
        bool(r.manual) and any(r.manual.lower() in u.lower()
                               for cs in r.cand_sets for u in cs)
        for r in recs
    ]
    metrics = metrics_from_records(df)
    report["a7_metrics_of_reference_run"] = {k: round(v, 6)
                                             for k, v in metrics.items()}
    # sanity anchors from the raw file
    if int(metrics["n_gold_linkable"]) != 1915 or by_class["good"] != 906:
        failures.append("A7 anchor counts diverge from raw artifact")

    # ---- 4. extraction parity (S1-S3) --------------------------------------
    contexts = parse_contexts(EVAL_TXT)
    mt = tei_mentions(INPUT_TEI).to_pandas()
    div_ids = sorted({int(u.rsplit("#div", 1)[1]) for u in mt["url"]})
    per_div = {
        d: list(mt[mt["url"].str.endswith(f"#div{d}")]
                .sort_values("mention_id")["surface"])
        for d in div_ids
    }
    n_ctx = len(contexts)
    seq_mism = []
    for d in range(min(n_ctx, len(per_div))):
        if per_div.get(d, []) != contexts[d]:
            seq_mism.append(d)
    report["extraction_parity"] = {
        "n_portions_reference": n_ctx,
        "n_divs_ours": len(per_div),
        "n_mentions_ours": int(len(mt)),
        "n_mentions_reference": n,
        "portions_with_sequence_mismatch": len(seq_mism),
        "mismatch_portions": seq_mism[:10],
    }
    if len(per_div) != n_ctx or len(mt) != n or seq_mism:
        failures.append(
            f"extraction: divs {len(per_div)} vs {n_ctx} portions, "
            f"mentions {len(mt)} vs {n}, {len(seq_mism)} mismatched sequences")

    # ---- 5. candidate-generation parity (M1+J1) ----------------------------
    # Rebuild the dictionary from the artifact's own candidate sets.
    # REDEN's lookup is a pure function of the surface (global Lucene
    # index), so identical surfaces must have identical sets — verify,
    # then key by surface_norm.
    from reden_ray.functions.text import normalize_surface

    sets_by_surface: dict[str, list[list[str]]] = {}
    conflicts = []
    for r in recs:
        prev = sets_by_surface.get(r.mention)
        if prev is None:
            sets_by_surface[r.mention] = r.cand_sets
        elif prev != r.cand_sets:
            conflicts.append(r.mention)
    norm_conflicts = []
    dico_rows = []
    by_norm: dict[str, list[list[str]]] = {}
    for surf, sets in sets_by_surface.items():
        norm = normalize_surface(surf)
        if norm in by_norm and by_norm[norm] != sets:
            norm_conflicts.append(surf)
            continue
        if norm not in by_norm:
            by_norm[norm] = sets
            for cs in sets:
                dico_rows.append({
                    "surface": surf, "surface_norm": norm,
                    "canonical_name": surf,
                    "entity_id": cs[0] if cs else "",
                    "uris": cs, "ne_type": "PER",
                })
    report["dictionary_reconstruction"] = {
        "n_distinct_surfaces": len(sets_by_surface),
        "same_surface_set_conflicts": len(conflicts),
        "norm_collision_conflicts": sorted(set(norm_conflicts))[:10],
        "n_dico_rows": len(dico_rows),
    }
    if conflicts:
        failures.append(
            f"{len(conflicts)} surfaces with inconsistent candidate sets "
            "in the reference artifact itself")

    import pyarrow as pa
    import ray

    from reden_ray.stages.candidates import generate_candidates
    from reden_ray.state.broadcast import put_broadcast

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    index: dict[str, list[tuple[str, tuple[str, ...], str]]] = {}
    for row in dico_rows:
        index.setdefault(row["surface_norm"], []).append(
            (row["entity_id"], tuple(row["uris"]), row["ne_type"]))
    dico_ref = put_broadcast(index)
    mentions_ds = ray.data.from_arrow(pa.Table.from_pandas(
        mt[["url", "mention_id", "surface", "surface_norm"]]))
    cands = generate_candidates(mentions_ds, dico_ref).to_pandas()

    # per (div, mention_id) ordered candidate sets from OUR pipeline
    ours_by_key: dict[tuple[int, int], list[tuple[str, ...]]] = {}
    for _, row in cands.sort_values(["url", "mention_id", "cand_rank"]).iterrows():
        d = int(row["url"].rsplit("#div", 1)[1])
        ours_by_key.setdefault((d, int(row["mention_id"])), []).append(
            tuple(row["uris_str"].split(" ")))
    # reference per (portion, k-th mention) — positional alignment
    k_in_portion: Counter = Counter()
    cand_mism, checked = [], 0
    for r in recs:
        key = (r.portion, k_in_portion[r.portion])
        k_in_portion[r.portion] += 1
        if normalize_surface(r.mention) in {s for s in norm_conflicts}:
            continue
        ref_sets = [tuple(cs) for cs in r.cand_sets if cs != [""]]
        got = ours_by_key.get(key, [])
        checked += 1
        # D1: our stage dedups identical URI lists; REDEN's artifact can
        # repeat a set — compare as deduped sequences-preserving lists
        def dedup(seq):
            seen, out = set(), []
            for x in seq:
                if x not in seen:
                    seen.add(x)
                    out.append(x)
            return out
        if dedup(ref_sets) != dedup(got):
            cand_mism.append((r.portion, r.mention))
    report["candidate_generation_parity"] = {
        "n_mentions_checked": checked,
        "n_mismatches": len(cand_mism),
        "examples": [list(x) for x in cand_mism[:5]],
    }
    if cand_mism:
        failures.append(f"{len(cand_mism)} candidate-set mismatches")

    # ---- committed outV3.xml consistency note ------------------------------
    try:
        out_mt = tei_mentions(OUT_TEI).to_pandas()
        n_auto = int(out_mt["ref_auto"].notna().sum())
        report["outv3_note"] = {
            "n_mentions": int(len(out_mt)),
            "n_ref_auto": n_auto,
            "n_nonempty_chosen_in_eval": sum(1 for r in recs if r.chosen),
            "consistent_with_eval_artifact": None,
        }
        report["outv3_note"]["consistent_with_eval_artifact"] = (
            n_auto == sum(1 for r in recs if r.chosen))
    except Exception as e:  # outV3 is huge/odd; never fail parity on it
        report["outv3_note"] = {"error": str(e)[:200]}

    report["not_reproducible_offline"] = (
        "The centrality CHOICES themselves: the run's dictionary TSVs and "
        "N3 RDF cache are not committed in the reference checkout, so the "
        "fusion graphs cannot be rebuilt. Everything downstream of the "
        "choice (J5 verdicts, A8 counts, A7 metrics) and upstream of the "
        "KB (S1-S3 extraction, M1+J1 candidate generation) is verified "
        "mention-by-mention above.")
    report["pass"] = not failures
    report["failures"] = failures

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    print(json.dumps({k: report[k] for k in
                      ("verdict_parity", "a8_correct_mentions_parity",
                       "extraction_parity", "candidate_generation_parity",
                       "pass")}, indent=2, ensure_ascii=False))
    print(f"wrote {out_path}")
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
