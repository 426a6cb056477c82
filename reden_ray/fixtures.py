"""Deterministic synthetic fixtures: corpus + dictionary + KB + gold.

Reproduces the *shape* of the reference's conformance corpora (TEI files
with gold ``ref`` attributes + TSV alias dictionaries + N3 neighborhood
caches — see /root/reference/input/thibaudet_reflexions{,-gold}.xml and
src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:82-97) as Parquet
tables per FIXTURES.md. Pure functions of a seed; byte-stable output.

Construction guarantees (making expected argmax analytically known, cf.
the pruning rule CentralityHandler.java:100-122 and degree scoring
CentralityHandler.java:136-171):

* Entities live in disjoint *clusters*; each cluster has a hub node and
  ``knows`` edges between consecutive members. Within a cluster all
  family names are distinct; family names are shared ACROSS clusters,
  which is the only source of candidate ambiguity.
* Every page embeds >=2 gold entities from ONE cluster, so the cluster
  hub is adjacent to candidates of >=2 distinct mentions and survives
  pruning, giving every gold candidate degree >= 1.
* Decoy candidates (same family alias, other clusters) have only
  private neighbors (their own hub with 1 mention on this page; unique
  literals), which are pruned -> degree 0. Hence gold wins argmax.
* Odd entities attach their hub-membership triple to a sameAs-equivalent
  URI, so correct J4 (one-hop sameAs expansion,
  GraphHandlerNEL.java:114-197) is REQUIRED for parity.
* NIL mentions: gazetteer-known surfaces with no dictionary row.
* A "head" surface (skew): one unambiguous entity mentioned on a large
  fraction of pages, exercising salted-key canonicalization.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from . import CANONICAL_LABEL_PRED, MENTIONS_PRED
from .functions.alias import make_aliases, normalized_display_name
from .functions.text import normalize_surface, text_to_html

# Name material: invented, disjoint from the filler vocabulary below.
FIRST_NAMES = [
    "Alexandre", "Berthe", "Camille", "Denise", "Edmond", "Felicie", "Gaspard",
    "Honorine", "Isidore", "Josephine", "Klervi", "Leopold", "Mathilde", "Narcisse",
    "Odile", "Prosper", "Quentin", "Rosalie", "Severin", "Theodule",
]
# Unique last names are synthesized from syllables (16^3 combos); tokens
# are pure-alpha and disjoint from FILLER / NIL / first names.
_SYLLABLES = ["bal", "cor", "dun", "fal", "gri", "hol", "jat", "kel",
              "lum", "nov", "pol", "rud", "sel", "tor", "vul", "wim"]


def _unique_last_name(j: int) -> str:
    s = _SYLLABLES[(j // 256) % 16] + _SYLLABLES[(j // 16) % 16] + _SYLLABLES[j % 16]
    return s.capitalize()


PARTICLES = ["", "de", "von", "", "da", "", "d'", ""]
# NOTE: no single-letter words here — a lone "a" before a mention would
# merge into the initial-form alias "A <Last>" under greedy longest
# match (found by verification on seed 99), desynchronizing the gold
# mention inventory.
FILLER = (
    "the quick story follows one long road through winter fields and quiet rivers "
    "while every reader wonders what happens next in this small town where markets "
    "open early and letters arrive late carrying news about distant harbors"
).split()
NIL_SURFACES = ["Zorvath", "Quellin Morr", "Velgrane", "Ostrevent Kale"]
HEAD_SURFACE = "Globonia"
HEAD_URI = "http://kb.example/ent/head0"
LANGS = ["fr", "fr", "fr", "fr", "fr", "fr", "fr", "en", "en", "de"]

KB = "http://kb.example"
PRED_MEMBER = f"{KB}/onto#memberOf"
PRED_KNOWS = f"{KB}/onto#knows"
PRED_OCC = f"{KB}/onto#occupation"
PRED_ABSTRACT = f"{KB}/onto#abstract"
CLUSTER_SIZE = 8


@dataclass
class Entity:
    idx: int
    first: str
    last: str
    particle: str
    cluster: int
    base_uri: str
    equiv_uris: list[str]
    aliases: list[str] = field(default_factory=list)

    @property
    def all_uris(self) -> list[str]:
        return [self.base_uri, *self.equiv_uris]


def _build_entities(n_entities: int) -> list[Entity]:
    """Entities in clusters of CLUSTER_SIZE with a *sparse, bijective*
    ambiguity mapping.

    Every entity starts with a unique last name. Then for each cluster c
    and position p in {0,1,2}, the "source" entity (c, p) donates its
    last name to the "decoy target" entity ((c+1+p) % n_clusters, 5+p).
    Positions 3-4 stay unique; 5-7 only *receive* names. Hence every
    shared family name is shared by EXACTLY two entities in different
    clusters, and two ambiguous mentions on the same page always have
    their decoys in two DIFFERENT clusters — so each decoy is the only
    candidate in its cluster, its hub is pruned
    (CentralityHandler.java:100-122 rule) and its degree is 0, while the
    gold candidate keeps hub degree >= 1. The expected argmax is
    therefore analytically known.
    """
    if n_entities % CLUSTER_SIZE:
        raise ValueError(f"n_entities must be a multiple of {CLUSTER_SIZE}")
    n_clusters = n_entities // CLUSTER_SIZE
    if n_clusters < 7:
        raise ValueError("need >= 7 clusters (56 entities) for decoy-cluster disjointness")
    lasts = [_unique_last_name(j) for j in range(n_entities)]
    for c in range(n_clusters):
        for p in range(3):
            src = c * CLUSTER_SIZE + p
            tc = (c + 1 + p) % n_clusters
            if tc == c:
                continue
            tgt = tc * CLUSTER_SIZE + 5 + p
            lasts[tgt] = lasts[src]
    ents: list[Entity] = []
    for j in range(n_entities):
        cluster = j // CLUSTER_SIZE
        last = lasts[j]
        first = FIRST_NAMES[j % len(FIRST_NAMES)]
        particle = PARTICLES[j % len(PARTICLES)]
        base = f"{KB}/ent/{j:05d}"
        equiv = []
        if j % 2 == 0:
            equiv.append(f"http://dbp.example/resource/Ent{j}")
        if j % 3 == 0:
            equiv.append(f"http://idref.example/{j:05d}")
        e = Entity(j, first, last, particle, cluster, base, equiv)
        e.aliases = make_aliases(first, last, gender="M" if j % 2 else "F", particle=particle)
        ents.append(e)
    return ents


def build_dictionary_rows(entities: list[Entity]) -> list[dict]:
    rows = []
    for e in entities:
        canonical = normalized_display_name(e.first, e.last)
        for alias in e.aliases:
            rows.append(
                {
                    "surface": alias,
                    "surface_norm": normalize_surface(alias),
                    "canonical_name": canonical,
                    "entity_id": e.base_uri,
                    "uris": e.all_uris,
                    "ne_type": "PER",
                }
            )
    # Head entity: unambiguous, high-frequency (skew driver).
    rows.append(
        {
            "surface": HEAD_SURFACE,
            "surface_norm": normalize_surface(HEAD_SURFACE),
            "canonical_name": HEAD_SURFACE,
            "entity_id": HEAD_URI,
            "uris": [HEAD_URI],
            "ne_type": "LOC",
        }
    )
    return rows


def build_kb_rows(entities: list[Entity]) -> tuple[list[dict], list[dict]]:
    """Returns (kb_triples rows, sameas rows)."""
    kb: list[dict] = []
    sameas: list[dict] = []
    n_clusters = (len(entities) + CLUSTER_SIZE - 1) // CLUSTER_SIZE
    for e in entities:
        hub = f"{KB}/hub/{e.cluster:04d}"
        # Odd entities attach memberOf under an equivalent URI when one
        # exists -> exercises one-hop sameAs expansion (J4).
        member_subj = e.base_uri
        if e.idx % 2 == 1 and e.idx % 3 == 0:
            member_subj = e.equiv_uris[0]
        kb.append({"subj": member_subj, "pred": PRED_MEMBER, "obj": hub,
                   "obj_is_literal": False, "weight": 1.0})
        nxt = entities[(e.idx + 1) if (e.idx + 1) % CLUSTER_SIZE else (e.idx + 1 - CLUSTER_SIZE)]
        if nxt.cluster == e.cluster:
            kb.append({"subj": e.base_uri, "pred": PRED_KNOWS, "obj": nxt.base_uri,
                       "obj_is_literal": False, "weight": 1.0})
        kb.append({"subj": e.base_uri, "pred": PRED_OCC, "obj": f"occupation {e.idx}",
                   "obj_is_literal": True, "weight": 1.0})
        if e.equiv_uris:
            kb.append({"subj": e.equiv_uris[0], "pred": PRED_ABSTRACT,
                       "obj": f"abstract of entity {e.idx}", "obj_is_literal": True,
                       "weight": 1.0})
        for eq in e.equiv_uris:
            sameas.append({"uri": e.base_uri, "equiv_uri": eq})
    kb.append({"subj": HEAD_URI, "pred": PRED_OCC, "obj": "head place",
               "obj_is_literal": True, "weight": 1.0})
    del n_clusters
    return kb, sameas


def _page_text_and_mentions(
    rng: random.Random, entities: list[Entity], by_cluster: dict[int, list[Entity]]
) -> tuple[str, list[tuple[str, str | None]]]:
    """One page: returns (text, [(surface, gold_uri-or-None) in offset order]).

    Surfaces are embedded separated by >=1 filler token so the greedy
    longest-match gazetteer NER recovers exactly this inventory.
    """
    cluster = rng.randrange(len(by_cluster))
    members = by_cluster[cluster]
    k = rng.randint(2, min(5, len(members)))
    chosen = rng.sample(members, k)
    mentions: list[tuple[str, str | None]] = []
    for e in chosen:
        if rng.random() < 0.45:
            surface = e.last  # family-only -> ambiguous across clusters
        elif rng.random() < 0.5:
            surface = f"{e.first} {e.last}"  # full name -> unambiguous
        else:
            title = "M" if e.idx % 2 else "Mme"
            surface = f"{title}. {e.last}"
        mentions.append((surface, e.base_uri))
    if rng.random() < 0.30:
        mentions.append((HEAD_SURFACE, HEAD_URI))
    if rng.random() < 0.25:
        mentions.append((rng.choice(NIL_SURFACES), None))
    rng.shuffle(mentions)

    # Interleave with filler; 2-4 lines.
    tokens: list[str] = []
    spans: list[tuple[int, str, str | None]] = []  # (token_pos, surface, gold)
    for surface, gold in mentions:
        tokens.extend(rng.choices(FILLER, k=rng.randint(2, 6)))
        spans.append((len(tokens), surface, gold))
        tokens.extend(surface.split())
    tokens.extend(rng.choices(FILLER, k=rng.randint(2, 5)))
    n_lines = rng.randint(1, 3)
    # Choose line break positions that never split a mention.
    mention_token_pos = set()
    for pos, surface, _ in spans:
        for t in range(pos, pos + len(surface.split())):
            mention_token_pos.add(t)
    breakable = [i for i in range(1, len(tokens)) if i not in mention_token_pos and (i - 1) not in mention_token_pos]
    breaks = sorted(rng.sample(breakable, min(n_lines - 1, len(breakable)))) if n_lines > 1 else []
    parts: list[str] = []
    prev = 0
    for b in [*breaks, len(tokens)]:
        parts.append(" ".join(tokens[prev:b]))
        prev = b
    text = "\n".join(p for p in parts if p)
    # Mentions in character-offset order == token order (left to right).
    ordered = [(s, g) for _, s, g in sorted(spans, key=lambda x: x[0])]
    return text, ordered


def generate_fixture(
    out_dir: str | Path,
    n_pages: int = 1000,
    n_entities: int = 200,
    seed: int = 42,
) -> dict[str, str]:
    """Write pages/dictionary/kb_triples/sameas/gazetteer/gold_links/gold_triples
    Parquet under ``out_dir``. Returns {table: path}."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(seed)
    entities = _build_entities(n_entities)
    by_cluster: dict[int, list[Entity]] = {}
    for e in entities:
        by_cluster.setdefault(e.cluster, []).append(e)

    dico_rows = build_dictionary_rows(entities)
    kb_rows, sameas_rows = build_kb_rows(entities)

    pages = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    gold = {"url": [], "mention_id": [], "surface": [], "gold_uri": []}
    epoch = 1_700_000_000_000  # fixed ms epoch
    for i in range(n_pages):
        url = f"https://site{i % 50}.example/page/{i}"
        text, mentions = _page_text_and_mentions(rng, entities, by_cluster)
        pages["url"].append(url)
        pages["warc_ts"].append(epoch + i * 1000)
        pages["html"].append(text_to_html(text, title=f"Page {i}"))
        pages["text"].append(text)
        pages["lang"].append(LANGS[i % len(LANGS)])
        for mid, (surface, gold_uri) in enumerate(mentions):
            gold["url"].append(url)
            gold["mention_id"].append(mid)
            gold["surface"].append(surface)
            gold["gold_uri"].append(gold_uri)

    gazetteer_rows = [{"surface": r["surface"], "ne_type": r["ne_type"]} for r in dico_rows]
    seen = {r["surface"] for r in gazetteer_rows}
    for s in NIL_SURFACES:
        if s not in seen:
            gazetteer_rows.append({"surface": s, "ne_type": "PER"})

    paths: dict[str, str] = {}

    def write(name: str, table: pa.Table) -> None:
        p = out / f"{name}.parquet"
        pq.write_table(table, p)
        paths[name] = str(p)

    write(
        "pages",
        pa.table(
            {
                "url": pa.array(pages["url"], pa.string()),
                "warc_ts": pa.array(pages["warc_ts"], pa.timestamp("ms")),
                "html": pa.array(pages["html"], pa.binary()),
                "text": pa.array(pages["text"], pa.large_string()),
                "lang": pa.array(pages["lang"], pa.string()),
            }
        ),
    )
    write("dictionary", pa.Table.from_pylist(dico_rows, schema=pa.schema({
        "surface": pa.string(), "surface_norm": pa.string(),
        "canonical_name": pa.string(), "entity_id": pa.string(),
        "uris": pa.list_(pa.string()), "ne_type": pa.string()})))
    write("kb_triples", pa.Table.from_pylist(kb_rows, schema=pa.schema({
        "subj": pa.string(), "pred": pa.string(), "obj": pa.string(),
        "obj_is_literal": pa.bool_(), "weight": pa.float64()})))
    write("sameas", pa.Table.from_pylist(sameas_rows, schema=pa.schema({
        "uri": pa.string(), "equiv_uri": pa.string()})))
    write("gazetteer", pa.Table.from_pylist(gazetteer_rows, schema=pa.schema({
        "surface": pa.string(), "ne_type": pa.string()})))
    write("gold_links", pa.table({
        "url": pa.array(gold["url"], pa.string()),
        "mention_id": pa.array(gold["mention_id"], pa.int64()),
        "surface": pa.array(gold["surface"], pa.string()),
        "gold_uri": pa.array(gold["gold_uri"], pa.string()),
    }))

    # gold_triples: derived from gold_links + kb by the pipeline's own
    # canonicalization/dedup rules (FIXTURES.md §6).
    ent_by_uri = {e.base_uri: e for e in entities}
    triples: set[tuple[str, str, str]] = set()
    label_counts: dict[str, dict[str, int]] = {}
    linked_uris: set[str] = set()
    for url, surface, gold_uri in zip(gold["url"], gold["surface"], gold["gold_uri"]):
        if gold_uri is None:
            continue
        triples.add((url, MENTIONS_PRED, gold_uri))
        linked_uris.add(gold_uri)
        label_counts.setdefault(gold_uri, {})
        label_counts[gold_uri][surface] = label_counts[gold_uri].get(surface, 0) + 1
    for uri, counts in label_counts.items():
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        triples.add((uri, CANONICAL_LABEL_PRED, best))
    uri_to_base: dict[str, str] = {}
    for e in entities:
        for u in e.all_uris:
            uri_to_base[u] = e.base_uri
    uri_to_base[HEAD_URI] = HEAD_URI
    for row in kb_rows:
        base = uri_to_base.get(row["subj"])
        if base in linked_uris:
            triples.add((base, row["pred"], row["obj"]))
    del ent_by_uri
    tri = sorted(triples)
    write("gold_triples", pa.table({
        "subj": pa.array([t[0] for t in tri], pa.string()),
        "pred": pa.array([t[1] for t in tri], pa.string()),
        "obj": pa.array([t[2] for t in tri], pa.string()),
    }))
    return paths
