"""End-to-end NEL / KG-construction pipeline (reference Mode 1,
src/fr/lip6/reden/MainNELApp.java:79-373 — SURVEY.md §3.1/§3.4).

    read_parquet(pages)
      -> map_batches(extract_text)              stateless, drops html
      -> map_batches(GazetteerNER)              mentions
      -> map_batches(link_batch)                candidates + fusion graph
                                                + argmax FUSED, no shuffle
                                                (sort path for fragmented
                                                inputs: NELConfig.link_shuffle)
      -> canonical_labels + emit_triples        dedup'd (subj,pred,obj)

Everything is lazy; the caller consumes (write_parquet / to_pandas on
small results). Ray is NEVER initialised here — sessions belong to the
caller.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data as rd

from ..stages.candidates import generate_candidates, generate_candidates_packed
from ..stages.canonicalize import canonical_labels, emit_triples, label_partials
from ..stages.extract import extract_pages
from ..stages.linker import link_documents, link_documents_packed
from ..stages.ner import detect_mentions
from ..state.broadcast import (
    load_dictionary_index,
    load_gazetteer_surfaces,
    load_kb_index,
    load_sameas_index,
    put_broadcast,
)


def _parquet_bytes(path: str) -> int:
    """On-disk bytes of a Parquet file or directory of files."""
    from ..state.manifest import list_parquet_files

    return sum(f.stat().st_size for f in list_parquet_files(path) if f.exists())


@dataclass
class NELConfig:
    """Typed replacement for the reference's 16-key .properties contract
    (MainNELApp.java:104-123)."""

    measure: str = "degree"            # centralityMeasure
    prefered_uri_order: str = "ALL"    # preferedURIOrder
    rels: dict = field(default_factory=dict)  # -relsFile predicate weights
    # actor_pools=False (default): stateful stages run as elastic task
    # pools with per-worker-process state caches — same once-per-process
    # amortization, no pool ramp-up. True switches to explicit actor
    # pools sized by the concurrency tuples below (hard isolation; use
    # when a stage reserves GPUs / large memory).
    actor_pools: bool = False
    # Autoscaling actor pools (min, max): min=1 so several pools coexist
    # on small CPU budgets without deadlocking each other; max sized to
    # the node at bench time.
    ner_concurrency: int | tuple = (1, 4)
    cand_concurrency: int | tuple = (1, 4)
    extract_batch_size: int = 256
    ner_batch_size: int = 512
    # url-hash bucket count for the link shuffle (power of two); the
    # explicit partitioning knob for cluster sizing.
    link_buckets: int = 256
    # "none": link packed rows in place (whole-block packing guarantees
    # one packed row per url -> no shuffle needed; fastest).
    # "sort": url-hash bucket groupby (use when packed rows may be
    # fragmented, e.g. re-read from arbitrary Parquet).
    link_shuffle: str = "none"
    # Measured-size gates for the broadcast side state, in bytes of the
    # source Parquet (cheap stat, same pattern as relational.py's
    # BROADCAST_ROW_LIMIT dimension gate): a KB / dictionary whose
    # files exceed the limit is NOT collected into one object-store
    # entry — links() routes through the distributed joins instead
    # (stages/linker_join.py J3, candidates_via_join J1) and the
    # entity-triple branch through emit_entity_triples_via_join.
    # Parquet bytes understate the in-memory index (dict-of-lists
    # expansion is ~5-10x), so the default is conservative relative to
    # a worker heap. Tests force 0 to exercise the join path.
    kb_broadcast_limit_bytes: int = 256 << 20
    dico_broadcast_limit_bytes: int = 256 << 20
    # hash-join partition count for the gated join path
    join_partitions: int = 16
    # Semi-join reduction for the gated J3 / entity-triple KB joins:
    # when the dictionary IS broadcastable (the common over-gate-KB
    # shape: vocabulary-sized dictionary, DBpedia-scale KB), every
    # probe URI the join can emit is already known driver-side
    # (entity_id ∪ uris ∪ sameAs hops of those), so the KB side is
    # filtered map-side to possibly-matching subjects BEFORE its
    # shuffle — the "one unavoidable KB-sized exchange" ships only the
    # candidate neighborhoods. Gated off when the universe can't be
    # bounded: dictionary over ITS gate, sameAs too big to enumerate
    # driver-side, or more distinct probe URIs than the cap.
    kb_join_probe_filter: bool = True
    probe_filter_max_uris: int = 4_000_000
    probe_filter_sameas_limit_bytes: int = 64 << 20
    # Re-gate after reduction: a KB over its broadcast gate usually
    # fails it on NON-candidate mass (a DBpedia-class KB is ~99%
    # subjects no dictionary entry can ever probe). When the probe
    # universe is enumerable, the semi-join filter shrinks the KB to
    # candidate neighborhoods — whose measured size is re-checked
    # against the SAME gate. If the reduced KB fits, the fast fused
    # broadcast path runs against the reduced index (lossless: every
    # KB probe on the broadcast path — ent_rec / _entity_edges /
    # EntityTripleEmitter — draws from the universe). If it doesn't,
    # the already-filtered, pinned KB is handed to the distributed
    # joins so the reduction scan is never wasted. Forced-0 gates keep
    # exercising the pure join path (no reduced size passes a 0 limit).
    kb_reduced_broadcast: bool = True
    # S2 context granularity (the reference's xpathExpresion knob,
    # MainNELApp.java:222-231): None = whole page (//body); an int K =
    # K-word context windows (//body/div analog) — mentions, fusion
    # graphs and argmax all become per-window, and links carry a
    # ``ctx_id`` column.
    context_words: int | None = None


class NELPipeline:
    """Holds the broadcast side-state refs and composes the Dataset plan."""

    def __init__(self, fixture_dir: str, config: NELConfig | None = None):
        self.cfg = config or NELConfig()
        self.dir = fixture_dir
        self.dico_path = f"{fixture_dir}/dictionary.parquet"
        self.kb_path = f"{fixture_dir}/kb_triples.parquet"
        self.sameas_path = f"{fixture_dir}/sameas.parquet"
        # measured gates (file stat only — nothing is read to decide)
        self.kb_broadcastable = (
            _parquet_bytes(self.kb_path) + _parquet_bytes(self.sameas_path)
            <= self.cfg.kb_broadcast_limit_bytes)
        self.dico_broadcastable = (
            _parquet_bytes(self.dico_path) <= self.cfg.dico_broadcast_limit_bytes)
        self.dico_ref = (put_broadcast(load_dictionary_index(self.dico_path))
                         if self.dico_broadcastable else None)
        # the gazetteer is the NER model — vocabulary-sized by design,
        # always broadcast (a gazetteer is surface forms, not the KB)
        self.gaz_ref = put_broadcast(load_gazetteer_surfaces(f"{fixture_dir}/gazetteer.parquet"))
        self.kb_ref = (put_broadcast(load_kb_index(self.kb_path))
                       if self.kb_broadcastable else None)
        self.sameas_ref = (put_broadcast(load_sameas_index(self.sameas_path))
                           if self.kb_broadcastable else None)
        # routing record: "broadcast" (whole KB under the gate),
        # "reduced-broadcast" (over-gate KB, reduced neighborhoods
        # re-passed the gate), or "join" (distributed J3). Decided
        # lazily for over-gate KBs — None until links()/triples() run.
        self.kb_route = "broadcast" if self.kb_broadcastable else None

    def _try_reduced_broadcast(self) -> bool:
        """Attempt the reduced-KB re-gate (NELConfig.kb_reduced_broadcast).

        Runs the semi-join subject filter over the KB Parquet as a
        distributed map, pins the reduced rows, and measures them: under
        the gate, the fused broadcast path is unlocked by building the
        subj-keyed index from the reduced blocks (the in-memory Arrow
        measurement is the conservative side of the Parquet-byte gate —
        uncompressed Arrow ≥ Parquet for URI triples). Over the gate,
        the pinned reduced Dataset is stashed for the join path to use
        as its pre-filtered KB side, so the scan is never wasted —
        the join path would have run the identical filter anyway."""
        if self.kb_broadcastable:
            return True
        if getattr(self, "_reduced_tried", False):
            return self.kb_ref is not None
        self._reduced_tried = True
        self._reduced_kb_ds = None
        if (not self.cfg.kb_reduced_broadcast
                or self.cfg.kb_broadcast_limit_bytes <= 0):
            self.kb_route = "join"
            return False
        probe_ref = self.probe_universe_ref()
        if probe_ref is None:
            self.kb_route = "join"
            return False
        import pyarrow.compute as pc

        import ray

        from ..functions.blocks import pin_nonempty
        from ..state.broadcast import get_broadcast, kb_index_from_table

        def subj_in_universe(t, _ref=probe_ref):
            return t.filter(pc.is_in(t["subj"],
                                     value_set=get_broadcast(_ref)))

        reduced = pin_nonempty(
            rd.read_parquet(self.kb_path)
            .map_batches(subj_in_universe, batch_format="pyarrow"))
        if reduced.size_bytes() > self.cfg.kb_broadcast_limit_bytes:
            self._reduced_kb_ds = reduced
            self.kb_route = "join"
            return False
        idx: dict = {}
        for tbl in ray.get(reduced.to_arrow_refs()):
            kb_index_from_table(tbl, into=idx)
        self.kb_ref = put_broadcast(idx)
        # sameAs is bounded by probe_filter_sameas_limit_bytes here
        # (the universe requires it), so the whole table broadcasts
        self.sameas_ref = put_broadcast(load_sameas_index(self.sameas_path))
        self.kb_broadcastable = True
        self.kb_route = "reduced-broadcast"
        return True

    def _join_kb_ds(self):
        """KB Dataset for the distributed-join path: the pinned
        semi-join-reduced rows when a failed re-gate already produced
        them (the in-join filter stays on — idempotent and cheap on the
        reduced size, and it keeps the empty-KB short-circuit), else
        the raw Parquet."""
        stashed = getattr(self, "_reduced_kb_ds", None)
        return stashed if stashed is not None else rd.read_parquet(self.kb_path)

    def probe_universe_ref(self):
        """Broadcast ref to the probe-URI universe (Arrow string array)
        for the semi-join KB reduction, or None when it can't be
        soundly bounded (see NELConfig.kb_join_probe_filter). The
        universe is a superset of every URI the J3 link join and the
        entity-triple join can probe: dictionary entity_ids ∪ their
        equivalence lists ∪ sameAs targets of either. Computed once
        per pipeline from the same Parquet the probes derive from —
        losslessness of the inner-join filter follows by construction."""
        if getattr(self, "_probe_ref", None) is not None:
            return self._probe_ref if self._probe_ref is not False else None
        if not self.cfg.kb_join_probe_filter or not self.dico_broadcastable:
            self._probe_ref = False
            return None
        if (_parquet_bytes(self.sameas_path)
                > self.cfg.probe_filter_sameas_limit_bytes):
            self._probe_ref = False
            return None
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        d = pq.read_table(self.dico_path, columns=["entity_id", "uris"])
        ents = d["entity_id"].combine_chunks().cast(pa.string())
        flat = pc.list_flatten(d["uris"].combine_chunks()).cast(pa.string())
        base = pc.unique(pa.chunked_array([ents, flat]).combine_chunks())
        sa = pq.read_table(self.sameas_path, columns=["uri", "equiv_uri"])
        hops = (sa["equiv_uri"].combine_chunks().cast(pa.string())
                .filter(pc.is_in(sa["uri"].combine_chunks(), value_set=base)))
        universe = pc.unique(pa.chunked_array([base, hops]).combine_chunks())
        if len(universe) > self.cfg.probe_filter_max_uris:
            self._probe_ref = False
            return None
        self._probe_ref = put_broadcast(universe)
        return self._probe_ref

    # --- staged plans (each lazy) -------------------------------------
    def pages(self, pages_path: str | None = None):
        return rd.read_parquet(pages_path or f"{self.dir}/pages.parquet")

    def texts(self, pages_ds=None):
        ds = pages_ds if pages_ds is not None else self.pages()
        return extract_pages(ds, batch_size=self.cfg.extract_batch_size)

    def contexts(self, texts_ds=None):
        """Linking contexts: the texts themselves (page granularity) or
        minted (url, ctx) word windows under cfg.context_words."""
        ds = texts_ds if texts_ds is not None else self.texts()
        if self.cfg.context_words is None:
            return ds
        from ..stages.extract import split_contexts

        return split_contexts(ds, self.cfg.context_words)

    def mentions(self, texts_ds=None):
        ds = self.contexts(texts_ds)
        return detect_mentions(
            ds, self.gaz_ref,
            concurrency=self.cfg.ner_concurrency, batch_size=self.cfg.ner_batch_size,
            actor_pool=self.cfg.actor_pools,
        )

    def candidates(self, mentions_ds=None):
        ds = mentions_ds if mentions_ds is not None else self.mentions()
        if not self.dico_broadcastable:
            # J1 scale path: dictionary too large to broadcast — hash-
            # partitioned equi-join with rank determinism via dict_row
            from ..stages.candidates import candidates_via_join, dictionary_with_order

            return candidates_via_join(ds, dictionary_with_order(self.dico_path),
                                       num_partitions=self.cfg.join_partitions)
        return generate_candidates(ds, self.dico_ref,
                                   concurrency=self.cfg.cand_concurrency,
                                   actor_pool=self.cfg.actor_pools)

    def links(self, candidates_ds=None, mentions_ds=None):
        """links Dataset. With explicit row-form candidates, uses the
        row path; otherwise the packed per-url hot path (one shuffle
        row per page — see PackedCandidateGen) over ``mentions_ds``
        (default: this fixture's pages).

        When the measured KB size exceeds cfg.kb_broadcast_limit_bytes
        (kb_broadcastable=False), the reduced-KB re-gate runs first
        (cfg.kb_reduced_broadcast — see _try_reduced_broadcast): if the
        semi-join-reduced neighborhoods fit the gate, linking stays on
        the fused broadcast path against the reduced index; otherwise
        it routes through the distributed J3 join
        (stages/linker_join.py) — candidates likewise arrive via the J1
        join when the dictionary is over its gate. On that route, a
        caller-supplied ``candidates_ds`` must draw its candidate URIs
        from THIS fixture's dictionary/sameas tables (the standing
        pipeline contract — the broadcast path couples to the same
        tables): the semi-join KB reduction
        (cfg.kb_join_probe_filter) derives its probe universe from
        them.

        Under cfg.context_words the mention rows carry minted context
        keys; the returned links are remapped back to the page ``url``
        plus an int64 ``ctx_id`` column (mention_id is per-context)."""
        return self._ctx_unmap(self._links_raw(candidates_ds, mentions_ds))

    def _ctx_unmap(self, links_ds):
        if self.cfg.context_words is None:
            return links_ds
        from ..stages.extract import split_context_key

        return split_context_key(links_ds)

    def _links_raw(self, candidates_ds=None, mentions_ds=None):
        if not self.kb_broadcastable and not self._try_reduced_broadcast():
            cands = (candidates_ds if candidates_ds is not None
                     else self.candidates(mentions_ds))
            from ..functions.blocks import pin_nonempty
            from ..stages.linker_join import link_documents_via_join

            # pin_nonempty (not bare materialize): the J1 join path's
            # rank map_groups can emit schema-less empty blocks that
            # poison the J3 join's key resolution (see blocks.py)
            return link_documents_via_join(
                pin_nonempty(cands),
                self._join_kb_ds(),
                sameas_ds=rd.read_parquet(self.sameas_path),
                kb_subj_filter_ref=self.probe_universe_ref(),
                rels=self.cfg.rels,
                measure=self.cfg.measure,
                prefered_uri_order=self.cfg.prefered_uri_order,
                num_partitions=self.cfg.join_partitions,
                num_buckets=self.cfg.link_buckets,
            )
        if candidates_ds is None and not self.dico_broadcastable:
            # dictionary over its gate with a broadcastable KB: the
            # fused/packed paths need dico_ref (None here) — route
            # candidates through the J1 join, then the broadcast-KB row
            # linker. pin_nonempty for the same reason as the J3 branch.
            from ..functions.blocks import pin_nonempty

            candidates_ds = pin_nonempty(self.candidates(mentions_ds))
        if candidates_ds is not None:
            return link_documents(
                candidates_ds, self.kb_ref, self.sameas_ref, rels=self.cfg.rels,
                measure=self.cfg.measure,
                prefered_uri_order=self.cfg.prefered_uri_order,
                num_buckets=self.cfg.link_buckets,
            )
        src = mentions_ds if mentions_ds is not None else self.mentions()
        if self.cfg.link_shuffle == "none":
            # fused mentions->links: candidate gen runs inside the link
            # batch fn — no packing, no serialization, no sort. The
            # stage self-verifies url/block contiguity at runtime and
            # re-links any straddled urls through the sort path
            # (stats land in self.last_link_stats).
            from ..stages.linker import link_documents_from_mentions

            self.last_link_stats = {}
            ds = link_documents_from_mentions(
                src, self.dico_ref, self.kb_ref, self.sameas_ref,
                rels=self.cfg.rels, measure=self.cfg.measure,
                prefered_uri_order=self.cfg.prefered_uri_order,
                stats=self.last_link_stats,
            )
            # remember the exact dataset object: triples() can then skip
            # re-materializing it (it is a cheap filter view over the
            # blocks the fused stage already pinned). Context mode wraps
            # links in the ctx_id remap, so the identity check in
            # triples() only ever fires at page granularity — where the
            # url-aligned-block guarantee actually holds.
            self._last_fused_links = ds
            return ds
        packed = generate_candidates_packed(src, self.dico_ref, batch_size=8192)
        return link_documents_packed(
            packed, self.kb_ref, self.sameas_ref, rels=self.cfg.rels,
            measure=self.cfg.measure, prefered_uri_order=self.cfg.prefered_uri_order,
            num_buckets=self.cfg.link_buckets, shuffle="sort",
        )

    def triples(self, links_ds=None):
        ds = links_ds if links_ds is not None else self.links()
        # links feed two consumers (labels + triple emission): pin the
        # narrow link rows once instead of re-running the linker twice.
        # The at-scale production path checkpoints links to partitioned
        # Parquet instead (state/manifest.py) — that is also the resume
        # point. EXCEPTION: links straight off a clean fused run are
        # already a zero-copy filter over blocks the link stage pinned —
        # re-materializing would rewrite ~10 GiB into the object store;
        # each consumer's filter re-scan is cheaper, and the link stage
        # already measured the block ceiling for the fast-path guard.
        fused_clean = (
            ds is getattr(self, "_last_fused_links", None)
            and self.last_link_stats.get("fused_clean")
        )
        if not fused_clean:
            ds = ds.materialize()
        # One full links scan feeds BOTH small reduction branches
        # (canonical labels + distinct linked entities): the (uri,
        # surface, cnt) partials are ~vocabulary-sized, so pinning them
        # is free and saves a second 12M-row scan per run.
        partials = label_partials(ds).materialize()
        # Labels are one row per distinct linked uri — materialized
        # (vocabulary-sized) they double as the entity-emission list,
        # so the whole distinct-uri reduction disappears.
        labels = canonical_labels(ds, partials=partials).materialize()
        entities = labels.select_columns(["uri"])
        # Structured fast path: skips the D5 all-to-all on the full
        # triple stream. Its one cross-batch hazard — a url's link rows
        # split across blocks, duplicating (url, mentions, uri) —
        # requires Ray's dynamic block splitting to have cut a linker
        # bucket's output, which only happens when a block crosses the
        # split threshold. We CHECK the materialized link blocks
        # instead of assuming: under half the threshold -> skip the
        # extra (url, uri) dedup shuffle; at/over it -> keep the dedup
        # (exact in every regime). Raising cfg.link_buckets keeps
        # bucket outputs small on bigger corpora.
        from ray.data import DataContext

        target = DataContext.get_current().target_max_block_size or (128 << 20)
        if self.cfg.context_words is not None:
            # context granularity: a url's link rows live in DIFFERENT
            # ctx_key buckets, so the per-batch (url, uri) combiner is
            # never globally exact — always run the narrow pair dedup.
            needs_pair_dedup = True
        elif fused_clean and self.last_link_stats.get("url_aligned_blocks"):
            # The fused link stage yields url-aligned chunks bounded
            # well under the 0.5x-target slice threshold, so every
            # materialized link block is url-aligned by construction
            # (see linker._FUSED_CHUNK_BYTES) — with zero straddled
            # urls the per-batch pair combiner is globally exact and
            # the (url, uri) dedup shuffle is pure overhead (~12 s of
            # poorly-scaling all-to-all at 2.4M pages / 32 CPUs).
            needs_pair_dedup = False
        else:
            max_block = 0
            for bundle in ds.iter_internal_ref_bundles():
                for meta in bundle.metadata:
                    max_block = max(max_block, meta.size_bytes or 0)
            needs_pair_dedup = max_block >= target // 2
        if self.kb_ref is None and not self._try_reduced_broadcast():
            # gated join mode: entity triples via the distributed join
            return emit_triples(
                ds, labels, None, None, global_dedup=False,
                mention_pair_dedup=needs_pair_dedup,
                partials=partials, entities_ds=entities,
                kb_ds=self._join_kb_ds(),
                sameas_ds=rd.read_parquet(self.sameas_path),
                kb_subj_filter_ref=self.probe_universe_ref())
        return emit_triples(ds, labels, self.kb_ref, self.sameas_ref,
                            global_dedup=False,
                            mention_pair_dedup=needs_pair_dedup,
                            partials=partials, entities_ds=entities)


def run_nel(fixture_dir: str, config: NELConfig | None = None):
    """Convenience: returns the lazy triples Dataset for a fixture dir."""
    return NELPipeline(fixture_dir, config).triples()
