"""Block-level hygiene for bounded Datasets that feed ``Dataset.join``.

Ray's sort-shuffle ``groupby().map_groups()`` emits a ZERO-COLUMN empty
Arrow block for every empty output partition, ``repartition(n)`` keeps
(or re-mints) them whenever the Dataset has fewer than ``n`` rows, and
an identity ``map_batches`` passes them through untouched (empty blocks
skip the UDF). If such a block reaches either side of a hash-shuffle
``Dataset.join``, the join aggregator can receive a partition whose
concatenated table lacks the key column and dies inside
``HashShuffleAggregator.finalize`` with::

    pyarrow.lib.ArrowInvalid: No match or multiple matches for key
    field reference FieldRef.Name(<key>)

which surfaces as a nondeterministic pipeline failure on SMALL inputs
(big inputs rarely leave a partition empty). ``pin_nonempty`` is the
repo-wide fix: every bounded Dataset that feeds a join is pinned here
instead of with a bare ``.materialize()``.
"""

from __future__ import annotations

import pyarrow as pa


def pin_nonempty(ds):
    """Materialize a bounded Dataset and rebuild it from its non-empty
    blocks only. Metadata-only: block data never moves — the rebuilt
    Dataset references the same object-store blocks, so this costs one
    materialize (which the call sites already paid for pinning) plus a
    driver-side metadata scan, regardless of data size. Only call it on
    bounded (pair-/vocabulary-sized) Datasets: the materialize pins the
    whole input in the object store.

    A FULLY empty side is a separate problem this helper cannot fix:
    Ray 2.49's join drops empty shards, so an aggregator partition that
    receives none rebuilds a zero-column table and dies the same way
    EVEN IF every input block is typed. Callers whose join side can be
    legitimately empty must short-circuit on ``count() == 0``
    (pin first — count() on the pinned Dataset is metadata-only).
    """
    import ray.data as rd

    m = ds.materialize()
    refs, saw_empty = [], False
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
            else:
                saw_empty = True
    if not saw_empty or not refs:
        return m
    return rd.from_arrow_refs(refs)
