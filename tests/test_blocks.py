"""pin_nonempty: schema-less empty-block hygiene for join inputs.

Regression for a nondeterministic ArrowInvalid ("No match or multiple
matches for key field reference") inside Ray's join aggregator when a
sort-shuffle groupby/map_groups output — which emits ZERO-COLUMN empty
blocks for empty partitions — fed a ``Dataset.join``.
"""

import pyarrow as pa
import ray
import ray.data as rd

from reden_ray.functions.blocks import pin_nonempty


def _poison(n_partitions: int = 16):
    """A 3-row Dataset whose materialized form carries zero-column
    empty blocks (sort-shuffle map_groups over many partitions)."""
    ds = rd.from_arrow(
        pa.table({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    ).repartition(n_partitions)
    return ds.groupby("k").map_groups(lambda df: df, batch_format="pandas")


def _block_stats(ds):
    m = ds.materialize()
    rows, zero_col_blocks = 0, 0
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            rows += meta.num_rows
            blk = ray.get(ref)
            ncols = len(getattr(blk, "schema", getattr(blk, "columns", [])))
            if ncols == 0:
                zero_col_blocks += 1
    return m, rows, zero_col_blocks


class TestPinNonempty:
    def test_map_groups_emits_poison_and_pin_removes_it(self):
        poison = _poison().materialize()
        _, rows, zero_before = _block_stats(poison)
        assert rows == 3
        # the mechanism under test: without poison blocks upstream this
        # regression can't bite (Ray may fix it someday — then this
        # assert tells us the helper can be retired)
        assert zero_before > 0
        clean, rows_after, zero_after = _block_stats(pin_nonempty(poison))
        assert rows_after == 3
        assert zero_after == 0
        assert sorted(clean.to_pandas()["k"].tolist()) == [1, 2, 3]

    def test_pinned_dataset_joins_repeatedly(self):
        clean = pin_nonempty(_poison())
        other = rd.from_arrow(pa.table({"k": [1, 2, 3], "w": ["a", "b", "c"]}))
        for _ in range(5):
            out = clean.join(other, join_type="inner", num_partitions=8,
                             on=("k",)).to_pandas()
            assert len(out) == 3

    def test_all_empty_dataset_passthrough(self):
        # joins against a FULLY empty side are a Ray 2.49 limitation the
        # helper can't fix (typed or not — empty shards get dropped and
        # the aggregator rebuilds a zero-column table); callers must
        # short-circuit on count()==0. The helper just stays harmless.
        ds = rd.from_arrow(pa.table({"k": pa.array([7], pa.int64())}))
        empty = ds.filter(lambda r: False).repartition(4)
        pinned = pin_nonempty(empty)
        assert pinned.count() == 0

    def test_clean_input_passthrough(self):
        ds = rd.from_arrow(pa.table({"k": [1, 2], "v": [1.0, 2.0]}))
        pinned = pin_nonempty(ds)
        assert pinned.count() == 2
