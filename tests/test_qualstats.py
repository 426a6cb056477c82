"""Integer-Chebyshev outliers and hashed-vocab chi-square drift tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from reden_ray.pipelines.qualstats import (
    _DRIFT_BUCKETS, _DRIFT_SCALE, length_outliers, source_drift,
    source_moments,
)


def _docs(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestLengthOutliers:
    def test_planted_outlier_flagged(self):
        rows = [{"doc_id": i, "source": "a", "n_chars": 100 + (i % 5)}
                for i in range(50)]
        rows.append({"doc_id": 99, "source": "a", "n_chars": 5000})
        out = length_outliers(_docs(rows)).to_pandas()
        assert list(out["doc_id"]) == [99]

    def test_all_equal_no_flags(self):
        rows = [{"doc_id": i, "source": "a", "n_chars": 7} for i in range(10)]
        out = length_outliers(_docs(rows)).to_pandas()
        assert len(out) == 0

    def test_per_source_scoping(self):
        # 400 is an outlier for tight source a, normal for wide source b
        rows = [{"doc_id": i, "source": "a", "n_chars": 100 + (i % 3)}
                for i in range(30)]
        rows += [{"doc_id": 100 + i, "source": "b",
                  "n_chars": [50, 400, 800][i % 3]} for i in range(30)]
        rows.append({"doc_id": 999, "source": "a", "n_chars": 400})
        out = length_outliers(_docs(rows)).to_pandas()
        assert 999 in set(out["doc_id"])
        assert not (set(out["doc_id"]) & set(range(100, 130)))

    def test_matches_exact_integer_rule(self):
        rng = np.random.RandomState(3)
        rows = [{"doc_id": i, "source": f"s{i % 3}",
                 "n_chars": int(rng.randint(10, 2000))} for i in range(200)]
        out = set(length_outliers(_docs(rows)).to_pandas()["doc_id"])
        df = pd.DataFrame(rows)
        exp = set()
        for src, g in df.groupby("source"):
            n = len(g)
            s = int(g["n_chars"].sum())
            ss = int((g["n_chars"].astype(object) ** 2).sum())
            rhs = 9 * (n * ss - s * s)
            for _, r in g.iterrows():
                if 4 * (int(r["n_chars"]) * n - s) ** 2 > rhs:
                    exp.add(int(r["doc_id"]))
        assert out == exp

    def test_moments_block_split_invariant(self):
        rows = [{"doc_id": i, "source": "a", "n_chars": i * 13 % 997}
                for i in range(100)]
        one = source_moments(_docs(rows)).to_pandas()
        many = source_moments(_docs(rows).repartition(7)).to_pandas()
        assert one.sort_values("k").reset_index(drop=True).equals(
            many.sort_values("k").reset_index(drop=True))


def _brute_drift(rows):
    """Independent reimplementation of the integer chi-square."""
    from reden_ray.pipelines.selection import _word_buckets

    cells = {}
    for r in rows:
        for w in r["text"].split(" "):
            if not w:
                continue
            b = int(_word_buckets(np.array([w], dtype=object))[0])
            cells[(r["source"], b)] = cells.get((r["source"], b), 0) + 1
    tb, ssum, tt = {}, {}, 0
    for (k, b), c in cells.items():
        tb[b] = tb.get(b, 0) + c
        ssum[k] = ssum.get(k, 0) + c
        tt += c
    out = {}
    for k, s in ssum.items():
        chi = 0
        for b, t in tb.items():
            c = cells.get((k, b), 0)
            chi += _DRIFT_SCALE * (c * tt - s * t) ** 2 // (s * t * tt)
        out[k] = chi
    return out


class TestSourceDrift:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(5)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        rows = [{"doc_id": i, "source": f"s{i % 2}",
                 "text": " ".join(rng.choice(vocab, 12))}
                for i in range(40)]
        got = source_drift(_docs(rows)).set_index("source")["chi_e6"].to_dict()
        assert got == _brute_drift(rows)

    def test_divergent_source_scores_higher(self):
        base = [{"doc_id": i, "source": "same1" if i % 2 else "same2",
                 "text": "the quick brown fox " * 5} for i in range(40)]
        odd = [{"doc_id": 100 + i, "source": "odd",
                "text": "zzzqx wvvk jjy " * 5} for i in range(20)]
        df = source_drift(_docs(base + odd)).set_index("source")["chi_e6"]
        assert df["odd"] > df["same1"]
        assert df["odd"] > df["same2"]

    def test_block_split_invariant(self):
        rows = [{"doc_id": i, "source": f"s{i % 3}",
                 "text": f"tok{i % 7} tok{i % 11} tok{i % 13}"}
                for i in range(60)]
        one = source_drift(_docs(rows))
        many = source_drift(_docs(rows).repartition(8))
        assert one.sort_values("source").reset_index(drop=True).equals(
            many.sort_values("source").reset_index(drop=True))


from reden_ray.pipelines.qualstats import _disc_median, mad_outliers


class TestMadOutliers:
    def test_disc_median_matches_duckdb_convention(self):
        import duckdb
        rng = np.random.RandomState(9)
        for _ in range(20):
            vals = rng.randint(0, 50, size=rng.randint(1, 30))
            v, c = np.unique(vals, return_counts=True)
            got = _disc_median(v, c.astype(np.int64))
            con = duckdb.connect()
            exp = con.execute(
                "SELECT quantile_disc(x, 0.5) FROM (SELECT unnest(?) x)",
                [vals.tolist()]).fetchone()[0]
            assert got == exp, (vals, got, exp)

    def test_planted_outlier_robust_to_contamination(self):
        # mean/std (q97) get dragged by a huge outlier; MAD does not:
        # with 10% contamination the MAD flag still fires on all of it
        rows = [{"doc_id": i, "source": "a", "n_chars": 100 + (i % 7)}
                for i in range(45)]
        rows += [{"doc_id": 900 + i, "source": "a", "n_chars": 90_000}
                 for i in range(5)]
        out = mad_outliers(_docs(rows)).to_pandas()
        assert set(out["doc_id"]) == {900, 901, 902, 903, 904}

    def test_zero_mad_flags_everything_off_median(self):
        rows = [{"doc_id": i, "source": "a", "n_chars": 5} for i in range(9)]
        rows.append({"doc_id": 99, "source": "a", "n_chars": 6})
        out = mad_outliers(_docs(rows)).to_pandas()
        assert list(out["doc_id"]) == [99]  # MAD=0 -> any deviation flags

    def test_block_split_invariant(self):
        rng = np.random.RandomState(31)
        rows = [{"doc_id": i, "source": f"s{i % 3}",
                 "n_chars": int(rng.randint(10, 500))} for i in range(120)]
        one = mad_outliers(_docs(rows)).to_pandas()
        many = mad_outliers(_docs(rows).repartition(7)).to_pandas()
        key = ["doc_id", "n_chars", "source"]
        assert one[key].sort_values(key).reset_index(drop=True).equals(
            many[key].sort_values(key).reset_index(drop=True))


from reden_ray.pipelines.qualstats import source_affinity


class TestSourceAffinity:
    def test_identical_sources_maximal_cosine(self):
        rows = [{"doc_id": i, "source": "a" if i % 2 else "b",
                 "text": "tok1 tok2 tok3 tok4"} for i in range(20)]
        df = source_affinity(_docs(rows))
        r = df.iloc[0]
        # identical distributions: dot^2 == na2 * nb2 (cosine exactly 1)
        assert r["dot"] ** 2 == r["na2"] * r["nb2"]

    def test_matches_bruteforce(self):
        rng = np.random.RandomState(61)
        vocab = [f"w{i}" for i in range(30)]
        rows = [{"doc_id": i, "source": f"s{i % 3}",
                 "text": " ".join(rng.choice(vocab, 15))}
                for i in range(60)]
        df = source_affinity(_docs(rows)).set_index(["src_a", "src_b"])
        from reden_ray.pipelines.selection import _word_buckets
        vecs = {}
        for r in rows:
            v = vecs.setdefault(r["source"], np.zeros(64, dtype=np.int64))
            for w in r["text"].split(" "):
                v[int(_word_buckets(np.array([w], dtype=object))[0])] += 1
        for a in vecs:
            for b in vecs:
                if a < b:
                    got = df.loc[(a, b)]
                    assert got["dot"] == int(np.dot(vecs[a], vecs[b]))
                    assert got["na2"] == int(np.dot(vecs[a], vecs[a]))
                    assert got["nb2"] == int(np.dot(vecs[b], vecs[b]))


from reden_ray.pipelines.qualstats import vocab_novelty


class TestVocabNovelty:
    def _run(self, rows):
        return {int(r["day"]): int(r["n_new"]) for _, r in
                vocab_novelty(_docs(rows)).iterrows()}

    def test_first_appearance_attribution(self):
        rows = [
            {"doc_id": 0, "day": 0, "text": "alpha beta"},
            {"doc_id": 1, "day": 1, "text": "beta gamma"},   # gamma new
            {"doc_id": 2, "day": 2, "text": "alpha beta"},   # nothing new
            {"doc_id": 3, "day": 2, "text": "delta"},
        ]
        assert self._run(rows) == {0: 2, 1: 1, 2: 1}

    def test_out_of_order_days_take_min(self):
        rows = [
            {"doc_id": 0, "day": 5, "text": "late"},
            {"doc_id": 1, "day": 2, "text": "late"},  # earlier sighting
        ]
        assert self._run(rows) == {2: 1}

    def test_block_split_invariant(self):
        rows = [{"doc_id": i, "day": i % 6,
                 "text": f"w{i % 17} w{i % 23}"} for i in range(120)]
        one = vocab_novelty(_docs(rows))
        many = vocab_novelty(_docs(rows).repartition(9))
        assert one.sort_values("day").reset_index(drop=True).equals(
            many.sort_values("day").reset_index(drop=True))
