"""Funnel stages, weighted sampling, BPE pair counts, grouped exact
distinct — planted cases + random differentials vs in-memory truth."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sylk.stages.aggregate import grouped_distinct_count
from sylk.stages.funnel import funnel_stages, grouped_min
from sylk.stages.sample import balanced_resample, weighted_priority_sample
from sylk.stages.text import bpe_pair_counts, char_pair_count_partial


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "t_us"])
    return ray.data.from_pandas(df).repartition(3)


def test_funnel_strictly_after(ray_session):
    rows = [
        # u1 completes all three in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE view -> stage stops at view
        (2, "click", 5), (2, "view", 10),
        # u3: click at EXACTLY t_view (not strictly after) -> stage 1
        (3, "view", 10), (3, "click", 10),
        # u4: never viewed but active -> stage 0
        (4, "purchase", 50),
        # u5: first-touch view is t=10; the click at 15 counts even
        # though a later view at 20 exists; purchase before click -> 2
        (5, "view", 10), (5, "click", 15), (5, "view", 20),
        (5, "purchase", 12),
    ]
    out = funnel_stages(_events(rows), ("view", "click", "purchase"),
                        key="user_id").to_pandas()
    out = out.set_index("user_id").sort_index()
    assert out["stage"].tolist() == [3, 1, 1, 0, 2]
    assert out.loc[1, ["t_view", "t_click", "t_purchase"]].tolist() == \
        [10, 20, 30]
    assert out.loc[3, ["t_click", "t_purchase"]].tolist() == [-1, -1]
    assert out.loc[5, ["t_view", "t_click", "t_purchase"]].tolist() == \
        [10, 15, -1]


def test_funnel_random_differential(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "event_type": rng.choice(["view", "click", "purchase", "other"],
                                 n),
        "t_us": rng.integers(0, 10_000, n),
    })
    got = funnel_stages(ray.data.from_pandas(df).repartition(5),
                        ("view", "click", "purchase"),
                        key="user_id").to_pandas()
    got = got.set_index("user_id").sort_index()

    for uid, g in df.groupby("user_id"):
        t1 = g.loc[g.event_type == "view", "t_us"].min()
        exp = [-1, -1, -1]
        if pd.notna(t1):
            exp[0] = int(t1)
            c = g.loc[(g.event_type == "click") & (g.t_us > t1), "t_us"]
            if len(c):
                exp[1] = int(c.min())
                p = g.loc[(g.event_type == "purchase")
                          & (g.t_us > exp[1]), "t_us"]
                if len(p):
                    exp[2] = int(p.min())
        row = got.loc[uid]
        assert [row.t_view, row.t_click, row.t_purchase] == exp
        assert row.stage == sum(v != -1 for v in exp)


def test_grouped_min_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 9, 500),
                       "v": rng.integers(-100, 100, 500)})
    got = grouped_min(ray.data.from_pandas(df).repartition(4),
                      "k", "v", "mv").to_pandas()
    exp = df.groupby("k")["v"].min()
    assert dict(zip(got.k, got.mv)) == exp.to_dict()


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                          "little")


def test_weighted_priority_sample_exact_topk(ray_session):
    rng = np.random.default_rng(11)
    texts = [f"document number {i} body {rng.integers(0, 1e9)}"
             for i in range(400)]
    w = rng.integers(1, 500, 400)
    df = pd.DataFrame({"doc_id": np.arange(400), "text": texts,
                       "n_chars": w})
    out = weighted_priority_sample(
        ray.data.from_pandas(df).repartition(6), "text", "n_chars",
        25, "doc_id").to_pandas()
    prio = np.array([_md5_64(t) // max(int(ww), 1)
                     for t, ww in zip(texts, w)], dtype=np.uint64)
    exp = df.assign(p=prio).sort_values(["p", "doc_id"]).head(25)
    assert sorted(out.doc_id) == sorted(exp.doc_id)


def test_weighted_sample_prefers_heavy_rows(ray_session):
    # identical hash distribution, weight 1000 vs 1: heavy rows should
    # dominate the sample
    texts = [f"row {i}" for i in range(2000)]
    w = np.where(np.arange(2000) < 1000, 1000, 1)
    df = pd.DataFrame({"doc_id": np.arange(2000), "text": texts,
                       "n_chars": w})
    out = weighted_priority_sample(ray.data.from_pandas(df), "text",
                                   "n_chars", 100, "doc_id").to_pandas()
    assert (out.doc_id < 1000).sum() > 90


def test_char_pair_partial_planted():
    t = pa.table({"text": ["ab ab abc", "x"]})
    out = char_pair_count_partial(t).to_pandas()
    pairs = {(chr(a), chr(b)): n
             for a, b, n in zip(out.a, out.b, out.n)}
    # unique words: ab(f=2), abc(f=1), x(f=1); pairs a-b: 2+1, b-c: 1
    assert pairs == {("a", "b"): 3, ("b", "c"): 1}


def test_bpe_pair_counts_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "ee", "f"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
             for _ in range(300)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})) \
        .repartition(4)
    got = bpe_pair_counts(ds, "text", k=50).to_pandas()
    truth = {}
    for t in texts:
        for w in t.split():
            for i in range(len(w) - 1):
                truth[(w[i], w[i + 1])] = truth.get((w[i], w[i + 1]),
                                                   0) + 1
    got_d = {(a, b): n for a, b, n in zip(got.a, got.b, got.n)}
    exp = dict(sorted(truth.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:50])
    assert got_d == exp


def test_balanced_resample_matches_bruteforce(ray_session):
    rng = np.random.default_rng(13)
    langs = ["en"] * 600 + ["de"] * 200 + ["fr"] * 90
    texts = [f"doc {i} {rng.integers(0, 1e9)}" for i in range(len(langs))]
    df = pd.DataFrame({"doc_id": np.arange(len(langs)), "text": texts,
                       "lang": langs})
    out = balanced_resample(
        ray.data.from_pandas(df).repartition(5), "text",
        "lang").to_pandas()
    counts = {"en": 600, "de": 200, "fr": 90}
    keep = [
        _md5_64(t) % 1_000_000 < (1_000_000 * 90) // counts[g]
        for t, g in zip(texts, langs)
    ]
    exp = df[np.array(keep)]
    assert sorted(out.doc_id) == sorted(exp.doc_id)
    # expectation ~90 per language; determinism bounds drift
    got_counts = out.groupby("lang").size()
    assert all(40 <= got_counts.get(lg, 0) <= 140 for lg in counts)


def test_balanced_resample_smallest_group_kept_whole(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [f"t{i}" for i in range(40)],
        "lang": ["en"] * 30 + ["fr"] * 10,
    })
    out = balanced_resample(ray.data.from_pandas(df), "text",
                            "lang").to_pandas()
    # threshold for fr = scale exactly -> every fr row survives
    assert (out.lang == "fr").sum() == 10


def test_retention_cohort_differential(ray_session):
    rng = np.random.default_rng(21)
    n = 2500
    df = pd.DataFrame({"user_id": rng.integers(0, 60, n),
                       "day": rng.integers(0, 15, n)})
    cohort = df.groupby("user_id")["day"].min().rename("cohort")
    j = df.join(cohort, on="user_id")
    exp = (j.assign(off=j.day - j.cohort)
           .groupby(["cohort", "off"])["user_id"]
           .agg(["nunique", "size"]))

    from sylk.stages.funnel import grouped_min as gm
    from sylk.stages.join import hash_join

    ds = ray.data.from_pandas(df).repartition(6)
    c = gm(ds, "user_id", "day", "cohort_day")
    joined = hash_join(ds, c, on=("user_id",))

    def _o(b):
        import pyarrow.compute as _pc
        return pa.table({
            "cohort_day": b.column("cohort_day"),
            "day_offset": _pc.subtract(b.column("day"),
                                       b.column("cohort_day")),
            "user_id": b.column("user_id")})

    pairs = joined.map_batches(_o, batch_format="pyarrow",
                               batch_size=None)
    got = grouped_distinct_count(pairs, ["cohort_day", "day_offset"],
                                 "user_id", "nu", "ne").to_pandas()
    got = got.set_index(["cohort_day", "day_offset"]).sort_index()
    assert got["nu"].to_dict() == exp["nunique"].to_dict()
    assert got["ne"].to_dict() == exp["size"].to_dict()


def test_grouped_distinct_count_differential(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.integers(0, 12, 4000),
                       "v": rng.integers(0, 60, 4000)})
    got = grouped_distinct_count(
        ray.data.from_pandas(df).repartition(7), "k", "v",
        "nd", "nr").to_pandas().set_index("k").sort_index()
    exp_nd = df.groupby("k")["v"].nunique()
    exp_nr = df.groupby("k")["v"].size()
    assert got["nd"].to_dict() == exp_nd.to_dict()
    assert got["nr"].to_dict() == exp_nr.to_dict()


def test_new_ops_block_layout_invariance(ray_session):
    """funnel / bpe / grouped-distinct results are identical across
    block layouts (1 block vs many) — no hidden order or seam
    dependence."""
    rng = np.random.default_rng(17)
    n = 1200
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(["view", "click", "purchase"], n),
        "t_us": rng.integers(0, 5000, n),
    })
    texts = pd.DataFrame({"text": [
        " ".join(rng.choice(["ab", "abc", "xy", "q"], 12))
        for _ in range(200)]})

    def canon(df, keys):
        return df.sort_values(keys).reset_index(drop=True)

    f1 = funnel_stages(ray.data.from_pandas(ev), ("view", "click",
                                                  "purchase"),
                       key="user_id").to_pandas()
    f2 = funnel_stages(ray.data.from_pandas(ev).repartition(11),
                       ("view", "click", "purchase"),
                       key="user_id").to_pandas()
    pd.testing.assert_frame_equal(canon(f1, ["user_id"]),
                                  canon(f2, ["user_id"]),
                                  check_like=True)

    b1 = bpe_pair_counts(ray.data.from_pandas(texts), "text",
                         k=30).to_pandas()
    b2 = bpe_pair_counts(ray.data.from_pandas(texts).repartition(9),
                         "text", k=30).to_pandas()
    pd.testing.assert_frame_equal(canon(b1, ["a", "b"]),
                                  canon(b2, ["a", "b"]), check_like=True)

    g1 = grouped_distinct_count(ray.data.from_pandas(ev), "user_id",
                                "t_us", "nd", "nr").to_pandas()
    g2 = grouped_distinct_count(ray.data.from_pandas(ev).repartition(13),
                                "user_id", "t_us", "nd",
                                "nr").to_pandas()
    pd.testing.assert_frame_equal(canon(g1, ["user_id"]),
                                  canon(g2, ["user_id"]), check_like=True)
