"""Property tests for Good-Turing counts-of-counts, Gries' DP term
dispersion, and deterministic SGNS skip-gram negative sampling.
Cross-engine value parity is covered by test_oracle_parity; these pin
the algebraic invariants."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


class TestGoodTuring:
    def test_matches_hand_counts(self, spark):
        from ocr_spark.functions.quality import good_turing_counts

        texts = ["a a a b b c", "c d e a"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = {r["r"]: r for r in good_turing_counts(df).collect()}
        # freqs: a=4 b=2 c=2 d=1 e=1 -> N_1=2, N_2=2, N_4=1, N=10
        assert rows[1]["n_r"] == 2 and rows[2]["n_r"] == 2
        assert rows[4]["n_r"] == 1
        # r*=1: (1+1)*N_2/N_1 = 2*2/2 = 2.0
        assert rows[1]["r_star"] == pytest.approx(2.0)
        # unseen mass estimate = N_1/N = 0.2
        assert rows[1]["mass_share"] == pytest.approx(0.2)
        # no N_3 -> r=2 has n_r1 = 0 and NULL r_star (not a fake 0)
        assert rows[2]["n_r1"] == 0 and rows[2]["r_star"] is None

    def test_mass_shares_sum_to_one(self, spark):
        from ocr_spark.functions.quality import good_turing_counts

        df = spark.createDataFrame(
            [("w x y z w x w",), ("y y z q",)], "text string")
        rows = good_turing_counts(df, n_rows=10_000).collect()
        assert sum(r["mass_share"] for r in rows) == pytest.approx(1.0, abs=1e-5)


class TestTermDispersion:
    def test_matches_naive_definition(self, spark):
        from ocr_spark.functions.colloc import term_dispersion

        texts = ["the cat sat on the mat", "the dog", "wholly other words",
                 "the the the spam spam spam"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = {r["tok"]: r for r in term_dispersion(df, top=50).collect()}

        docs = [t.split() for t in texts]
        sizes = [len(d) for d in docs]
        S = sum(sizes)
        for term in ["the", "spam", "cat"]:
            V = sum(d.count(term) for d in docs)
            dp = 0.5 * sum(abs(d.count(term) / V - s / S)
                           for d, s in zip(docs, sizes))
            assert got[term]["dp"] == pytest.approx(dp, abs=1e-6), term
            assert got[term]["v"] == V

    def test_even_vs_concentrated(self, spark):
        from ocr_spark.functions.colloc import term_dispersion

        # "even" appears once per doc (like a function word); "burst"
        # has the same corpus frequency but sits in one doc
        texts = ["even filler pad", "even filler pad",
                 "even filler pad", "even burst burst burst"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = {r["tok"]: r["dp"] for r in term_dispersion(df, top=50).collect()}
        assert got["burst"] > got["even"]


class TestSkipgramPairs:
    def _run(self, spark, texts, **kw):
        from ocr_spark.operators.corpus import skipgram_pairs

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        return skipgram_pairs(df, **kw).collect()

    def test_pair_structure(self, spark):
        rows = self._run(spark, ["a b c d e"], window=2, n_neg=1)
        pairs = {(r["pos"], r["cpos"]) for r in rows}
        # center 3 sees 1,2,4,5; center 1 sees 2,3 — window-2 skip-grams
        assert {(3, j) for j in (1, 2, 4, 5)} <= pairs
        assert {(1, 2), (1, 3)} <= pairs
        assert all(r["pos"] != r["cpos"] for r in rows)
        # center/context are the tokens at those positions
        toks = "a b c d e".split()
        assert all(r["center"] == toks[r["pos"] - 1]
                   and r["context"] == toks[r["cpos"] - 1] for r in rows)

    def test_negatives_deterministic_and_complete(self, spark):
        texts = ["quick brown fox jumps", "lazy dog sleeps all day"]
        a = self._run(spark, texts, window=2, n_neg=3)
        b = self._run(spark, texts, window=2, n_neg=3)
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # every (pair, slot) got exactly ONE negative (CDF intervals
        # partition the hash space)
        keys = [(r["doc_id"], r["pos"], r["cpos"], r["neg_slot"]) for r in a]
        assert len(keys) == len(set(keys))
        n_pairs = len({k[:3] for k in keys})
        assert len(keys) == n_pairs * 3

    def test_negative_distribution_follows_unigram(self, spark):
        # a corpus where one token holds half the mass: it should be
        # drawn as a negative far more often than a singleton
        texts = [("common " * 50 + "rare" + " mid" * 10).strip()] * 4
        rows = self._run(spark, texts, window=1, n_neg=4)
        drawn = Counter(r["neg_tok"] for r in rows)
        assert drawn["common"] > drawn["rare"] * 3

    def test_bucketed_cdf_matches_partition(self, spark):
        # many range buckets + tiny vocab: every target still lands in
        # exactly one interval even when intervals span bucket edges
        rows = self._run(spark, ["x y " * 30], window=1, n_neg=2,
                         n_range_buckets=256)
        keys = [(r["doc_id"], r["pos"], r["cpos"], r["neg_slot"])
                for r in rows]
        assert len(keys) == len(set(keys)) and len(keys) > 0


class TestHeapsFit:
    def test_matches_naive_ols(self, spark):
        from ocr_spark.functions.colloc import heaps_fit

        import random
        rnd = random.Random(3)
        vocab_pool = [f"w{i}" for i in range(400)]
        texts = [" ".join(rnd.choice(vocab_pool) for _ in range(40))
                 for _ in range(60)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        row = heaps_fit(df, bucket_width=7).collect()[0]

        seen, pts, cn, cv = set(), [], 0, 0
        for t in texts:
            toks = t.split()
            cn += len(toks)
            for tok in toks:
                if tok not in seen:
                    seen.add(tok)
            cv = len(seen)
            if cn > 0 and cv > 0:
                pts.append((math.log(cn), math.log(cv)))
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        sxx = sum((x - mx) ** 2 for x, _ in pts)
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        beta = sxy / sxx
        assert row["n_points"] == n
        assert row["beta"] == pytest.approx(beta, abs=1e-3)
        assert row["ln_k"] == pytest.approx(my - beta * mx, abs=1e-3)
        # sanity: random-uniform draws still grow sublinearly
        assert 0.0 < row["beta"] < 1.0


class TestCrossPpl:
    def test_unseen_pairs_get_floor_not_dropped(self, spark):
        from ocr_spark.functions.quality import cross_bigram_logprob

        train = spark.createDataFrame(
            [(0, "the cat sat"), (1, "the dog ran")],
            "doc_id long, text string")
        score = spark.createDataFrame(
            [(10, "the cat ran"), (11, "zebra quark flux")],
            "doc_id long, text string")
        got = {r["doc_id"]: r
               for r in cross_bigram_logprob(train, score).collect()}
        # every scored pair counts, even wholly-unseen ones
        assert got[10]["n_bigrams"] == 2
        assert got[11]["n_bigrams"] == 2
        # a doc of entirely unseen tokens scores strictly worse than
        # one sharing pairs with training
        assert got[10]["avg_logprob"] > got[11]["avg_logprob"]
        # unseen floor: p = 1/V for c_xy = c_x = 0 -> lp = -ln(V)
        import math
        v = 6  # the cat sat dog ran -> 5? the,cat,sat,dog,ran = 5
        v = 5
        assert got[11]["avg_logprob"] == pytest.approx(
            math.log(1 / v), abs=1e-6)

    def test_self_vs_cross_optimism(self, spark):
        # scoring the training corpus itself must be no worse than
        # scoring held-out text of the same shape
        from ocr_spark.functions.quality import (bigram_logprob,
                                                 cross_bigram_logprob)

        texts = [(i, "alpha beta gamma delta " * 3) for i in range(4)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        held = spark.createDataFrame(
            [(9, "omega psi chi phi " * 3)], "doc_id long, text string")
        self_score = bigram_logprob(df).agg(
            F.avg("avg_logprob")).collect()[0][0]
        cross = cross_bigram_logprob(df, held).collect()[0]["avg_logprob"]
        assert self_score > cross


class TestMinKProb:
    def test_matches_hand_computation(self, spark):
        from ocr_spark.functions.quality import min_k_prob

        texts = [(0, "a a a a b"), (1, "b c c c c")]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r["doc_id"]: r for r in min_k_prob(df, k_frac=0.2).collect()}
        import math
        # counts: a=4 b=2 c=4, N=10, V=3 -> lp(tok) = ln((c+1)/13)
        lp = {t: math.log((c + 1) / 13) for t, c in
              {"a": 4, "b": 2, "c": 4}.items()}
        # doc0 tokens: 5 -> k = 1 -> bottom-1 = min lp = lp(b)
        assert got[0]["k_tokens"] == 1
        assert got[0]["min_k_logprob"] == pytest.approx(lp["b"], abs=1e-6)
        assert got[0]["n_tokens"] == 5

    def test_memorized_like_doc_scores_higher(self, spark):
        from ocr_spark.functions.quality import min_k_prob

        common = " ".join(["filler"] * 30)
        rare = "filler xqz1 filler wvu2 filler tsr3"
        df = spark.createDataFrame(
            [(0, common), (1, rare)] + [(i, common) for i in range(2, 6)],
            "doc_id long, text string")
        got = {r["doc_id"]: r["min_k_logprob"]
               for r in min_k_prob(df).collect()}
        # the doc with rare tokens has a lower (worse) min-k score
        assert got[0] > got[1]


class TestBurrowsDelta:
    def test_matches_naive(self, spark):
        from ocr_spark.functions.model import burrows_delta

        texts = ["the of and cat", "the the of dog", "of and and bird",
                 "the of mouse mouse"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = {(r["doc_a"], r["doc_b"]): r["delta"]
               for r in burrows_delta(df, n_terms=3).collect()}

        import statistics
        docs = [t.split() for t in texts]
        from collections import Counter
        freq = Counter(t for d in docs for t in d)
        top = sorted(freq, key=lambda t: (-freq[t], t))[:3]
        fs = {t: [d.count(t) / len(d) for d in docs] for t in top}
        z = {}
        for t in top:
            mu = sum(fs[t]) / len(docs)
            sig = (sum(x * x for x in fs[t]) / len(docs) - mu * mu) ** 0.5
            if sig > 0:
                z[t] = [(x - mu) / sig for x in fs[t]]
        for (a, b), d_got in got.items():
            want = sum(abs(z[t][a] - z[t][b]) for t in z) / len(z)
            assert d_got == pytest.approx(want, abs=1e-5), (a, b)

    def test_same_style_different_topic_is_close(self, spark):
        from ocr_spark.functions.model import burrows_delta

        # docs 0/1: same function-word skeleton, different content;
        # doc 2: different skeleton
        t0 = "the cat of the house and the bird in the tree"
        t1 = "the dog of the barn and the fish in the pond"
        t2 = "buy now great offer buy cheap offer now now deal"
        df = spark.createDataFrame(
            [(0, t0), (1, t1), (2, t2)], "doc_id long, text string")
        got = {(r["doc_a"], r["doc_b"]): r["delta"]
               for r in burrows_delta(df, n_terms=6).collect()}
        assert got[(0, 1)] < got[(0, 2)]
        assert got[(0, 1)] < got[(1, 2)]

    def test_candidate_pairs_restriction(self, spark):
        from ocr_spark.functions.model import burrows_delta

        df = spark.createDataFrame(
            [(i, f"the of and tok{i} tok{i}") for i in range(6)],
            "doc_id long, text string")
        pairs = spark.createDataFrame(
            [(0, 1), (2, 3)], "doc_a long, doc_b long")
        rows = burrows_delta(df, pairs=pairs).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(0, 1), (2, 3)}
