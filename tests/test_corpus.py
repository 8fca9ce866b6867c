"""Corpus assembly: deterministic stratified sampling + token-budget mix.

The load-bearing properties: selection is a pure function of (key,
salt) — invariant to partitioning — and the two-pass distributed
prefix sum in token_budget_mix selects exactly the set the naive
single-window form would (checked by n_buckets=1 equivalence and by a
pure-Python reference).
"""

import hashlib

from pyspark.sql import functions as F

from ocr_spark.operators.corpus import (
    HASH_SPACE,
    contamination_pairs,
    pack_sequences,
    sample_thresholds,
    stratified_sample,
    token_budget_mix,
)


def _h60(key, salt=""):
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)


def _docs(spark, n=200, n_sources=4):
    rows = [
        (i, f"s{i % n_sources}", "tok " * (i % 7 + 1))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stratified_sample_matches_reference_and_is_partition_invariant(spark):
    df = _docs(spark)
    fracs = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    thr = sample_thresholds(fracs)
    want = {
        i for i in range(200)
        if f"s{i % 4}" in thr and _h60(i) < thr[f"s{i % 4}"]
    }
    got1 = {r["doc_id"] for r in stratified_sample(df, fracs).collect()}
    got2 = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), fracs).collect()
    }
    assert got1 == want
    assert got2 == want
    # s0 fully kept, s2 and unlisted s3 fully dropped
    assert {i for i in want if i % 4 == 0} == {i for i in range(200) if i % 4 == 0}
    assert not any(i % 4 in (2, 3) for i in want)


def test_sample_thresholds_full_fraction_keeps_max_hash():
    assert sample_thresholds({"s": 1.0})["s"] == HASH_SPACE
    assert _h60("anything") < HASH_SPACE


def _budget_reference(n, budgets, n_buckets):
    """Single-pass python reference: per stratum, order by
    (h % n_buckets, h, key), cumsum, keep while <= budget."""
    per = {}
    for i in range(n):
        s = f"s{i % 4}"
        if s not in budgets:
            continue
        per.setdefault(s, []).append(i)
    keep = {}
    for s, ids in per.items():
        ids.sort(key=lambda i: (_h60(i) % n_buckets, _h60(i), i))
        run = 0
        for i in ids:
            run += i % 7 + 1
            if run > budgets[s]:
                break
            keep[i] = run
    return keep


def test_token_budget_mix_matches_reference(spark):
    df = _docs(spark)
    budgets = {"s0": 40, "s1": 10_000, "s3": 1}
    want = _budget_reference(200, budgets, n_buckets=8)
    out = token_budget_mix(df, budgets, n_buckets=8).collect()
    got = {r["doc_id"]: r["cum_tokens"] for r in out}
    assert got == want
    # s1's budget is effectively infinite: every s1 doc selected
    assert {i for i in got if i % 4 == 1} == {i for i in range(200) if i % 4 == 1}
    # s2 absent from budgets: nothing selected
    assert not any(i % 4 == 2 for i in got)
    # n_tokens faithful
    for r in out:
        assert r["n_tokens"] == r["doc_id"] % 7 + 1


def test_token_budget_mix_bucket_count_invariant(spark):
    # two-pass prefix sum with B buckets == the single-window form
    # (n_buckets=1 IS the single-window form, up to the bucket term in
    # the order key, which is constant at B=1)
    df = _docs(spark, n=120)
    budgets = {"s0": 55, "s1": 23}
    one = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_mix(df, budgets, n_buckets=1).collect()
    )
    # B=1 reference order is (h, key); B>1 changes the order (bucket
    # leads), so compare against the python reference per B instead
    for b in (1, 4, 64):
        want = sorted(_budget_reference(120, budgets, n_buckets=b).items())
        got = sorted(
            (r["doc_id"], r["cum_tokens"])
            for r in token_budget_mix(df, budgets, n_buckets=b).collect()
        )
        assert got == want, f"n_buckets={b}"
    assert one == sorted(_budget_reference(120, budgets, n_buckets=1).items())


def test_contamination_pairs_threshold_and_broadcast(spark):
    # doc 1 contains the benchmark passage verbatim (many shared
    # 3-grams); doc 2 shares exactly two 3-grams (below min_shared=3);
    # doc 3 shares none.
    passage = "alpha beta gamma delta epsilon zeta"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {passage} outro words"),
            (2, "alpha beta gamma unrelated tail content here"),
            (3, "совершенно другой текст без перекрытия вообще"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, passage)], "bench_id long, text string"
    )
    out = contamination_pairs(corpus, bench, ngram_k=3, min_shared=3)
    rows = {(r["doc_id"], r["bench_id"]): r["n_shared"] for r in out.collect()}
    # passage has 4 distinct 3-grams, all inside doc 1
    assert rows == {(1, 100): 4}
    # scale shape: benchmark side broadcast, corpus never shuffled wide
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def _pack_reference(n, seq_len, n_buckets):
    """Single-stream python reference: order by (h % B, h, key), global
    cumsum, cut at seq_len boundaries."""
    ids = sorted(range(n), key=lambda i: (_h60(i) % n_buckets, _h60(i), i))
    out, run = {}, 0
    for i in ids:
        nt = i % 7 + 1
        start, run = run, run + nt
        out[i] = (nt, start, start // seq_len, (run - 1) // seq_len)
    return out


def test_pack_sequences_matches_reference(spark):
    df = _docs(spark, n=150)
    for b in (1, 8, 64):
        want = _pack_reference(150, 16, b)
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_off"],
                          r["seq_first"], r["seq_last"])
            for r in pack_sequences(df, 16, n_buckets=b).collect()
        }
        assert got == want, f"n_buckets={b}"


def test_pack_sequences_contiguous_and_drops_empty(spark):
    rows = [(0, "s0", ""), (1, "s0", "a b c"), (2, "s0", "   "),
            (3, "s0", "x " * 40), (4, "s0", "y z")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_sequences(df, 8, n_buckets=4).collect()
    # empty / whitespace-only docs pack to nothing
    assert {r["doc_id"] for r in out} == {1, 3, 4}
    # offsets tile the token stream: start at 0, no gaps, no overlap
    ivs = sorted((r["start_off"], r["start_off"] + r["n_tokens"]) for r in out)
    assert ivs[0][0] == 0
    for (_, end), (nxt, _) in zip(ivs, ivs[1:]):
        assert end == nxt
    # a 40-token doc spans >= 5 seq_len=8 sequences; n_seqs consistent
    r3 = next(r for r in out if r["doc_id"] == 3)
    assert r3["n_seqs"] == r3["seq_last"] - r3["seq_first"] + 1
    assert r3["n_seqs"] >= 5
    # partition-invariant placement
    re_out = {
        (r["doc_id"], r["start_off"])
        for r in pack_sequences(df.repartition(7), 8, n_buckets=4).collect()
    }
    assert re_out == {(r["doc_id"], r["start_off"]) for r in out}


def test_packed_sequences_materialize_concat_and_cut(spark):
    """The writer must reproduce the naive 'concatenate all tokens in
    hash order, cut every seq_len' reference exactly — including docs
    split across sequence boundaries — and mark only the trailing
    partial sequence full=false."""
    from ocr_spark.operators.corpus import packed_sequences

    rows = [(i, "src", " ".join(f"d{i}t{j}" for j in range(i % 9 + 1)))
            for i in range(60)] + [(60, "src", ""), (61, "src", "   ")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    L = 7
    # reference: global hash order (bucket, h, key), then concat + cut
    order = sorted((r[0] for r in rows if r[2].strip()),
                   key=lambda i: (_h60(i) % 16, _h60(i), i))
    stream, owners = [], []
    for i in order:
        toks = rows[i][2].split()
        stream.extend(toks)
        owners.extend([i] * len(toks))
    want = {}
    for s in range(0, len(stream), L):
        chunk, own = stream[s:s + L], owners[s:s + L]
        want[s // L] = (len(set(own)), len(chunk), len(chunk) == L,
                        " ".join(chunk))
    got = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"], r["full"], r["text"])
        for r in packed_sequences(df, L, n_buckets=16).collect()
    }
    assert got == want
    # boundary splits actually happened (a doc in >1 sequence)
    assert any(n_docs > 1 for n_docs, _, _, _ in got.values())
    # partition-invariant materialization
    re_got = {
        r["seq_id"]: r["text"]
        for r in packed_sequences(df.repartition(7), L, n_buckets=16).collect()
    }
    assert re_got == {k: v[3] for k, v in got.items()}


def test_epoch_mix_fractional_upsampling(spark):
    """floor(w) copies for every doc, one extra for a deterministic
    hash fraction, absent strata dropped, epoch indices 1..n, and the
    exact copy set invariant under repartitioning."""
    from ocr_spark.operators.corpus import epoch_mix

    rows = [(i, ["a", "b", "c", "z"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"a": 2.5, "b": 1.0, "c": 0.4}
    out = epoch_mix(df, w).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r.doc_id, r.source), []).append(r.epoch)
    assert all(s != "z" for _, s in by_key)          # whitelist
    for (k, s), epochs in by_key.items():
        lo = int(w[s])
        assert sorted(epochs) == list(range(1, len(epochs) + 1))
        assert lo <= len(epochs) <= lo + 1
    # fractional strata actually split both ways
    a_counts = {len(v) for (k, s), v in by_key.items() if s == "a"}
    c_counts = {len(v) for (k, s), v in by_key.items() if s == "c"}
    assert a_counts == {2, 3} and c_counts <= {0, 1} and 1 in c_counts
    # every b doc exactly once; c docs with 0 copies are absent rows
    assert all(len(v) == 1 for (k, s), v in by_key.items() if s == "b")
    assert len([1 for (k, s) in by_key if s == "b"]) == 100
    # determinism across partitionings
    re_out = sorted((r.doc_id, r.source, r.epoch)
                    for r in epoch_mix(df.repartition(13), w).collect())
    assert re_out == sorted((r.doc_id, r.source, r.epoch) for r in out)


def test_dsir_weights_scores_target_like_docs_higher(spark):
    """Docs sharing the target subset's vocabulary must outscore docs
    made of off-domain tokens; empty docs keep NULL; the weights are
    invariant under repartitioning."""
    from ocr_spark.operators.corpus import dsir_weights

    rows = (
        # target subset: clean encyclopedic tokens
        [(i, "the quick history of science and art", 1) for i in range(10)]
        # raw-only docs that look like the target
        + [(10 + i, "history of art and science", 0) for i in range(5)]
        # raw-only junk
        + [(15 + i, "zzz qqq xxx spam spam spam", 0) for i in range(5)]
        + [(20, "   ", 0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = {r.doc_id: r for r in dsir_weights(df, "tgt").collect()}
    assert len(out) == 21
    assert out[20].log_weight is None and out[20].n_tokens == 0
    target_like = out[12].log_weight
    junk = out[17].log_weight
    assert target_like > junk
    re_out = {r.doc_id: r.log_weight
              for r in dsir_weights(df.repartition(7), "tgt").collect()}
    for k, r in out.items():
        if r.log_weight is None:
            assert re_out[k] is None
        else:
            assert abs(re_out[k] - r.log_weight) < 1e-9


def test_data_split_disjoint_exhaustive_stable(spark):
    from ocr_spark.operators.corpus import data_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = {r.doc_id: r.split
           for r in data_split(df, {"train": 0.8, "val": 0.1,
                                    "test": 0.1}).collect()}
    assert len(out) == 2000                      # exhaustive, one split each
    from collections import Counter

    c = Counter(out.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["val"] / 2000 < 0.14
    # growth stability: assignments of a subset are unchanged when the
    # corpus doubles (leakage safety across snapshot growth)
    half = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    sub = {r.doc_id: r.split
           for r in data_split(half, {"train": 0.8, "val": 0.1,
                                      "test": 0.1}).collect()}
    assert all(out[k] == v for k, v in sub.items())


class TestLengthBuckets:
    def test_bucket_assignment_and_batch_fill(self, spark):
        from ocr_spark.operators.corpus import length_buckets
        rows = [(i, " ".join(["w"] * n)) for i, n in
                enumerate([3, 10, 17, 40, 999])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               length_buckets(df, (16, 32, 64), batch_size=2).collect()}
        assert got[0]["bucket_len"] == 16 and got[0]["pad_tokens"] == 13
        assert got[1]["bucket_len"] == 16
        assert got[2]["bucket_len"] == 32 and got[2]["pad_tokens"] == 15
        assert got[3]["bucket_len"] == 64
        # over the last boundary: clamped, pad floor at 0
        assert got[4]["bucket_len"] == 64 and got[4]["pad_tokens"] == 0
        # the two 16-bucket docs fill one batch of 2 deterministically
        b16 = sorted((got[i]["batch_idx"], got[i]["pos_in_batch"])
                     for i in (0, 1))
        assert b16 == [(0, 0), (0, 1)]

    def test_deterministic_across_runs(self, spark):
        from ocr_spark.operators.corpus import length_buckets
        df = spark.createDataFrame(
            [(i, "w " * (i % 50 + 1)) for i in range(200)],
            "doc_id long, text string")
        a = sorted(map(tuple, length_buckets(df, (16, 64), 8).collect()))
        b = sorted(map(tuple, length_buckets(
            df.repartition(7), (16, 64), 8).collect()))
        assert a == b

    def test_bad_boundaries_rejected(self, spark):
        import pytest as _pt

        from ocr_spark.operators.corpus import length_buckets
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pt.raises(ValueError):
            length_buckets(df, (), 8)
        with _pt.raises(ValueError):
            length_buckets(df, (32, 16), 8)


def test_weighted_sample_matches_reference_and_is_partition_invariant(spark):
    """A-ES selection must equal the pure-Python reference (top-k by
    ln(u)/w desc) and be identical under any repartitioning."""
    import math

    from ocr_spark.operators.corpus import weighted_sample

    rows = [(i, (i % 13) + 1) for i in range(80)] + [(900, 0), (901, None)]
    df = spark.createDataFrame(rows, "doc_id long, w int")

    def key(i, w):
        u = (_h60(i) + 1) / HASH_SPACE
        return math.log(u) / w

    ref = sorted(((i, w) for i, w in rows if w),
                 key=lambda t: (-key(*t), t[0]))[:10]
    got = [(r.doc_id, r.w) for r in
           weighted_sample(df, k=10, weight_col="w").collect()]
    assert got == ref                         # zero/NULL weights excluded
    re_got = [(r.doc_id, r.w) for r in
              weighted_sample(df.repartition(7), k=10,
                              weight_col="w").collect()]
    assert re_got == ref


def test_weighted_sample_weight_monotonicity(spark):
    """Two rows with the same hash draw: the heavier one has the
    larger key, so at k=1 the heavier must win.  Same draw is forced
    by sampling the same key twice under different weight columns."""
    from ocr_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, 5, 50)], "doc_id long, w_small int, w_big int")
    small = weighted_sample(df, k=1, weight_col="w_small").collect()[0]
    big = weighted_sample(df, k=1, weight_col="w_big").collect()[0]
    assert big.es_key > small.es_key          # ln(u)<0 shrinks toward 0


def test_epoch_shuffle_is_exact_permutation_and_seed_sensitive(spark):
    from ocr_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(300)], "doc_id long, text string")
    out = {r.doc_id: r.epoch_pos
           for r in epoch_shuffle(df, seed="a").collect()}
    assert sorted(out.values()) == list(range(300))    # a real permutation
    # matches the naive global order on (hash, key)
    ref = {i: rank for rank, i in enumerate(
        sorted(range(300), key=lambda i: (_h60(i, "a"), i)))}
    assert out == ref
    # partition-invariant; a different seed is a different permutation
    out2 = {r.doc_id: r.epoch_pos
            for r in epoch_shuffle(df.repartition(11), seed="a").collect()}
    assert out2 == out
    outb = {r.doc_id: r.epoch_pos
            for r in epoch_shuffle(df, seed="b").collect()}
    assert sorted(outb.values()) == list(range(300)) and outb != out


def test_cluster_split_members_never_straddle(spark):
    """Leakage safety: every member of a near-dup cluster inherits ONE
    split (per-doc hashing can straddle — the failure mode this
    operator removes); assignment is deterministic and stable under
    corpus growth (a surviving cluster's split never migrates)."""
    from ocr_spark.operators.corpus import cluster_split

    rows = [(i, i % 7, (200 + 6) // 7) for i in range(200)]
    df = spark.createDataFrame(rows,
                               "doc_id long, cluster_id long, cluster_size long")
    shares = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = cluster_split(df, shares, "cluster_id", salt="t")
    per = (out.groupBy("cluster_id")
           .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r.k == 1 for r in per)
    # stability under growth: drop half the docs, survivors keep splits
    full = {r.doc_id: r.split for r in out.collect()}
    half = cluster_split(df.filter(F.col("doc_id") % 2 == 0), shares,
                         "cluster_id", salt="t")
    assert all(full[r.doc_id] == r.split for r in half.collect())
    # with 7 clusters and 3 shares, at least 2 splits actually occur
    assert len(set(full.values())) >= 2


def test_shard_plan_invariants_and_naive_parity(spark):
    from ocr_spark.operators.corpus import shard_plan

    rows = [(i, "x" * (17 * (i % 13) + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    budget = 400
    plan = shard_plan(df, shard_bytes=budget, n_buckets=8).collect()
    assert len(plan) == 200

    # naive single-stream recompute in the same (h % 8, h, key) order
    import hashlib

    def h60(k):
        return int(hashlib.md5(f"|{k}".encode()).hexdigest()[:15], 16)

    order = sorted(rows, key=lambda r: (h60(r[0]) % 8, h60(r[0]), r[0]))
    cum, expect = 0, {}
    for k, t in order:
        expect[k] = (len(t), cum, cum // budget, cum % budget)
        cum += len(t)
    for r in plan:
        assert (r["n_bytes"], r["start_off"], r["shard_id"],
                r["shard_off"]) == expect[r["doc_id"]], r

    # shard capacity: a shard's docs span from its first doc's offset to
    # past the next boundary (straddlers stay whole), so each non-final
    # shard's byte total is within one max-doc of the budget either way
    max_doc = max(len(t) for _, t in rows)
    per_shard: dict[int, int] = {}
    last_end: dict[int, int] = {}
    for r in plan:
        per_shard[r["shard_id"]] = per_shard.get(r["shard_id"], 0) \
            + r["n_bytes"]
        last_end[r["shard_id"]] = max(
            last_end.get(r["shard_id"], 0), r["start_off"] + r["n_bytes"])
    sids = sorted(per_shard)
    assert sids == list(range(len(sids)))  # contiguous shard ids
    for sid in sids[:-1]:
        assert budget - max_doc < per_shard[sid] < budget + max_doc
        # the shard's stream reaches (or crosses) its upper boundary
        assert last_end[sid] >= (sid + 1) * budget

    # layout is a pure function of keys: repartitioning cannot move docs
    plan2 = shard_plan(df.repartition(13), shard_bytes=budget,
                       n_buckets=8).collect()
    assert sorted(map(tuple, plan)) == sorted(map(tuple, plan2))


def test_shard_plan_rejects_nonpositive_budget(spark):
    import pytest as _pytest

    from ocr_spark.operators.corpus import shard_plan

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        shard_plan(df, shard_bytes=0)


class TestClozeQA:
    def test_rarest_term_blank_and_ties(self, spark):
        from ocr_spark.operators.corpus import cloze_qa

        df = spark.createDataFrame(
            [(1, "the rare gem shines here. the cat sat."),
             (2, "the gem glows and the gem endures daily."),
             (3, "common words fill the air today."),
             (4, "apple apple apple apple zed.")],
            "doc_id long, text string")
        got = {(r.doc_id, r.sent_idx):
               (r.question, r.answer, r.answer_df)
               for r in cloze_qa(df, min_tokens=5).collect()}
        assert got == {
            # df=1 ties resolve to the lexicographically smallest
            (1, 0): ("the rare gem shines ____", "here.", 1),
            (2, 0): ("the gem glows ____ the gem endures daily.",
                     "and", 1),
            (3, 0): ("common words fill the ____ today.", "air", 1),
            # every occurrence of the answer is blanked
            (4, 0): ("____ ____ ____ ____ zed.", "apple", 1),
        }
        # "the cat sat." has 3 tokens < min_tokens -> no row

    def test_short_sentences_skipped(self, spark):
        from ocr_spark.operators.corpus import cloze_qa

        df = spark.createDataFrame(
            [(1, "tiny one. two words here!")],
            "doc_id long, text string")
        assert cloze_qa(df, min_tokens=5).count() == 0


class TestSectionQA:
    def test_pairs_and_filters(self, spark):
        from ocr_spark.operators.corpus import section_qa

        df = spark.createDataFrame(
            [(1, "preamble text here\n# Setup Guide\none two three "
                 "four five\n## Tiny\nshort\n### Deep Dive\na b c d "
                 "e f")],
            "doc_id long, text string")
        got = {(r.section_idx): (r.question, r.answer,
                                 r.answer_tokens)
               for r in section_qa(df, min_body_tokens=5).collect()}
        # preamble (NULL heading) and the 1-token 'Tiny' body drop
        assert got == {
            1: ("Setup Guide", "one two three four five", 5),
            3: ("Deep Dive", "a b c d e f", 6),
        }


class TestParseJsonRecords:
    def test_quarantine_contract(self, spark):
        from ocr_spark.sources.jsonl import parse_json_records

        df = spark.createDataFrame(
            [(1, '{"title": "ok", "views": 42}'),
             (2, '{"title": "trunc", "views": 7'),   # no closing brace
             (3, "not json at all"),
             (4, None),
             (5, '{"title": "extra", "views": 1, "junk": true}')],
            "doc_id long, line string")
        got = {r.doc_id: (r.title, r.views, r.corrupt,
                          r.quarantine_raw)
               for r in parse_json_records(
                   df, "line", "title string, views bigint").collect()}
        assert got[1] == ("ok", 42, False, None)
        # truncation rejects the whole record; raw line quarantined
        assert got[2] == (None, None, True,
                          '{"title": "trunc", "views": 7')
        assert got[3] == (None, None, True, "not json at all")
        assert got[4] == (None, None, True, None)
        # unreferenced keys are ignored, not errors
        assert got[5] == ("extra", 1, False, None)
