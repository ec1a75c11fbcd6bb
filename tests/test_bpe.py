"""BPE tokenizer training: greedy-merge semantics, determinism, and
Spark-vs-Python-mirror agreement on the real corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import bpe


def _wf(spark, words):
    return spark.createDataFrame(
        [([w for w in word],) for word in words], "symbols array<string>"
    ).withColumn("cnt", F.lit(1))


def test_apply_merge_greedy_left_to_right(spark):
    """'aaa' + merge (a,a) -> ['aa','a'] (BPE's scan order), and the merged
    symbol participates in later pair counts."""
    wf = _wf(spark, ["aaa", "aab", "ba"])
    out = bpe._apply_merge(wf, "a", "a").select("symbols").collect()
    got = sorted(tuple(r["symbols"]) for r in out)
    assert got == [("aa", "a"), ("aa", "b"), ("b", "a")]


def test_pair_counts_weighted(spark):
    wf = spark.createDataFrame(
        [(["a", "b", "a", "b"], 3), (["b", "a"], 2)],
        "symbols array<string>, cnt long")
    got = {(r["a"], r["b"]): r["total"]
           for r in bpe._pair_counts(wf).collect()}
    assert got == {("a", "b"): 6, ("b", "a"): 5}


def test_bpe_train_deterministic_tiebreak(spark):
    """Equal-count pairs resolve to the lexicographically smallest —
    'ab'×2 vs 'ba'... corpus 'abab' has (a,b)=2, (b,a)=1; after merging
    (a,b) the next best is (ab,ab)=1."""
    docs = spark.createDataFrame([(["abab"],)], "words array<string>")
    merges, _ = bpe.bpe_train(spark, docs, n_merges=2)
    assert [(m[1], m[2], m[4]) for m in merges] == \
        [("a", "b", 2), ("ab", "ab", 1)]


def test_gate_query_matches_python_mirror(spark, sf_dir):
    """The distributed learner and the oracle's driver-side mirror agree
    merge-for-merge on the real corpus, including the vocab row."""
    got = sorted(tuple(r) for r in bpe.q_bpe_merges(spark, sf_dir).collect())
    import duckdb

    exp = sorted(tuple(r) for r in
                 duckdb.sql(bpe.bpe_oracle_sql(sf_dir)).fetchall())
    assert got == exp


def test_merged_symbol_is_concatenation(spark, sf_dir):
    rows = bpe.q_bpe_merges(spark, sf_dir).collect()
    for r in rows:
        if r["rank"] > 0:
            assert r["merged"] == r["a"] + r["b"]
            assert r["freq"] > 0


def test_bpe_compression_bounds(spark, sf_dir):
    """Tokens per doc are bounded by chars (merges only shrink, singles
    can't exceed character count) and every doc is counted."""
    rows = bpe.q_bpe_compression(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["tokens"] <= r["chars"]
        assert r["chars_per_token"] >= 1.0
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

    total = load_table(spark, "documents", sf_dir).count()
    assert sum(r["docs"] for r in rows) == total


def test_bpe_compression_improves_on_no_merges(spark, sf_dir):
    """With 8 learned merges the corpus tokenizes to strictly fewer
    tokens than the no-merge baseline (character-level tokens = total
    word characters) — proving the merges actually fire. chars_per_token
    alone can't show this: n_chars counts separator spaces, so it
    exceeds token count even with zero merges."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

    rows = bpe.q_bpe_compression(spark, sf_dir).collect()
    tokens = sum(r["tokens"] for r in rows)
    word_chars = (
        load_table(spark, "documents", sf_dir)
        .select(F.aggregate(
            F.split(F.lower("text"), " "),
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.length(w)).alias("wc"))
        .agg(F.sum("wc").alias("t")).collect()[0]["t"])
    assert tokens < word_chars


def _py_greedy_merge(syms: tuple, a: str, b: str) -> tuple:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return tuple(out)


def test_fold_matches_python_mirror_property(spark):
    """Property: the Spark aggregate fold and the oracle mirror's greedy
    scan agree on EVERY symbol sequence — including overlap runs
    ('aaaa'), merged-symbol collisions ('ab'+'ab'), and empties. One
    Spark job over the whole hypothesis-generated batch."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = ["a", "b", "ab", "ba"]
    cases: list[tuple] = []

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.sampled_from(alphabet), min_size=0, max_size=8),
           st.sampled_from([("a", "a"), ("a", "b"), ("ab", "ab"),
                            ("b", "ba")]))
    def collect(syms, pair):
        cases.append((tuple(syms), pair))

    collect()
    rows = [(i, list(syms)) for i, (syms, _p) in enumerate(cases)]
    by_pair: dict[tuple, list] = {}
    for i, (syms, pair) in enumerate(cases):
        by_pair.setdefault(pair, []).append(i)
    df = spark.createDataFrame(rows, "i long, symbols array<string>") \
        .withColumn("cnt", F.lit(1))
    for pair, idxs in by_pair.items():
        sub = df.filter(F.col("i").isin(idxs))
        got = {r["i"]: tuple(r["symbols"])
               for r in bpe._apply_merge(
                   sub.select("symbols", "cnt", F.col("i").alias("word")),
                   *pair, keep_word=True)
               .select(F.col("word").alias("i"), "symbols").collect()}
        for i in idxs:
            assert got[i] == _py_greedy_merge(cases[i][0], *pair), \
                (cases[i], pair, got[i])
