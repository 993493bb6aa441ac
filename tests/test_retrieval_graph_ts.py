"""Unit tests for the session-3 operators: retrieval (tf·idf, vocab
coverage), decontamination, triangle counting, gap fill, and the
interval overlap join. Oracle parity runs in test_oracle_parity.py;
these tests pin SEMANTICS on hand-built fixtures and the plan shapes
the 100 TB claims rest on.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.operators.components import triangle_counts
from eco_pulse_lakehouse_spark.operators.decontaminate import decontaminate
from eco_pulse_lakehouse_spark.operators.joins import interval_overlap_join
from eco_pulse_lakehouse_spark.operators.retrieval import (
    bm25_topk,
    tfidf_topk_terms,
    vocab_coverage,
)
from eco_pulse_lakehouse_spark.operators.timeseries import gap_fill_daily


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- retrieval ------------------------------------------------------------


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare1 common common"),
            (2, "common rare2 common"),
            (3, "common common"),
        ],
        ["doc_id", "text"],
    )
    top1 = {
        r["doc_id"]: r["term"]
        for r in tfidf_topk_terms(docs, "doc_id", "text", k=1).collect()
    }
    # 'common' has df=3 → idf=0; each rare term appears in one doc
    assert top1[1] == "rare1"
    assert top1[2] == "rare2"
    # doc 3 has only the zero-idf term; it still gets a (zero-score) row
    assert top1[3] == "common"


def test_vocab_coverage_oov_rate(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c c c c")],
        ["doc_id", "text"],
    )
    # vocab_size=1 → vocab = {'c'} (4 occurrences beats 'a' at 2)
    rows = {
        r["doc_id"]: r
        for r in vocab_coverage(docs, "doc_id", "text", vocab_size=1).collect()
    }
    assert rows[1]["n_oov"] == 3 and rows[1]["oov_rate"] == 1.0
    assert rows[2]["n_oov"] == 0 and rows[2]["oov_rate"] == 0.0


def test_vocab_selection_avoids_global_sort_window(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = _plan(vocab_coverage(docs, "doc_id", "text", vocab_size=2))
    assert "TakeOrderedAndProject" in plan


def test_bm25_ranks_matching_docs_and_saturates_tf(spark):
    """A doc matching both query terms outranks single-term docs, and
    BM25's tf saturation keeps a term-stuffed doc from dominating a
    balanced one (tf contribution is bounded by k1+1)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma gamma"),
            (2, "alpha alpha alpha alpha"),  # stuffed single-term
            (3, "alpha beta delta delta"),
            (4, "gamma delta epsilon zeta"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, "doc_id", "text", [(1, "alpha beta")], k=4)
    rows = {r.rk: r for r in out.collect()}
    # both-term docs (1, 3) lead; the stuffed doc 2 is behind them
    assert {rows[1].doc_id, rows[2].doc_id} == {1, 3}
    assert rows[3].doc_id == 2
    assert rows[1].n_terms_matched == 2
    assert rows[3].n_terms_matched == 1
    # doc 4 matches nothing → absent
    assert len(rows) == 3


def test_bm25_shorter_doc_wins_at_equal_tf(spark):
    """Length normalization: equal tf in a shorter document scores
    higher (b=0.75 penalizes long documents)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha x"),
            (2, "alpha x y z w v u t s r q p"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, "doc_id", "text", [(7, "alpha")], k=2)
    rows = sorted(out.collect(), key=lambda r: r.rk)
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].score_fp > rows[1].score_fp


def test_prf_expansion_widens_recall_and_flips_ranking(spark):
    """PRF on a crafted corpus: the query names a topic one way
    ('vector search'); a relevant document uses a synonym phrasing
    ('embedding retrieval') and shares NO query term, so plain BM25
    cannot see it — but the feedback docs bridge the vocabularies.
    Expansion must (a) pick bridge terms not in the original query,
    (b) respect n_expand, (c) surface the synonym doc in pass two."""
    from eco_pulse_lakehouse_spark.operators.retrieval import (
        bm25_prf_topk,
        bm25_topk,
        prf_expand_terms,
        term_postings,
    )

    docs = spark.createDataFrame(
        [
            # feedback bridge docs: match the query AND carry the
            # synonym vocabulary
            (1, "vector search uses embedding retrieval"),
            (2, "vector search embedding index"),
            (3, "vector search embedding recall"),
            # the target: synonym phrasing only — zero query terms
            (4, "embedding retrieval embedding index embedding recall"),
            # distractors
            (5, "relational join planner"),
            (6, "stream window watermark"),
        ],
        ["doc_id", "text"],
    )
    queries = [(1, "vector search")]
    plain = {r.doc_id for r in bm25_topk(docs, "doc_id", "text", queries, k=6).collect()}
    assert 4 not in plain  # invisible to the literal query
    q_terms = spark.createDataFrame(
        [(1, "vector"), (1, "search")], "query_id long, term string"
    )
    exp = prf_expand_terms(
        term_postings(docs, "doc_id", "text"), q_terms, "doc_id",
        fb_k=3, n_expand=2,
    ).collect()
    terms = {r.term for r in exp}
    assert len(exp) == 2 and not terms & {"vector", "search"}
    assert "embedding" in terms  # the bridge term dominates feedback
    prf = {
        r.doc_id: r.rk
        for r in bm25_prf_topk(
            docs, "doc_id", "text", queries, fb_k=3, n_expand=2, k=6
        ).collect()
    }
    assert 4 in prf  # recall widened by the expansion pass


def test_postings_tf_sum_equals_token_count(spark):
    """Pins the invariant the serving budget stage rests on (ADVICE
    r11): sum(tf) over term_postings == token_count(text) per doc.
    This holds ONLY because tokens() is a bare split that never drops
    tokens — a tokenizer edit that filters empties or punctuation
    would silently change budget cuts. Checked on the real corpus AND
    a crafted doc whose double space yields an empty-string token
    (kept by split, so the equality still holds — the trap case)."""
    from eco_pulse_lakehouse_spark.catalog import load_table
    from eco_pulse_lakehouse_spark.functions.text import token_count
    from eco_pulse_lakehouse_spark.operators.retrieval import term_postings

    crafted = spark.createDataFrame(
        [(9_000_001, "alpha  beta gamma alpha"), (9_000_002, "x")],
        ["doc_id", "text"],
    )
    d = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select(F.col("doc_id").cast("bigint"), "text")
        .unionByName(crafted)
    )
    mismatch = (
        term_postings(d, "doc_id", "text")
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("tf_sum"))
        .join(d.select("doc_id", token_count(F.col("text")).alias("n")), "doc_id", "full")
        .filter(
            F.col("tf_sum").isNull()
            | F.col("n").isNull()
            | (F.col("tf_sum") != F.col("n"))
        )
        .count()
    )
    assert mismatch == 0


def test_search_serving_flagship_stages_all_bind(spark):
    """Flagship #9 on the real corpus: every stage must do real work
    — the budget cut drops fused candidates, the fused order differs
    from plain BM25 (the overlap retriever + expansion moved it),
    cum_tokens is the inclusive running sum in rank order, and rank
    gaps only come from the cut."""
    from eco_pulse_lakehouse_spark.catalog import load_table
    from eco_pulse_lakehouse_spark.corpus.northstar import _BM25_QUERIES
    from eco_pulse_lakehouse_spark.operators.retrieval import bm25_topk
    from eco_pulse_lakehouse_spark.plans.search_serving import (
        search_serving,
    )

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents").select(
        F.col("doc_id").cast("bigint"), "text"
    )
    out = search_serving(d, _BM25_QUERIES).collect()
    assert out and len(out) < 30  # budget cut binds below 3 x top-10
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    plain = {
        (r.query_id, r.rk): r.doc_id
        for r in bm25_topk(d, "doc_id", "text", _BM25_QUERIES, k=10).collect()
    }
    fused_differs = False
    for qid, rows in per_q.items():
        rows.sort(key=lambda r: r.rk)
        run = 0
        for r in rows:
            run += r.n_tokens
            assert r.cum_tokens == run <= 300
            if plain.get((qid, r.rk)) != r.doc_id:
                fused_differs = True
    assert fused_differs


def test_hybrid_serving_recall_flip_vs_keyword_only(spark):
    """Flagship #10 on the real corpus: the hybrid fusion surfaces
    documents the keyword half CANNOT — at least one budget-kept doc
    per run is absent from both keyword ranklists (PRF-expanded BM25
    top-20 is the keyword recall ceiling inside the flagship, and the
    term-overlap list can only contain literal-term matches), so it
    arrived through the dense list — while keyword-retrieved docs
    still appear, i.e. fusion adds recall without discarding the
    keyword side. Also re-pins the budget running sum on the fused
    rank order."""
    from eco_pulse_lakehouse_spark.catalog import load_table
    from eco_pulse_lakehouse_spark.corpus.northstar import _BM25_QUERIES
    from eco_pulse_lakehouse_spark.operators.retrieval import (
        bm25_prf_topk,
        term_overlap_topk,
    )
    from eco_pulse_lakehouse_spark.plans.hybrid_serving import (
        hybrid_serving,
    )

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents").select(
        F.col("doc_id").cast("bigint"), "text"
    )
    e = load_table(spark, sf, "embeddings")
    out = hybrid_serving(d, e, _BM25_QUERIES).collect()
    assert out
    kw = {
        (r.query_id, r.doc_id)
        for r in bm25_prf_topk(
            d, "doc_id", "text", _BM25_QUERIES, fb_k=5, n_expand=3, k=20
        ).collect()
    } | {
        (r.query_id, r.doc_id)
        for r in term_overlap_topk(
            d, "doc_id", "text", _BM25_QUERIES, k=20
        ).collect()
    }
    kept = {(r.query_id, r.doc_id) for r in out}
    dense_only = kept - kw
    assert dense_only, "hybrid output identical to keyword-only"
    assert kept & kw, "fusion discarded the keyword side entirely"
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r.rk)
        run = 0
        for r in rows:
            run += r.n_tokens
            assert r.cum_tokens == run <= 300


def test_rake_multiword_phrases_outrank_frequent_singletons(spark):
    """RAKE's signature (Rose et al. 2010, Table 1 behavior): words
    that co-occur in long candidate phrases get high degree/freq
    scores, so a multi-word domain phrase outranks an isolated word
    that is individually more frequent; phrase segmentation splits
    exactly at stopwords; scores replay in python."""
    from eco_pulse_lakehouse_spark.operators.retrieval import (
        rake_keyphrases,
    )

    docs = spark.createDataFrame(
        [
            (1, "linear diophantine equations and strict inequations"),
            (2, "linear diophantine equations of minimal scope"),
            (3, "criteria criteria criteria and criteria"),  # frequent singleton
            (4, "the criteria to criteria"),
        ],
        ["doc_id", "text"],
    )
    out = rake_keyphrases(docs, "doc_id", "text", top_k=10).collect()
    by_phrase = {r.phrase: r for r in out}
    # segmentation: 'and'/'of'/'the'/'to' never appear inside phrases
    assert all(
        not set(p.split()) & {"the", "a", "of", "and", "to"}
        for p in by_phrase
    )
    top = max(out, key=lambda r: (r.score_fp, r.phrase))
    assert top.phrase == "linear diophantine equations"
    # deg/freq: 'criteria' is the most frequent word but lives in
    # short phrases — every multi-word phrase above outranks it
    assert by_phrase["linear diophantine equations"].score_fp > by_phrase[
        "criteria criteria criteria"
    ].score_fp
    assert by_phrase["linear diophantine equations"].n_occurrences == 2
    # python replay of the scoring on this corpus
    phrases = [
        ["linear", "diophantine", "equations"],
        ["strict", "inequations"],
        ["linear", "diophantine", "equations"],
        ["minimal", "scope"],
        ["criteria", "criteria", "criteria"],
        ["criteria"],
        ["criteria"],
        ["criteria"],
    ]
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for wd in ph:
            freq[wd] = freq.get(wd, 0) + 1
            deg[wd] = deg.get(wd, 0) + len(ph)
    score = {wd: (deg[wd] * 1_000_000) // freq[wd] for wd in freq}
    for ph in {tuple(p) for p in phrases}:
        want = sum(score[wd] for wd in ph)
        assert by_phrase[" ".join(ph)].score_fp == want, ph


def test_textrank_window_semantics_and_centrality(spark):
    """TextRank: (a) window semantics — non-stop words separated by
    ONE stopword (original-position distance 2) are linked, distance
    3 is not; (b) centrality — the word bridging every context
    outranks a word that is merely frequent inside one clique."""
    from eco_pulse_lakehouse_spark.operators.retrieval import (
        textrank_keywords,
    )

    docs = spark.createDataFrame(
        [
            # 'hub' co-occurs with everything; 'loop' repeats but
            # only ever next to itself and 'end'
            (1, "alpha hub beta"),
            (2, "gamma hub delta"),
            (3, "epsilon hub zeta"),
            (4, "loop loop loop loop end"),
            # distance-2 across a stopword: north~south linked
            (5, "north the south"),
            # distance-3 across two stopwords: east!~west NOT linked
            (6, "east the a west"),
        ],
        ["doc_id", "text"],
    )
    out = textrank_keywords(docs, "doc_id", "text", top_k=50).collect()
    pr = {r.word: r.pr for r in out}
    assert pr["hub"] == max(pr.values())  # the bridge dominates
    assert pr["hub"] > pr["loop"]
    # window semantics: north/south present (linked via distance 2);
    # east/west have NO edges at distance 3 → absent from the graph
    assert "north" in pr and "south" in pr
    assert "east" not in pr and "west" not in pr


# --- decontamination ------------------------------------------------------


def test_decontaminate_flags_exact_ngram_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 4-gram with eval
            (2, "entirely different words here now"),
            (3, "quick brown fox leaps high"),  # only a 3-gram overlap
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "so the quick brown fox ran")], ["doc_id", "text"]
    )
    flagged = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate(train, ev, "doc_id", "text", shingle_n=4).collect()
    }
    # eval 4-grams: 'so the quick brown', 'the quick brown fox',
    # 'quick brown fox ran'; doc 1 shares exactly 'the quick brown fox';
    # doc 3's overlap is only 3 words long; doc 2 shares nothing
    assert flagged == {1: 1}


def test_decontaminate_overlap_count_is_distinct_shingles(spark):
    train = spark.createDataFrame(
        [(1, "a b c d a b c d")], ["doc_id", "text"]  # 'a b c d' twice
    )
    ev = spark.createDataFrame([(9, "z a b c d z")], ["doc_id", "text"])
    rows = decontaminate(train, ev, "doc_id", "text", shingle_n=4).collect()
    assert len(rows) == 1
    assert rows[0]["n_overlap"] == 1  # repeated shingle counts once


def test_decontaminate_join_is_hash_equi_join(spark):
    train = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "b c d e f")], ["doc_id", "text"])
    plan = _plan(decontaminate(train, ev, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- triangles ------------------------------------------------------------


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["id_a", "id_b"]
    )
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(pairs).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_ignores_duplicate_and_reversed_edges(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)], ["id_a", "id_b"]
    )
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_closure_probe_is_hash_join(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["id_a", "id_b"])
    plan = _plan(triangle_counts(pairs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- gap fill -------------------------------------------------------------


def test_gap_fill_carries_last_value_forward(spark):
    t0 = datetime(2024, 1, 1, 5, 0, 0)
    rows = [
        (1, t0, 10.0),
        (1, t0 + timedelta(days=3), 7.0),  # days 2-3 silent
        (2, t0, 1.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    agg = F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
    out = gap_fill_daily(ev, "user_id", "ts", agg).collect()
    k1 = sorted(
        [r for r in out if r["user_id"] == 1], key=lambda r: r["day"]
    )
    assert [r["filled_value"] for r in k1] == [10.0, 10.0, 10.0, 7.0]
    assert [r["observed"] for r in k1] == [True, False, False, True]
    # key 2 observed once → exactly its own single-day grid
    assert len([r for r in out if r["user_id"] == 2]) == 1


def test_gap_fill_aggregates_within_day_before_filling(spark):
    t0 = datetime(2024, 1, 1, 5, 0, 0)
    ev = spark.createDataFrame(
        [(1, t0, 2.0), (1, t0 + timedelta(hours=3), 3.5)],
        ["user_id", "ts", "value"],
    )
    agg = F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
    out = gap_fill_daily(ev, "user_id", "ts", agg).collect()
    assert len(out) == 1 and out[0]["filled_value"] == 5.5


# --- interval overlap join ------------------------------------------------


def _iv(spark, rows, s, e):
    return spark.createDataFrame(rows, ["id", s, e])


def test_interval_join_matches_naive(spark):
    t0 = datetime(2024, 1, 1)
    lrows = [
        (i, t0 + timedelta(minutes=7 * i), t0 + timedelta(minutes=7 * i + 13))
        for i in range(40)
    ]
    rrows = [
        (j, t0 + timedelta(minutes=11 * j), t0 + timedelta(minutes=11 * j + 29))
        for j in range(25)
    ]
    left = _iv(spark, lrows, "ls", "le").withColumnRenamed("id", "lid")
    right = _iv(spark, rrows, "rs", "re").withColumnRenamed("id", "rid")
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=600
        ).select("lid", "rid").collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .select("lid", "rid")
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_interval_join_no_duplicate_pairs_across_cells(spark):
    t0 = datetime(2024, 1, 1)
    # long intervals spanning many cells: every pair shares many cells
    left = _iv(spark, [(1, t0, t0 + timedelta(hours=3))], "ls", "le")
    right = _iv(
        spark, [(2, t0 + timedelta(minutes=30), t0 + timedelta(hours=2))],
        "rs", "re",
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_seconds=300
    ).collect()
    assert len(out) == 1


def test_interval_join_is_hash_join(spark):
    t0 = datetime(2024, 1, 1)
    left = _iv(spark, [(1, t0, t0 + timedelta(minutes=5))], "ls", "le")
    right = _iv(spark, [(2, t0, t0 + timedelta(minutes=5))], "rs", "re")
    plan = _plan(
        interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=600
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- forward as-of join ---------------------------------------------------


def test_asof_forward_picks_earliest_at_or_after(spark):
    from eco_pulse_lakehouse_spark.operators.joins import asof_join

    t0 = datetime(2024, 1, 1)

    def ts(m):
        return t0 + timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(20)), (2, ts(5))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, ts(12), "a"), (1, ts(20), "b"), (1, ts(25), "c")],
        ["k", "rts", "v"],
    )
    out = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_vals=["v"], direction="forward",
        ).collect()
    }
    assert out[(1, ts(10))] == "a"   # earliest right at-or-after 10:00
    assert out[(1, ts(20))] == "b"   # tie takes the equal-ts right row
    assert out[(2, ts(5))] is None   # no right rows for key 2


def test_priority_sample_is_weight_proportional_and_deterministic(spark):
    from eco_pulse_lakehouse_spark.operators.sampling import priority_sample

    n = 2000
    df = spark.range(n).select(
        F.col("id"),
        # first half weight 1, second half weight 50
        F.when(F.col("id") < n // 2, 1.0).otherwise(50.0).alias("w"),
    )
    picked = priority_sample(df, "id", "w", k=200).collect()
    heavy = sum(1 for r in picked if r["w"] == 50.0)
    # heavy rows are 50x likelier; expect the sample utterly dominated
    # by them (binomial tail makes <150/200 astronomically unlikely)
    assert heavy > 150
    # determinism: same selection under a different partitioning
    again = priority_sample(df.repartition(13), "id", "w", k=200).collect()
    assert {r["id"] for r in picked} == {r["id"] for r in again}


def test_bloom_join_equals_plain_join_even_with_tiny_bitmap(spark):
    """With a deliberately saturated 64-bit bitmap the Bloom pass is
    nearly all false positives — the joined RESULT must still equal
    the plain join exactly (no false negatives, join removes FPs)."""
    from eco_pulse_lakehouse_spark.operators.joins import (
        bloom_join,
        bloom_prefilter,
    )

    fact = spark.range(500).select(F.col("id").alias("fk"))
    dim = spark.range(0, 500, 25).select(F.col("id").alias("dk"))  # 20 keys
    plain = {
        (r.fk, r.dk)
        for r in fact.join(dim, fact.fk == dim.dk).collect()
    }
    for n_bits in (64, 1 << 14):
        got = {
            (r.fk, r.dk)
            for r in bloom_join(fact, dim, "fk", "dk", n_bits=n_bits).collect()
        }
        assert got == plain, f"n_bits={n_bits}"
    # a roomy bitmap prunes hard: way fewer survivors than fact rows
    survivors = bloom_prefilter(fact, dim, "fk", "dk", n_bits=1 << 14).count()
    assert 20 <= survivors < 100


def test_sax_motif_windows_share_word(spark):
    """Two occurrences of the same shape must symbolize to the same
    SAX word even at different offsets/scales (z-normalization), and
    a structurally different window must get a different word."""
    from eco_pulse_lakehouse_spark.operators.timeseries import sax_words

    motif = [1, 9, 2, 8, 1, 9, 2, 8, 1, 9, 2, 8, 1, 9, 2, 8]
    ramp = list(range(16))
    vals = motif + [v * 3.0 + 100 for v in motif] + ramp
    rows = [(1, i, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id INT, ts INT, event_id INT, value DOUBLE"
    )
    out = {
        r.win_start: r.sax_word
        for r in sax_words(
            df, "user_id", ("ts", "event_id"), "value",
            window_len=16, stride=16, paa_segments=4,
        ).collect()
    }
    assert set(out) == {1, 17, 33}
    assert out[1] == out[17], "scaled/shifted motif must share the word"
    assert out[33] != out[1], "ramp must differ from the oscillation"
    assert all(len(w) == 4 and set(w) <= set("abcd") for w in out.values())


def test_sax_motif_cap_bounds_hot_bucket(spark):
    """Adversarial skew fixture: many constant (flat) series all
    symbolize to ONE sax word, the quadratic hot bucket the round-2
    verdict flagged. The cap must (a) bound that word's pairs at
    cap·(cap-1)/2, (b) emit a SUBSET of the exact result, (c) leave
    words under the cap bit-identical, and (d) report the truncation
    through sax_bucket_overflow — never silently."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        sax_bucket_overflow,
        sax_motif_pairs,
    )

    rows = []
    # 6 flat users × 80 points → 9 windows each = 54 windows, one word
    for u in range(6):
        rows += [(u, i, i, 5.0) for i in range(80)]
    # 2 oscillating users → a different, cold word family
    motif = [1, 9, 2, 8] * 4
    for u in (100, 101):
        rows += [(u, i, i, float(motif[i % 16])) for i in range(32)]
    df = spark.createDataFrame(
        rows, "user_id INT, ts INT, event_id INT, value DOUBLE"
    )
    kw = dict(
        key_col="user_id", order_cols=("ts", "event_id"),
        value_col="value", window_len=16, stride=8, paa_segments=4,
        max_dist=1e9,
    )
    exact = {
        (r.key_a, r.start_a, r.key_b, r.start_b, r.dist)
        for r in sax_motif_pairs(df, **kw).collect()
    }
    cap = 10
    capped_rows = sax_motif_pairs(
        df, **kw, max_bucket_windows=cap
    ).collect()
    capped = {
        (r.key_a, r.start_a, r.key_b, r.start_b, r.dist)
        for r in capped_rows
    }
    assert capped <= exact, "cap must never invent pairs"
    flat_pairs = [r for r in capped_rows if r.key_a < 100]
    assert len(flat_pairs) == cap * (cap - 1) // 2, (
        "hot word must be bounded at cap·(cap-1)/2"
    )
    # deterministic selection: the kept windows are the first `cap`
    # under (user_id, win_start) — users 0 and 1 only
    assert {r.key_a for r in flat_pairs} <= {0, 1}
    cold_exact = {p for p in exact if p[0] >= 100}
    cold_capped = {p for p in capped if p[0] >= 100}
    assert cold_exact == cold_capped, "under-cap words must be exact"
    over = sax_bucket_overflow(
        df, max_bucket_windows=cap, **{
            k: v for k, v in kw.items() if k != "max_dist"
        }
    ).collect()
    assert len(over) == 1
    assert over[0].n_windows == 54
    assert over[0].n_dropped_windows == 44
    assert over[0].uncapped_pairs == 54 * 53 // 2


def test_sax_motif_prefilter_lossless_at_boundary(spark):
    """The per-coordinate refine prefilter (r14) must be LOSSLESS:
    identical pair sets with the bound off, the default full-window
    form, and a sparse subset — including a pair sitting EXACTLY at
    dist == max_dist (the inclusive boundary the ½-quantum + 1e-9
    slack exists to protect)."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        sax_motif_pairs,
    )

    rows = []
    motif = [1, 9, 2, 8] * 4
    for u in range(4):
        # same shape, per-user jitter → same sax word, varied dists
        rows += [
            (u, i, i, float(motif[i % 16]) + 0.13 * u * ((i * 7) % 5))
            for i in range(32)
        ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts INT, event_id INT, value DOUBLE"
    )
    kw = dict(
        key_col="user_id", order_cols=("ts", "event_id"),
        value_col="value", window_len=16, stride=8, paa_segments=4,
    )
    allp = sax_motif_pairs(
        df, **kw, max_dist=1e9, prefilter_coords=None
    ).collect()
    assert len(allp) >= 3, "fixture must produce comparable pairs"
    dists = sorted(r.dist for r in allp)
    boundary = dists[len(dists) // 2]
    assert boundary > 0
    variants = {
        "off": None,
        "default": "auto",
        "sparse": (1, 6, 11, 16),
    }
    got = {}
    for name, coords in variants.items():
        got[name] = {
            (r.key_a, r.start_a, r.key_b, r.start_b, r.dist)
            for r in sax_motif_pairs(
                df, **kw, max_dist=boundary, prefilter_coords=coords
            ).collect()
        }
    assert got["default"] == got["off"], "default prefilter lost pairs"
    assert got["sparse"] == got["off"], "sparse prefilter lost pairs"
    assert any(p[4] == boundary for p in got["off"]), (
        "the dist == max_dist boundary pair must be kept"
    )


def test_pmi_ranks_true_collocation_above_independents(spark):
    """A bigram that only ever occurs as a unit ('new york') must get
    higher PMI than bigrams formed by independently-shuffled fillers,
    and PMI must be symmetric-input deterministic (exact counts)."""
    from eco_pulse_lakehouse_spark.operators.retrieval import collocations_pmi

    filler = ["alpha", "beta", "gamma", "delta"]
    rows = []
    i = 0
    for _ in range(3):
        for a in filler:
            for b in filler:
                if a != b:
                    rows.append((i, f"new york {a} {b}"))
                    i += 1
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        (r.w1, r.w2): r.pmi
        for r in collocations_pmi(df, "doc_id", "text", min_count=2).collect()
    }
    ny = out[("new", "york")]
    indep = [v for k, v in out.items() if "new" not in k and "york" not in k]
    assert indep and all(ny > v for v in indep), (ny, sorted(indep)[-3:])


def test_trend_slope_recovers_linear_series(spark):
    """y = 2.5·x + 7 sampled hourly must come back slope≈60/day and
    intercept≈7; a constant-x key yields NULL slope."""
    import datetime

    from eco_pulse_lakehouse_spark.operators.timeseries import (
        TREND_EPOCH_BASE,
        trend_slopes,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(hours=i), 2.5 * i + 7.0)
        for i in range(48)
    ] + [(2, base, 5.0), (2, base, 9.0)]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, value DOUBLE"
    )
    out = {r.user_id: r for r in trend_slopes(df, "user_id", "ts", "value").collect()}
    assert abs(out[1].slope_per_day - 2.5 * 24) < 1e-5
    assert abs(out[1].intercept - 7.0) < 1e-6
    assert out[2].slope_per_day is None and out[2].intercept is None


def test_dtw_refine_matches_python_reference(spark):
    """The nested-fold DTW must equal an independent pure-Python DP
    bit-for-bit (both run the same IEEE adds/mins in the same
    order), including band-excluded cells pinned to +inf."""
    import math

    from eco_pulse_lakehouse_spark.catalog import load_table
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        dtw_motif_pairs,
        sax_words,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    W, R = 4, 1

    sax = sax_words(
        ev, "user_id", ("ts", "event_id"), "value", 16, 8, W,
        with_zvec=True,
    )
    sd = 16 // W
    paa_rows = {
        (r.user_id, r.win_start): [
            sum(r.zvec[m * sd : (m + 1) * sd]) / float(sd) for m in range(W)
        ]
        for r in sax.collect()
    }

    def py_dtw(pa, pb):
        inf = float("inf")
        prev = [0.0] + [inf] * W
        for i in range(1, W + 1):
            row = [inf]
            for j in range(1, W + 1):
                if abs(i - j) > R:
                    row.append(inf)
                    continue
                d = pa[i - 1] - pb[j - 1]
                row.append(d * d + min(prev[j], prev[j - 1], row[j - 1]))
            prev = row
        return math.sqrt(prev[W])

    got = dtw_motif_pairs(
        ev, "user_id", ("ts", "event_id"), "value", 16, 8, W,
        band_radius=R, max_dist=1e18,
    ).collect()
    assert got
    for r in got:
        expect = py_dtw(
            paa_rows[(r.key_a, r.start_a)], paa_rows[(r.key_b, r.start_b)]
        )
        assert r.dtw_dist == expect, (r, expect)
    # elasticity sanity: DTW never exceeds the lock-step (band-0
    # diagonal) distance of the same pair
    diag = dtw_motif_pairs(
        ev, "user_id", ("ts", "event_id"), "value", 16, 8, W,
        band_radius=0, max_dist=1e18,
    ).collect()
    d0 = {(r.key_a, r.start_a, r.key_b, r.start_b): r.dtw_dist for r in diag}
    for r in got:
        assert r.dtw_dist <= d0[(r.key_a, r.start_a, r.key_b, r.start_b)] + 1e-12


def test_trigram_backoff_matches_python_reference(spark):
    """trigram_backoff_score vs an independent pure-Python stupid
    backoff on a crafted corpus where every tier fires: train docs
    (ids hashing < 0.5) supply the LM; a held-out doc contains an
    unseen trigram (bi tier), an unseen bigram (uni tier), and an
    unseen WORD (the OOV floor)."""
    import math

    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.operators.retrieval import (
        trigram_backoff_score,
    )
    from eco_pulse_lakehouse_spark.operators.sampling import KNUTH, M32

    def u(i):
        return (i * KNUTH % M32) / M32

    # ids 0.. : pick two train ids (u<0.5) and one held-out (u>=0.5)
    train_ids = [i for i in range(40) if u(i) < 0.5][:3]
    test_id = next(i for i in range(40) if u(i) >= 0.5)
    rows = [
        (train_ids[0], "a b c d e"),
        (train_ids[1], "a b c x y"),
        (train_ids[2], "b c d a b"),
        # "e a b": e->a unseen bigram but both words seen (uni tier);
        # "y zz": zz unseen word (OOV floor); "c d e": seen trigram
        (test_id, "c d e a b y zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    train_pred = (
        F.pmod(F.col("doc_id").cast("bigint") * F.lit(KNUTH), F.lit(M32))
        / F.lit(M32)
        < 0.5
    )
    got = {
        r.doc_id: (r.n_scored, r.avg_surprisal)
        for r in trigram_backoff_score(df, train_pred).collect()
    }

    # pure-Python reference
    from collections import Counter

    toks = {i: t.split(" ") for i, t, in rows}
    tr = [i for i, _ in rows if u(i) < 0.5]
    c3, c3x, c2, c2x, c1 = Counter(), Counter(), Counter(), Counter(), Counter()
    n = 0
    for i in tr:
        w = toks[i]
        for a, b, c in zip(w, w[1:], w[2:]):
            c3[(a, b, c)] += 1
            c3x[(a, b)] += 1
        for a, b in zip(w, w[1:]):
            c2[(a, b)] += 1
            c2x[a] += 1
        for a in w:
            c1[a] += 1
            n += 1

    def halfup(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    for i, _ in rows:
        w = toks[i]
        fps = []
        for a, b, c in zip(w, w[1:], w[2:]):
            if (a, b, c) in c3:
                s = c3[(a, b, c)] / c3x[(a, b)]
            elif (b, c) in c2:
                s = 0.4 * (c2[(b, c)] / c2x[b])
            elif c in c1:
                s = (0.4 * 0.4) * (c1[c] / n)
            else:
                s = (0.4 * 0.4) * (1.0 / n)
            fps.append(halfup(-math.log(s) * 1e6))
        if fps:
            expect = (len(fps), sum(fps) / len(fps) / 1e6)
            assert got[i][0] == expect[0]
            assert abs(got[i][1] - expect[1]) < 1e-6, (i, got[i], expect)
        else:
            assert got[i] == (0, None)
