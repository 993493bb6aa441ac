#!/usr/bin/env python
"""sf1 scale rehearsal (VERDICT r04 item 7): measure how the headline
plans scale from sf0.1 to a synthetic 10x corpus, and record
per-family scaling exponents in BENCH_DETAIL.json + SCALE.md.

The driver provides no sf1 data (TESTDATA.md: sf up to 0.1,
read-only), so this builds a PERF-ONLY 10x scale-up under /tmp from
sf0.1 — never used for correctness:

* dims (region..part) are byte-copied (fixed-dim growth: fan-in per
  entity rises 10x, the realistic shape);
* facts are 10 key-shifted copies — orders/lineitem shift o_orderkey
  jointly (join structure preserved), events shift (event_id,
  user_id) (10x independent users with identical per-user series),
  embeddings shift vec_id (query set stays the 10 copy-0 vectors, so
  ANN cost scales in |C| alone);
* documents shift doc_id AND suffix every word with the copy index —
  each copy gets a DISJOINT vocabulary, so cross-copy shingle
  buckets don't exist and the dedup family's candidate pairs scale
  linearly (10 verbatim copies would make every pair-emitting
  operator's OUTPUT quadratic by construction — that would measure
  the data artifact, not the operator; within-copy duplicates
  remain, so exact-dedup still finds 10x the dups). FLIP SIDE: the
  suffixing makes LITERAL query terms match nothing at sf1, so the
  keyword-retrieval entries (x4_bm25 / x4_rrf_fusion / bm25_table)
  are not rehearsed here; x4_prf_expansion keeps a row because its
  timing still exercises the corpus-scaled postings/df/dl/stats
  build, with rows_sf1=0 annotated as this artifact.

* events additionally get a per-copy deterministic VALUE jitter
  (copy 0 untouched): identical per-user series would degenerate
  every SAX word into one hot bucket (candidate pairs x100 at 10x —
  measuring the data artifact, not the operator), and a pure
  per-copy offset or scale would be stripped by z-normalization, so
  the jitter is a per-row hash ramp that changes each copy's series
  SHAPE. This lets w16 (uncapped SAX motifs, round-5's exclusion)
  be measured alongside w19, closing VERDICT r05 item 3.

Usage: python tools/sf1_rehearsal.py  (~10 min; writes the
"sf1_rehearsal" section of BENCH_DETAIL.json).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# v3 suffix = build recipe version (r06 added the events jitter; v3
# adds per-copy embedding jitter so LSH signatures stay distributed);
# bumping it invalidates any cached _BUILT_* markers from older runs
DST = "/tmp/eco_pulse_sf1_v3"
COPIES = 10

QUERIES = [
    "flagship_gold_risk", "a7_summary", "j3_equi_join_3way",
    "j2_range_join_grid", "w1_latest_per_key", "w6_running_sum",
    "o4_distributed_global_rank", "tpch_q1", "tpch_q3", "tpch_q5",
    "x1_hash_dedup_key", "x4_text_stats", "x2_ngram_jaccard",
    "x2_minhash_lsh", "x3_cosine_topk", "x3_quantized_topk",
    "x3_pq_topk", "x3_lsh_multiprobe", "t5_stream_dedup",
    "x6_dsir_weights", "x6_dsir_resample", "x2_line_dedup",
    "x1_soft_dedup",
    # x3_ivf_topk REJOINED in round 8: the entry now derives
    # n_centroids = max(16, round(sqrt(N))) from the corpus size, so
    # per-list candidate sets stay ~sqrt(N) and the r07 fixed-knob
    # exponent-1.46 artifact no longer applies (tools/
    # ivf_scaling_probe.py predicted exp ≈0.1 with the scaled knob).
    "x3_ivf_topk",
    "w16_sax_motif_pairs",
    "w19_sax_motif_capped", "flagship_text_pipeline",
    "skew1_salted_count", "skew4_hot_key_count",
    # round-8 additions (VERDICT r07 item 2): the late round-7
    # families whose 10x exponents were unmeasured.
    "x2_prefix_filter_jaccard", "x2_canonical_per_cluster",
    "x4_trigram_backoff", "x6_budget_select", "x4_bpe_merges",
    "x3_binary_quant_topk", "x6_k_anonymity",
    "flagship_curation_select",
    # round-8 new families
    "x4_wordpiece_merges", "x4_sp_unigram_em",
    "x4_perplexity_buckets",
    # round-14 additions (VERDICT r13 item 8): the r13 aHash rewrite
    # is the one change that ADDED exchanges — re-check the trade
    # where shuffle cost is real; pHash rides along as its control.
    "x5_image_ahash", "x5_image_phash",
]

FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.catalog import TABLES, load_table

    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        done = os.path.join(DST, f"_BUILT_{t}")
        if os.path.exists(done):
            continue
        if t not in FACT_KEYS:
            shutil.copyfile(
                os.path.join(SRC, f"{t}.parquet"),
                os.path.join(DST, f"{t}.parquet"),
            )
            open(done, "w").close()
            continue
        df = load_table(spark, SRC, t)
        shifts = {
            k: (df.agg(F.max(k)).collect()[0][0] or 0) + 1
            for k in FACT_KEYS[t]
        }
        # orders and lineitem MUST shift their orderkey by the SAME
        # constant or copies 1..9 silently re-wire the join (round-5
        # review: per-table maxes only coincide by luck — e.g. a
        # trailing order with no lineitems would misalign every
        # join-bearing rehearsal query)
        if t in ("orders", "lineitem"):
            okey = "o_orderkey" if t == "orders" else "l_orderkey"
            o_max = (
                load_table(spark, SRC, "orders")
                .agg(F.max("o_orderkey")).collect()[0][0] or 0
            )
            l_max = (
                load_table(spark, SRC, "lineitem")
                .agg(F.max("l_orderkey")).collect()[0][0] or 0
            )
            shifts[okey] = max(o_max, l_max) + 1
        parts = []
        for i in range(COPIES):
            c = df
            for k, kk in shifts.items():
                c = c.withColumn(k, (F.col(k) + F.lit(i * kk)).cast(
                    dict(df.dtypes)[k]))
            if t == "events" and i > 0:
                # shape-changing per-copy jitter (see module doc):
                # a Knuth-hash ramp over the (already-shifted)
                # event_id, scaled by the copy index — deterministic,
                # no RNG, and NOT removable by z-normalization
                jit = (
                    F.pmod(
                        F.col("event_id") * F.lit(2654435761),
                        F.lit(997),
                    ).cast("double")
                    / F.lit(100.0)
                ) * F.lit(float(i))
                c = c.withColumn("value", F.col("value") + jit)
            if t == "embeddings" and i > 0:
                # per-copy vector jitter (v3): without it, 10 copies
                # of IDENTICAL vectors put 10x members in every LSH
                # bucket and cross-copy pair counts go quadratic —
                # the same degenerate-copy artifact the documents
                # suffix and events ramp already fix. A small
                # deterministic (vec_id, position)-keyed ramp flips
                # low-margin signs so signatures stay realistically
                # distributed; ±~0.1 max at copy 9 keeps cosine
                # structure intact. Two-arg lambda is DELIBERATE
                # (element, index) — position must key the hash.
                etype = dict(df.dtypes)["embedding"]
                ramp = F.col("vec_id") * F.lit(2654435761)
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, pos: x.cast("double")
                        + (
                            F.pmod(
                                ramp + pos.cast("bigint") * F.lit(40503),
                                F.lit(211),
                            ).cast("double")
                            - F.lit(105.0)
                        )
                        / F.lit(10000.0)
                        * F.lit(float(i)),
                    ).cast(etype),
                )
            if t == "documents":
                # exactly-one-arg lambda: a default arg (s=sfx) makes
                # pyspark infer the TWO-arg (element, index) form and
                # silently binds the suffix to the position index —
                # every copy then keeps an identical vocabulary and
                # cross-copy pair counts go quadratic (hit round 5)
                def _suffix(copy_i):
                    s = F.lit(f"_c{copy_i}")
                    return lambda w: F.concat(w, s)

                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(F.split("text", " "), _suffix(i)),
                        " ",
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(DST, f"{t}.parquet")
        )
        open(done, "w").close()
        print(f"built {t} x{COPIES}", flush=True)


def stage_01(spark) -> str:
    """32-way silver staging of sf0.1 — bench.py's layout discipline,
    so both scale points run the same file layout."""
    import bench

    stage, sec = bench.stage_silver(spark, SRC)
    print(f"sf0.1 staged in {sec}s", flush=True)
    return stage


def time_query(fn, spark, sf_dir, runs=2):
    import bench

    bench.materialize(fn(spark, sf_dir))  # warm-up
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        bench.materialize(fn(spark, sf_dir))
        ts.append(round(time.perf_counter() - t0, 3))
    return min(ts), ts


def main() -> None:
    from eco_pulse_lakehouse_spark.session import get_session

    spark = get_session("eco-pulse-sf1")
    import __spark_entry__ as entry

    qs = entry.queries()
    build_sf1(spark)
    s01 = stage_01(spark)

    heavy_only = "--heavy-only" in sys.argv
    # --only a,b,c: rehearse just those entries and MERGE their rows
    # into the existing section (late-added families don't force a
    # full 25-minute re-run)
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    out = {}
    run_list = (
        [] if heavy_only
        else [n for n in QUERIES if only is None or n in only]
        + ([n for n in (only or set()) if n not in QUERIES])
    )
    for name in run_list:
        fn = qs[name]
        t01, runs01 = time_query(fn, spark, s01)
        t1, runs1 = time_query(fn, spark, DST)
        r01 = fn(spark, s01).count()
        r1 = fn(spark, DST).count()
        exp = (
            round(math.log(t1 / t01) / math.log(COPIES), 2)
            if t01 > 0 and t1 > 0
            else None
        )
        out[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2) if t01 else None,
            "time_exponent": exp,
            "rows_sf0.1": r01,
            "rows_sf1": r1,
        }
        print(name, json.dumps(out[name]), flush=True)

    # --only: keep the standing heavy section (merged below) instead
    # of re-paying the one-off families
    heavy = {} if only is not None else heavy_families(spark, qs, s01)

    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    try:
        detail = json.load(open(detail_path))
    except FileNotFoundError:
        detail = {}
    except (json.JSONDecodeError, UnicodeDecodeError):
        # same contract as bench.py (ADVICE r06): never silently
        # replace a sidecar holding other tools' sections
        os.replace(detail_path, detail_path + ".corrupt")
        print(f"WARNING: unparseable sidecar backed up to "
              f"{detail_path}.corrupt", flush=True)
        detail = {}
    if heavy_only:
        # keep the existing headline section, refresh heavy only
        out = detail.get("sf1_rehearsal", {}).get("queries", out)
    elif only is not None:
        # merge the subset into the standing rows
        prev = detail.get("sf1_rehearsal", {}).get("queries", {})
        out = {**prev, **out}
        heavy = detail.get("sf1_rehearsal", {}).get(
            "heavy_families", heavy
        )
    detail["sf1_rehearsal"] = {
        "copies": COPIES,
        "method": "key-shifted 10x of sf0.1; documents get per-copy "
                  "word suffixes (disjoint vocabularies); events get "
                  "per-copy shape-changing value jitter so SAX words "
                  "stay realistically distributed (w16 measurable)",
        "queries": out,
        "heavy_families": heavy,
    }
    json.dump(detail, open(detail_path, "w"), indent=1)
    print(json.dumps({"sf1_rehearsal_written": True,
                      "n_queries": len(out),
                      "n_heavy": len(heavy)}))


# Heavy one-off families (VERDICT r06 item 3): timed ONCE per scale
# point (minutes-scale iterative jobs; bench.py times them once too,
# so single-shot is the comparable protocol).
HEAVY_QUERIES = ["x2_dedup_clusters", "g1_pagerank", "x7_pack_documents"]


def heavy_families(spark, qs, s01) -> dict:
    import bench
    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.catalog import load_table
    from eco_pulse_lakehouse_spark.operators.dedup import (
        bounded_phonetic_pairs,
        phonetic_code,
    )

    out = {}
    for name in HEAVY_QUERIES:
        fn = qs[name]
        # warm the operator's code path (codegen + python workers) on
        # the tiny sf0.01 tables: single-shot timings otherwise charge
        # first-use overhead to whichever scale point runs first
        # (observed: x7's sf0.1 number 5x inflated -> negative
        # exponent)
        bench.materialize(fn(spark, "/root/testdata/sf0.01"))
        t0 = time.perf_counter()
        bench.materialize(fn(spark, s01))
        t01 = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        bench.materialize(fn(spark, DST))
        t1 = round(time.perf_counter() - t0, 3)
        out[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2) if t01 else None,
            "time_exponent": (
                round(math.log(t1 / t01) / math.log(COPIES), 2)
                if t01 > 0 and t1 > 0
                else None
            ),
        }
        print(name, json.dumps(out[name]), flush=True)

    # Phonetic blocking: part is a byte-copied DIM in this rehearsal
    # (fixed-dim growth), so the 10x point needs a dedicated
    # key-shifted 10x part table — names deliberately UNCHANGED
    # (real catalogs grow with heavy name reuse; that reuse is
    # exactly why the bare-code block key is the hazard).
    part10_path = os.path.join(DST, "part10.parquet")
    if not os.path.exists(os.path.join(DST, "_BUILT_part10")):
        p = load_table(spark, SRC, "part")
        shift = (p.agg(F.max("p_partkey")).collect()[0][0] or 0) + 1
        parts = [
            p.withColumn(
                "p_partkey", F.col("p_partkey") + F.lit(i * shift)
            )
            for i in range(COPIES)
        ]
        u = parts[0]
        for c in parts[1:]:
            u = u.unionByName(c)
        u.repartition(32).write.mode("overwrite").parquet(part10_path)
        open(os.path.join(DST, "_BUILT_part10"), "w").close()

    def bounded(src_path):
        p = spark.read.parquet(src_path).select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_name",
        )
        return bounded_phonetic_pairs(
            p, "p_partkey", "p_name", max_edit=3, max_block=50
        )

    bench.materialize(
        bounded(os.path.join("/root/testdata/sf0.01", "part.parquet"))
    )
    t0 = time.perf_counter()
    bench.materialize(bounded(os.path.join(SRC, "part.parquet")))
    t01 = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    bench.materialize(bounded(part10_path))
    t1 = round(time.perf_counter() - t0, 3)
    # the UNBOUNDED form's 10x candidate volume, predicted from
    # block sizes alone (a tiny aggregation — materializing 100x the
    # 25M sf0.1 pairs just to time the hazard would measure ~2.5G
    # levenshtein calls, the exact cliff the bounded form removes)
    p10 = spark.read.parquet(part10_path)
    uncapped = (
        p10.select(phonetic_code(F.col("p_name")).alias("pc"))
        .groupBy("pc")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .collect()[0]["pairs"]
    )
    out["x2_phonetic_bounded"] = {
        "sf0.1_sec": t01,
        "sf1_sec": t1,
        "ratio": round(t1 / t01, 2) if t01 else None,
        "time_exponent": (
            round(math.log(t1 / t01) / math.log(COPIES), 2)
            if t01 > 0 and t1 > 0
            else None
        ),
        "note": "10x part via dedicated key-shifted part10 (names "
                "reused, the realistic catalog shape); unbounded "
                f"bare-code form predicts {int(uncapped):,} candidate "
                "pairs at 10x (~100x sf0.1's 25M) and is deliberately "
                "not materialized — the bounded entry is the "
                "scale-sanctioned form (w16->w19 precedent)",
    }
    print("x2_phonetic_bounded", json.dumps(out["x2_phonetic_bounded"]),
          flush=True)
    return out


if __name__ == "__main__":
    main()
