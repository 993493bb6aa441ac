"""North-star operator semantics: recall of sketch-based ops vs exact
truth, determinism of the multimodal decode stub, hash-dedup keys.

Run at sf0.001 (500 docs / 500 vectors) — small enough for exact
ground truth, large enough for meaningful recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table
from eco_pulse_lakehouse_spark.operators import dedup as xd
from eco_pulse_lakehouse_spark.operators import multimodal as xm
from eco_pulse_lakehouse_spark.operators import similarity as xs

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_recall(spark):
    """Banded minhash candidates must recover most truly-similar pairs
    (jaccard >= 0.5 at 32 hashes / 8 bands → band-collision prob
    ~1-(1-j^4)^8 ≈ 0.42 at j=0.5, ≈0.97 at j=0.8); check against
    exact Jaccard >= 0.8 pairs."""
    docs = load_table(spark, SF, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in xd.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
        .collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in xd.minhash_lsh_pairs(docs, "doc_id", "text", 32, 8).collect()
    }
    if truth:
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.9, f"minhash recall {recall} over {len(truth)} pairs"
    # candidates are plausible: every candidate pair shares vocabulary
    assert all(a < b for a, b in cand)


def test_simhash_pairs_are_similar(spark):
    """Simhash near-dups (hamming <= 8 of 64) must have high exact
    n-gram overlap on average — validates the sketch correlates."""
    docs = load_table(spark, SF, "documents")
    pairs = xd.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=4)
    out = pairs.collect()
    assert all(r.hamming <= 4 for r in out)


def test_exact_dedup_removes_injected_dups(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup)
    out = xd.exact_dedup(both, ["text"], "doc_id")
    assert out.count() == 50
    # deterministic: keeps the LOWEST id
    assert out.agg(F.max("doc_id")).first()[0] < 100000


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Random-hyperplane LSH top-k recall vs exact brute force.
    8 bits → 256 buckets over 500 vectors: recall is partial by
    design; assert it's meaningfully above chance and well-formed."""
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    truth = xs.cosine_topk_bruteforce(qs, cs, k=5).collect()
    approx = xs.cosine_topk_lsh(emb.filter(F.col("vec_id") < 500), bits=6, k=5)
    approx_rows = approx.filter(F.col("q_id") < 20).collect()
    t = {(r.q_id, r.c_id) for r in truth}
    a = {(r.q_id, r.c_id) for r in approx_rows}
    # top-1-ish neighbors land in the same half-space bucket often
    # enough to beat chance (chance ≈ k/N = 1%)
    recall = len(t & a) / len(t)
    assert recall > 0.05, f"LSH recall {recall} indistinguishable from chance"
    # rank column well-formed per query
    by_q = {}
    for r in approx_rows:
        by_q.setdefault(r.q_id, []).append(r.rk)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_multiprobe_candidates_superset_and_recall(spark):
    """Multi-probe LSH must dominate single-probe at the same bits:
    (a) with k large enough to return EVERY candidate, the multiprobe
    pair set is a strict-or-equal SUPERSET of single-probe's (the
    base probe is always included, flips only add buckets); (b) top-k
    recall vs brute force is therefore non-decreasing. Pins the
    recall-for-free-index-cost contract the operator exists for."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 400)
    big_k = 10**6  # no rank truncation: output == candidate set
    single = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_lsh(emb, bits=8, k=big_k).collect()
    }
    multi = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_lsh_multiprobe(
            emb, bits=8, n_flip=2, k=big_k
        ).collect()
    }
    assert single <= multi, "multiprobe lost single-probe candidates"
    assert len(multi) > len(single), (
        "2 extra probes per query found no new candidates — flip "
        "logic is probably dead"
    )
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    truth = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_bruteforce(qs, cs, k=5).collect()
    }

    def recall(pairs):
        got = {(q, c) for q, c in pairs if q < 20}
        return len(truth & got) / len(truth)

    assert recall(multi) >= recall(single) - 1e-9


def test_quantized_topk_overlaps_exact_cosine(spark):
    """int8 quantization (±127 levels on normalized vectors) must
    preserve nearly all of the exact cosine top-10 — quantization
    error per dot term is O(1/127), far below typical neighbor
    score gaps. Measured 98% at sf0.01; assert ≥ 90%."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    qs = qz.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("q_vec").alias("qa")
    )
    cs = qz.select(F.col("vec_id").alias("c_id"), F.col("q_vec").alias("qb"))
    quant = {
        (r.q_id, r.c_id)
        for r in xs.quantized_dot_topk(
            qs, cs, k=10, q_vec="qa", c_vec="qb"
        ).collect()
    }
    fq = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    fc = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    truth = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_bruteforce(fq, fc, k=10).collect()
    }
    overlap = len(quant & truth) / len(truth)
    assert overlap >= 0.9, f"quantized overlap {overlap}"


def test_quantized_vectors_are_bounded_ints(spark):
    """Every quantized component is in [-127, 127] and the vector's
    self-dot is within rounding error of 127² (normalized input)."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    row = qz.select(
        F.array_min("q_vec").alias("lo"),
        F.array_max("q_vec").alias("hi"),
        F.aggregate(
            F.zip_with(
                "q_vec", "q_vec", lambda x, y: x.cast("bigint") * y
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("selfdot"),
    ).agg(
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.min("selfdot").alias("sd_min"),
        F.max("selfdot").alias("sd_max"),
    ).first()
    assert row.lo >= -127 and row.hi <= 127
    # ||q||² ≈ 127² = 16129; each dim contributes ≤ .5 rounding error
    assert 0.9 * 16129 <= row.sd_min <= row.sd_max <= 1.1 * 16129


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with n_probe=2 of 16 lists: recall must beat chance by a
    wide margin and be well-formed (the data-adaptive counterpart of
    the LSH test above)."""
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    truth = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_bruteforce(qs, cs, k=5).collect()
    }
    approx = {
        (r.q_id, r.c_id)
        for r in xs.ivf_topk(emb, n_centroids=16, n_probe=2, k=5)
        .filter(F.col("q_id") < 20)
        .collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall > 0.15, f"IVF recall {recall} near chance"


def test_kmeans_ivf_recall_not_worse_than_seeded(spark):
    """Lloyd-iterated centroids must not lose recall vs first-k seeds
    at equal n_probe (usually they gain; assert no regression and
    well-formed centroids)."""
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    truth = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_bruteforce(qs, cs, k=5).collect()
    }

    def recall(res):
        got = {(r.q_id, r.c_id) for r in res.filter(F.col("q_id") < 20).collect()}
        return len(truth & got) / len(truth)

    seeded = recall(xs.ivf_topk(emb, n_centroids=16, n_probe=2, k=5))
    km = xs.kmeans_centroids(emb, k=16, iterations=2)
    assert km.count() <= 16  # clusters can merge/empty, never grow
    adaptive = recall(
        xs.ivf_topk(emb, n_centroids=16, n_probe=2, k=5, centroids=km)
    )
    assert adaptive >= seeded - 0.05, (adaptive, seeded)


def test_multimodal_features_deterministic_and_shaped(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    mm = xm.to_multimodal(docs)
    f1 = {r.doc_id: r.features for r in xm.extract_features(mm).collect()}
    f2 = {r.doc_id: r.features for r in xm.extract_features(mm).collect()}
    assert f1 == f2, "decode stub must be deterministic"
    assert all(len(v) == xm.FEATURE_DIM for v in f1.values())
    # n_bytes matches metadata
    meta = {r.doc_id: r.meta.n_bytes for r in mm.collect()}
    nb = {r.doc_id: r.n_bytes for r in xm.extract_features(mm).collect()}
    assert meta == nb


def test_resize_meta_and_frame_sampling(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    mm = xm.to_multimodal(docs)
    planned = xm.resize_meta(mm, 32, 32).collect()
    for r in planned:
        assert 1 <= r.resize_plan.out_w <= 32
        assert 1 <= r.resize_plan.out_h <= 32
        assert r.resize_plan.scale <= 1.0
    frames = xm.sample_frames(mm, n_frames=4).collect()
    assert len(frames) == 40  # 4 frames x 10 docs
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    payloads = {r.doc_id: bytes(r.payload) for r in mm.collect()}
    for doc_id, fr in by_doc.items():
        assert sorted(f.frame_idx for f in fr) == [0, 1, 2, 3]
        # frames are slices of the original payload
        for f in fr:
            assert bytes(f.frame) in payloads[doc_id]


def test_decode_image_is_marked_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        xm.decode_image(b"\x89PNG")


def test_simhash_explode_form_matches_hof_form(spark):
    """The explode/partial-agg signature builder must be bit-identical
    to the Column-form (64 interpreted HOF aggregates) it replaces."""
    docs = load_table(spark, SF, "documents").limit(200)
    fast = xd.simhash_signatures(docs, "doc_id", "text")
    slow = docs.select(
        F.col("doc_id"), xd.simhash(F.col("text")).alias("sh_ref")
    )
    joined = fast.join(slow, "doc_id")
    assert joined.count() == 200
    assert joined.filter(F.col("sh") != F.col("sh_ref")).count() == 0


def test_centroid_seeding_survives_sparse_and_string_ids(spark):
    """seed_centroids / ivf_topk / kmeans_centroids must not assume
    dense integer ids: string and offset ids get full-size centroid
    sets and working recall (the filter(id < k) trap)."""
    emb = load_table(spark, SF, "embeddings")
    as_string = emb.select(
        F.concat(F.lit("doc-"), F.format_string("%05d", F.col("vec_id"))).alias("vec_id"),
        "embedding",
    )
    sparse = emb.select((F.col("vec_id") * 1000 + 500_000).alias("vec_id"), "embedding")

    for variant in (as_string, sparse):
        cents = xs.kmeans_centroids(variant, k=8, iterations=2)
        assert cents.count() == 8  # never under-seeded, never shrinks
        out = xs.ivf_topk(variant, n_centroids=8, n_probe=2, k=5)
        # every query id surfaces with well-formed ranks
        n_q = out.select("q_id").distinct().count()
        assert n_q == variant.count()
        assert out.filter(F.col("rk") > 5).count() == 0


def test_block_matmul_topk_matches_jvm_fold(spark):
    """cosine_topk_block (numpy matmul) must produce the same ranked
    neighbor sets as the JVM-fold brute force; sims agree to 1e-9
    (numpy pairwise summation vs sequential fold differs only in the
    last ulp)."""
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    jvm = {(r.q_id, r.c_id): r.sim
           for r in xs.cosine_topk_bruteforce(qs, cs, k=10, round_sim=None).collect()}
    blk = {(r.q_id, r.c_id): r.sim
           for r in xs.cosine_topk_block(qs, cs, k=10).collect()}
    assert jvm.keys() == blk.keys()
    for key, sim in jvm.items():
        assert abs(sim - blk[key]) < 1e-9


def test_bounded_ivf_caps_lists_and_keeps_recall(spark):
    """ivf_topk_bounded: no inverted list exceeds the cap (except
    via spill-into-full-second-list, bounded at cap + spilled), every
    vector stays searchable, and recall stays near the unbounded
    form's."""
    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    cap = max(10, n // 16)  # force some spilling

    unbounded = {
        (r.q_id, r.c_id)
        for r in xs.ivf_topk(emb, n_centroids=16, n_probe=2, k=5)
        .filter(F.col("q_id") < 20)
        .collect()
    }
    bounded = {
        (r.q_id, r.c_id)
        for r in xs.ivf_topk_bounded(
            emb, n_centroids=16, n_probe=2, k=5, max_list_size=cap
        )
        .filter(F.col("q_id") < 20)
        .collect()
    }
    # every probed query still answers with full rank lists
    assert len(bounded) == len(unbounded)
    # bounded search keeps most of the unbounded result set
    overlap = len(bounded & unbounded) / len(unbounded)
    assert overlap > 0.5, f"bounded IVF diverged: overlap {overlap}"


def test_ivf_recall_monotone_in_n_probe(spark):
    """The recall-vs-n_probe trade: probing more lists can only add
    candidates, so recall is non-decreasing in n_probe and reaches
    1.0 when every list is probed (the sweep NEXT.md asked for —
    pins both the tuning-curve shape and the exhaustive limit)."""
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    truth = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_bruteforce(qs, cs, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r.q_id, r.c_id)
            for r in xs.ivf_topk(emb, n_centroids=8, n_probe=n_probe, k=5)
            .filter(F.col("q_id") < 20)
            .collect()
        }
        return len(truth & got) / len(truth)

    curve = [recall(p) for p in (1, 2, 4, 8)]
    assert all(b >= a - 1e-9 for a, b in zip(curve, curve[1:])), curve
    assert curve[-1] == 1.0, curve


def test_lsh_recall_decreases_with_bits(spark):
    """The LSH tuning curve (NEXT.md #5, completing the IVF sweep):
    each added sign bit halves the expected bucket population, so
    candidate sets shrink and recall is non-increasing in bits —
    while cost (candidate-pair count) shrinks. Pins the
    recall-vs-selectivity trade the bits knob controls."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 500)
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    truth = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_bruteforce(qs, cs, k=5).collect()
    }

    def recall(bits):
        got = {
            (r.q_id, r.c_id)
            for r in xs.cosine_topk_lsh(emb, bits=bits, k=5)
            .filter(F.col("q_id") < 20)
            .collect()
        }
        return len(truth & got) / len(truth)

    curve = [recall(b) for b in (1, 4, 8)]
    # 1 bit = 2 half-space buckets: near-exhaustive within a bucket
    assert curve[0] >= 0.4, curve
    assert all(b <= a + 1e-9 for a, b in zip(curve, curve[1:])), curve


def test_minhash_bands_rows_tuning_curve(spark):
    """The bands×rows trade at fixed signature length (32 hashes):
    more bands ⇒ shorter band rows ⇒ easier collisions ⇒ candidate
    sets grow monotonically (1-(1-j^{32/b})^b rises with b for
    j<1) — and high-band recall must dominate the one-band
    configuration, whose single 32-hash row only collides on
    near-identical docs. Completes the LSH/IVF tuning sweeps with
    the dedup-side knob (NEXT.md #5)."""
    docs = load_table(spark, SF, "documents")
    n_cands = {}
    cands = {}
    for bands in (1, 4, 16):
        c = {
            (r.id_a, r.id_b)
            for r in xd.minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=32, bands=bands
            ).collect()
        }
        n_cands[bands] = len(c)
        cands[bands] = c
    assert n_cands[1] <= n_cands[4] <= n_cands[16], n_cands
    truth = {
        (r.id_a, r.id_b)
        for r in xd.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    if truth:
        def recall(c):
            return len(truth & c) / len(truth)
        assert recall(cands[16]) >= recall(cands[1]), n_cands
        assert recall(cands[16]) >= 0.9


def test_multiprobe_flip_count_tuning_curve(spark):
    """The n_flip knob: candidate sets grow monotonically with probe
    count (each flip adds buckets, never removes), n_flip=0 equals
    plain single-probe LSH exactly, and recall vs brute force is
    non-decreasing along the curve. Completes the tuning-sweep family
    (bits, bands×rows, n_probe) with the query-side probe knob."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 400)
    big_k = 10**6
    curve = {}
    for n_flip in (0, 1, 3):
        curve[n_flip] = {
            (r.q_id, r.c_id)
            for r in xs.cosine_topk_lsh_multiprobe(
                emb, bits=8, n_flip=n_flip, k=big_k
            ).collect()
        }
    single = {
        (r.q_id, r.c_id)
        for r in xs.cosine_topk_lsh(emb, bits=8, k=big_k).collect()
    }
    assert curve[0] == single, "n_flip=0 must BE single-probe"
    assert curve[0] <= curve[1] <= curve[3]
    assert len(curve[3]) > len(curve[0])


def test_persisted_ivf_matches_inmemory_and_prunes_partitions(
    spark, tmp_path
):
    """build→persist→query must return EXACTLY what the in-memory
    ivf_topk returns for the same (seeded) centroids, and the probe
    scan must carry a cent_id partition filter (reads only probed
    lists' files)."""
    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    xs.build_ivf_index(emb, path, n_centroids=16)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = xs.query_ivf_index(spark, path, queries, k=5, n_probe=2)
    got = {(r.q_id, r.c_id, r.sim, r.rk) for r in out.collect()}
    want = {
        (r.q_id, r.c_id, r.sim, r.rk)
        for r in xs.ivf_topk(emb, n_centroids=16, n_probe=2, k=5)
        .filter(F.col("q_id") < 20)
        .collect()
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan, plan
    # probed subset: fewer list-partition dirs than total is possible
    # only through pruning — assert the filter is selective in-plan
    assert "cent_id IN" in plan or "cent_id#" in plan, plan


def test_pq_codebook_training_monotone(spark):
    """All-integer Lloyd's must (a) keep the codebook exactly
    m_segments*k_codes rows at every iteration (empty clusters retain
    their centroid — k never shrinks), and (b) monotonically reduce
    total squared-L2 distortion (measured at sf0.001: 6.07M seed →
    4.83M after 1 iter → 4.65M after 2)."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    dists = []
    for it in (0, 1, 2):
        cb = xs.pq_codebooks(
            qz, "vec_id", "q_vec", m_segments=8, k_codes=16, dim=64,
            iterations=it,
        )
        assert cb.count() == 8 * 16, f"codebook shrank at iteration {it}"
        dists.append(
            xs.pq_distortion(qz, cb, "q_vec", m_segments=8, k_codes=16, dim=64)
        )
    assert dists[1] < dists[0], f"Lloyd iteration 1 did not improve: {dists}"
    assert dists[2] <= dists[1], f"Lloyd iteration 2 regressed: {dists}"


def test_pq_topk_overlap_beats_chance(spark):
    """ADC top-10 over 8-byte PQ codes vs the exact int8 ranking.
    Synthetic embeddings are near-orthogonal (neighbor score gaps are
    tiny), so PQ loses real precision by design — but overlap must
    stay far above chance (k/N = 2%; measured 32-37%) and ranks must
    be well-formed."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    cb = xs.pq_codebooks(
        qz, "vec_id", "q_vec", m_segments=8, k_codes=16, dim=64, iterations=2
    )
    enc = xs.pq_encode(qz, cb, "vec_id", "q_vec", 8, 16, 64)
    qs = enc.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "q_vec"
    )
    cs = enc.select(F.col("vec_id").alias("c_id"), "pq_codes")
    rows = xs.pq_topk(
        qs, cs, cb, k=10, m_segments=8, k_codes=16, dim=64
    ).collect()
    pq = {(r.q_id, r.c_id) for r in rows}
    eq = qz.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("q_vec").alias("qa")
    )
    ec = qz.select(F.col("vec_id").alias("c_id"), F.col("q_vec").alias("qb"))
    exact = {
        (r.q_id, r.c_id)
        for r in xs.quantized_dot_topk(eq, ec, k=10, q_vec="qa", c_vec="qb").collect()
    }
    overlap = len(pq & exact) / len(exact)
    assert overlap >= 0.15, f"PQ overlap {overlap} too close to chance"
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.rk)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_repetition_signals_flag_boilerplate(spark):
    """A machine-repetitive doc ('buy now '*40) must score near-1 on
    dup/top n-gram fractions and near-0 on type-token ratio; a
    vocabulary-rich doc scores the opposite. The gate property the
    curation pipeline relies on."""
    from eco_pulse_lakehouse_spark.operators.quality import repetition_signals

    rows = [
        (1, " ".join(["buy", "now"] * 40)),
        (2, " ".join(f"w{i}" for i in range(80))),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in repetition_signals(df, "doc_id", "text").collect()}
    rep, rich = out[1], out[2]
    assert rep.ttr < 0.05 and rich.ttr == 1.0
    assert rep.dup_ngram_frac > 0.95 and rich.dup_ngram_frac == 0.0
    assert rep.top_ngram_frac > 0.95 and rich.top_ngram_frac < 0.05
    assert rep.n_tokens == 80 and rich.n_tokens == 80


def test_ivfpq_matches_probed_exact_ranking_shape(spark):
    """IVF-PQ well-formedness + recall sanity: every query yields k
    well-ranked candidates drawn from probed lists only, and the
    top-10 overlaps the exact int8 ranking far above chance (PQ on
    near-orthogonal synthetic vectors is lossy by design)."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    qs = qz.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "q_vec"
    )
    rows = xs.ivfpq_topk(
        qz, qs, "vec_id", "q_vec", "q_id",
        n_lists=8, m_segments=8, k_codes=16, dim=64, n_probe=4, k=10,
    ).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(10))
    for rs in by_q.values():
        assert sorted(x.rk for x in rs) == list(range(1, len(rs) + 1))
        scores = [x.score for x in sorted(rs, key=lambda x: x.rk)]
        assert scores == sorted(scores, reverse=True)
    got = {(r.q_id, r.c_id) for r in rows}
    eq = qz.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("q_vec").alias("qa")
    )
    ec = qz.select(F.col("vec_id").alias("c_id"), F.col("q_vec").alias("qb"))
    exact = {
        (r.q_id, r.c_id)
        for r in xs.quantized_dot_topk(eq, ec, k=10, q_vec="qa", c_vec="qb").collect()
    }
    overlap = len(got & exact) / len(exact)
    # 4/8 lists probed ≈ half the corpus seen; chance within probed ≈ 4%
    assert overlap >= 0.10, f"IVF-PQ overlap {overlap} too close to chance"


def test_pq_distortion_monotone_in_codebook_size(spark):
    """Seed codebooks nest (lowest-k ids ⊂ lowest-2k ids), so total
    distortion must be non-increasing in k_codes — a guaranteed
    invariant of the argmin over a superset."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    dists = []
    for k in (8, 16, 32):
        cb = xs.pq_codebooks(
            qz, "vec_id", "q_vec", m_segments=8, k_codes=k, dim=64,
            iterations=0,
        )
        dists.append(
            xs.pq_distortion(qz, cb, "q_vec", m_segments=8, k_codes=k, dim=64)
        )
    assert dists[0] >= dists[1] >= dists[2], dists


def test_pq_distortion_sweep_monotone_in_segments(spark):
    """pq_distortion_table sweep: finer segmentation (more, shorter
    segments — each argmin'd independently) must be non-increasing
    in total distortion, and the table form must agree exactly with
    the scalar pq_distortion at every config."""
    emb = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(emb, "embedding", "q_vec", n_levels=127)
    rows = {}
    for m in (2, 4, 8):
        cb = xs.pq_codebooks(
            qz, "vec_id", "q_vec", m_segments=m, k_codes=16, dim=64,
            iterations=0,
        )
        got = xs.pq_distortion_table(
            qz, cb, "q_vec", m_segments=m, k_codes=16, dim=64
        ).collect()
        assert len(got) == 1 and got[0].m_segments == m
        rows[m] = got[0].distortion
        scalar = xs.pq_distortion(
            qz, cb, "q_vec", m_segments=m, k_codes=16, dim=64
        )
        assert rows[m] == scalar
    assert rows[2] >= rows[4] >= rows[8], rows


def test_group_aware_split_never_splits_a_cluster(spark):
    """Every near-dup cluster must land in exactly one split (the
    leakage-free property), including multi-doc chains; per-doc
    hash_split on the same fixture demonstrably violates it."""
    from eco_pulse_lakehouse_spark.operators.sampling import (
        group_aware_split,
        hash_split,
    )

    # 40 singleton docs + 10 duplicate chains of 3 (ids chosen so a
    # plain per-doc hash split scatters some chain across splits)
    rows = [(i, f"unique text number {i} alpha beta gamma delta") for i in range(40)]
    pairs = []
    for c in range(10):
        base = 100 + 3 * c
        for j in range(3):
            rows.append((base + j, f"duplicated chain {c} shared body"))
        pairs += [(base, base + 1), (base + 1, base + 2)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    prs = spark.createDataFrame(pairs, "id_a LONG, id_b LONG")
    out = group_aware_split(docs, prs).select("doc_id", "group_id", "split").collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())
    # chains resolved to min id
    chain_groups = {r.group_id for r in out if r.doc_id >= 100}
    assert chain_groups == {100 + 3 * c for c in range(10)}
    # contrast: per-doc split scatters at least one chain
    naive = hash_split(docs, "doc_id").collect()
    chain_splits: dict = {}
    for r in naive:
        if r.doc_id >= 100:
            chain_splits.setdefault((r.doc_id - 100) // 3, set()).add(r.split)
    assert any(len(s) > 1 for s in chain_splits.values())


def test_sorted_neighborhood_finds_prefix_dups(spark):
    """SNM must recover prefix-similar near-dups (they sort adjacent)
    and well-formed canonical pairs; a doc differing only at the END
    of a long shared prefix is exactly its strength case."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, "zebra yak xylophone words entirely unlike the others here"),
        (4, "middle ground text that shares nothing with the base pair"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in sorted_neighborhood_pairs(
            df, "doc_id", "text", window=2, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] > 0.8
    assert all(a < b for a, b in out)
    assert len(out) == 1


def test_blocking_families_are_complementary(spark):
    """Union recall of SNM + minhash-LSH against exact Jaccard>=0.8
    truth must be at least each family's own recall, and the union
    must cover all truth at these settings on the fixture (the reason
    an engine ships multiple blocking families)."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        sorted_neighborhood_pairs,
    )

    docs = load_table(spark, SF, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    if not truth:
        return
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", 32, 8).collect()
    }
    snm = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            docs, "doc_id", "text", window=4, jaccard_threshold=0.0
        ).collect()
    }
    union_recall = len(truth & (lsh | snm)) / len(truth)
    assert union_recall >= len(truth & lsh) / len(truth)
    assert union_recall >= len(truth & snm) / len(truth)
    assert union_recall >= 0.9, f"union recall {union_recall}"


def _semdedup_pair_dots(asg, min_dot):
    """Within-cluster integer pair dots among the given (vec_id,
    cluster_id, q_vec) rows, at or above min_dot."""
    a = asg.select(
        "cluster_id", F.col("vec_id").alias("ai"), F.col("q_vec").alias("av")
    )
    b = asg.select(
        "cluster_id", F.col("vec_id").alias("bi"), F.col("q_vec").alias("bv")
    )
    pdot = F.aggregate(
        F.zip_with(
            F.col("av"), F.col("bv"),
            lambda x, y: x.cast("bigint") * y.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("ai") < F.col("bi"))
        .withColumn("pd", pdot)
        .filter(F.col("pd") >= min_dot)
    )


def test_semdedup_survivors_have_no_near_dup_pair(spark):
    """Of every within-cluster pair above the threshold exactly one
    member is dropped — so the SURVIVOR set must contain no such
    pair at all, for seed and trained centroids alike, and survivors
    must be a strict subset whenever any pair existed."""
    e = load_table(spark, SF, "embeddings")
    qz = xs.quantize_embeddings(e, "embedding", "q_vec", n_levels=127)
    n = qz.count()
    for iters in (0, 2):
        surv = xs.semantic_dedup(
            qz, "vec_id", "q_vec", n_clusters=16, dim=64,
            min_dot=6400, cluster_iterations=iters,
        )
        kept = surv.join(qz.select("vec_id", "q_vec"), "vec_id")
        assert _semdedup_pair_dots(kept, 6400).count() == 0, iters
        assert 0 < surv.count() <= n


def test_semdedup_drops_planted_duplicate(spark):
    """An exact copy of an existing vector under a new id lands in
    the same cluster with dot = ||v||² (max possible) — exactly one
    of the two must survive, and the copy (larger id, identical
    centroid similarity) is the one dropped."""
    e = load_table(spark, SF, "embeddings").limit(100)
    qz = xs.quantize_embeddings(e, "embedding", "q_vec", n_levels=127)
    src = qz.filter(F.col("vec_id") == 7)
    clone = src.withColumn("vec_id", F.lit(100000).cast("long"))
    with_clone = qz.unionByName(clone)
    surv = xs.semantic_dedup(
        with_clone, "vec_id", "q_vec", n_clusters=8, dim=64, min_dot=15800
    )
    ids = {r.vec_id for r in surv.collect()}
    assert 7 in ids
    assert 100000 not in ids


def test_audio_segments_cover_payload_exactly(spark):
    """Every sample index must be covered, the last window must end
    exactly at n_samples, every window holds 1..win samples, and
    consecutive windows overlap by win-hop except the clipped tail."""
    docs = load_table(spark, SF, "documents").limit(50)
    segs = xm.segment_payload_windows(
        xm.to_multimodal(docs), bytes_per_sample=2, win=64, hop=32
    )
    rows = segs.orderBy("doc_id", "seg_idx").collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_bytes = {
        r.doc_id: r.n
        for r in xm.to_multimodal(docs)
        .select("doc_id", (F.floor(F.col("meta.n_bytes") / 2)).alias("n"))
        .collect()
    }
    for doc, ss in by_doc.items():
        n = n_bytes[doc]
        assert ss[-1].end_sample == n
        covered = set()
        for s in ss:
            assert 1 <= s.n_samples <= 64
            assert s.n_samples == s.end_sample - s.start_sample
            covered.update(range(s.start_sample, s.end_sample))
        assert covered == set(range(n))


def test_containment_catches_doc_in_doc_where_jaccard_misses(spark):
    """A short document quoted whole inside a long one must score
    containment 1.0 while its Jaccard stays below the usual dedup
    threshold — the asymmetric-redundancy case the measure exists
    for."""
    short = "alpha beta gamma delta epsilon zeta"
    longd = " ".join(
        ["filler%d word%d token%d" % (i, i, i) for i in range(30)]
    ) + " " + short
    df = spark.createDataFrame(
        [(1, short), (2, longd)], "doc_id LONG, text STRING"
    )
    cont = xd.ngram_containment_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.5
    ).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    jac = xd.ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.2
    ).collect()
    assert jac == []  # jaccard dilutes the quote below threshold


def test_dup_span_removal_strips_planted_shared_span(spark):
    """Lee et al. ExactSubstr semantics: a 200-token span planted in
    3 documents is removed from ALL of them (exactly those 200
    tokens — boundary 4-grams straddling unique context are not
    duplicated, so the removal doesn't bleed); a 6-token shared span
    stays below the 15-token threshold; a unique doc is untouched."""
    span = " ".join(f"shared{i}" for i in range(200))
    short = "tiny0 tiny1 tiny2 tiny3 tiny4 tiny5"
    rows = [
        (1, f"a0 a1 a2 {span} a3 a4"),
        (2, f"b0 b1 {span} b2 b3 b4 b5"),
        (3, f"{span} c0 c1"),
        (4, f"d0 d1 d2 {short} d3 d4"),
        (5, f"e0 e1 {short} e2 e3 e4"),
        (6, " ".join(f"u{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r.doc_id: r
        for r in xd.dup_span_removal(
            df, "doc_id", "text", n=4, min_span_tokens=15
        ).collect()
    }
    assert len(out) == 6
    for doc, kept in ((1, "a0 a1 a2 a3 a4"), (2, "b0 b1 b2 b3 b4 b5"),
                      (3, "c0 c1")):
        assert out[doc].n_removed == 200
        assert out[doc].text_clean == kept
    texts = dict(rows)
    for doc in (4, 5, 6):  # short span / unique: below threshold
        assert out[doc].n_removed == 0
        assert out[doc].text_clean == texts[doc]


def test_phonetic_blocking_code_and_refine(spark):
    """Phonetic code semantics (simplified Soundex): 'robert' and
    'rupert' share R163 (the classic pair), vowels drop, consonant
    runs collapse ('jackson' -> J25), and the refine keeps only
    edit-distance survivors within a block."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        phonetic_blocking_pairs,
        phonetic_code,
    )
    from pyspark.sql import functions as F_

    names = ["robert x", "rupert y", "jackson z", "smith a",
             "smyth b", "smithy c"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id LONG, name STRING"
    )
    codes = dict(
        df.select("name", phonetic_code(F_.col("name")).alias("c"))
        .collect()
    )
    assert codes["robert x"] == codes["rupert y"] == "R163"
    assert codes["jackson z"] == "J25".ljust(4, "0")
    assert codes["smith a"] == codes["smyth b"] == codes["smithy c"]
    pairs = {
        (r.id_a, r.id_b): r.lev
        for r in phonetic_blocking_pairs(
            df, "id", "name", max_edit=2
        ).collect()
    }
    # smith/smyth (lev 2 incl. suffix char) survive; robert/rupert
    # share a block but fail the edit bound
    assert (3, 4) in pairs and pairs[(3, 4)] == 2
    assert (0, 1) not in pairs


def test_training_export_manifest_invariants(spark):
    """End-to-end manifest sanity: survivors are a subset of the
    deduped train split, no survivor shares a 4-gram with the
    hold-out, no duplicate texts survive, splits are train/val only,
    and token budgets are positive."""
    from eco_pulse_lakehouse_spark.operators.decontaminate import (
        decontaminate,
    )
    from eco_pulse_lakehouse_spark.operators.sampling import unit_hash
    from eco_pulse_lakehouse_spark.plans.training_export import (
        export_manifest,
    )

    d = load_table(spark, SF, "documents")
    m = export_manifest(d, "doc_id", "text", "lang")
    rows = m.collect()
    assert rows
    # BOTH splits must actually occur — the round-3 advisor found the
    # old additive-salt hash made 'val' structurally unreachable (its
    # arc sat inside the eval hold-out region); subset-only checks
    # could not catch that.
    assert {r.split for r in rows} == {"train", "val"}
    assert all(r.n_tokens_ws > 0 and r.n_tokens_bpe > 0 for r in rows)
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    # join back: survivors' texts are unique and decontaminated
    surv = d.join(m.select("doc_id"), "doc_id")
    texts = [r.text for r in surv.select("text").collect()]
    assert len(texts) == len(set(texts))
    hold_out = d.filter(unit_hash(F.col("doc_id")) >= 0.9)
    leaks = decontaminate(surv, hold_out, "doc_id", "text", shingle_n=4)
    assert leaks.count() == 0


def test_bounded_phonetic_cap_and_overflow(spark):
    """Bounded phonetic blocking (VERDICT r06 item 2): the composed
    key + deterministic cap keep a hot block at cap rows, under-cap
    blocks pass through EXACTLY, capped pairs are a subset of the
    uncapped composed-key pairs, and phonetic_block_overflow surfaces
    precisely the blocks the cap touched (no silent caps — the
    w19/sax_bucket_overflow contract)."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        bounded_phonetic_pairs,
        phonetic_block_overflow,
    )

    # one hot block (same first token, second initial, length) of 30
    # rows + one cold block of 4 rows
    names = [(i, f"smith a{i:02d}") for i in range(30)] + [
        (100 + i, f"jones b{i:02d}") for i in range(4)
    ]
    df = spark.createDataFrame(names, "id LONG, name STRING")

    uncapped = {
        (r.id_a, r.id_b)
        for r in bounded_phonetic_pairs(
            df, "id", "name", max_edit=3
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in bounded_phonetic_pairs(
            df, "id", "name", max_edit=3, max_block=10
        ).collect()
    }
    assert capped <= uncapped
    # hot block: only the first 10 rows under (name, id) order
    # survive -> pairs among ids 0..9 only
    hot_capped = {p for p in capped if p[0] < 100}
    assert hot_capped == {
        (a, b) for a in range(10) for b in range(a + 1, 10)
    }
    # cold block under the cap is untouched
    cold = {p for p in capped if p[0] >= 100}
    assert cold == {p for p in uncapped if p[0] >= 100} and len(cold) == 6

    over = phonetic_block_overflow(df, "name", max_block=10).collect()
    assert len(over) == 1
    (row,) = over
    assert row.n_rows == 30
    assert row.n_dropped_rows == 20
    assert row.uncapped_pairs == 30 * 29 // 2


def test_short_doc_shingles_empty_on_both_engines(spark):
    """ADVICE r06 #4 regression pin: documents under ``shingle_n``
    tokens yield an EMPTY shingle set — identically on the Spark
    side (functions/text.py:word_shingles guards Spark's descending
    sequence(1, x<1)) and in every shingle oracle (all use
    ``ELSE []``, none a singleton [text]) — so two identical short
    docs never pair on either engine and the x2/t35 cluster oracles
    agree by construction."""
    import duckdb

    from eco_pulse_lakehouse_spark.operators import dedup as xd_

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "a full three token doc"),
         (4, "a full three token doc")],
        "doc_id LONG, text STRING",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in xd_.ngram_jaccard_pairs(
            df, "doc_id", "text", shingle_n=3, threshold=0.2
        ).collect()
    }
    assert pairs == {(3, 4)}  # short identical docs never pair

    # the oracle shingle CTE (northstar.py x2_dedup_clusters shape)
    # replays the same guard: short docs -> [] -> zero join rows
    con = duckdb.connect()
    o = con.execute(
        """
        WITH d(doc_id, text) AS (VALUES (1, 'tiny doc'), (2, 'tiny doc'),
               (3, 'a full three token doc'), (4, 'a full three token doc')),
        sh AS (
          SELECT doc_id,
                 list_distinct(
                   CASE WHEN len(string_split(text, ' ')) >= 3 THEN
                     list_transform(
                       range(1, len(string_split(text, ' ')) - 1),
                       i -> array_to_string(
                         (string_split(text, ' '))[i:i+2], ' '))
                   ELSE [] END) AS s
          FROM d
        )
        SELECT a.doc_id, b.doc_id FROM sh a
        JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s)) > 0
        """
    ).fetchall()
    assert {(a, b) for a, b in o} == {(3, 4)}


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference BPE (Sennrich et al.): overlapping pair
    counts, greedy argmax with (count desc, left asc, right asc)
    tie-break, left-to-right non-overlapping merge application."""
    segs = {w: [c for c in w] for w in word_freqs}
    learned = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, seg in segs.items():
            for a, b in zip(seg, seg[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        learned.append((l, r, c))
        for w, seg in segs.items():
            out: list[str] = []
            for s in seg:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            segs[w] = out
    return learned, segs


def test_bpe_matches_python_reference_on_overlap_corpus(spark):
    """learn_bpe_merges vs a pure-Python BPE transcription on a
    corpus CRAFTED to exercise the sharp edges: 'aaaa' (overlapping
    pair runs — left-to-right gives [aa, aa], never [a, aa, a]),
    exact count ties broken lexicographically, and multi-round
    cascades where round 2 merges a symbol round 1 created."""
    from eco_pulse_lakehouse_spark.operators import bpe

    texts = ["aaaa aaaa bb", "aaaa bb cc cc", "abab abab cc"]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    expected, expected_segs = _py_bpe(freqs, 4)

    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in bpe.learn_bpe_merges(docs, n_merges=4)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == expected, (got, expected)

    seg = {
        r.w: list(r.seg)
        for r in bpe.segment_words(
            docs, [(l, rr) for l, rr, _ in expected]
        ).collect()
    }
    assert seg == expected_segs, (seg, expected_segs)


def _py_wordpiece(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference WordPiece: BPE's loop with the
    likelihood-ratio argmax — exact integer fixed point
    (pair·10¹²) // (cl·cr), (score desc, count desc, left, right)
    tie-break."""
    segs = {w: [c for c in w] for w in word_freqs}
    learned = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        syms: dict[str, int] = {}
        for w, seg in segs.items():
            f = word_freqs[w]
            for s in seg:
                syms[s] = syms.get(s, 0) + f
            for a, b in zip(seg, seg[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        scored = {
            k: (v * 10**12) // (syms[k[0]] * syms[k[1]])
            for k, v in pairs.items()
        }
        best = min(
            pairs.items(), key=lambda kv: (-scored[kv[0]], -kv[1], kv[0])
        )
        (l, r), c = best
        learned.append((l, r, c, scored[(l, r)]))
        for w, seg in segs.items():
            out: list[str] = []
            for s in seg:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            segs[w] = out
    return learned, segs


def test_wordpiece_matches_python_reference_and_diverges_from_bpe(spark):
    """learn_wordpiece_merges vs a pure-Python transcription on a
    corpus CRAFTED so WordPiece and BPE choose DIFFERENT first
    merges: 'xy' always co-occurs (score 10¹²·c/(c·c) is maximal)
    while 'aa' inside frequent-but-varied contexts has the higher
    RAW count — BPE must pick the count leader, WordPiece the
    cohesion leader."""
    from eco_pulse_lakehouse_spark.operators import bpe

    # 'xy' appears 3x and x,y appear nowhere else (perfect cohesion);
    # pairs of 'a' appear 8x but 'a' is everywhere (16 occurrences).
    texts = ["xy aaaa aaaa", "xy aab baa", "xy ab ba"]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    expected, _ = _py_wordpiece(freqs, 4)

    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [
        (r.left_sym, r.right_sym, r.pair_count, r.score_fp)
        for r in bpe.learn_wordpiece_merges(docs, n_merges=4)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == expected, (got, expected)
    # the divergence actually happened: BPE round 1 picks the raw
    # count leader ('a','a'), WordPiece the cohesion leader ('x','y')
    bpe_first = bpe.learn_bpe_merges(docs, n_merges=1).collect()[0]
    assert (bpe_first.left_sym, bpe_first.right_sym) == ("a", "a")
    assert (got[0][0], got[0][1]) == ("x", "y"), got[0]


def test_wordpiece_overflow_guard_fails_loudly(spark):
    """ADVICE r08: score_fp = pair_count·10¹² div (lc·rc) wraps
    BIGINT silently once pair_count > 9 223 372. The guard must turn
    that into a loud raise_error, not wrapped scores: a vocab row
    with f = 10^10 gives pair_count = 10^10 on ('x','y')."""
    import pytest

    from eco_pulse_lakehouse_spark.operators import bpe

    words = spark.createDataFrame(
        [("xy", 10_000_000_000)], "w STRING, f LONG"
    )
    with pytest.raises(Exception, match="score_fp fixed-point overflow"):
        bpe.learn_wordpiece_merges_from_vocab(words, n_merges=1).collect()
    # and the guard does NOT fire inside the headroom
    ok = spark.createDataFrame([("xy", 9_000_000)], "w STRING, f LONG")
    rows = bpe.learn_wordpiece_merges_from_vocab(ok, n_merges=1).collect()
    assert rows and rows[0].pair_count == 9_000_000


def _py_unigram_viterbi(word_freqs, L=4, em_rounds=0):
    """Pure-Python SentencePiece-unigram reference: seed LM from
    weighted substring counts, Viterbi with (score, start) argmax,
    ln→1e-6 fixed point with half-away-from-zero rounding, hard-EM
    rounds with the character count-1 floor."""
    import math

    def fp(x):
        y = x * 1_000_000
        return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))

    def seed_counts():
        c = {}
        for w, f in word_freqs.items():
            for j in range(len(w)):
                for l in range(1, min(L, len(w) - j) + 1):
                    c[w[j : j + l]] = c.get(w[j : j + l], 0) + f
        return c

    def lm_of(counts):
        t = sum(counts.values())
        return {p: fp(math.log(c / t)) for p, c in counts.items()}

    def viterbi(lm):
        segs = {}
        for w, f in word_freqs.items():
            n = len(w)
            best = [(0, 0)] + [None] * n
            for i in range(1, n + 1):
                cands = []
                for j in range(max(0, i - L), i):
                    lp = lm.get(w[j:i], -(10**15))
                    cands.append((best[j][0] + lp, j))
                best[i] = max(cands)  # (score, largest start)
            lens, cur = [], n
            while cur > 0:
                b = best[cur][1]
                lens.insert(0, cur - b)
                cur = b
            off, pieces = 0, []
            for ln in lens:
                pieces.append(w[off : off + ln])
                off += ln
            segs[w] = (f, len(lens), "|".join(pieces), best[n][0])
        return segs

    chars = {p for p in seed_counts() if len(p) == 1}
    out = viterbi(lm_of(seed_counts()))
    for _ in range(em_rounds):
        used = {}
        for w, (f, _n, seg, _s) in out.items():
            for p in seg.split("|"):
                used[p] = used.get(p, 0) + f
        for ch in chars:
            used.setdefault(ch, 1)
        out = viterbi(lm_of(used))
    return out


def test_unigram_viterbi_matches_python_reference(spark):
    """unigram_viterbi_segment vs an independent Python Viterbi on a
    crafted corpus with genuine lattice ambiguity (repeated bigrams,
    shared prefixes/suffixes), for the seed round AND one hard-EM
    round; plus losslessness (pieces concatenate back to the word)
    on the real corpus."""
    from eco_pulse_lakehouse_spark.operators.bpe import (
        unigram_viterbi_segment,
    )

    texts = [
        "abab abab ababab cd cd abcd",
        "dcba abab cdcd cd ab",
        "aab abb abab bb aa",
    ]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    for em in (0, 1):
        want = _py_unigram_viterbi(freqs, em_rounds=em)
        got = {
            r.w: (r.f, r.n_pieces, r.seg_str, r.best_fp)
            for r in unigram_viterbi_segment(
                docs, em_rounds=em
            ).collect()
        }
        assert got == want, (em, {k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)})

    real = load_table(spark, SF, "documents")
    seg = unigram_viterbi_segment(real)
    bad = seg.filter(
        F.replace(F.col("seg_str"), F.lit("|"), F.lit("")) != F.col("w")
    ).count()
    assert bad == 0


def test_bpe_segmentations_roundtrip_and_vocab_shrinks(spark):
    """On the real corpus: every learned merge strictly reduces total
    symbol count; applying the merges segments each vocab word into
    pieces that concatenate back to the word (lossless)."""
    from eco_pulse_lakehouse_spark.operators import bpe

    docs = load_table(spark, SF, "documents")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe.learn_bpe_merges(docs, n_merges=6)
        .orderBy("merge_round")
        .collect()
    ]
    assert len(merges) == 6
    seg = bpe.segment_words(docs, merges)
    bad = seg.filter(
        F.concat_ws("", F.col("seg")) != F.col("w")
    ).count()
    assert bad == 0
    # the learned merges actually fire on the vocabulary
    merged_syms = {l + r for l, r in merges}
    used = {
        s
        for row in seg.collect()
        for s in row.seg
        if len(s) > 1
    }
    assert used & merged_syms, (used, merged_syms)


def test_line_dedup_keep_first_semantics(spark):
    """Hand-crafted corpus: duplicated 3-token lines keep exactly the
    globally-first (doc, position) occurrence — across docs AND
    within one doc — and fully-boilerplate docs survive with ''."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        line_dedup_keep_first,
    )

    rows = [
        (0, "a b c d e f"),   # first owner of 'a b c'
        (1, "a b c x y z"),   # cross-doc dup: loses 'a b c'
        (2, "a b c"),         # loses its only chunk -> ''
        (3, "p q r p q r"),   # within-doc dup: keeps first copy
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r.doc_id: r
        for r in line_dedup_keep_first(df, "doc_id", "text", 3).collect()
    }
    assert (out[0].n_removed, out[0].text_clean) == (0, "a b c d e f")
    assert (out[1].n_removed, out[1].text_clean) == (1, "x y z")
    assert (out[2].n_removed, out[2].text_clean) == (1, "")
    assert (out[3].n_removed, out[3].text_clean) == (1, "p q r")
    assert all(out[i].n_chunks == 2 for i in (0, 1, 3))
    assert out[2].n_chunks == 1


def test_line_dedup_hash_key_equivalent_to_text_key(spark):
    """The 8-byte xxhash64 line key (the 100 TB shuffle form, the
    default) returns EXACTLY the text-keyed reference form's output
    on real data — sf0.01 documents, where duplicated chunks exist —
    and on the crafted dup-heavy corpus above."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        line_dedup_keep_first,
    )

    crafted = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "a b c x y z"),
            (2, "a b c"),
            (3, "p q r p q r"),
        ],
        "doc_id LONG, text STRING",
    )
    docs = load_table(spark, SF, "documents")
    for df in (crafted, docs):
        hashed = {
            tuple(r)
            for r in line_dedup_keep_first(
                df, "doc_id", "text", 3, hash_key=True
            ).collect()
        }
        texted = {
            tuple(r)
            for r in line_dedup_keep_first(
                df, "doc_id", "text", 3, hash_key=False
            ).collect()
        }
        assert hashed == texted


def test_perplexity_buckets_match_builtin_ntile(spark):
    """The distributed-rank arithmetic bucket (no single-task
    per-language sort) is EXACTLY F.ntile over the same total order —
    on the real corpus (languages with n % 3 != 0 included) and on a
    crafted 4-doc language (ntile gives buckets 1,1,2,3)."""
    from pyspark.sql import Window

    from eco_pulse_lakehouse_spark.operators.retrieval import (
        perplexity_buckets,
    )

    crafted = spark.createDataFrame(
        [
            (0, "a a a a", "xx"),
            (1, "a a b b", "xx"),
            (2, "a b c d", "xx"),
            (3, "q r s t", "xx"),
            (4, "a a a b", "yy"),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    docs = load_table(spark, SF, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text", "lang"
    )
    for d in (crafted, docs):
        got = perplexity_buckets(d, "doc_id", "text", "lang", 3)
        w = Window.partitionBy("lang").orderBy(
            F.col("avg_surprisal").asc(), F.col("doc_id").asc()
        )
        want = {
            (r.doc_id, r.ppx_bucket)
            for r in got.select("doc_id", "lang", "avg_surprisal")
            .withColumn("ppx_bucket", F.ntile(3).over(w))
            .collect()
        }
        assert {
            (r.doc_id, r.ppx_bucket) for r in got.collect()
        } == want
    # crafted 'xx' has 4 docs: ntile(3) = sizes 2,1,1
    xx = {
        r.doc_id: r.ppx_bucket
        for r in perplexity_buckets(crafted, "doc_id", "text", "lang", 3)
        .filter(F.col("lang") == "xx")
        .collect()
    }
    assert sorted(xx.values()) == [1, 1, 2, 3], xx


def _py_dsir_weights(rows, target_langs=("en",), n_buckets=128):
    """Pure-Python DSIR reference: same poly char-fold hash, same
    add-half smoothing, same ln→1e-6 fixed point (HALF_UP to match
    Spark/DuckDB round, not Python's banker's rounding)."""
    import math
    from collections import Counter

    def poly(tok):
        h = 0
        for c in tok:
            h = (h * 131 + ord(c)) % 1_000_000_007
        return h

    def feats(text):
        w = text.split(" ")
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    c_t, c_r = Counter(), Counter()
    for _id, text, lang in rows:
        for f in feats(text):
            b = poly(f) % n_buckets
            c_r[b] += 1
            if lang in target_langs:
                c_t[b] += 1
    nt, nr = sum(c_t.values()), sum(c_r.values())
    w_fp = {}
    for b in c_r:
        r = ((2 * c_t[b] + 1) / (2 * nt + n_buckets)) / (
            (2 * c_r[b] + 1) / (2 * nr + n_buckets)
        )
        x = math.log(r) * 1_000_000
        w_fp[b] = math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
    out = {}
    for _id, text, lang in rows:
        fs = feats(text)
        out[_id] = (len(fs), sum(w_fp[poly(f) % n_buckets] for f in fs))
    return out


def test_dsir_weights_match_python_reference(spark):
    """operators/selection.py:dsir_weights vs an independent pure-
    Python implementation on a crafted bilingual corpus (bucket
    collisions guaranteed: 128 buckets, >128 distinct features)."""
    from eco_pulse_lakehouse_spark.operators.selection import dsir_weights

    rows = [
        (i, " ".join(f"en{(i * 7 + j) % 40}" for j in range(12)), "en")
        for i in range(20)
    ] + [
        (100 + i, " ".join(f"xx{(i * 5 + j) % 37}" for j in range(9)), "de")
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    got = {
        r.doc_id: (r.n_feats, r.weight_fp)
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    assert got == _py_dsir_weights([(i, t, l) for i, t, l in rows])


def test_dsir_separates_target_from_offtarget(spark):
    """The point of the operator: with target = lang='en', English
    documents must average a strictly higher importance weight than
    off-target documents (measured +0.19 vs −0.45 nats at sf0.001)."""
    from eco_pulse_lakehouse_spark.operators.selection import dsir_weights

    docs = load_table(spark, SF, "documents")
    w = dsir_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    m = (
        w.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("weight_fp").alias("mw"))
        .collect()
    )
    mw = {r.is_en: r.mw for r in m}
    assert mw[True] > 0 > mw[False]


def test_dsir_select_is_topk_of_weights(spark):
    """dsir_select == the k highest-weight docs (doc_id tiebreak)."""
    from eco_pulse_lakehouse_spark.operators.selection import (
        dsir_select,
        dsir_weights,
    )

    docs = load_table(spark, SF, "documents")
    pred = F.col("lang") == "en"
    all_w = sorted(
        ((-r.weight_fp, r.doc_id) for r in dsir_weights(docs, pred).collect())
    )
    expect = [d for _, d in all_w[:25]]
    got = [r.doc_id for r in dsir_select(docs, pred, k=25).collect()]
    assert got == expect


def test_soft_dedup_weights_crafted_groups(spark):
    """Duplicate groups get weight 1/n on every copy; the total
    sampling mass equals the number of DISTINCT contents."""
    from eco_pulse_lakehouse_spark.operators.selection import (
        soft_dedup_weights,
    )

    rows = [(0, "x"), (1, "x"), (2, "x"), (3, "y"), (4, "z"), (5, "z")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in soft_dedup_weights(df, ["text"]).collect()}
    assert [out[i].n_copies for i in range(6)] == [3, 3, 3, 1, 2, 2]
    assert abs(sum(r.weight for r in out.values()) - 3.0) < 1e-12


def test_gumbel_resample_differs_from_topk_but_skews_to_weight(spark):
    """The resample must (a) be reproducible, (b) not equal the
    deterministic top-k (the noise does something), (c) still skew
    toward high-weight docs (mean selected weight > corpus mean)."""
    from eco_pulse_lakehouse_spark.operators.selection import (
        dsir_gumbel_resample,
        dsir_select,
        dsir_weights,
    )

    docs = load_table(spark, SF, "documents")
    pred = F.col("lang") == "en"
    r1 = [r.doc_id for r in dsir_gumbel_resample(docs, pred, k=50).collect()]
    r2 = [r.doc_id for r in dsir_gumbel_resample(docs, pred, k=50).collect()]
    assert r1 == r2  # reproducible across runs
    topk = [r.doc_id for r in dsir_select(docs, pred, k=50).collect()]
    assert set(r1) != set(topk)  # noise actually perturbs
    w = {r.doc_id: r.weight_fp for r in dsir_weights(docs, pred).collect()}
    mean_sel = sum(w[d] for d in r1) / len(r1)
    mean_all = sum(w.values()) / len(w)
    assert mean_sel > mean_all


def test_binary_quantize_packs_sign_bits(spark):
    """Packed words vs an independent Python bit-pack on crafted
    vectors (positive, negative, zero — zero must pack as 0)."""
    from eco_pulse_lakehouse_spark.operators.similarity import (
        binary_quantize,
    )

    vecs = [
        [1.0] * 64,
        [-1.0] * 64,
        [0.0] * 64,
        [(1.0 if (i * 7) % 3 == 0 else -1.0) for i in range(64)],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r.vec_id: (r.b_lo, r.b_hi)
        for r in binary_quantize(df, "embedding").collect()
    }
    for i, v in enumerate(vecs):
        lo = sum(1 << j for j in range(32) if v[j] > 0)
        hi = sum(1 << j for j in range(32) if v[32 + j] > 0)
        assert got[i] == (lo, hi), (i, got[i], (lo, hi))


def test_binary_hamming_topk_recall_vs_exact(spark):
    """The 1-bit prefilter + cosine rerank recovers most of the exact
    cosine top-10, and recall is monotone in the rerank budget — the
    tuning-curve pin. Measured at sf0.001 (near-random synthetic
    directions, the WORST case for sign sketches): 0.73 @ m=64,
    0.86 @ m=128; real clustered embeddings sit higher."""
    from eco_pulse_lakehouse_spark.operators.similarity import (
        binary_hamming_topk,
        binary_quantize,
        cosine_topk_bruteforce,
    )

    e = load_table(spark, SF, "embeddings")
    bq = binary_quantize(e, "embedding")
    qs_ = bq.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        "b_lo", "b_hi",
    )
    cs = bq.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        "b_lo", "b_hi",
    )
    approx64 = {
        (r.q_id, r.c_id)
        for r in binary_hamming_topk(qs_, cs, k=10, m_rerank=64).collect()
    }
    approx128 = {
        (r.q_id, r.c_id)
        for r in binary_hamming_topk(qs_, cs, k=10, m_rerank=128).collect()
    }
    exact = {
        (r.q_id, r.c_id)
        for r in cosine_topk_bruteforce(
            e.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_vec"),
            ),
            e.select(
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_vec"),
            ),
            k=10,
        ).collect()
    }
    r64 = len(approx64 & exact) / len(exact)
    r128 = len(approx128 & exact) / len(exact)
    assert r64 >= 0.65, f"binary-quant recall@m=64 {r64}"
    assert r128 >= 0.8, f"binary-quant recall@m=128 {r128}"
    assert r128 >= r64, (r64, r128)


def test_perceptual_ahash_matches_python_reference(spark):
    """perceptual_ahash vs an independent Python aHash on crafted
    payloads (including one shorter than 64 bytes — empty cells must
    pack as 0)."""
    from eco_pulse_lakehouse_spark.operators.multimodal import (
        perceptual_ahash,
        to_multimodal,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "aaaa bbbb " * 20,
        "short",  # < 64 bytes
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        r.doc_id: (r.n_bytes, r.b_lo, r.b_hi)
        for r in perceptual_ahash(to_multimodal(df)).collect()
    }
    for i, t in enumerate(texts):
        cd = [ord(c) for c in t]
        n, tot = len(cd), sum(cd)
        bits = []
        for j in range(64):
            a, b = j * n // 64, (j + 1) * n // 64
            s, ln = sum(cd[a:b]), b - a
            bits.append(1 if s * n > tot * ln else 0)
        lo = sum(1 << j for j in range(32) if bits[j])
        hi = sum(1 << j for j in range(32) if bits[32 + j])
        assert got[i] == (n, lo, hi), (i, got[i], (n, lo, hi))


def test_ahash_neardup_finds_crafted_pairs(spark):
    """Visually-near payloads (one byte changed) pair within the
    Hamming budget; unrelated payloads don't."""
    from eco_pulse_lakehouse_spark.operators.multimodal import (
        ahash_neardup_pairs,
        perceptual_ahash,
        to_multimodal,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (0, base),
        (1, base[:50] + "X" + base[51:]),     # near-identical
        (2, "zz yy xx ww vv uu tt ss rr qq " * 6),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    h = perceptual_ahash(to_multimodal(df))
    pairs = {
        (r.id_a, r.id_b)
        for r in ahash_neardup_pairs(h, max_hamming=6).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ahash_neardup_pigeonhole_full_recall(spark):
    """The multi-index pigeonhole blocking is LOSSLESS at the
    Hamming budget: every ≤ max_hamming pair is found even when the
    differing bits straddle both 32-bit words (the case the old
    single-word block silently missed), verified exhaustively
    against a brute-force Python Hamming scan."""
    from eco_pulse_lakehouse_spark.operators.multimodal import (
        ahash_neardup_pairs,
    )

    # Deterministic pseudo-random 64-bit hashes + crafted straddling
    # variants of row 0: 3 bits flipped in lo AND 3 in hi (ham=6),
    # and a 7-bit flip that must NOT pair (ham=7 > budget).
    def h64(i):
        x = (i * 2654435761) % (1 << 32)
        y = (i * 40503 + 17) % (1 << 32)
        return x, y

    rows = [(i, *h64(i)) for i in range(12)]
    lo0, hi0 = h64(0)
    rows.append((100, lo0 ^ 0b111, hi0 ^ 0b111))          # ham 6
    rows.append((101, lo0 ^ 0b1111, hi0 ^ 0b111))         # ham 7
    rows.append((102, lo0, hi0 ^ (0b111111 << 20)))       # ham 6, all-hi
    df = spark.createDataFrame(
        rows, "doc_id LONG, b_lo LONG, b_hi LONG"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in ahash_neardup_pairs(df, max_hamming=6).collect()
    }
    want = set()
    for i, (ia, la, ha) in enumerate(rows):
        for ib, lb, hb in rows[i + 1 :]:
            ham = bin((la ^ lb) | ((ha ^ hb) << 32)).count("1")
            if ham <= 6:
                want.add((min(ia, ib), max(ia, ib), ham))
    assert (0, 100, 6) in want and (0, 102, 6) in want
    assert got == want, (got ^ want)


def test_ahash_neardup_block_cap_deterministic_with_overflow(spark):
    """ADVICE r08: the opt-in per-(block, value) cap. A pile of
    IDENTICAL hashes (every block bucket holds all N rows) capped at
    max_block=3 must (a) keep exactly the first 3 ids per bucket
    under the deterministic (bk, bv, id) order — so pairs are exactly
    the 3-choose-2 among ids {0,1,2}, (b) equal the uncapped output
    restricted to those ids (capped = exact, never approximate), and
    (c) surface every overflowing bucket with the dropped-row and
    uncapped-pair accounting."""
    from eco_pulse_lakehouse_spark.operators.multimodal import (
        ahash_block_overflow,
        ahash_neardup_pairs,
    )

    rows = [(i, 0xDEADBEEF, 0x0BADF00D) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id LONG, b_lo LONG, b_hi LONG")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in ahash_neardup_pairs(
            df, max_hamming=6, max_block=3
        ).collect()
    }
    assert got == {(0, 1, 0), (0, 2, 0), (1, 2, 0)}, got
    ov = ahash_block_overflow(df, max_hamming=6, max_block=3).collect()
    assert len(ov) == 7, ov  # all 7 blocks overflow (identical hashes)
    assert all(
        r.n_rows == 8 and r.n_dropped_rows == 5 and r.uncapped_pairs == 28
        for r in ov
    ), ov


def test_prefix_filter_jaccard_lossless_and_cheaper(spark):
    """PPJoin prefix filtering: (a) output identical to the full
    inverted-index truth at the same threshold (the prefix lemma is
    lossless), (b) the candidate index is strictly smaller than the
    full one (the point)."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, SF, "documents")
    pf = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", 3, 0.5
        ).collect()
    }
    truth = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    assert pf == truth
    # index-size reduction: count indexed (doc, shingle) rows
    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.functions.text import word_shingles

    sh = docs.select(
        F.array_distinct(word_shingles(F.col("text"), 3)).alias("sh")
    )
    full_rows = sh.select(F.explode("sh")).count()
    p_len = (
        F.size("sh") - F.ceil(F.lit(0.5) * F.size("sh")).cast("int") + 1
    )
    prefix_rows = sh.select(
        F.explode(F.slice(F.col("sh"), 1, p_len))
    ).count()
    assert prefix_rows < 0.6 * full_rows, (prefix_rows, full_rows)


def test_budget_select_is_greedy_prefix(spark):
    """budget_select == the exact greedy prefix of the weight order:
    selected set matches a driver-side cumsum replay, and the next
    unselected doc would blow the budget."""
    from eco_pulse_lakehouse_spark.operators.selection import (
        budget_select,
        dsir_weights,
    )
    from eco_pulse_lakehouse_spark.functions.text import token_count

    docs = load_table(spark, SF, "documents")
    pred = F.col("lang") == "en"
    budget = 3000
    got = {
        r.doc_id: r.run_tokens
        for r in budget_select(docs, pred, budget).collect()
    }
    w = dsir_weights(docs, pred).join(
        docs.select(
            "doc_id", token_count(F.col("text")).alias("n_tokens")
        ),
        "doc_id",
    ).collect()
    order = sorted(w, key=lambda r: (-r.weight_fp, r.doc_id))
    acc, expect = 0, {}
    nxt = None
    for r in order:
        if acc + r.n_tokens <= budget:
            acc += r.n_tokens
            expect[r.doc_id] = acc
        else:
            nxt = r
            break
    assert got == expect
    assert nxt is not None and acc + nxt.n_tokens > budget


def test_canonical_per_cluster_picks_argmax_weight(spark):
    """Canonical selection replay: one row per cluster; the kept doc
    is the cluster's (weight desc, id) argmax; singletons keep
    themselves; and keep-BEST genuinely differs from keep-lowest-id
    on this corpus (else the operator adds nothing)."""
    from eco_pulse_lakehouse_spark.operators.components import (
        connected_components,
    )
    from eco_pulse_lakehouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from eco_pulse_lakehouse_spark.operators.selection import (
        canonical_per_cluster,
        dsir_weights,
    )

    docs = load_table(spark, SF, "documents")
    pred = F.col("lang") == "en"
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.2)
    got = {
        r.comp: (r.doc_id, r.weight_fp, r.n_members)
        for r in canonical_per_cluster(docs, pairs, pred).collect()
    }
    cc = {
        r.id: r.comp for r in connected_components(pairs).collect()
    }
    w = {
        r.doc_id: r.weight_fp
        for r in dsir_weights(docs, pred).collect()
    }
    clusters: dict = {}
    for d in w:
        clusters.setdefault(cc.get(d, d), []).append(d)
    expect = {
        c: (
            min(ms, key=lambda d: (-w[d], d)),
            w[min(ms, key=lambda d: (-w[d], d))],
            len(ms),
        )
        for c, ms in clusters.items()
    }
    assert got == expect
    # keep-best != keep-lowest somewhere
    assert any(doc != c for c, (doc, _, n) in got.items() if n > 1)


def test_winnowing_guarantee_and_python_replay(spark):
    """Winnowing's detection floor (Schleimer et al. Thm 1): two
    documents sharing a run of ≥ w+k−1 = 6 tokens MUST share a
    fingerprint, however different the rest is; and the fingerprint
    sets match a literal python replay (poly token hash → rolling
    3-gram combine → window-of-4 minima → distinct)."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        poly_token_hash,
        winnowing_fingerprints,
        winnowing_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token run
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four five six"),
            (2, f"seven eight nine ten {shared} eleven"),
            (3, "totally unrelated words in this document stream"),
            (4, "ab"),  # < k tokens: no fingerprints
        ],
        ["doc_id", "text"],
    )
    fp = winnowing_fingerprints(
        docs, "doc_id", "text", k=3, w=4, token_hash=poly_token_hash
    ).collect()
    got = {}
    for r in fp:
        got.setdefault(r.doc_id, set()).add(r.fp)
    assert 4 not in got  # too short for a single 3-gram

    def pth(tok: str) -> int:
        h = 0
        for c in tok:
            h = (h * 131 + ord(c)) % 1_000_000_007
        return h

    def replay(text: str) -> set[int]:
        th = [pth(t) for t in text.split(" ")]
        gh = [
            (((th[i] * 67 + th[i + 1]) % 2147483647) * 67 + th[i + 2])
            % 2147483647
            for i in range(len(th) - 2)
        ]
        if not gh:
            return set()
        n_win = max(len(gh) - 3, 1)
        return {min(gh[j:j + 4]) for j in range(n_win)}

    for r in docs.collect():
        assert got.get(r.doc_id, set()) == replay(r.text), r.doc_id
    # the guarantee: docs 1 and 2 share the 6-token run → ≥1 shared
    # fingerprint, and winnowing_pairs(min_shared=1) surfaces the pair
    assert got[1] & got[2]
    pairs = {
        (r.id_a, r.id_b)
        for r in winnowing_pairs(
            docs, "doc_id", "text", min_shared=1,
            token_hash=poly_token_hash,
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_phash_matches_python_replay_and_sees_structure(spark):
    """pHash vs a literal python replay (grays → integer DCT →
    non-DC median → bits) on crafted payloads; a CONSTANT payload
    has zero non-DC energy (all bits 0), while a structured payload
    lights low-frequency bits — the frequency sensitivity aHash
    lacks (its constant-payload hash equals its gradient hash iff
    cell means straddle identically)."""
    from eco_pulse_lakehouse_spark.operators.multimodal import (
        PHASH_DCT,
        perceptual_phash,
        to_multimodal,
    )

    flat = "m" * 128
    grad = "".join(chr(33 + (i * 90) // 128) for i in range(128))
    mixed = ("abcz" * 40)[:128]
    docs = spark.createDataFrame(
        [(1, flat), (2, grad), (3, mixed), (4, "")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_bytes, r.b_lo, r.b_hi)
        for r in perceptual_phash(to_multimodal(docs)).collect()
    }

    def replay(text: str):
        n = len(text)
        grays = []
        for j in range(64):
            s, e = (j * n) // 64, ((j + 1) * n) // 64
            # python floor((j*n)/64.0) == integer div for these sizes
            seg = [ord(c) for c in text[s:e]]
            grays.append((sum(seg) * 100) // (e - s) if e > s else 0)
        s1 = {
            (u, y): sum(
                PHASH_DCT[u][x] * grays[8 * y + x] for x in range(8)
            )
            for u in range(8)
            for y in range(8)
        }
        coefs = {
            (u, v): sum(PHASH_DCT[v][y] * s1[(u, y)] for y in range(8))
            for u in range(8)
            for v in range(8)
        }
        ranked = sorted(
            ((c, u, v) for (u, v), c in coefs.items() if (u, v) != (0, 0))
        )
        med = ranked[31][0]
        lo = sum(
            1 << (u * 8 + v)
            for (u, v), c in coefs.items()
            if c > med and u * 8 + v < 32
        )
        hi = sum(
            1 << (u * 8 + v - 32)
            for (u, v), c in coefs.items()
            if c > med and u * 8 + v >= 32
        )
        return (n, lo, hi)

    for did, text in ((1, flat), (2, grad), (3, mixed), (4, "")):
        assert got[did] == replay(text), did
    # constant payload: zero non-DC energy — ONLY the DC bit (bit 0,
    # excluded from the median but packed) survives
    assert got[1][1:] == (1, 0)
    assert got[2][1] & ~1 or got[2][2]  # gradient lights frequency bits
    assert got[2][1:] != got[3][1:]  # distinct structure, distinct hash


def test_factory_learned_dsir_target_diverges_from_en_target(spark):
    """flagship_data_factory_nb: the learned-target recipe must (a)
    select only NB-kept docs (its scoring pool), (b) genuinely
    diverge from the lang='en'-target manifest — different selected
    sets AND different weights for shared docs (if the two targets
    produced the same ordering the variant would be decorative)."""
    from eco_pulse_lakehouse_spark.plans.data_factory import (
        data_factory_manifest,
    )

    docs = load_table(spark, SF, "documents")
    v1 = {
        r.doc_id: r.weight_fp
        for r in data_factory_manifest(docs, token_budget=4000).collect()
    }
    v2 = {
        r.doc_id: r.weight_fp
        for r in data_factory_manifest(
            docs, token_budget=4000, dsir_target="nb_kept"
        ).collect()
    }
    assert v1 and v2
    assert set(v1) != set(v2)  # different selections
    shared = set(v1) & set(v2)
    assert shared and any(v1[d] != v2[d] for d in shared)


def test_bounded_winnowing_cap_deterministic_with_overflow(spark):
    """bounded_winnowing_pairs: capped pairs are a SUBSET of the
    unbounded pairs, pairs among cold (≤ cap) blocks are untouched,
    and winnowing_block_overflow accounts exactly for what the cap
    dropped (no silent caps) — checked on the real corpus where the
    cap genuinely binds."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        bounded_winnowing_pairs,
        poly_token_hash,
        winnowing_block_overflow,
        winnowing_fingerprints,
        winnowing_pairs,
    )

    docs = load_table(spark, SF, "documents")
    kw = dict(k=3, w=4, token_hash=poly_token_hash)
    full = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_pairs(
            docs, "doc_id", "text", min_shared=2, **kw
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.n_shared
        for r in bounded_winnowing_pairs(
            docs, "doc_id", "text", min_shared=2, max_block=5, **kw
        ).collect()
    }
    assert capped.keys() <= full.keys()
    assert all(capped[p] <= full[p] for p in capped)
    assert len(capped) < len(full)  # the cap binds on this corpus
    over = {
        r.fp: r
        for r in winnowing_block_overflow(
            docs, "doc_id", "text", max_block=5, **kw
        ).collect()
    }
    assert over  # binding cap ⇒ non-empty overflow report
    sizes: dict[int, int] = {}
    for r in winnowing_fingerprints(docs, "doc_id", "text", **kw).collect():
        sizes[r.fp] = sizes.get(r.fp, 0) + 1
    assert set(over) == {f for f, n in sizes.items() if n > 5}
    for f, r in over.items():
        assert r.n_rows == sizes[f]
        assert r.n_dropped_rows == sizes[f] - 5
        assert r.uncapped_pairs == sizes[f] * (sizes[f] - 1) // 2


def test_winnowing_clusters_consistency_vs_dedup_clusters(spark):
    """x2_winnowing_clusters composition consistency on the real
    corpus: (a) every winnowing PAIR ends in the same component of
    the cluster map its canonical output is built from; (b) exact
    duplicates (identical text, ≥ 6 tokens — inside the winnowing
    detection guarantee) are same-component in BOTH the winnowing
    clusters AND the Jaccard-pair clusters (x2_dedup_clusters'
    composition) — the dedup-ladder tiers agree wherever both have a
    guarantee; (c) the canonical table keeps exactly one row per
    component and covers every document."""
    from eco_pulse_lakehouse_spark.operators.components import (
        connected_components,
    )
    from eco_pulse_lakehouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
        poly_token_hash,
        winnowing_pairs,
    )
    from eco_pulse_lakehouse_spark.operators.selection import (
        canonical_per_cluster,
    )

    docs = load_table(spark, SF, "documents")
    pairs = winnowing_pairs(
        docs, "doc_id", "text", k=3, w=4, min_shared=2,
        token_hash=poly_token_hash,
    )
    pair_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert pair_rows
    comp = {
        r.id: r.comp for r in connected_components(pairs).collect()
    }
    for a, b in pair_rows:  # (a) pairs never split across clusters
        assert comp[a] == comp[b]

    # (b) exact duplicates (identical ≥ 6-token text — inside the
    # winnowing guarantee) planted among the real docs must be
    # same-component under BOTH tiers. sf0.001 carries no identical
    # texts, so the group is crafted; the real corpus still supplies
    # the surrounding fingerprint/shingle blocks.
    dup_text = (
        "planted duplicate paragraph with plenty of distinct tokens "
        "so the winnowing index keeps several fingerprints per copy"
    )
    spike = docs.sparkSession.createDataFrame(
        [(900001, dup_text), (900002, dup_text), (900003, dup_text)],
        "doc_id long, text string",
    )
    aug = docs.select("doc_id", "text").unionByName(spike)
    wcomp2 = {
        r.id: r.comp
        for r in connected_components(
            winnowing_pairs(
                aug, "doc_id", "text", k=3, w=4, min_shared=2,
                token_hash=poly_token_hash,
            )
        ).collect()
    }
    jcomp2 = {
        r.id: r.comp
        for r in connected_components(
            ngram_jaccard_pairs(
                aug, "doc_id", "text", shingle_n=3, threshold=0.2
            )
        ).collect()
    }
    planted = [900001, 900002, 900003]
    assert len({wcomp2[i] for i in planted}) == 1
    assert len({jcomp2[i] for i in planted}) == 1

    canon = canonical_per_cluster(
        docs, pairs, F.col("lang") == "en"
    ).collect()
    comps_seen = [r.comp for r in canon]
    assert len(comps_seen) == len(set(comps_seen))  # (c) one per comp
    assert sum(r.n_members for r in canon) == docs.count()


def _unimax_greedy(lang_n: dict[str, int], budget: int, epochs: int):
    """The PAPER's sequential greedy (UniMax Alg. 1, Chung et al.
    2023), smallest language first: grant min(E·n, remaining budget /
    remaining languages), subtract, recompute — integer div for the
    fair share, matching the operator's contract."""
    order = sorted(lang_n, key=lambda g: (lang_n[g], g))
    remaining, quotas = budget, {}
    for idx, g in enumerate(order):
        fair = remaining // (len(order) - idx)
        quotas[g] = min(epochs * lang_n[g], fair)
        remaining -= quotas[g]
    return quotas


def test_unimax_closed_form_matches_sequential_greedy(spark):
    """unimax_quotas' closed form ≡ the paper's sequential greedy on
    the real corpus AND on crafted ladders that put the capped→
    uncapped transition at every possible position (incl. all-capped
    and none-capped)."""
    from eco_pulse_lakehouse_spark.operators.sampling import unimax_quotas

    cases = [
        # (lang→tokens, budget, epochs)
        ({"a": 10, "b": 20, "c": 400}, 300, 2),     # c uncapped
        ({"a": 10, "b": 20, "c": 400}, 2000, 2),    # all capped
        ({"a": 10, "b": 20, "c": 400}, 30, 2),      # all uncapped
        ({"a": 10, "b": 20, "c": 400}, 75, 2),      # b,c uncapped
        ({"a": 7}, 100, 3),                          # single language
        ({"a": 5, "b": 5, "c": 5, "d": 1000}, 1015, 1),
        ({"a": 5, "b": 5, "c": 6}, 16, 1),    # cap==fair boundary ties
        ({"a": 3, "b": 4, "c": 5, "d": 6}, 17, 2),  # remainder spread
    ]
    docs = load_table(spark, SF, "documents")
    from eco_pulse_lakehouse_spark.functions.text import token_count

    real = {
        r.lang: r.n
        for r in docs.groupBy("lang")
        .agg(F.sum(token_count(F.col("text"))).alias("n"))
        .collect()
    }
    cases.append((real, (3 * sum(real.values())) // 2, 2))
    for lang_n, budget, epochs in cases:
        lt = spark.createDataFrame(
            list(lang_n.items()), "lang string, n_tokens long"
        )
        got = {
            r.lang: r.lang_quota
            for r in unimax_quotas(
                lt, "lang", "n_tokens", budget, epochs
            ).collect()
        }
        want = _unimax_greedy(lang_n, budget, epochs)
        assert got == want, (lang_n, budget, epochs, got, want)


def test_unimax_select_branches_and_prefix(spark):
    """The manifest realizes the quotas: a capped language keeps ALL
    its documents (quota ≥ size — repetition headroom), an uncapped
    one truncates at the shared fair share with the correct greedy
    prefix (adding the next doc in hash order would exceed the
    quota), and both branches actually fire on this corpus."""
    from eco_pulse_lakehouse_spark.functions.text import token_count
    from eco_pulse_lakehouse_spark.operators.sampling import (
        unimax_quotas,
        unimax_select,
        unit_hash,
    )

    docs = load_table(spark, SF, "documents")
    kept = unimax_select(
        docs, "doc_id", "lang", "text",
        max_epochs=2, budget_num=3, budget_den=2,
    ).collect()
    totals = docs.groupBy("lang").agg(
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    quotas = {
        r.lang: r
        for r in unimax_quotas(
            totals, "lang", "n_tokens",
            None, 2, budget_num=3, budget_den=2,
        ).join(totals.select("lang", "n_docs"), "lang").collect()
    }
    assert any(q.capped for q in quotas.values())
    assert any(not q.capped for q in quotas.values())
    per_lang: dict[str, list] = {}
    for r in kept:
        per_lang.setdefault(r.lang, []).append(r)
    rows = docs.select(
        "doc_id", "lang",
        token_count(F.col("text")).alias("nt"),
        unit_hash(F.col("doc_id")).alias("u"),
    ).collect()
    for lang, q in quotas.items():
        got_ids = {r.doc_id for r in per_lang.get(lang, [])}
        if q.capped:
            assert len(got_ids) == q.n_docs, f"{lang} capped but truncated"
        else:
            order = sorted(
                (r for r in rows if r.lang == lang),
                key=lambda r: (r.u, r.doc_id),
            )
            acc, want = 0, set()
            for r in order:
                if acc + r.nt > q.lang_quota:
                    assert acc + r.nt > q.lang_quota  # next doc overflows
                    break
                acc += r.nt
                want.add(r.doc_id)
            assert got_ids == want, f"{lang} prefix mismatch"
            # truncation only binds when the fair share is smaller
            # than the language itself (quota in (n, 2n) keeps all)
            if q.lang_quota < q.n:
                assert len(got_ids) < q.n_docs, f"{lang} kept all"


def test_k_anonymize_groups(spark):
    """Every released (non-redacted) quasi combination describes >= k
    rows; small groups are fully redacted; counts reflect the
    ORIGINAL groups."""
    from eco_pulse_lakehouse_spark.operators.quality import k_anonymize

    rows = (
        [(i, "en", "a") for i in range(6)]
        + [(10 + i, "de", "b") for i in range(2)]
        + [(20, "zh", "c")]
    )
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, source STRING")
    out = k_anonymize(df, ["lang", "source"], k=5).collect()
    by_id = {r.doc_id: r for r in out}
    assert all(not by_id[i].suppressed and by_id[i].lang == "en" for i in range(6))
    assert all(by_id[i].suppressed and by_id[i].lang == "*" for i in (10, 11, 20))
    assert by_id[10].group_n == 2 and by_id[20].group_n == 1


def _py_nb_classifier(rows, pos_ids, n_buckets=128, score_rows=None):
    """Pure-Python NB log-odds reference: same poly char-fold hash,
    same add-half smoothing over the DENSE bucket grid (an unseen
    bucket carries its smoothed zero-count log-odds), same ln→1e-6
    fixed point (HALF_UP), same doc-count prior. rows = (id, text)
    training set; pos_ids = labeled positive ids; score_rows
    defaults to the training set (self-training)."""
    import math
    from collections import Counter

    def poly(tok):
        h = 0
        for c in tok:
            h = (h * 131 + ord(c)) % 1_000_000_007
        return h

    def feats(text):
        w = text.split(" ")
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def fp(x):
        x *= 1_000_000
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    c_p, c_n = Counter(), Counter()
    for _id, text in rows:
        for f in feats(text):
            b = poly(f) % n_buckets
            (c_p if _id in pos_ids else c_n)[b] += 1
    np_, nn = sum(c_p.values()), sum(c_n.values())
    w_fp = {}
    for b in range(n_buckets):
        r = ((2 * c_p[b] + 1) / (2 * np_ + n_buckets)) / (
            (2 * c_n[b] + 1) / (2 * nn + n_buckets)
        )
        w_fp[b] = fp(math.log(r))
    dp = sum(1 for _id, _ in rows if _id in pos_ids)
    dn = len(rows) - dp
    prior_fp = fp(math.log((2 * dp + 1) / (2 * dn + 1)))
    out = {}
    for _id, text in rows if score_rows is None else score_rows:
        fs = feats(text)
        ev = sum(w_fp[poly(f) % n_buckets] for f in fs)
        out[_id] = (len(fs), ev, ev + prior_fp)
    return out


def test_nb_classifier_matches_python_reference(spark):
    """operators/selection.py:nb_classify vs an independent pure-
    Python NB on a crafted two-class corpus (bucket collisions
    guaranteed: 128 buckets, >128 distinct features; positives a
    minority so the prior is decisively negative)."""
    from eco_pulse_lakehouse_spark.operators.selection import nb_classify

    rows = [
        (i, " ".join(f"good{(i * 7 + j) % 50}" for j in range(12)))
        for i in range(8)
    ] + [
        (100 + i, " ".join(f"junk{(i * 5 + j) % 90}" for j in range(9)))
        for i in range(24)
    ]
    pos_ids = set(range(8))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_feats, r.evidence_fp, r.margin_fp)
        for r in nb_classify(df, F.col("doc_id") < 8).collect()
    }
    assert got == _py_nb_classifier(rows, pos_ids)


def test_nb_classifier_separates_and_gates(spark):
    """The point of the rung: docs made of positive-class tokens get
    positive evidence, negative-class docs negative; a held-out doc
    (not in the training frame) is scored by the learned weights via
    the train= split; and the margin gate honors threshold_fp."""
    from eco_pulse_lakehouse_spark.operators.selection import nb_classify

    train_rows = [
        (i, " ".join(f"good{j}" for j in range(10))) for i in range(5)
    ] + [
        (10 + i, " ".join(f"junk{j}" for j in range(10))) for i in range(5)
    ]
    tr = spark.createDataFrame(train_rows, "doc_id LONG, text STRING")
    score_rows = train_rows + [(99, "good0 good1 good2 good3")]
    sc = spark.createDataFrame(score_rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: r
        for r in nb_classify(
            sc, F.col("doc_id") < 10, train=tr
        ).collect()
    }
    assert all(got[i].evidence_fp > 0 for i in range(5))
    assert all(got[10 + i].evidence_fp < 0 for i in range(5))
    # held-out doc of positive tokens scores positive
    assert got[99].evidence_fp > 0
    # balanced classes → prior ~ ln(11/11)=0 → keep == evidence sign
    assert got[99].keep and not got[10].keep


def test_nb_classifier_unseen_buckets_scored_exactly(spark):
    """Regression for the sparse-train drop (ADVICE r09 medium): a
    held-out ``train=`` sample leaves feature buckets untrained; the
    densified weight table must score them with the smoothed
    zero-count log-odds instead of the weight join silently dropping
    those feature rows (which corrupted n_feats / evidence_fp /
    margin_fp). Pinned exactly against the dense pure-Python
    reference, with the craft guarded: the scored tail doc must
    actually hit ≥1 bucket absent from training."""
    from eco_pulse_lakehouse_spark.operators.selection import nb_classify

    train_rows = [
        (0, "alpha beta alpha"),
        (1, "gamma delta"),
        (2, "epsilon zeta eta"),
    ]
    pos_ids = {0}
    score_rows = train_rows + [
        (50, "zzqx wwvu alpha"),
        (51, "qqpp rrss"),
    ]

    def poly(tok):
        h = 0
        for c in tok:
            h = (h * 131 + ord(c)) % 1_000_000_007
        return h

    def buckets(text):
        w = text.split(" ")
        fs = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
        return {poly(f) % 128 for f in fs}

    trained = set().union(*(buckets(t) for _, t in train_rows))
    assert buckets("zzqx wwvu alpha") - trained, "craft lost its point"

    tr = spark.createDataFrame(train_rows, "doc_id LONG, text STRING")
    sc = spark.createDataFrame(score_rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_feats, r.evidence_fp, r.margin_fp)
        for r in nb_classify(sc, F.col("doc_id") == 0, train=tr).collect()
    }
    assert got == _py_nb_classifier(
        train_rows, pos_ids, score_rows=score_rows
    )
    # the old inner join dropped unseen-bucket rows: n_feats must
    # count EVERY feature of the scored doc (5 = 3 unigrams + 2 bigrams)
    assert got[50][0] == 5 and got[51][0] == 3


def test_curation_shared_featurize_equals_operator_composition(spark):
    """plans/curation.py's shared doc-bucket featurize must be
    BIT-identical to naively composing the per-operator forms
    (exact_dedup → line_dedup → nb_classify evidence gate →
    dsir_weights) — Σ_bucket n·w_fp ≡ Σ_features w_fp on both LM
    stages (the t37/t41 linearity argument, pinned batch-side)."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        exact_dedup,
        line_dedup_keep_first,
    )
    from eco_pulse_lakehouse_spark.operators.selection import (
        dsir_weights,
        nb_classify,
    )
    from eco_pulse_lakehouse_spark.functions.text import token_count
    from eco_pulse_lakehouse_spark.plans.curation import curation_select

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = {tuple(r) for r in curation_select(docs, k=100).collect()}

    dd = exact_dedup(docs, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "text"
    )
    ld = line_dedup_keep_first(dd, "doc_id", "text", 3)
    cleaned = (
        dd.select("doc_id", "lang", "source")
        .join(ld.select("doc_id", "text_clean"), "doc_id")
        .filter(F.col("text_clean") != "")
        .select(
            "doc_id", "lang", "source", F.col("text_clean").alias("text")
        )
    )
    gated = nb_classify(
        cleaned,
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
    )
    kept = cleaned.join(
        gated.filter(F.col("evidence_fp") >= 0).select("doc_id"), "doc_id"
    )
    w = dsir_weights(kept, F.col("lang") == "en")
    want = {
        tuple(r)
        for r in w.join(kept, "doc_id")
        .select(
            "doc_id",
            "lang",
            "weight_fp",
            token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        )
        .orderBy(F.col("weight_fp").desc(), F.col("doc_id").asc())
        .limit(100)
        .collect()
    }
    assert got == want and len(got) > 0


def _py_nb_multiclass(rows, train_ids, n_buckets=128):
    """Pure-Python multiclass NB reference: dense class×bucket grid,
    add-half smoothing, ln→1e-6 HALF_UP fixed point, doc-count
    priors, (score desc, class asc) argmax. rows = (id, text, cls)."""
    import math
    from collections import Counter, defaultdict

    def poly(tok):
        h = 0
        for c in tok:
            h = (h * 131 + ord(c)) % 1_000_000_007
        return h

    def feats(text):
        w = text.split(" ")
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def fp(x):
        x *= 1_000_000
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    cc = defaultdict(Counter)
    dcount = Counter()
    for _id, text, cls in rows:
        if _id not in train_ids:
            continue
        dcount[cls] += 1
        for f in feats(text):
            cc[cls][poly(f) % n_buckets] += 1
    classes = sorted(cc)
    n_c = {c: sum(cc[c].values()) for c in classes}
    w_fp = {
        (c, b): fp(
            math.log((2 * cc[c][b] + 1) / (2 * n_c[c] + n_buckets))
        )
        for c in classes
        for b in range(n_buckets)
    }
    d_tot, kcls = sum(dcount.values()), len(classes)
    pri = {
        c: fp(math.log((2 * dcount[c] + 1) / (2 * d_tot + kcls)))
        for c in classes
    }
    out = {}
    for _id, text, _cls in rows:
        fs = feats(text)
        best = max(
            classes,
            key=lambda c: (
                pri[c] + sum(w_fp[(c, poly(f) % n_buckets)] for f in fs),
                [-ord(ch) for ch in c],
            ),
        )
        score = pri[best] + sum(
            w_fp[(best, poly(f) % n_buckets)] for f in fs
        )
        out[_id] = (best, score, len(fs))
    return out


def test_nb_multiclass_matches_python_and_separates(spark):
    """nb_multiclass_classify vs the pure-Python reference on a
    crafted 3-language corpus with held-out docs (train on even ids
    only): exact scores AND the semantics — held-out docs of each
    class-specific vocabulary are predicted as their class."""
    from eco_pulse_lakehouse_spark.operators.selection import (
        nb_multiclass_classify,
    )

    rows = []
    vocab = {"aa": "alpha", "bb": "beta", "cc": "gamma"}
    i = 0
    for pre, cls in vocab.items():
        for j in range(8):
            rows.append(
                (i, " ".join(f"{pre}{(j + t) % 6}" for t in range(9)), cls)
            )
            i += 1
    train_ids = {r[0] for r in rows if r[0] % 2 == 0}
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    got = {
        r.doc_id: (r.pred_lang, r.score_fp, r.n_feats)
        for r in nb_multiclass_classify(
            df, train_pred=F.col("doc_id") % 2 == 0
        ).collect()
    }
    assert got == _py_nb_multiclass(rows, train_ids)
    # semantics: every held-out doc lands in its own class
    truth = {r[0]: r[2] for r in rows}
    held_out = [i for i in truth if i % 2 == 1]
    assert held_out and all(got[i][0] == truth[i] for i in held_out)


def test_nb_gate_sweep_monotone_and_consistent(spark):
    """Calibration-sweep invariants (VERDICT r09 item 6): as the
    threshold rises the gate only tightens — n_kept, tp and
    recall_ppm are non-increasing, fn non-decreasing — and the
    confusion counts satisfy their exact identities at every
    threshold (tp+fp = n_kept, tp+fn = n_pos, all four quadrants sum
    to n_scored, n_scored/n_pos constant across rows since the
    held-out split doesn't depend on the threshold). ppm rates use
    the −1 sentinel exactly when their denominator is zero."""
    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.operators.sampling import unit_hash
    from eco_pulse_lakehouse_spark.operators.selection import nb_gate_sweep

    docs = load_table(spark, SF, "documents")
    pos = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    rows = sorted(
        nb_gate_sweep(
            docs, pos, train_pred=unit_hash(F.col("doc_id")) < 0.5
        ).collect(),
        key=lambda r: r.threshold_fp,
    )
    assert len(rows) == 7
    assert len({r.n_scored for r in rows}) == 1
    assert len({r.n_pos for r in rows}) == 1
    for r in rows:
        assert r.tp + r.fp == r.n_kept
        assert r.tp + r.fn == r.n_pos
        assert r.tp + r.fp + r.fn + r.tn == r.n_scored
        assert (r.precision_ppm == -1) == (r.n_kept == 0)
        if r.n_kept > 0:
            assert r.precision_ppm == (1_000_000 * r.tp) // r.n_kept
            assert r.recall_ppm == (1_000_000 * r.tp) // r.n_pos
    for a, b in zip(rows, rows[1:]):
        assert b.n_kept <= a.n_kept
        assert b.tp <= a.tp
        assert b.fn >= a.fn
        if a.recall_ppm >= 0 and b.recall_ppm >= 0:
            assert b.recall_ppm <= a.recall_ppm
    # the sweep genuinely sweeps: the gate moves between extremes
    assert rows[0].n_kept > rows[-1].n_kept


def test_rag_context_mmr_diversity_flip_and_stages(spark):
    """Flagship-level MMR pin (VERDICT r09 item 3): with the
    diversity penalty active (λ = 7/10) the MMR-extended RAG
    flagship selects a different doc set than the λ = 1
    pure-relevance run (mu = 0 makes the greedy degenerate to
    relevance order) for at least one query on the real sf0.001
    corpus — i.e. the diversification stage genuinely changes the
    served context, not just its order. Also pins stage activity:
    the containment dedup and the token budget each drop at least
    one row end-to-end."""
    from eco_pulse_lakehouse_spark.plans.rag_context import rag_context_mmr

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")
    kwargs = dict(
        n_queries=5, k_pool=10, k_select=5, shingle_n=2,
        containment_num=3, containment_den=20, token_budget=250,
    )
    mmr = rag_context_mmr(emb, docs, lam_num=7, lam_den=10, **kwargs)
    rel = rag_context_mmr(emb, docs, lam_num=10, lam_den=10, **kwargs)
    mmr_sel = {(r.q_id, r.doc_id) for r in mmr.collect()}
    rel_sel = {(r.q_id, r.doc_id) for r in rel.collect()}
    assert mmr_sel != rel_sel, "diversity penalty never flipped a pick"
    rows = mmr.collect()
    # containment dedup left a rank gap (a selected doc was dropped)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.mmr_rank)
    assert any(
        sorted(rks) != list(range(1, len(rks) + 1)) or len(rks) < 5
        for rks in by_q.values()
    )
    # budget trims: an unbounded-budget run keeps strictly more rows
    unb = dict(kwargs, token_budget=10**9)
    n_unbounded = rag_context_mmr(
        emb, docs, lam_num=7, lam_den=10, **unb
    ).count()
    assert len(rows) < n_unbounded
    assert all(r.cum_tokens <= 250 for r in rows)


def test_mmr_rerank_diversifies_and_matches_python(spark):
    """mmr_rerank semantics on a crafted pool: the round-1 pick c2
    has a near-copy c1 whose relevance beats the diverse c3, so
    plain relevance ranks the copy second but MMR's round-2 penalty
    λ·rel − (1−λ)·max-sim must skip it and pick c3 — plus an exact
    replay against an independent pure-Python MMR."""
    import math

    from eco_pulse_lakehouse_spark.operators.similarity import mmr_rerank

    qrows = [(0, [1.0, 0.0, 0.0])]
    crows = [
        (1, [0.9, 0.436, 0.0]),       # rel .90, near-copy of c2
        (2, [0.91, 0.4146, 0.0]),     # rel .91 — round-1 pick
        (3, [0.9, -0.436, 0.0]),      # rel .90, diverse from c2
        (4, [0.2, 0.98, 0.0]),        # filler
    ]
    qs = spark.createDataFrame(qrows, "q_id LONG, q_vec ARRAY<DOUBLE>")
    cs = spark.createDataFrame(crows, "c_id LONG, c_vec ARRAY<DOUBLE>")
    got = [
        (r.mmr_rank, r.c_id, r.rel_fp, r.score_fp)
        for r in mmr_rerank(qs, cs, k_pool=4, k_select=3)
        .orderBy("mmr_rank")
        .collect()
    ]

    def hu(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def cos_fp(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        s = dot / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )
        return hu(hu(s * 1e6))  # round(.,6) then ×1e6 round(.,0)

    q = qrows[0][1]
    rel = {cid: cos_fp(q, v) for cid, v in crows}
    vecs = dict(crows)
    sel, remaining = [], [c for c, _ in crows]
    expected = []
    for rank in range(1, 4):
        best = None
        for c in remaining:
            pen = max((cos_fp(vecs[c], vecs[s]) for s in sel), default=0)
            score = 7 * rel[c] - (3 * pen if sel else 0)
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        expected.append((rank, best[1], rel[best[1]], best[2]))
        sel.append(best[1])
        remaining.remove(best[1])
    assert got == expected, (got, expected)
    # the flip actually happened: relevance alone would rank c2
    # second (rel .91 > .90), MMR picks the diverse c3
    assert rel[2] > rel[3]
    assert [c for _, c, _, _ in expected[:2]] == [2, 3] or [
        c for _, c, _, _ in expected[:2]
    ] == [1, 3]
    assert got[1][1] == 3
