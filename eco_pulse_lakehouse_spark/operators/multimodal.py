"""Multimodal (binary) column plumbing — north-star X5 (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payloads with a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
layout, Arrow-batched decode UDF signature — is real and tested; the
actual byte decode is STUBBED (image/audio libraries are not in this
container): ``decode_features`` computes a deterministic fake feature
vector from the bytes, and ``decode_image`` raises
``NotImplementedError`` to mark the integration point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FEATURE_DIM = 8

MULTIMODAL_SCHEMA = (
    "doc_id BIGINT, payload BINARY, "
    "meta STRUCT<format: STRING, n_bytes: BIGINT, width: INT, height: INT>"
)


def to_multimodal(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal table from documents: payload = utf-8 bytes
    (stand-in for image bytes), metadata struct with deterministic
    fake dimensions. At scale this is the shape of an image-manifest
    table: small metadata columns scan-prunable without touching the
    payload column (parquet column pruning)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.length(payload).cast("bigint")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("utf8-text").alias("format"),
            n_bytes.alias("n_bytes"),
            (F.pmod(n_bytes, F.lit(64)) + 1).cast("int").alias("width"),
            (F.pmod(n_bytes, F.lit(48)) + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def chunk_payloads(mm: DataFrame, page_bytes: int = 1024) -> DataFrame:
    """Split each binary payload into fixed-size pages:
    (doc_id, page_idx, page, n_pages).

    The larger-than-one-Arrow-batch shape: a 100 TB multimodal table
    can't move GB-scale payloads as single cells (Arrow batch and
    shuffle-record limits); paged layout keeps every record bounded
    by ``page_bytes``, pages shuffle/write independently, and
    :func:`reassemble_chunks` restores the payload where it's
    consumed. Pure JVM expressions — the slicing never enters Python.
    """
    n_pages = F.ceil(F.col("meta.n_bytes") / F.lit(float(page_bytes))).cast(
        "int"
    )
    ex = (
        mm.select(
            "doc_id",
            "payload",
            n_pages.alias("n_pages"),
        )
        # sequence(0, -1) DESCENDS for empty payloads — guard to none
        .filter(F.col("n_pages") >= 1)
        .select(
            "doc_id",
            "payload",
            "n_pages",
            F.explode(
                F.sequence(F.lit(0), F.col("n_pages") - 1)
            ).alias("page_idx"),
        )
    )
    return ex.select(
        "doc_id",
        "page_idx",
        F.expr(
            f"substring(payload, page_idx * {page_bytes} + 1, {page_bytes})"
        ).alias("page"),
        "n_pages",
    )


def reassemble_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of :func:`chunk_payloads`: order pages per doc and
    binary-concat them back into (doc_id, payload). One shuffle on
    doc_id; the fold is a JVM higher-order concat (no Python)."""
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("page_idx", "page"))
            ).alias("__ps")
        )
        .select(
            "doc_id",
            F.aggregate(
                F.col("__ps"),
                F.lit(b""),
                lambda acc, s: F.concat(acc, s.getField("page")),
            ).alias("payload"),
        )
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """REAL decode integration point (PIL/torchvision/ffmpeg).

    Not implemented in this container — the callers below use the
    deterministic fake featurizer instead.
    """
    raise NotImplementedError(
        "image/audio decode libraries are not available in this image; "
        "plug PIL/ffmpeg here on a real cluster"
    )


def _fake_features(payload: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in featurizer: FEATURE_DIM means of byte
    slices — same batch shape/cost profile as a thumbnail embed."""
    import numpy as np

    feats = []
    for b in payload:
        arr = np.frombuffer(b, dtype=np.uint8)
        chunks = np.array_split(arr, FEATURE_DIM)
        feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
    return pd.DataFrame({"features": feats})


def resize_meta(mm: DataFrame, max_w: int = 32, max_h: int = 32) -> DataFrame:
    """Resize planning as pure metadata math (aspect-preserving fit
    into max_w x max_h). The pixel resample itself belongs in the
    decode UDF (decode_image stub); the planned dimensions are
    column expressions — scannable and filterable WITHOUT touching
    payload bytes."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    return mm.withColumn(
        "resize_plan",
        F.struct(
            F.greatest(F.floor(w * scale).cast("int"), F.lit(1)).alias("out_w"),
            F.greatest(F.floor(h * scale).cast("int"), F.lit(1)).alias("out_h"),
            F.round(scale, 6).alias("scale"),
        ),
    )


def sample_frames(mm: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over a "video" payload: emit ``n_frames``
    evenly-spaced byte slices per document as (doc_id, frame_idx,
    frame) rows via mapInPandas — the batch shape of real
    ffmpeg-frame extraction (decode stubbed: slices stand in for
    decoded frames; one output row per frame, payload never on the
    driver)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    start = min(i * step, max(n - 1, 0))
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[start : start + step]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return mm.mapInPandas(
        op, schema="doc_id BIGINT, frame_idx INT, frame BINARY"
    )


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    mapInPandas — the canonical shape for decode/resize/frame-sample
    at scale (one Python worker per partition, Arrow batch transfer,
    payload never passes through the driver)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _fake_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": out["features"].values,
                }
            )

    return mm.mapInPandas(
        op, schema="doc_id BIGINT, n_bytes BIGINT, features ARRAY<DOUBLE>"
    )


def segment_payload_windows(
    mm: DataFrame,
    bytes_per_sample: int = 2,
    win: int = 64,
    hop: int = 32,
    sample_rate: int = 16000,
) -> DataFrame:
    """Fixed-window AUDIO segmentation plan — metadata-only, like
    :func:`resize_meta` for images: treat the payload as PCM samples
    (``n_samples = n_bytes // bytes_per_sample``) and emit one row
    per sliding window of ``win`` samples at ``hop`` sample stride,
    the pre-transcription windowing every speech pipeline runs
    (Whisper's fixed 30 s windows, VAD chunkers); the final window
    is ragged (clipped at the payload end) so every sample is
    covered. Returns (doc_id, seg_idx, start_sample, end_sample,
    n_samples, duration_s).

    The plan never touches payload bytes — it is derived entirely
    from the meta struct, so at 100 TB the scheduler-side segment
    manifest scans a few metadata columns (parquet column pruning)
    and the GB-scale payload column stays on disk until the stubbed
    decode stage (decode_image's integration point) consumes chosen
    segments, via the page-slice machinery in chunk_payloads. All
    arithmetic is integer + one final double division (duration), so
    the plan replays exactly in SQL (x5_audio_segments)."""
    nn = F.floor(
        F.col("meta.n_bytes") / F.lit(float(bytes_per_sample))
    ).cast("bigint")
    extra = F.when(
        nn > win,
        F.floor(
            (nn - F.lit(win) + F.lit(hop - 1)) / F.lit(float(hop))
        ).cast("int"),
    ).otherwise(F.lit(0))
    n_seg = F.when(nn <= 0, F.lit(0)).otherwise(extra + F.lit(1))
    seg_end = lambda i: F.least(  # noqa: E731
        i.cast("bigint") * hop + win, F.col("__n")
    )
    segs = F.when(
        n_seg > 0,
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.struct(
                i.cast("int").alias("seg_idx"),
                (i.cast("bigint") * hop).alias("start_sample"),
                seg_end(i).alias("end_sample"),
                (seg_end(i) - i.cast("bigint") * hop).alias("n_samples"),
                (
                    (seg_end(i) - i.cast("bigint") * hop).cast("double")
                    / F.lit(float(sample_rate))
                ).alias("duration_s"),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<seg_idx:int,start_sample:bigint,"
            "end_sample:bigint,n_samples:bigint,duration_s:double>>"
        )
    )
    return (
        mm.withColumn("__n", nn)
        .select("doc_id", F.explode(segs).alias("seg"))
        .select("doc_id", "seg.*")
    )


def perceptual_ahash(mm: DataFrame) -> DataFrame:
    """Perceptual AVERAGE HASH over the payload bytes — the classic
    aHash (resize to an 8×8 gray grid, bit = cell > global mean),
    re-expressed over the deterministic stand-in "decode": cell j's
    gray value is the byte-sum of the j-th of 64 contiguous payload
    slices (REAL decode integration point = decode_image; the
    hash-from-grays math below is the production shape either way).
    The 64-cell / two-32-bit-word layout is fixed (it is the
    binary_quantize word layout ahash_neardup_pairs XORs against),
    so there is deliberately no cell-count knob.

    Exactness without division: cell_mean > global_mean is evaluated
    as the integer cross-multiplication ``cell_sum · n_bytes >
    total_sum · cell_len`` — no float anywhere, so the packed words
    are oracle-exact. Bits pack into two 32-bit words (b_lo =
    cells 0-31, b_hi = 32-63), the binary_quantize layout, so
    near-dup pairing reuses the same XOR+popcount machinery.
    Empty cells (payload shorter than 64 bytes) compare 0 > 0 and
    pack as 0 in every engine.

    Row-local HOF arithmetic only — no shuffle, no Python; scales
    linearly and column-prunes to the payload. Returns
    (doc_id, n_bytes, b_lo, b_hi).

    PRECONDITION (ADVICE r13): ``doc_id`` rows must be UNIQUE — the
    r13 explode+groupBy form aggregates cell sums by (doc_id, n),
    so equal-length duplicate doc_id rows would merge into one
    summed output row where the r12 per-row form hashed each
    independently. perceptual_phash shares the same precondition;
    the mm corpus is keyed by doc_id, and a caller with duplicate
    ids should aggregate on a row-unique key instead."""
    # ASCII payloads make byte values char codes (the x5 oracle
    # trick): ascii() over split characters == the byte stream.
    # Spark split('', '') yields [''] where DuckDB string_split
    # yields [] — guard the empty payload to the empty byte stream
    # so both engines agree on n_bytes = 0.
    #
    # Shape (r13): the original 64 interpreted slice-folds per row
    # benched 4.9 s at sf0.1; this is the pHash discipline instead —
    # ONE posexplode + map-side-combinable cell-sum groupBy + per-doc
    # 64-entry map, then a row-local generated-SQL tail (cell lengths
    # come from the slice-boundary formula, so only sums are
    # carried). Bit-identical: the inverted cell assignment
    # j = (64·(p+1) − 1) div n is the exact inverse of the
    # floor(j·n/64) slice boundaries, sums are integer, and the
    # bit rule s·n > tot·l compares the same integers.
    txt = F.decode(F.col("payload"), "UTF-8")
    codes = F.when(
        F.length(txt) > 0,
        F.transform(F.split(txt, ""), lambda c: F.ascii(c).cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))
    base = mm.select(
        "doc_id",
        codes.alias("__cd"),
        F.size(codes).cast("bigint").alias("__n"),
    )
    bytes_ = base.select(
        "doc_id",
        F.col("__n"),
        F.posexplode_outer(F.col("__cd")).alias("__p", "__c"),
    )
    cells_map = (
        bytes_.filter(F.col("__c").isNotNull())
        .withColumn(
            "j", F.expr("CAST((64 * (__p + 1) - 1) div __n AS INT)")
        )
        .groupBy("doc_id", "__n", "j")
        .agg(F.sum("__c").alias("__s"))
        .groupBy("doc_id", "__n")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("j", "__s"))
            ).alias("__m")
        )
    )
    # sums[j], lens[j] (slice-boundary formula), tot = Σ sums, then
    # the integer cross-multiplication bit rule — one generated-SQL
    # expression with each stage bound once per row (the pHash
    # let-binding form).
    sums = "array({})".format(
        ",".join(
            f"coalesce(element_at(__m, {j}), 0L)" for j in range(64)
        )
    )
    lens = "array({})".format(
        ",".join(
            f"CAST((({j + 1}) * __n) div 64 - (({j}) * __n) div 64"
            " AS BIGINT)"
            for j in range(64)
        )
    )
    tot = "aggregate(s, 0L, (acc, x) -> acc + x)"

    def _pack(lo: int) -> str:
        return (
            "aggregate(sequence(0, 31), 0L, (acc, j) -> acc +"
            f" (CASE WHEN element_at(s, CAST(j + {lo + 1} AS INT)) * __n"
            f" > t * element_at(l, CAST(j + {lo + 1} AS INT))"
            " THEN shiftleft(1L, j) ELSE 0L END))"
        )

    tail = (
        f"element_at(transform(array({sums}), s -> "
        f"element_at(transform(array({lens}), l -> "
        f"element_at(transform(array({tot}), t -> "
        f"named_struct('b_lo', {_pack(0)}, 'b_hi', {_pack(32)})"
        "), 1)), 1)), 1)"
    )
    hashed = cells_map.withColumn("__h", F.expr(tail)).select(
        "doc_id",
        F.col("__n").alias("n_bytes"),
        F.col("__h.b_lo").alias("b_lo"),
        F.col("__h.b_hi").alias("b_hi"),
    )
    empty = base.filter(F.col("__n") == 0).select(
        "doc_id",
        F.col("__n").alias("n_bytes"),
        F.lit(0).cast("bigint").alias("b_lo"),
        F.lit(0).cast("bigint").alias("b_hi"),
    )
    return hashed.unionByName(empty)


# Integer DCT-II basis for the 8-point transform, rounded to a 1e4
# fixed point: C[u][x] = round(cos((2x+1)·u·π/16) · 10000). Plain
# compile-time literals baked into BOTH the operator and the oracle
# generator from this one table (the minhash-constants discipline),
# so the transform is exact BIGINT arithmetic in every engine.
import math as _math

PHASH_DCT = tuple(
    tuple(
        int(round(_math.cos((2 * x + 1) * u * _math.pi / 16) * 10_000))
        for x in range(8)
    )
    for u in range(8)
)


def perceptual_phash(mm: DataFrame) -> DataFrame:
    """Perceptual DCT HASH (pHash) over the payload bytes — the
    frequency-domain tier next to :func:`perceptual_ahash`'s spatial
    mean bits: the 8×8 gray grid goes through a separable 2-D DCT-II
    (integer 1e4 fixed-point cosine table — PHASH_DCT), and bit (u,v)
    = coefficient > the exact integer MEDIAN of the 63 non-DC
    coefficients (the classic pHash threshold; aHash sees only
    per-cell brightness, the DCT sees gradients and structure).
    Same stand-in decode as aHash: cell gray = 1e2 fixed-point mean
    of the cell's byte slice (integer div — the real decode is the
    documented env-gated integration point); same two-32-bit-word
    output layout, so ahash_neardup_pairs' XOR+popcount machinery
    pairs pHashes unchanged.

    Shape: grays explode to 64 rows/doc; the two DCT stages are
    equi-joins against the BROADCAST 64-row basis table + partial
    aggregations (never a 4096-term expression); the median is one
    per-doc rank over 63 rows. All BIGINT (|coef| ≤ 64·10⁸·grays —
    safe under 2⁶³ for any payload ≤ ~100 MB/cell). Returns
    (doc_id, n_bytes, b_lo, b_hi)."""
    txt = F.decode(F.col("payload"), "UTF-8")
    codes = F.when(
        F.length(txt) > 0,
        F.transform(F.split(txt, ""), lambda c: F.ascii(c).cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))
    base = mm.select(
        "doc_id",
        codes.alias("__cd"),
        F.size(codes).cast("bigint").alias("__n"),
    )
    # cell assignment INVERTED: byte at 0-based position p belongs to
    # cell j = (64·(p+1) − 1) div n — the exact inverse of the slice
    # boundaries floor(j·n/64) ≤ p < floor((j+1)·n/64), so ONE
    # explode + one map-side-combinable groupBy replaces 64
    # interpreted slice-folds (first draft benched 10.3 s at sf0.1;
    # this shape is the explode→partial-agg discipline the minhash
    # rewrite established). The dense 0..63 grid is restored
    # MAP-SIDE (VERDICT r10 item 4): the populated cells collapse to
    # one per-doc 64-entry map (a second, doc-sized groupBy) and a
    # transform over sequence(0,63) fills the gaps with gray 0 — no
    # 64·N-row grid join anywhere (the join restore measured 1.16×
    # slower at sf0.1 AND at the 10× rehearsal corpus,
    # BENCH_DETAIL.phash_grid_restore_probe). Zero-byte docs carry no
    # cell rows at all and re-enter as an all-zero dense grid.
    bytes_ = base.select(
        "doc_id",
        F.col("__n"),
        F.posexplode_outer(F.col("__cd")).alias("__p", "__c"),
    )
    cell_sums = (
        bytes_.filter(F.col("__c").isNotNull())
        .withColumn(
            "j", F.expr("CAST((64 * (__p + 1) - 1) div __n AS INT)")
        )
        .groupBy("doc_id", "__n", "j")
        .agg(
            F.sum("__c").alias("__s"),
            F.count(F.lit(1)).cast("bigint").alias("__l"),
        )
    )
    cells_map = (
        cell_sums.withColumn("gray", F.expr("(__s * 100) div __l"))
        .groupBy("doc_id", "__n")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("j", "gray"))
            ).alias("__m")
        )
    )
    # Everything downstream of the per-doc cell map is ROW-LOCAL
    # integer math (r13 optimization, guide §2.4 "remove shuffles
    # outright"): the dense 0..63 grid, both separable DCT stages,
    # the exact 63-value median and the bit pack are unrolled
    # literal-coefficient BIGINT expressions over the one 64-entry
    # map. The previous dense-explode → two basis joins → median
    # window → pack-aggregation shape not only paid ~6 post-map
    # exchanges — Catalyst evaluated the WHOLE upstream pipeline
    # (scan → byte explode → cell sums → map) TWICE, once under the
    # median branch and once under the bits branch of the final
    # join (plans/r13/x5_image_phash_before.txt, operators 1-43 vs
    # 44-87). Results are bit-identical: every stage is integer
    # addition/multiplication (order-free), and the median is the
    # same 32nd-smallest of the 63 non-DC coefficients the rank-32
    # window row selected. Each intermediate array is referenced
    # many times by its consumer, so CollapseProject keeps the
    # stage boundaries and every array evaluates once per row.
    # The whole tail is ONE generated-SQL expression (a single F.expr
    # / py4j call — the same tree built Column-by-Column costs ~4600
    # py4j round-trips and 10-38 s of DRIVER time per construction,
    # measured before this form replaced it). Each stage's array is
    # bound ONCE per row through a single-element transform lambda
    # ("let"): Catalyst cannot substitute an expression through a
    # lambda binding, so the dense grid / s1 / coefficients / median
    # each evaluate exactly once per row — stacking them as plain
    # withColumn projections would let CollapseProject inline the
    # single-reference stages into the consuming lambda, where they
    # would re-evaluate per ELEMENT (compounding to ~300k ops/row).
    carr = "array({})".format(
        ",".join(
            f"{PHASH_DCT[u][x]}L" for u in range(8) for x in range(8)
        )
    )
    grays = "array({})".format(
        ",".join(
            f"coalesce(element_at(__m, {j}), 0L)" for j in range(64)
        )
    )
    # s1[u*8+y] = Σ_x C[u][x] · gray(x, y), gray(x, y) = g[8y+x]
    s1 = (
        "transform(sequence(0, 63), i -> aggregate(sequence(0, 7), 0L,"
        f" (acc, x) -> acc + element_at({carr},"
        " CAST((i div 8) * 8 + x + 1 AS INT))"
        " * element_at(g, CAST((i % 8) * 8 + x + 1 AS INT))))"
    )
    # coef[u*8+v] = Σ_y C[v][y] · s1[u*8+y]
    cf = (
        "transform(sequence(0, 63), i -> aggregate(sequence(0, 7), 0L,"
        f" (acc, y) -> acc + element_at({carr},"
        " CAST((i % 8) * 8 + y + 1 AS INT))"
        " * element_at(s, CAST((i div 8) * 8 + y + 1 AS INT))))"
    )
    med = "element_at(array_sort(slice(c, 2, 63)), 32)"

    def _pack(lo: int) -> str:
        return (
            "aggregate(sequence(0, 31), 0L, (acc, j) -> acc +"
            f" (CASE WHEN element_at(c, CAST(j + {lo + 1} AS INT)) > m"
            " THEN shiftleft(1L, j) ELSE 0L END))"
        )

    tail = (
        f"element_at(transform(array({grays}), g -> "
        f"element_at(transform(array({s1}), s -> "
        f"element_at(transform(array({cf}), c -> "
        f"element_at(transform(array({med}), m -> "
        f"named_struct('b_lo', {_pack(0)}, 'b_hi', {_pack(32)})"
        "), 1)), 1)), 1)), 1)"
    )
    hashed = cells_map.withColumn("__h", F.expr(tail)).select(
        "doc_id",
        F.col("__n").alias("n_bytes"),
        F.col("__h.b_lo").alias("b_lo"),
        F.col("__h.b_hi").alias("b_hi"),
    )
    empty = base.filter(F.col("__n") == 0).select(
        "doc_id",
        F.col("__n").alias("n_bytes"),
        F.lit(0).cast("bigint").alias("b_lo"),
        F.lit(0).cast("bigint").alias("b_hi"),
    )
    return hashed.unionByName(empty)


def _hash_block(start: int, end: int) -> Column:
    """Bits [start, end) of the 64-bit (b_lo = bits 0-31,
    b_hi = bits 32-63) hash as a small bigint. Handles blocks that
    span the word boundary; words hold unsigned 32-bit values so
    shiftrightunsigned is exact."""
    parts = []
    if start < 32:
        lo_end = min(end, 32)
        width = lo_end - start
        parts.append(
            F.shiftrightunsigned(F.col("b_lo"), start).bitwiseAND(
                F.lit((1 << width) - 1).cast("bigint")
            )
        )
    if end > 32:
        hi_start = max(start, 32) - 32
        width = end - max(start, 32)
        shift_in = max(start, 32) - start
        hi = F.shiftrightunsigned(F.col("b_hi"), hi_start).bitwiseAND(
            F.lit((1 << width) - 1).cast("bigint")
        )
        parts.append(hi * F.lit(1 << shift_in).cast("bigint"))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def ahash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    max_block: int | None = None,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming
    distance via PIGEONHOLE MULTI-INDEX blocking (multi-index
    hashing, Norouzi & Fleet 2012): the 64 hash bits split into
    ``max_hamming + 1`` disjoint blocks, a candidate index is built
    per block, and any pair within ``max_hamming`` differing bits
    MUST agree exactly on at least one block — guaranteed 100%
    recall, unlike a single-word block (which misses every pair
    whose diffs straddle the indexed word). Candidates from the
    block equi-joins are de-duplicated and refined with the full
    64-bit XOR+popcount — never all-pairs BETWEEN blocks, but the
    candidate cost WITHIN blocks is distribution-dependent (ADVICE
    r08): at ``max_hamming=6`` the 7 blocks are 9–10 bits wide, so
    UNIFORM-RANDOM hashes expect ≈ Σ_k N²/2^(w_k+1) ≈ 7·N²/2¹⁰
    candidates — near-quadratic. The guarantee is cheap only because
    real perceptual hashes are far from uniform ONLY where near-dups
    exist; for hostile/heavy-tailed block distributions pass
    ``max_block`` to cap each (block, value) bucket at its first
    ``max_block`` rows under the deterministic (block, value, id)
    order (the bounded_phonetic_pairs discipline: the cap is opt-in,
    SQL row_number-replayable so capped output stays oracle-EXACT,
    and :func:`ahash_block_overflow` surfaces exactly what was
    dropped — pairs whose every shared block overflowed past the cap
    may be missed, so recall under a cap is exact only for the
    surfaced-clean remainder; never a silent loss). Returns
    (id_a < id_b, hamming)."""
    n_blocks = max_hamming + 1
    bounds = [64 * k // n_blocks for k in range(n_blocks + 1)]
    blocks = F.array(
        *[
            F.struct(
                F.lit(k).alias("bk"),
                _hash_block(bounds[k], bounds[k + 1]).alias("bv"),
            )
            for k in range(n_blocks)
        ]
    )
    keyed = hashes.select(
        F.col(id_col).alias("id"),
        F.col("b_lo").alias("lo"),
        F.col("b_hi").alias("hi"),
        F.explode(blocks).alias("blk"),
    ).select("id", "lo", "hi", "blk.bk", "blk.bv")
    if max_block is not None:
        from eco_pulse_lakehouse_spark.operators.rank import (
            global_row_number,
        )

        # (bk, bv) alphabet is ≤ (max_hamming+1)·2^⌈64/(h+1)⌉ keys at
        # the default widths (~7k) — the per-block offset table always
        # broadcasts; no single-task-per-hot-block sort.
        ranked = global_row_number(
            keyed,
            [F.col("bk").asc(), F.col("bv").asc(), F.col("id").asc()],
            out_col="__gpos",
        )
        firsts = ranked.groupBy("bk", "bv").agg(
            F.min("__gpos").alias("__first")
        )
        keyed = (
            ranked.join(F.broadcast(firsts), ["bk", "bv"])
            .filter(F.col("__gpos") - F.col("__first") < max_block)
            .drop("__gpos", "__first")
        )
    a = keyed.select(
        F.col("id").alias("id_a"),
        F.col("lo").alias("__la"),
        F.col("hi").alias("__ha"),
        "bk",
        "bv",
    )
    b = keyed.select(
        F.col("id").alias("id_b"),
        F.col("lo").alias("__lb"),
        F.col("hi").alias("__hb"),
        "bk",
        "bv",
    )
    ham = F.bit_count(F.col("__la").bitwiseXOR(F.col("__lb"))) + F.bit_count(
        F.col("__ha").bitwiseXOR(F.col("__hb"))
    )
    return (
        a.join(b, ["bk", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def ahash_block_overflow(
    hashes: DataFrame, max_hamming: int, max_block: int
) -> DataFrame:
    """The no-silent-caps companion to ``ahash_neardup_pairs(...,
    max_block=N)`` (same contract as dedup.phonetic_block_overflow /
    timeseries.sax_bucket_overflow): per overflowing (block, value)
    bucket, how many rows the cap dropped and the candidate-pair
    count the full bucket would have cost. One tiny aggregation over
    the exploded block keys; emit it next to any capped run so
    truncation — and therefore any possible recall loss — is visible
    in the job's output."""
    n_blocks = max_hamming + 1
    bounds = [64 * k // n_blocks for k in range(n_blocks + 1)]
    blocks = F.array(
        *[
            F.struct(
                F.lit(k).alias("bk"),
                _hash_block(bounds[k], bounds[k + 1]).alias("bv"),
            )
            for k in range(n_blocks)
        ]
    )
    n = F.col("n_rows")
    return (
        hashes.select(F.explode(blocks).alias("blk"))
        .select("blk.bk", "blk.bv")
        .groupBy("bk", "bv")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(n > max_block)
        .select(
            "bk",
            "bv",
            "n_rows",
            (n - max_block).alias("n_dropped_rows"),
            F.expr("n_rows * (n_rows - 1) div 2")
            .cast("bigint")
            .alias("uncapped_pairs"),
        )
    )
