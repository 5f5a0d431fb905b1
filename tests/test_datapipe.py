"""Training-data pipeline operator correctness (SURVEY §2 datapipe rows).

Unit-level evidence for the sketch/ANN operators whose driver-oracle
coverage is probabilistic or impossible:

- MinHash / SimHash / winnowing: hand-checkable small-corpus behavior
  (the full md5-replica DuckDB oracles run in the driver contract).
- ANN (multi-table SRP LSH + IVF): measured recall vs exact kNN, and the
  IVF exactness property nprobe=ncells ⇒ identical to brute force.
- cosine_near_dup_lsh: exact equality with the brute-force baseline on a
  corpus with planted jittered near-dups (recall 1.0 at the threshold).
- image decode: mapInPandas metadata equals the synthesis ground truth
  for every row (the codec is deterministic).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_spark.datapipe.dedup import (
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash64,
    simhash_near_dups,
)
from scrapy_spark.datapipe.similarity import (
    cosine_near_dup_lsh,
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
)
from scrapy_spark.datapipe.text import winnow_fingerprints

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # = 1
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # ~ 1
        (4, "completely different content about spark shuffles and joins"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dup_groups(docs):
    out = {r.content_hash: r for r in exact_dup_groups(docs).collect()}
    dup = [r for r in out.values() if r.n_copies == 2]
    assert len(dup) == 1 and dup[0].keep_id == 1


def test_jaccard_pairs_paths_identical(docs):
    def key(rows):
        return sorted((r.id_a, r.id_b, r.common, r.jaccard) for r in rows)

    on = key(jaccard_pairs(docs, threshold=0.3, prefix_filter=True).collect())
    off = key(jaccard_pairs(docs, threshold=0.3, prefix_filter=False).collect())
    auto = key(jaccard_pairs(docs, threshold=0.3, prefix_filter="auto").collect())
    assert on == off == auto
    pairs = {(a, b): j for a, b, _, j in on}
    assert pairs[(1, 2)] == 1.0  # identical docs
    assert 0.3 <= pairs[(1, 3)] < 1.0  # one-word edit
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_identical_docs_land_in_same_bucket(docs):
    out = {(r.id_a, r.id_b): r.est_jaccard for r in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0  # identical signature, every band matches
    # the one-word edit has high true jaccard; the 64-hash estimate must
    # find it above the 0.5 LSH threshold too
    assert (1, 3) in out


def test_minhash_estimate_tracks_true_jaccard(docs):
    sig = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    est = sum(1 for x, y in zip(sig[1], sig[3]) if x == y) / 64.0
    true_j = {(r.id_a, r.id_b): r.jaccard for r in
              jaccard_pairs(docs, threshold=0.0, prefix_filter=False).collect()}[(1, 3)]
    assert abs(est - true_j) < 0.2  # 64 hashes ⇒ σ≈0.06, 3σ bound


def test_simhash_hamming(docs):
    sh = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert sh[1] == sh[2] and sh[5] == 0
    out = {(r.id_a, r.id_b): r.hamming for r in
           simhash_near_dups(docs, max_hamming=10).collect()}
    assert out[(1, 2)] == 0
    assert (1, 4) not in out  # different content: no band collision or far


def test_winnow_fingerprints(docs):
    fps = {r.doc_id: r.fingerprints for r in winnow_fingerprints(docs).collect()}
    assert fps[1] == fps[2] and fps[1] == sorted(set(fps[1]))
    assert fps[5] == []
    # one-word edit: shares some spans, not all
    shared = set(fps[1]) & set(fps[3])
    assert shared and set(fps[1]) != set(fps[3])


def test_ann_lsh_recall_vs_exact_knn(emb):
    """Hard-corpus mode: isotropic random vectors (top-5 cosine ≈0.4 =
    barely above noise). Recall is bought with many low-bit tables —
    the config is deliberately expensive (≈brute-force candidate volume)
    to show the recall math holds even here; production configs target
    real neighbor structure (next test)."""
    exact = set(
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, emb, k=5).select("query_id", "neighbor_id").collect()
    )
    ann = set(
        (r.query_id, r.neighbor_id)
        for r in lsh_ann_topk(emb, k=5, nbits=6, ntables=48)
        .select("query_id", "neighbor_id")
        .collect()
    )
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.85, f"LSH ANN recall {recall:.3f} < 0.85"


def test_ann_lsh_planted_neighbors_economical_config(emb):
    """Production operating point (16 bits × 8 tables ⇒ ~0.01% of pairs
    become candidates): every planted near-copy must report its original
    as the rank-1 neighbor — the contract q_ann_lsh_topk config."""
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    jit = base.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1.0) + F.lit(0.05) * ((i % 2) * 2 - 1)),
        ).alias("embedding"),
    )
    corpus = base.unionByName(jit)
    out = lsh_ann_topk(corpus, k=5, nbits=16, ntables=8)
    rank1 = {
        r.query_id: r.neighbor_id
        for r in out.filter(F.col("rank") == 1).collect()
    }
    for vid in range(100):
        assert rank1.get(vid + 10000) == vid  # copy → original
        assert rank1.get(vid) == vid + 10000  # original → copy


def test_ivf_recall_and_exactness_at_full_probe(emb):
    exact = set(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in cosine_topk(emb, emb, k=5).collect()
    )
    part = set(
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, k=5, ncells=16, nprobe=4)
        .select("query_id", "neighbor_id")
        .collect()
    )
    recall = len(set((q, n) for q, n, _, _ in exact) & part) / len(exact)
    assert recall >= 0.5, f"IVF nprobe=4/16 recall {recall:.3f} < 0.5"
    # probing every cell must reproduce brute force EXACTLY
    full = set(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivf_topk(emb, k=5, ncells=16, nprobe=16).collect()
    )
    assert full == exact


def test_ivfpq_recall_and_exactness_at_full_probe(emb):
    """IVF-PQ (compressed-code candidate join + ADC + exact re-rank):
    (a) at nprobe=ncells and rerank ≥ |corpus| the pipeline must equal
    brute-force kNN value-for-value — codebook quality cancels out, so
    this oracles the encode/LUT/ADC/re-rank plumbing end-to-end;
    (b) at realistic (nprobe, rerank) the ADC prune still finds most
    true neighbors even on this isotropic worst-case corpus."""
    from scrapy_spark.datapipe.similarity import ivfpq_topk

    n = emb.count()
    exact = set(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in cosine_topk(emb, emb, k=5).collect()
    )
    full = set(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivfpq_topk(
            emb, k=5, ncells=16, nprobe=16, rerank=n
        ).collect()
    )
    assert full == exact
    part = set(
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(emb, k=5, ncells=16, nprobe=4, rerank=64)
        .select("query_id", "neighbor_id")
        .collect()
    )
    recall = len(set((q, nb) for q, nb, _, _ in exact) & part) / len(exact)
    assert recall >= 0.4, f"IVF-PQ nprobe=4/16 recall {recall:.3f} < 0.4"


def test_near_dup_lsh_equals_brute_force_on_planted_dups(emb):
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    jit = base.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1.0) + F.lit(0.05) * ((i % 2) * 2 - 1)),
        ).alias("embedding"),
    )
    corpus = base.unionByName(jit)
    brute = set(map(tuple, cosine_pairs(corpus, threshold=0.99).collect()))
    lsh = set(map(tuple, cosine_near_dup_lsh(corpus, threshold=0.99).collect()))
    assert len(brute) == 100  # each jittered copy pairs with its original
    assert lsh == brute  # recall exactly 1.0 at the near-dup threshold


def test_image_decode_meta_matches_synthesis_ground_truth(spark):
    from scrapy_spark.datapipe.multimodal import decode_image_meta
    from scrapy_spark.functions.imaging import (
        decode_image,
        encode_image,
        phash64,
        synth_image,
    )
    from scrapy_spark.sources.corpus import synth_corpus_df

    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    meta = {
        r.image_id: r
        for r in decode_image_meta(synth_corpus_df(ids, "doc_id")).collect()
    }
    assert len(meta) == 200
    for raw_id in range(200):
        iid = f"img{raw_id:010d}"
        arr = synth_image(iid)
        fmt = "rawrgb" if raw_id % 5 < 3 else "qrgb"
        # ground truth runs the same decode the executor ran: for the
        # lossy qrgb codec the phash is of the DECODED pixels
        dec, _ = decode_image(encode_image(arr, fmt))
        got = meta[iid]
        assert got.decode_ok and got.fmt == fmt
        assert (got.w, got.h) == (arr.shape[1], arr.shape[0])
        assert got.phash == phash64(dec)


def test_payload_parity_meta_flags(spark):
    """Intact corpus → every flag TRUE; tampered payloads flip exactly the
    right flag (the property the image_decode_meta oracle pins)."""
    from scrapy_spark.datapipe.multimodal import payload_parity_meta
    from scrapy_spark.sources.corpus import synth_corpus_df

    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    corpus = synth_corpus_df(ids, "doc_id").cache()
    ok = payload_parity_meta(corpus).collect()
    assert len(ok) == 60
    for r in ok:
        assert (
            r.decode_ok and r.dims_ok and r.phash_ok and r.pixels_ok
            and r.payload_ok
        ), r
        assert r.fmt == (
            "rawrgb" if int(r.image_id[3:]) % 5 < 3 else "qrgb"
        )
        assert r.caption.startswith(f"caption for {r.image_id}: ")

    # corrupt the magic → decode fails, every flag false
    bad_magic = corpus.limit(1).withColumn(
        "bytes", F.concat(F.lit(b"XXXX"), F.col("bytes"))
    )
    r = payload_parity_meta(bad_magic).collect()[0]
    assert not r.decode_ok and not r.payload_ok and r.fmt is None

    # wrong stored phash → only phash_ok flips
    bad_ph = corpus.limit(1).withColumn(
        "phash", F.col("phash").bitwiseXOR(F.lit(1 << 33))
    )
    r = payload_parity_meta(bad_ph).collect()[0]
    assert r.decode_ok and r.dims_ok and r.pixels_ok
    assert not r.phash_ok and not r.payload_ok

    # wrong stored dims → only dims_ok flips
    bad_w = corpus.limit(1).withColumn("w", F.col("w") + F.lit(1))
    r = payload_parity_meta(bad_w).collect()[0]
    assert r.decode_ok and r.phash_ok and r.pixels_ok
    assert not r.dims_ok and not r.payload_ok
    corpus.unpersist()


def test_thumbs_parity_meta_flags(spark):
    """Correct thumbnails → all flags TRUE; a tampered thumb payload or
    wrong claimed dims flip the right flags (what the
    image_thumbs_parity oracle pins)."""
    from scrapy_spark.datapipe.multimodal import (
        resize_thumbnails,
        thumbs_parity_meta,
    )
    from scrapy_spark.sources.corpus import synth_corpus_df

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    corpus = synth_corpus_df(ids, "doc_id")
    thumbs = resize_thumbnails(corpus, max_side=16)
    joined = corpus.select("image_id", "bytes").join(thumbs, "image_id").cache()
    ok = thumbs_parity_meta(joined, max_side=16).collect()
    assert len(ok) == 40
    assert all(
        r.thumb_decodes and r.dims_ok and r.within_cap and r.pixels_ok
        and r.thumb_ok
        for r in ok
    )

    bad_dims = joined.limit(1).withColumn("tw", F.col("tw") + F.lit(1))
    r = thumbs_parity_meta(bad_dims, max_side=16).collect()[0]
    assert r.thumb_decodes and r.pixels_ok and not r.dims_ok and not r.thumb_ok

    bad_pix = joined.limit(1).withColumn(
        "thumb", F.concat(F.lit(b"XXXX"), F.col("thumb"))
    )
    r = thumbs_parity_meta(bad_pix, max_side=16).collect()[0]
    assert not r.thumb_decodes and not r.thumb_ok
    joined.unpersist()


def test_audio_video_fake_codecs_round_trip():
    """spcm/svid codecs: encode → decode round-trips bit-exact, headers
    follow the id formulas, junk raises (functions/media.py)."""
    import numpy as np
    import pytest as _pt

    from scrapy_spark.functions.media import (
        audio_params,
        decode_audio,
        decode_video,
        sample_frame_indices,
        synth_audio,
        synth_video,
        video_params,
    )

    for rid in (0, 1, 7, 49, 111):
        mid = f"aud{rid:010d}"
        data = synth_audio(mid, rid)
        samples, rate, channels = decode_audio(data)
        erate, ech, en = audio_params(rid)
        assert (rate, channels, samples.shape[0]) == (erate, ech, en)
        assert synth_audio(mid, rid) == data  # deterministic
        vid = f"vid{rid:010d}"
        frames, w, h, n = decode_video(synth_video(vid, rid))
        assert (w, h, n) == video_params(rid)
        assert frames.dtype == np.uint8 and frames.shape == (n, h, w, 3)
    assert sample_frame_indices(10, 3) == [0, 3, 6, 9]
    assert sample_frame_indices(1, 3) == [0]
    with _pt.raises(ValueError):
        decode_audio(b"JUNKxxxxxxxxxxxxxx")
    with _pt.raises(ValueError):
        decode_video(b"JUNKxxxxxxxxxxxxxx")


def test_audio_video_decode_ops_and_tamper(spark):
    """audio_decode_meta / video_frame_sample over the synthetic media
    corpus: all rows parity-green; tampered payloads flip the flags."""
    from scrapy_spark.datapipe.multimodal import (
        audio_decode_meta,
        video_frame_sample,
    )
    from scrapy_spark.sources.corpus import synth_media_df

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    aud = synth_media_df(ids, "audio").cache()
    out = audio_decode_meta(aud).collect()
    assert len(out) == 40
    for r in out:
        rid = int(r.media_id[3:])
        assert r.decode_ok and r.samples_ok
        assert r.rate == 16000 + (rid % 2) * 28100
        assert r.channels == 1 + rid % 2
        assert r.nsamples == 256 + (rid % 50) * 64

    bad = aud.limit(1).withColumn(
        "bytes", F.concat(F.col("bytes"), F.lit(b"\x00\x00"))
    )
    r = audio_decode_meta(bad).collect()[0]
    assert not r.decode_ok and not r.samples_ok
    aud.unpersist()

    vid = synth_media_df(ids, "video").cache()
    vout = video_frame_sample(vid, every_k=3).collect()
    assert len(vout) == 40
    for r in vout:
        rid = int(r.media_id[3:])
        assert r.decode_ok and r.frames_ok
        assert (r.w, r.h) == (4 + rid % 9, 4 + (rid * 3) % 9)
        assert r.nframes == 4 + rid % 13
        assert r.n_sampled == (r.nframes - 1) // 3 + 1
    # flip one pixel byte inside the frame payload: decode still works
    # (header intact) but the sampled-frame parity must fail
    one = vid.limit(1).collect()[0]
    raw = bytes(one.bytes)
    flipped = raw[:10] + bytes([raw[10] ^ 0x01]) + raw[11:]
    tampered = spark.createDataFrame(
        [(one.media_id, flipped)], "media_id string, bytes binary"
    )
    r = video_frame_sample(tampered, every_k=3).collect()[0]
    assert r.decode_ok and not r.frames_ok
    vid.unpersist()


def test_token_count_estimate(spark):
    from scrapy_spark.datapipe.text import token_count_estimate

    rows = [
        (1, "Hello world, it's 2026!"),
        (2, ""),
        (3, "   "),
        (4, "one-two three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in token_count_estimate(df).collect()}
    # "Hello"," world",","," it","'s"," 2026","!" → 7 BPE-ish tokens
    assert out[1].n_ws_tokens == 4 and out[1].n_bpe_tokens == 7
    assert out[2].n_ws_tokens == 0 and out[2].n_bpe_tokens == 0
    assert out[3].n_ws_tokens == 0 and out[3].n_bpe_tokens == 0
    # "one","-","two"," three" → 4
    assert out[4].n_ws_tokens == 2 and out[4].n_bpe_tokens == 4
    assert out[4].chars_per_bpe_token == round(len("one-two three") / 4, 4)


def test_incremental_dedup_verdicts(spark):
    """Delta-vs-corpus classification: planted exact copy, near-dup
    (small token append), and fresh doc get the right verdicts, match
    ids, and jaccard values; the asymmetric prefix filter must agree
    with the direct join (the contract oracle proves it corpus-wide —
    this pins the semantics on a hand-checkable fixture)."""
    from scrapy_spark.datapipe.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "pack my box with five dozen liquor jugs right now"),
            (3, "sphinx of black quartz judge my vow said the king"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog today"),
            (102, "pack my box with five dozen liquor jugs right now extra"),
            (103, "completely unrelated text about spark and parquet files"),
            (104, "tiny doc"),  # < n tokens: no shingles → new
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(delta, corpus).collect()}
    assert len(out) == 4  # exactly one row per delta doc
    assert out[101].verdict == "exact_dup" and out[101].match_id == 1
    assert out[101].jaccard == 1.0
    assert out[102].verdict == "near_dup" and out[102].match_id == 2
    # 8 shared shingles of 8∪9 → 8/9
    assert out[102].jaccard == round(8 / 9, 4)
    assert out[103].verdict == "new" and out[103].match_id is None
    assert out[104].verdict == "new" and out[104].jaccard is None


def test_remove_dup_spans_semantics(spark):
    """Span removal (Lee-et-al transform half): only tokens covered by a
    CROSS-document duplicated n-gram are cut; within-doc repeats alone
    survive; short docs pass through; counts are exact."""
    from scrapy_spark.datapipe.dedup import remove_dup_spans

    docs = spark.createDataFrame(
        [
            ("a", "alpha beta gamma delta epsilon zeta unique tail here"),
            ("b", "prefix words alpha beta gamma delta epsilon zeta other end"),
            # within-doc repetition of a 6-gram, but no other doc has it
            ("c", "one two three four five six one two three four five six"),
            ("d", "short doc"),
        ],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(docs, n=6).collect()}
    # the shared 6-gram "alpha…zeta" covers those 6 tokens in both docs
    assert out["a"].clean_text == "unique tail here"
    assert out["a"].n_removed == 6 and out["a"].n_tokens == 9
    assert out["b"].clean_text == "prefix words other end"
    assert out["b"].n_removed == 6 and out["b"].n_tokens == 10
    # within-doc-only duplication is NOT removed (df counts distinct docs)
    assert out["c"].n_removed == 0
    assert out["c"].clean_text.startswith("one two three")
    assert out["d"].clean_text == "short doc" and out["d"].n_removed == 0
