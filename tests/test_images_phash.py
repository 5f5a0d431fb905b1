"""datapipe/images.py — pHash image near-dup over the input_hint corpus
shape: generic banded hamming join exactness (incl. negative int64
hashes), the REAL pixel path (synth corpus → stored phash ≡ decoded
phash; jittered copies pair up, unrelated images don't), transitive
keep-one-per-cluster reps, and the scan-only stats/gate ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from scrapy_spark.datapipe.dedup import hamming_near_dup_pairs
from scrapy_spark.datapipe.images import (
    image_size_gate,
    image_stats_by_format,
    phash_dedup_reps,
    phash_near_dups,
)
from scrapy_spark.functions.imaging import encode_image, phash64, synth_image
from scrapy_spark.sources.corpus import synth_corpus_df


# ------------------------------------------------------------- band join
def test_hamming_pairs_exact_on_handcrafted_hashes(spark):
    rows = [
        (1, 0x0123456789ABCDEF - (1 << 63)),  # negative int64
        (2, 0x0123456789ABCDEF - (1 << 63) ^ 0b101),  # hamming 2 vs id 1
        (3, 0x0123456789ABCDEF),  # differs from 1 only in the sign bit
        (4, -1),  # all 64 bits set
        (5, (1 << 60) | 7),  # far from everything
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_dup_pairs(
            df, id_col="image_id", hash_col="phash", max_hamming=3
        ).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 3}


def test_hamming_mih_equals_band_variant_on_random_hashes(spark):
    """The Manku block-combination variant (the 10^10-row path) must
    produce EXACTLY the band variant's output — both are exact pigeonhole
    blocking. Random corpus + planted near pairs at every distance
    0..max_hamming and just beyond."""
    import random

    from scrapy_spark.datapipe.dedup import hamming_near_dup_pairs_mih

    rng = random.Random(42)
    rows = [(i, rng.getrandbits(64) - (1 << 63)) for i in range(300)]
    nid = 1000
    for d in (0, 1, 2, 3, 4):  # 4 must NOT pair
        base = rows[d][1]
        flipped = base
        for p in rng.sample(range(64), d):
            flipped ^= 1 << p
        # renormalize to signed int64
        flipped = (flipped + (1 << 63)) % (1 << 64) - (1 << 63)
        rows.append((nid + d, flipped))
    df = spark.createDataFrame(rows, "image_id long, phash long")
    kw = dict(id_col="image_id", hash_col="phash", max_hamming=3)
    band = {(r.id_a, r.id_b, r.hamming) for r in hamming_near_dup_pairs(df, **kw).collect()}
    mih = {(r.id_a, r.id_b, r.hamming) for r in hamming_near_dup_pairs_mih(df, **kw).collect()}
    assert band == mih
    for d in (0, 1, 2, 3):
        assert (d, nid + d, d) in mih
    assert not any(nid + 4 in (a, b) for a, b, _ in mih)


def test_hamming_pairs_pigeonhole_guard(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "image_id long, phash long")
    # explicit band width that violates the exactness bound must raise …
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dup_pairs(
            df, id_col="image_id", hash_col="phash", max_hamming=4, band_bits=16
        )
    with pytest.raises(ValueError, match="divide"):
        hamming_near_dup_pairs(
            df, id_col="image_id", hash_col="phash", max_hamming=3, band_bits=10
        )
    # … but the default auto-picks a narrower band (8 bits ⇒ 8 bands)
    assert hamming_near_dup_pairs(
        df, id_col="image_id", hash_col="phash", max_hamming=4
    ).count() == 0


# ---------------------------------------------------------- real pixels
def _jitter(arr: np.ndarray, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.clip(
        arr.astype(np.int16) + rng.integers(-2, 3, arr.shape), 0, 255
    ).astype(np.uint8)


def _corpus_with_twins(spark, n=30, twins_of=(3, 11, 19)):
    """synth corpus of n images + 2 jittered copies of each planted id.
    Twin rows carry REAL re-encoded bytes and the phash of those pixels —
    exactly what a crawl of mirrored/re-hosted images produces."""
    base = synth_corpus_df(spark.range(n).toDF("doc_id"))
    twin_rows = []
    for i in twins_of:
        iid = f"img{i:010d}"
        arr = synth_image(iid)
        for k in (1, 2):
            t = _jitter(arr, seed=1000 * i + k)
            twin_rows.append(
                (
                    f"twin{k}-{iid}",
                    encode_image(t, "rawrgb"),
                    int(t.shape[1]),
                    int(t.shape[0]),
                    "rawrgb",
                    f"caption twin{k} of {iid}",
                    phash64(t),
                )
            )
    twins = spark.createDataFrame(
        pd.DataFrame(
            twin_rows,
            columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        )
    )
    return base.unionByName(twins)


def test_corpus_stored_phash_matches_decoded_pixels(spark):
    """The input_hint phash column is the phash OF THE PAYLOAD: re-decode
    the bytes and recompute — must match row for row (for lossy qrgb the
    stored hash is of the encoded-then-decoded pixels, so it still
    matches a decode-side recompute)."""
    from scrapy_spark.datapipe.multimodal import decode_image_meta

    corpus = synth_corpus_df(spark.range(25).toDF("doc_id"))
    stored = {r.image_id: r.phash for r in corpus.select("image_id", "phash").collect()}
    decoded = {
        r.image_id: r.phash for r in decode_image_meta(corpus).collect()
    }
    assert decoded == stored and len(stored) == 25


def test_phash_near_dups_finds_jittered_copies_only(spark):
    corpus = _corpus_with_twins(spark)
    pairs = phash_near_dups(corpus, max_hamming=3).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # every planted (base, twin) pair is found
    for i in (3, 11, 19):
        iid = f"img{i:010d}"
        assert (iid, f"twin1-{iid}") in got
        assert (iid, f"twin2-{iid}") in got
    # no pair joins two DIFFERENT base images (diversified synth images
    # sit ~32 bits apart; planted copies ≤3) — ids end in the base number
    for id_a, id_b in got:
        assert id_a[-10:] == id_b[-10:], (id_a, id_b)


def test_phash_dedup_reps_transitive_keep_one(spark):
    corpus = _corpus_with_twins(spark, twins_of=(7,))
    reps = phash_dedup_reps(corpus, max_hamming=3).toPandas()
    iid = "img0000000007"
    cluster = set(reps[reps.rep_id == iid].image_id)
    # base + both twins collapse to ONE cluster keyed by the min id —
    # even if twin1 and twin2 never paired with each other directly
    assert cluster == {iid, f"twin1-{iid}", f"twin2-{iid}"}
    keepers = set(reps[reps.image_id == reps.rep_id].image_id)
    assert keepers == {iid}


# ------------------------------------------------------- stats and gates
def test_image_stats_by_format(spark):
    corpus = synth_corpus_df(spark.range(50).toDF("doc_id"))
    stats = image_stats_by_format(corpus).toPandas().set_index("fmt")
    # corpus synthesizes 3/5 rawrgb, 2/5 qrgb
    assert stats.loc["rawrgb", "n"] == 30 and stats.loc["qrgb", "n"] == 20
    assert (stats.min_side >= 8).all() and (stats.max_side <= 64).all()
    # rawrgb is 3 B/px + 8 B header; qrgb identical layout here → total
    # bytes equals Σ(w*h*3 + 8) per format
    raw = corpus.filter(F.col("fmt") == "rawrgb").select(
        F.sum(F.col("w") * F.col("h") * 3 + 8).alias("b")
    ).collect()[0].b
    assert stats.loc["rawrgb", "total_bytes"] == raw


def test_image_size_gate(spark):
    corpus = synth_corpus_df(spark.range(40).toDF("doc_id"))
    extra = spark.createDataFrame(
        pd.DataFrame(
            [
                ("tiny", b"x", 4, 4, "rawrgb", "too small", 0),
                ("sliver", b"x", 100, 10, "rawrgb", "aspect 10", 0),
                ("blob", b"x" * 64, 32, 32, "rawrgb", "fine", 0),
            ],
            columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        )
    )
    kept = image_size_gate(
        corpus.unionByName(extra), min_side=8, max_aspect=4.0, max_bytes=10**7
    )
    ids = {r.image_id for r in kept.select("image_id").collect()}
    assert "tiny" not in ids and "sliver" not in ids and "blob" in ids
    assert len(ids) == 41  # all 40 synth rows pass the gate


# ------------------------------------------- caption + joint dedup ops
def test_caption_dup_pairs_star_shape_and_normalization(spark):
    from scrapy_spark.datapipe.images import caption_dup_pairs

    rows = [
        (1, "A   Red  Fox "),   # normalizes to "a red fox"
        (5, "a red fox"),
        (9, "A RED FOX"),
        (2, "unique caption"),
        (3, "other"),
        (4, "other"),
    ]
    df = spark.createDataFrame(rows, "image_id long, caption string")
    got = {(r.id_a, r.id_b) for r in caption_dup_pairs(df).collect()}
    # star edges from the min id of each group — never member-member
    assert got == {(1, 5), (1, 9), (3, 4)}


def test_joint_dedup_reps_bridges_pixel_and_caption_edges(spark):
    """A (base) ~ B (pixel twin, different caption) ~ C (caption twin of
    B, unrelated pixels): only the UNION of both edge kinds closes the
    three into one cluster."""
    from scrapy_spark.datapipe.images import joint_dedup_reps

    pa = 0x0123456789ABCDEF
    rows = [
        (10, pa, "a red fox"),
        (20, pa ^ 0b11, "jumped over"),        # hamming 2 from A
        (30, -(1 << 62) + 5, "jumped over"),   # far pixels, B's caption
        (40, (1 << 60) | 7, "bystander"),      # unrelated entirely
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    reps = {r.image_id: r.rep_id for r in joint_dedup_reps(df).collect()}
    assert reps == {10: 10, 20: 10, 30: 10}
    assert 40 not in reps  # never entered any pair


def test_aspect_bucket_stats_assignments(spark):
    from scrapy_spark.datapipe.images import aspect_bucket_stats

    rows = [
        ("a", b"xx", 90, 160),    # 0.5625 → tall_9x16
        ("b", b"xx", 30, 40),     # 0.75   → portrait_3x4
        ("c", b"xxx", 50, 50),    # 1.0    → square_1x1
        ("d", b"x", 40, 30),      # 1.333  → landscape_4x3
        ("e", b"x", 160, 90),     # 1.778  → wide_16x9
        ("f", b"x", 500, 100),    # 5.0    → clamps to widest rung
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int"
    )
    stats = aspect_bucket_stats(df).toPandas().set_index("bucket")
    assert stats.loc["tall_9x16", "n"] == 1
    assert stats.loc["portrait_3x4", "n"] == 1
    assert stats.loc["square_1x1", "n"] == 1
    assert stats.loc["landscape_4x3", "n"] == 1
    assert stats.loc["wide_16x9", "n"] == 2  # e + clamped f
    assert stats.loc["square_1x1", "total_bytes"] == 3


def test_phash_near_dups_verified_on_real_pixels(spark):
    """Two-tier dedup ground truth: jittered twins must verify with
    PSNR ≥ 40 dB; a planted hash-collision pair (flat images, equal
    phash, different shapes) must come back verified=False."""
    from scrapy_spark.datapipe.images import phash_near_dups_verified

    corpus = _corpus_with_twins(spark, n=20, twins_of=(7,))
    flat_a = np.full((16, 16, 3), 128, dtype=np.uint8)
    flat_b = np.full((24, 24, 3), 128, dtype=np.uint8)
    collisions = spark.createDataFrame(
        pd.DataFrame(
            [
                ("zzflat-a", encode_image(flat_a, "rawrgb"), 16, 16,
                 "rawrgb", "flat a", phash64(flat_a)),
                ("zzflat-b", encode_image(flat_b, "rawrgb"), 24, 24,
                 "rawrgb", "flat b", phash64(flat_b)),
            ],
            columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        )
    )
    assert phash64(flat_a) == phash64(flat_b)  # genuine hash collision
    out = phash_near_dups_verified(
        corpus.unionByName(collisions), max_hamming=3
    ).toPandas()
    by_pair = out.set_index(["id_a", "id_b"])
    iid = "img0000000007"
    for twin in (f"twin1-{iid}", f"twin2-{iid}"):
        row = by_pair.loc[(iid, twin)]
        assert bool(row.verified) and row.psnr_db >= 40.0
    flat = by_pair.loc[("zzflat-a", "zzflat-b")]
    assert not bool(flat.verified) and pd.isna(flat.psnr_db)
