"""C12 imaging codec invariants (input_hint payload-parity gates)."""

import numpy as np
import pytest

from scrapy_spark.functions.imaging import (
    decode_image,
    encode_image,
    phash64,
    psnr,
    synth_image,
)


def test_rawrgb_roundtrip_bit_exact():
    arr = synth_image("img0000000001")
    out, fmt = decode_image(encode_image(arr, "rawrgb"))
    assert fmt == "rawrgb"
    assert np.array_equal(out, arr)  # lossless path: bit-exact


def test_qrgb_lossy_psnr_above_40db():
    for i in range(5):
        arr = synth_image(f"img{i:010d}")
        out, fmt = decode_image(encode_image(arr, "qrgb"))
        assert fmt == "qrgb"
        assert out.shape == arr.shape
        assert psnr(arr, out) >= 40.0  # the input_hint lossy gate


def test_psnr_identical_is_inf():
    arr = synth_image("imgx")
    assert psnr(arr, arr) == float("inf")


def test_phash_stable_and_robust_to_quantization():
    arr = synth_image("img0000000042")
    h1 = phash64(arr)
    assert isinstance(h1, int)
    out, _ = decode_image(encode_image(arr, "qrgb"))
    h2 = phash64(out)
    # hamming distance small under mild quantization
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 8


def test_synth_image_deterministic():
    a, b = synth_image("imgZ"), synth_image("imgZ")
    assert np.array_equal(a, b)
    assert a.shape != synth_image("imgQ").shape or not np.array_equal(
        a, synth_image("imgQ")
    )


def test_junk_bytes_raise():
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03junk")
