"""Baseline JPEG codec (llm/jpeg.py): round-trip properties, real-world
third-party decode pinning, and the error contract."""

import numpy as np
import pytest

from popelines_spark.llm.jpeg import (
    STD_LUMA_Q,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)

_ONES = np.ones((8, 8), np.int32)


def _smooth(h, w, seed):
    """Deterministic band-limited test image (JPEG is built for smooth
    content; noise images legitimately round-trip badly at Q50)."""
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        a, b, ph = rng.uniform(0.05, 0.2, 3)
        img[..., c] = 128 + 90 * np.sin(a * gx + ph) * np.cos(b * gy)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_flat_roundtrip_exact_all_sizes():
    """Flat color + all-ones quant tables = bit-exact round trip for any
    geometry (partial edge blocks, multi-MCU): the invariant the
    c_multimodal_jpeg oracle is built on."""
    for v in (0, 65, 90, 128, 255):
        for w, h in [(1, 1), (7, 5), (8, 8), (16, 9), (17, 17), (33, 10)]:
            px = np.full((h, w, 3), v, np.uint8)
            for sub in ("444", "420"):
                got_w, got_h, ch, out = decode_jpeg(
                    encode_jpeg(px, sub, _ONES, _ONES)
                )
                assert (got_w, got_h, ch) == (w, h, 3)
                assert np.array_equal(out, px), (v, w, h, sub)


def test_smooth_roundtrip_close():
    """Band-limited images survive Q50 with small error; 4:2:0 costs a
    little more chroma error but stays bounded."""
    for seed in (1, 2, 3):
        px = _smooth(40, 56, seed)
        for sub, tol in (("444", 6.0), ("420", 12.0)):
            w, h, ch, out = decode_jpeg(encode_jpeg(px, sub))
            err = np.abs(out.astype(int) - px.astype(int))
            assert err.mean() < tol, (seed, sub, err.mean())


def test_unit_quant_roundtrip_near_lossless():
    """All-ones tables keep even non-flat content within ±2 (FDCT/IDCT
    float rounding only) — the AC path (ZRL, EOB, run-length) is real."""
    px = _smooth(24, 31, 9)
    w, h, ch, out = decode_jpeg(encode_jpeg(px, "444", _ONES, _ONES))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 2, err.max()


def test_decodes_third_party_jpegs():
    """The decoder reads files produced by REAL encoders (not our own):
    whatever .jpg/.jpeg files ship with the host's installed toolchains
    and docs — exercising grayscale, 4:2:0 subsampling, restart markers,
    and multi-segment headers our encoder never emits."""
    import glob
    import os

    candidates: list[str] = []
    for root in (
        os.path.dirname(os.__file__),            # stdlib + site-packages
        os.path.expanduser("~/.rustup"),         # toolchain docs
        "/usr/share",
    ):
        for pat in ("**/*.jpg", "**/*.jpeg"):
            candidates.extend(
                glob.glob(os.path.join(root, pat), recursive=True)
            )
        if len(candidates) >= 5:
            break
    seen = 0
    for path in sorted(candidates)[:5]:
        buf = open(path, "rb").read()
        try:
            w, h, ch, px = decode_jpeg(buf)
        except ValueError:
            continue  # progressive/arithmetic variants decline cleanly
        assert w >= 1 and h >= 1 and ch in (1, 3)
        assert px.shape == (h, w, ch)
        assert 0.0 <= float(px.mean()) <= 255.0
        seen += 1
    if seen == 0:
        pytest.skip("no decodable third-party JPEG fixtures on this host")


def test_error_contract():
    """Unsupported variants and truncation raise descriptive ValueErrors
    (decode_image's per-doc error contract)."""
    px = np.full((8, 8, 3), 100, np.uint8)
    buf = encode_jpeg(px)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    # flip SOF0 -> SOF2 (progressive)
    prog = bytearray(buf)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(buf[: len(buf) // 2])


def test_zigzag_is_involution_companion():
    """The zigzag table is a permutation of 0..63 whose inverse maps the
    natural order back (guards a mistyped table entry)."""
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    inv = np.empty(64, np.int32)
    inv[ZIGZAG] = np.arange(64)
    assert np.array_equal(np.arange(64)[ZIGZAG][inv], np.arange(64))


def test_std_tables_shape():
    assert STD_LUMA_Q.shape == (8, 8) and STD_LUMA_Q[0, 0] == 16
