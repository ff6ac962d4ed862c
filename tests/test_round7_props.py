"""Round-7 property tests: JPEG codec (pure Python — hypothesis drives
many cases), duplicate-safe range-radius counts vs a brute-force oracle,
and two-level IVF exactness at full coarse probe."""

import numpy as np


def test_jpeg_blockwise_gray_roundtrips_exactly():
    """Property: any image whose 8×8-aligned blocks are each a constant
    GRAY value round-trips bit-exactly under all-ones quantization tables
    in both 4:4:4 and 4:2:0 — every block is DC-only, the DC is stored
    exactly, and edge replication keeps partial blocks constant. This is
    the invariant the c_multimodal_jpeg oracle fixture relies on,
    generalized from flat images to block mosaics (exercises DC
    PREDICTION across blocks, not just one DC)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from popelines_spark.llm.jpeg import decode_jpeg, encode_jpeg

    ones = np.ones((8, 8), np.int32)

    @given(
        st.integers(1, 3),   # block columns
        st.integers(1, 3),   # block rows
        st.integers(0, 7),   # right-edge partial width (0 = none)
        st.integers(0, 7),   # bottom-edge partial height
        st.integers(0, 2**32 - 1),
        st.sampled_from(["444", "420"]),
    )
    @settings(max_examples=40, deadline=None)
    def prop(bx, by, pw, ph, rngseed, sub):
        rng = np.random.default_rng(rngseed)
        w = bx * 8 + pw
        h = by * 8 + ph
        vals = rng.integers(0, 256, size=(by + 1, bx + 1))
        img = np.zeros((h, w, 3), np.uint8)
        for r in range(by + 1):
            for c in range(bx + 1):
                img[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8, :] = vals[r, c]
        got_w, got_h, ch, out = decode_jpeg(
            encode_jpeg(img, sub, ones, ones)
        )
        assert (got_w, got_h, ch) == (w, h, 3)
        assert np.array_equal(out, img)

    prop()


def test_jpeg_arbitrary_rgb_bounded_error_unit_tables():
    """Property: ANY uint8 RGB content round-trips within a small bound
    under all-ones tables — the only loss is YCbCr↔RGB rounding and
    FDCT/IDCT float noise (no quantization loss). 4:4:4 keeps chroma, so
    the bound is tight."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from popelines_spark.llm.jpeg import decode_jpeg, encode_jpeg

    ones = np.ones((8, 8), np.int32)

    @given(st.integers(1, 20), st.integers(1, 18),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def prop(w, h, rngseed):
        rng = np.random.default_rng(rngseed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got_w, got_h, ch, out = decode_jpeg(encode_jpeg(px, "444", ones, ones))
        assert (got_w, got_h, ch) == (w, h, 3)
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.max() <= 3, err.max()

    prop()


def test_count_within_radius_matches_bruteforce_with_duplicates(spark):
    """The ADVICE-r6 contract, pinned: duplicated (left_id, left_ts) rows
    get the CORRECT count (not doubled), verified against an O(n·m)
    Python brute force on randomized fixtures that always include exact
    duplicates."""
    import datetime as dt

    from popelines_spark.operators.rangejoin import count_within_radius

    base = dt.datetime(2024, 3, 1)
    rng = np.random.default_rng(1234)
    for trial in range(3):
        lrows = []
        for i in range(40):
            ts = base + dt.timedelta(minutes=int(rng.integers(0, 600)))
            lrows.append((int(i % 13), ts))
        lrows += lrows[:7]  # planted exact duplicates
        rrows = [
            (base + dt.timedelta(minutes=int(rng.integers(0, 600))),)
            for _ in range(120)
        ]
        left = spark.createDataFrame(lrows, "left_id long, left_ts timestamp")
        right = spark.createDataFrame(rrows, "right_ts timestamp")
        got = {
            (r.left_id, r.left_ts, r.n_nearby)
            for r in count_within_radius(
                left, right, "left_id", "left_ts", "right_ts",
                radius_us=30 * 60 * 1_000_000,
            ).collect()
        }
        # brute force
        want = set()
        for lid, lts in lrows:
            n = sum(
                1
                for (rts,) in rrows
                if abs((rts - lts).total_seconds()) * 1e6
                <= 30 * 60 * 1_000_000
            )
            want.add((lid, lts, n))
        assert got == want, trial
        # row count preserved (duplicates kept as rows)
        assert (
            count_within_radius(
                left, right, "left_id", "left_ts", "right_ts",
                radius_us=30 * 60 * 1_000_000,
            ).count()
            == len(lrows)
        )


def test_two_level_full_probe_equals_flat_many_seeds(spark):
    """Property (3 seeds): coarse_probe == n_coarse makes the two-level
    assignment EXACTLY the flat argmax — for any centroid set, any
    corpus, any coarse grouping."""
    from pyspark.sql import functions as F

    from popelines_spark.llm.ivf import assign_cells, assign_cells_two_level

    for seed in (3, 17, 99):
        rng = np.random.default_rng(seed)
        corpus = spark.createDataFrame(
            [(i, rng.standard_normal(8).round(5).tolist())
             for i in range(1, 151)],
            "c_id long, c_vec array<double>",
        )
        cents = [
            (i, rng.standard_normal(8).round(5).tolist()) for i in range(24)
        ]
        flat = {
            r.c_id: r["__cell"]
            for r in assign_cells(corpus, "c_vec", "c_id", cents).collect()
        }
        two = {
            r.c_id: r["__cell"]
            for r in assign_cells_two_level(
                corpus, "c_vec", "c_id", cents, n_coarse=5, coarse_probe=5
            ).collect()
        }
        assert two == flat, seed


def test_avi_mjpeg_container_roundtrip():
    """Container property: frames in == frames out, geometry and fps
    preserved, byte-identical JPEG payloads (the container must not
    touch the entropy-coded bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from popelines_spark.llm.avi import make_avi_mjpeg, parse_avi_mjpeg
    from popelines_spark.llm.jpeg import encode_jpeg

    ones = np.ones((8, 8), np.int32)

    @given(st.integers(1, 9), st.integers(1, 6), st.integers(1, 6),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=25, deadline=None)
    def prop(w, h, n, rngseed):
        rng = np.random.default_rng(rngseed)
        frames = [
            encode_jpeg(
                rng.integers(0, 256, (h, w, 3)).astype(np.uint8),
                "444", ones, ones,
            )
            for _ in range(n)
        ]
        buf = make_avi_mjpeg(frames, w, h, fps=12)
        gw, gh, fps, got = parse_avi_mjpeg(buf)
        assert (gw, gh, fps) == (w, h, 12)
        assert got == frames  # byte-identical payload chunks

    prop()


def test_avi_error_contract():
    import pytest

    from popelines_spark.llm.avi import make_avi_mjpeg, parse_avi_mjpeg

    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_mjpeg(b"\x89PNG____")
    buf = make_avi_mjpeg([b"\xff\xd8fakejpeg\xff\xd9"], 4, 3)
    with pytest.raises(ValueError, match="truncated"):
        parse_avi_mjpeg(buf[: len(buf) - 6])
    # non-MJPEG codec fourcc in strf must be rejected, not guessed
    # (strh also contains MJPG; find the strf one by locating 'strf')
    h264 = bytearray(buf)
    strf = bytes(h264).find(b"strf")
    comp = bytes(h264).find(b"MJPG", strf)
    h264[comp:comp + 4] = b"H264"
    with pytest.raises(ValueError, match="unsupported AVI video codec"):
        parse_avi_mjpeg(bytes(h264))


def test_misra_gries_exact_under_any_partitioning(spark):
    """heavy_hitters output must equal the exact HAVING-threshold set no
    matter how the input is partitioned — the candidate pass may emit
    different supersets per layout, but the exact re-count pass erases
    that. Skewed stream: term t_i appears 2^i times, i=0..9 (N=1023,
    only t_9=512 and t_8=256 clear N/4), plus capacity far below the
    distinct count to make the sketch actually prune."""
    from pyspark.sql import functions as F

    from popelines_spark.llm.sketch import heavy_hitters

    rows = [(f"t{i}",) for i in range(10) for _ in range(2 ** i)]
    df = spark.createDataFrame(rows, "term string")
    exact = {("t9", 512), ("t8", 256)}  # cnt*4 > 1023
    for parts in (1, 7, 32):
        got = {
            (r.term, r.cnt)
            for r in heavy_hitters(
                df.repartition(parts), "term", denom=4, capacity=5
            ).collect()
        }
        assert got == exact, (parts, got)


def test_misra_gries_candidates_bounded(spark):
    """The candidate frame is bounded by capacity × n_partitions even on
    an adversarial all-distinct stream (nothing survives decrements
    except the ≤capacity tail of each partition)."""
    from popelines_spark.llm.sketch import misra_gries_candidates

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(5000)], "term string"
    ).repartition(8)
    n = misra_gries_candidates(df, "term", capacity=16).count()
    assert n <= 16 * 8
