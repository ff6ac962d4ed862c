"""Pins for the round-12 LLM-subsystem review findings."""

import pytest
from pyspark.sql import functions as F


def test_hyperplane_bucket_rejects_dim_mismatch(spark):
    """Review r12: a vector shorter/longer than dim used to bucket
    SILENTLY to 0 (null-padded dot), collapsing the LSH join to
    all-pairs. It must fail loud per row."""
    from popelines_spark.llm.similarity import hyperplane_bucket

    ok = spark.createDataFrame(
        [(1, [0.5] * 8)], "id long, v array<double>"
    ).select(hyperplane_bucket(F.col("v"), n_planes=4, dim=8).alias("b"))
    assert ok.collect()[0]["b"] is not None

    bad = spark.createDataFrame(
        [(1, [0.5] * 6)], "id long, v array<double>"
    ).select(hyperplane_bucket(F.col("v"), n_planes=4, dim=8).alias("b"))
    with pytest.raises(Exception, match="vector length"):
        bad.collect()


def test_split_assigns_null_groups_and_decorrelates_from_mixture(spark):
    from popelines_spark.llm.mix import sample_to_mixture
    from popelines_spark.llm.split import assign_split

    # NULL group rows must receive a split, not vanish (review r12)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)],
        "doc_id long, src string",
    )
    out = assign_split(df, "src", "doc_id")
    assert out.count() == 4
    null_rows = out.filter(F.col("src").isNull()).collect()
    assert len(null_rows) == 2
    assert len({r["split"] for r in null_rows}) == 1  # group-constant

    # decorrelation: among mixture SURVIVORS of singleton groups, the
    # split must still be ~80/10/10 — the old shared hash sent 100% of
    # survivors to 'train' (review r12)
    corpus = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.lit("web").alias("dom"),
        F.col("id").cast("string").alias("site"),  # singleton groups
    )
    kept = sample_to_mixture(corpus, "dom", "doc_id", {"web": 0.8})
    split = assign_split(kept, "site", "doc_id")
    frac = {
        r["split"]: r["n"] / kept.count()
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert 0.7 < frac.get("train", 0) < 0.9
    assert 0.05 < frac.get("val", 0) < 0.15
    assert 0.05 < frac.get("test", 0) < 0.15


def test_mixture_and_split_reject_non_integral_ids(spark):
    from popelines_spark.llm.mix import sample_to_mixture
    from popelines_spark.llm.split import assign_split

    df = spark.createDataFrame(
        [("u-1", "a"), ("u-2", "a")], "doc_id string, src string"
    )
    with pytest.raises(ValueError, match="integral"):
        sample_to_mixture(df, "src", "doc_id", {"a": 0.5})
    with pytest.raises(ValueError, match="integral"):
        assign_split(df, "src", "doc_id")


def test_cms_and_bloom_preserve_probe_multiplicity_and_map_cols(spark):
    from popelines_spark.llm.sketch import (
        bloom_build,
        bloom_probe,
        cms_build,
        cms_estimate,
    )

    data = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 2, "term string"
    )
    cms = cms_build(data, "term")
    # duplicate probe rows + a map-typed payload column (review r12:
    # groupBy over the full row collapsed dups and rejected maps)
    probes = spark.createDataFrame(
        [("x", {"k": 1}), ("x", {"k": 2}), ("zz", {"k": 3})],
        "term string, payload map<string,int>",
    )
    got = cms_estimate(cms, probes, "term").collect()
    assert len(got) == 3
    ests = sorted(r["cms_est"] for r in got)
    assert ests[0] == 0 or ests[0] <= 2  # 'zz' never over-counts past collisions
    assert sum(1 for r in got if r["term"] == "x") == 2

    bloom = bloom_build(data, "term")
    hits = bloom_probe(bloom, probes, "term").collect()
    assert len(hits) == 3
    assert sum(1 for r in hits if r["term"] == "x" and r["bloom_pass"]) == 2


def test_heavy_hitters_numeric_column_and_capacity_floor(spark):
    from popelines_spark.llm.sketch import heavy_hitters

    df = spark.createDataFrame(
        [(7,)] * 60 + [(9,)] * 30 + [(i,) for i in range(10)],
        "tok long",
    )
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "tok", denom=100, capacity=20)
    # numeric column: the candidate pass must not crash Arrow (r12)
    got = {r["term"]: r["cnt"] for r in heavy_hitters(df, "tok", 4).collect()}
    assert got == {7: 61, 9: 31}


def test_png_truncated_chunk_raises_valueerror():
    import binascii
    import struct

    from popelines_spark.llm import multimodal as mm

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    # a chunk header claiming 100 bytes with the payload cut short
    buf = mm._PNG_SIG + chunk(b"IHDR", ihdr) + struct.pack(">I", 100) \
        + b"IDATxxxxxx"
    with pytest.raises(ValueError, match="truncated PNG"):
        mm._png_decode(buf)
