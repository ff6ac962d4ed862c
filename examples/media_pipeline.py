"""Multimodal curation pipeline on popelines_spark.

Composes the engine's binary-payload operators end to end, the way a
crawl-scale multimodal training-dataset build would run:

  1. wrap raw bytes as typed (payload, meta) columns — mixed formats in
     ONE column (PNG / JPEG / BMP), exactly how a crawl delivers them;
  2. decode + feature-extract in Arrow-batched mapInPandas stages
     (magic-byte dispatch; every decoder is real — llm/jpeg.py,
     llm/multimodal.py);
  3. gate on decoded properties (min resolution, decode success) with
     an explicit quarantine side-output instead of silent drops;
  4. join image features back to the text table and write the curated
     feature table partitioned by format — the layout downstream
     training jobs prune on.

Run:  python examples/media_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def curate_media(spark, sf_dir: str, out_dir: str) -> dict:
    from popelines_spark.llm import multimodal as M
    from popelines_spark.tables import load

    docs = load(spark, sf_dir, "documents")

    # 1. Mixed-format payload column: each doc deterministically becomes
    #    one of three real encoded formats (the fixtures are the repo's
    #    own encoders; in production this column comes off the crawl).
    png = M.make_png(docs.filter(F.col("doc_id") % 3 == 0), "doc_id")
    jpg = M.make_jpeg(docs.filter(F.col("doc_id") % 3 == 1), "doc_id")
    bmp = M.make_bmp(docs.filter(F.col("doc_id") % 3 == 2), "doc_id")
    payloads = png.unionByName(jpg).unionByName(bmp)

    # 2. Decode — one Arrow-batched stage, dispatching per payload.
    feats = M.decode_image(payloads)

    # 3. Quality gate with quarantine: resolution floor. (Decode errors
    #    raise per-doc in the stage; a production run would wrap the
    #    decoder in a try/except emitting an error column the same way
    #    fetch_windows_distributed surfaces __error.)
    ok = feats.filter((F.col("width") >= 2) & (F.col("height") >= 2))
    quarantined = feats.filter(
        ~((F.col("width") >= 2) & (F.col("height") >= 2))
    )

    # 4. Join back to text + write partitioned by format.
    curated = ok.join(
        docs.select("doc_id", "lang", "source", "n_chars"), "doc_id"
    )
    out_path = os.path.join(out_dir, "media_features")
    curated.write.mode("overwrite").partitionBy("format").parquet(out_path)

    back = spark.read.parquet(out_path)
    return {
        "input_docs": docs.count(),
        "decoded": feats.count(),
        "curated": back.count(),
        "quarantined": quarantined.count(),
        "formats": sorted(
            r["format"]
            for r in back.select("format").distinct().collect()
        ),
        "partition_dirs": sorted(
            d for d in os.listdir(out_path) if d.startswith("format=")
        ),
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/media_pipeline_out"
    stats = curate_media(get_spark(), sf_dir, out_dir)
    print(stats)
