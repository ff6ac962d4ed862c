"""SURVEY.md §2 Part C — multimodal (opaque binary payload) columns.

Payload plumbing is oracle-checked (byte lengths + SHA-256 digests are
engine-independent); the decode stage is the mapInPandas stub (rows-only —
no media libraries in this container; the Spark-side schema/batching is the
real deliverable). Implementations: popelines_spark/llm/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.llm import multimodal as M
from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "c_multimodal_col",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           source,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def c_multimodal_col(spark, sf_dir):
    """Typed payload column: binary bytes + metadata struct, flattened for
    the oracle. SHA-256 over the payload proves byte-level fidelity."""
    d = T(spark, sf_dir, "documents")
    wrapped = M.attach_payload(
        d, id_col="doc_id", content_col="text", source_col="source",
        mime="text/plain",
    )
    return wrapped.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


@query("c_multimodal_decode")  # rows-only: stub decode (no media libs)
def c_multimodal_decode(spark, sf_dir):
    """Distributed decode stage shape: Arrow-batched mapInPandas over
    binary payloads → typed features. Decode itself is the deterministic
    stub (llm/multimodal.py); real decoders slot into the same schema."""
    d = T(spark, sf_dir, "documents")
    wrapped = M.attach_payload(
        d, id_col="doc_id", content_col="text", source_col="source",
        mime="text/plain",
    )
    return M.decode_stub(wrapped)
