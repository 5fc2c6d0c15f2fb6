"""Multimodal column handling — SURVEY §7 phase E.

Media (image/audio/video) is modeled as an opaque `binary` payload
column plus typed metadata, the standard lakehouse shape for
multimodal training data. The fixture has no real media, so the
payload is derived deterministically from `documents.text`
(utf-8 bytes); everything Spark-side — schema, Arrow batch transfer,
mapInPandas signatures, partition behavior — is real and tested.

The actual codec step is STUBBED: `decode_image()` raises
NotImplementedError when a real decoder is requested (PIL/cv2 are not
in this container) and otherwise produces a deterministic fake
"decode" from the bytes. Swapping in a real decoder is a one-function
change; the distributed plumbing around it does not move.

Scale notes: payloads never shuffle — metadata extraction and feature
UDFs are scan-local (mapInPandas), and downstream joins/aggs use only
the small typed columns. At 100 TB the binary column stays in parquet
row groups and is column-pruned away from every query that doesn't
touch it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fixtures import load
from ..registry import register

FEATURE_DIM = 16


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, media_type, n_bytes)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


@register(
    "multimodal_metadata",
    oracle="""
SELECT doc_id, 'text/plain' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
""",
    doc="Typed metadata extraction from the opaque binary payload "
    "(byte length + checksum) — scan-local, no shuffle, binary column "
    "pruned from downstream plans",
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


def decode_image(payload: bytes, real_codec: bool = False) -> list[float]:
    """STUB decode step. A real deployment plugs PIL/ffmpeg in here;
    this container has neither, so `real_codec=True` raises and the
    default path computes a deterministic fake feature: a 16-bin
    byte-value histogram, L1-normalized. Same signature, same batch
    shape, same determinism contract as a real extractor."""
    if real_codec:
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment; "
            "plug PIL/cv2/ffmpeg in here"
        )
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [h / total for h in hist]


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def multimodal_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal array form: (doc_id, n_bytes, feature array<double>).

    Feature extraction over binary payloads via mapInPandas (Arrow
    batches in, per-partition iterator, no driver involvement). The
    decode step is the documented stub in decode_image(). Not
    registered directly — the driver's canonicalizer can't hash array
    columns (round-1 ERR), so the registered `multimodal_features`
    posexplodes this to scalar rows.
    """
    m = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return m.mapInPandas(extract, FEATURE_SCHEMA)


@register(
    "multimodal_features",
    # The stub decode (16-bin byte histogram over the utf-8 payload,
    # L1-normalized) IS SQL-expressible because the fixture text is
    # pure ASCII (byte value == codepoint, verified in
    # tests/test_extensions.py) — so this gets a full value-hash
    # oracle, not a rows-only check.
    oracle="""
WITH grid AS (
  SELECT doc_id, length(text) AS total, g.pos
  FROM documents, (SELECT unnest(range(0, 16)) AS pos) g
),
counts AS (
  SELECT doc_id, ord(substring(text, CAST(t.i AS INT), 1)) % 16 AS pos,
         count(*) AS c
  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
  GROUP BY 1, 2
)
SELECT g.doc_id, g.pos, COALESCE(c.c, 0) / g.total AS val
FROM grid g LEFT JOIN counts c ON g.doc_id = c.doc_id AND g.pos = c.pos
""",
    doc="Feature extraction over binary payloads via mapInPandas, "
    "posexploded to driver-comparable (doc_id, pos, val) scalar rows. "
    "The Arrow-batched decode stub is decode_image(); see "
    "multimodal_feature_vectors() for the array form.",
    tags=("multimodal", "udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    vec = multimodal_feature_vectors(spark, sf_dir)
    return vec.select(
        "doc_id", F.posexplode("feature").alias("pos", "val")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "val")


@register(
    "multimodal_feature_agg",
    # Same ASCII-byte-histogram equivalence as multimodal_features, so
    # the downstream aggregation is fully oracle-checked too.
    oracle="""
WITH f AS (
  SELECT doc_id, length(text) AS n_bytes,
         (SELECT count(*) FROM unnest(range(1, length(text) + 1)) AS t(i)
           WHERE ord(substring(text, CAST(t.i AS INT), 1)) % 16 = 0)
         / length(text) AS f0
  FROM documents)
SELECT d.lang, count(*) AS n_docs, avg(f.n_bytes) AS avg_bytes,
       avg(f.f0) AS avg_f0
FROM f JOIN documents d USING (doc_id) GROUP BY d.lang
""",
    doc="Downstream use of extracted features: join features back to "
    "document metadata and aggregate per lang — the features "
    "shuffle, the payloads never do",
    tags=("multimodal", "aggregate"),
)
def multimodal_feature_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = multimodal_feature_vectors(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        feats.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("n_bytes").alias("avg_bytes"),
            F.avg(F.element_at("feature", 1)).alias("avg_f0"),
        )
    )


FRAME_LEN = 64  # bytes per "frame"
FRAME_EVERY = 4  # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(payload: bytes, frame_len: int = FRAME_LEN, every: int = FRAME_EVERY):
    """STUB frame sampler: treats the payload as a contiguous frame
    stream (frame = `frame_len`-byte slice) and keeps every `every`-th
    frame — the plumbing shape of video keyframe sampling (a real
    deployment swaps the byte slicing for an ffmpeg seek+decode; the
    stride logic, batch shape, and downstream schema do not move)."""
    import hashlib

    n_frames = (len(payload) + frame_len - 1) // frame_len
    for fno in range(0, n_frames, every):
        chunk = payload[fno * frame_len : (fno + 1) * frame_len]
        yield fno, n_frames, hashlib.md5(chunk).hexdigest()


@register(
    "multimodal_frame_sample",
    # byte slice == char slice on the pure-ASCII fixture payloads, so
    # the sampled frames (and their md5s) are exactly expressible in
    # SQL — full value-hash oracle for the sampling plumbing.
    oracle=f"""
WITH f AS (
  SELECT doc_id, text,
         CAST((length(text) + {FRAME_LEN - 1}) // {FRAME_LEN} AS BIGINT) AS n_frames,
         unnest(range(0, CAST((length(text) + {FRAME_LEN - 1}) // {FRAME_LEN} AS BIGINT), {FRAME_EVERY})) AS frame_no
  FROM documents
)
SELECT doc_id, frame_no, n_frames,
       md5(substr(text, frame_no * {FRAME_LEN} + 1, {FRAME_LEN})) AS frame_md5
FROM f
""",
    doc=f"Frame sampling over binary payloads: every {FRAME_EVERY}th "
    f"{FRAME_LEN}-byte frame per document via mapInPandas (Arrow "
    "batches, scan-local — payloads never shuffle; only the small "
    "(doc_id, frame_no, md5) rows leave the scan stage). The decode "
    "is the documented byte-slice stand-in for keyframe extraction",
    tags=("multimodal", "frame_sample"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fno, n_frames, h in sample_frames(bytes(payload)):
                    rows.append((doc_id, fno, n_frames, h))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "n_frames", "frame_md5"]
            )

    return m.mapInPandas(extract, FRAME_SCHEMA)


RESIZE_EVERY = 4  # keep every 4th byte — the downsample ratio

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_len", T.LongType()),
        T.StructField("thumb_len", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_payload(payload: bytes, every: int = RESIZE_EVERY) -> bytes:
    """STUB resize: byte-stride downsample (every `every`-th byte) —
    the plumbing shape of thumbnailing (a real deployment swaps the
    stride for a PIL/libvips resample; the Arrow batch shape, schema,
    and scan-local execution do not move)."""
    return payload[::every]


@register(
    "multimodal_resize",
    # byte stride == char stride on the pure-ASCII fixture payloads, so
    # the downsampled bytes (and their md5) are exactly expressible in
    # SQL — full value-hash oracle for the resize plumbing.
    oracle=f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS orig_len,
       CAST((length(text) + {RESIZE_EVERY - 1}) // {RESIZE_EVERY} AS BIGINT) AS thumb_len,
       md5(array_to_string([text[i] for i in range(1, length(text) + 1, {RESIZE_EVERY})], '')) AS thumb_md5
FROM documents
""",
    doc=f"Media resize stand-in: every {RESIZE_EVERY}th byte of the "
    "payload via mapInPandas — completes the decode/feature/resize/"
    "frame-sample quartet. Scan-local like the other multimodal ops: "
    "payloads never shuffle, only (doc_id, lens, md5) rows leave the "
    "scan stage; at 100 TB the thumbnail would be WRITTEN back as a "
    "new binary column in the same pass, still shuffle-free.",
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    m = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                thumb = resize_payload(b)
                rows.append(
                    (doc_id, len(b), len(thumb), hashlib.md5(thumb).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "orig_len", "thumb_len", "thumb_md5"]
            )

    return m.mapInPandas(extract, RESIZE_SCHEMA)
