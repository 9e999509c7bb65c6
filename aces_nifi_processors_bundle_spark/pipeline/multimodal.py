"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The decode step is pluggable: ``real_decode_image`` uses PIL wherever
it is importable (``use_real_decoder=True`` requires it, ``"auto"``
probes per executor); environments without codecs — this container —
fall back to the deterministic ``fake_decode_image`` stub, raising
``DecoderUnavailable`` only when the real decoder was explicitly
required. Everything Spark-side is identical on both paths and fully
tested: schemas, mapInPandas batch iteration, partition sizing, and
the UDF signatures.

Scale notes: binary payloads dominate row size, so
- never groupBy/shuffle a frame that still carries the binary column:
  extract features first, project the binary away, then shuffle;
- `spark.sql.files.maxPartitionBytes` governs scan parallelism for
  fat rows; metadata-only transforms select around the blob (parquet
  column pruning means the blob bytes are never read);
- mapInPandas streams Arrow batches — peak memory is one batch, not
  one partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Typed metadata schema for an opaque media column (golden spec).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_hash", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decoder slot: image/audio libs absent here."""


def decoder_available() -> bool:
    """True iff a real image decoder (PIL) is importable in this
    interpreter. Checked on the EXECUTOR inside the UDF too — driver
    and executors can have different environments."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def real_decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """The production decode hook: PIL when importable (decode →
    grayscale → resize to a dim-px strip → [0,1] floats — a
    deterministic thumbnail feature, the slot a learned embedding
    would replace), DecoderUnavailable otherwise. The try-import runs
    per-process, not per-row (Python caches the module)."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise DecoderUnavailable(
            "media decoding requires image libraries not present in "
            "this environment; install pillow or use the deterministic "
            "fake_decode_image path (use_real_decoder=False)"
        ) from e
    with Image.open(io.BytesIO(payload)) as img:
        strip = img.convert("L").resize((dim, 1))
        return [p / 255.0 for p in strip.getdata()]


def fake_decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decode: md5-seeded feature vector.

    Stands in for decode→resize→embed so the distributed plumbing
    (batching, schema, partitioning) is testable without codecs."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, use_real_decoder: bool | str = False
) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Arrow-batched: each batch is a pandas DataFrame; per-batch work is
    vectorizable python. Output drops the payload (shuffle-safe).

    use_real_decoder: False = deterministic fake (the oracle path
    here), True = require the PIL decoder (DecoderUnavailable per
    task where absent), "auto" = real decoder wherever the EXECUTOR
    interpreter can import it, fake elsewhere — the availability probe
    runs inside the UDF, so a heterogeneous cluster degrades per-node
    instead of failing."""
    # identity checks, not `in`: 1 == True under `in`, but the `is
    # True` dispatch below would then silently pick the fake decoder
    if not (
        use_real_decoder is True
        or use_real_decoder is False
        or use_real_decoder == "auto"
    ):
        raise ValueError(
            f"extract_features: use_real_decoder must be True/False/'auto', "
            f"got {use_real_decoder!r}"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        if use_real_decoder is True:
            decode = real_decode_image
        elif use_real_decoder == "auto" and decoder_available():
            decode = real_decode_image
        else:
            decode = fake_decode_image
        for pdf in batches:
            # ONE python pass per batch (three .map passes tripled
            # loop overhead and the fake path hashed every payload
            # twice — the decode still receives the raw bytes)
            rows = [
                (len(b), hashlib.md5(b).hexdigest(), decode(b, dim))
                for b in (p or b"" for p in pdf["payload"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": pd.Series(
                        [r[0] for r in rows], dtype="int64"
                    ),
                    "payload_hash": [r[1] for r in rows],
                    "feat": [r[2] for r in rows],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp.

    The sample-point fan-out is pure SQL (sequence + explode) — only
    the eventual frame decode is a stubbed UDF. This keeps the fan-out
    Catalyst-visible (predicates on sample_ms prune before decoding)."""
    # duration <= 0 or NULL ⇒ ZERO sample rows: the old greatest(.,0)
    # clamp fabricated a sample at t=0 for media with no known frames
    # and downstream decode would chase a frame that does not exist
    return (
        media.filter(
            (F.col("kind") == "video") & (F.col("duration_ms") > 0)
        ).select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from documents (test fixture):
    payload = text bytes, kind cycles image/audio/video."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
