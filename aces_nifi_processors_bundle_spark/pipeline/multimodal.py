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


def stdlib_decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """REAL image decode on nothing but the stdlib (round 12 — the
    socketio_polling move applied to codecs): parse the two classic
    uncompressed formats whose specs are public and byte-simple —
    24-bit BI_RGB Windows BMP and binary PPM (P6, maxval <= 255) —
    then grayscale (integer Rec.601: (299R + 587G + 114B) / 1000, the
    same luma weights PIL's convert('L') uses) and box-average the
    columns into a dim-px strip of [0,1] floats. This makes the
    real-decode branch EXECUTE in every environment: PIL stays the
    production codec wherever importable (JPEG/PNG/everything), but
    its absence no longer reduces 'real decode' to a permanent skip.

    The strip is a box-filter column average (all rows, columns
    binned i*w//dim ..< (i+1)*w//dim), not PIL's bicubic — the two
    paths are different codecs, not bit-twins; tests pin each path's
    own arithmetic and, where PIL exists, cross-check within a loose
    tolerance. Raises DecoderUnavailable for any other format (the
    caller's 'auto' mode falls back to the deterministic fake)."""
    if payload and payload[:2] == b"BM":
        import struct

        if len(payload) < 54:
            raise DecoderUnavailable("BMP truncated before header end")
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            raise DecoderUnavailable(
                f"stdlib BMP path handles 24-bit BI_RGB only "
                f"(bpp={bpp}, compression={comp}, {w}x{h})"
            )
        top_down = h < 0
        h = abs(h)
        stride = ((w * 3 + 3) // 4) * 4
        if len(payload) < off + stride * h:
            raise DecoderUnavailable("BMP truncated before pixel end")
        import numpy as np

        # round 13: frombuffer/reshape slicing instead of per-pixel
        # Python loops (~100× on real rasters, bit-exact — integer
        # sums are exact and the float ops below are unchanged).
        # Bottom-up is the BMP default: file row 0 is the LAST image
        # row — flip to image order (irrelevant to column averages,
        # kept so the raster is the image).
        raster = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)
        if not top_down:
            raster = raster[::-1]
        pix = raster[:, : w * 3].reshape(h, w, 3).astype(np.int64)
        # BMP pixel order is little-endian BGR
        gray2d = (
            299 * pix[:, :, 2] + 587 * pix[:, :, 1] + 114 * pix[:, :, 0]
        ) // 1000

    elif payload and payload[:2] == b"P6":
        # header = 3 whitespace-separated tokens (w, h, maxval) with
        # '#' comments; one whitespace byte after maxval, then raw RGB
        pos, toks = 2, []
        n = len(payload)
        while len(toks) < 3 and pos < n:
            c = payload[pos:pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                while pos < n and payload[pos:pos + 1] != b"\n":
                    pos += 1
            else:
                start = pos
                while pos < n and not payload[pos:pos + 1].isspace():
                    pos += 1
                toks.append(payload[start:pos])
        if len(toks) < 3:
            raise DecoderUnavailable("PPM truncated inside header")
        w, h, maxval = (int(t) for t in toks)
        pos += 1  # the single whitespace byte after maxval
        if maxval > 255 or w <= 0 or h <= 0:
            raise DecoderUnavailable(
                f"stdlib PPM path handles maxval<=255 only "
                f"(maxval={maxval}, {w}x{h})"
            )
        if len(payload) < pos + 3 * w * h:
            raise DecoderUnavailable("PPM truncated before pixel end")
        import numpy as np

        pix = np.frombuffer(
            payload, np.uint8, count=3 * w * h, offset=pos
        ).reshape(h, w, 3).astype(np.int64)
        gray2d = (
            299 * pix[:, :, 0] + 587 * pix[:, :, 1] + 114 * pix[:, :, 2]
        ) // 1000

    else:
        raise DecoderUnavailable(
            "stdlib decoder handles 24-bit BMP and binary PPM (P6); "
            "install pillow for other formats or use "
            "fake_decode_image (use_real_decoder=False)"
        )
    feat = []
    for i in range(dim):
        x0 = i * w // dim
        x1 = max(x0 + 1, (i + 1) * w // dim)
        x1 = min(x1, w)
        # .item(): an exact Python int, so the division chain below is
        # the same float arithmetic as the pre-vectorized loop
        total = int(gray2d[:, x0:x1].sum())
        feat.append(total / ((x1 - x0) * h) / 255.0)
    return feat


def real_decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """The production decode hook: PIL when importable (decode →
    grayscale → resize to a dim-px strip → [0,1] floats — a
    deterministic thumbnail feature, the slot a learned embedding
    would replace); without PIL, the stdlib BMP/PPM parser above (so
    'real decode' executes in codec-less containers too), which
    raises DecoderUnavailable for formats it doesn't speak. The
    try-import runs per-process, not per-row (Python caches the
    module)."""
    try:
        import io

        from PIL import Image
    except ImportError:  # codec-less container: the stdlib path
        return stdlib_decode_image(payload, dim)
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
        elif use_real_decoder == "auto":
            if decoder_available():  # PIL: every format, no fallback
                decode = real_decode_image
            else:
                # codec-less executor: REAL stdlib decode for the
                # formats it speaks (BMP/P6), deterministic fake for
                # the rest — auto degrades per PAYLOAD now, not per
                # environment (round 12)
                def decode(b: bytes, d: int) -> list[float]:
                    try:
                        return stdlib_decode_image(b, d)
                    except DecoderUnavailable:
                        return fake_decode_image(b, d)
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
