"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/resize/frame-sample kernels require media libraries (Pillow /
ffmpeg / torchaudio) that are NOT in this container, so the kernels are
STUBBED — ``decode_image_stub`` produces deterministic fake metadata and
features derived from the raw bytes.  Everything Spark-side is real and
tested: schemas, Arrow batch iteration, partition-count preservation,
output typing.  Swapping a stub for a real decoder is a one-function
change; the distributed plumbing (the hard part at 100 TB) is identical.

Scale notes: mapInPandas streams record batches — a partition never has
to fit decoded media in memory at once; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small for large blobs,
and partition by content size upstream so batches are byte-balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, "
    "n_bytes bigint, checksum string"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, checksum string, "
    "width int, height int, feature array<double>"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pack a binary media column (here: utf-8 bytes of the text — the
    testdata has no real media) plus typed metadata.  Real pipelines read
    the bytes from object storage with the same schema."""
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.length(media).cast("bigint").alias("n_bytes"),
        F.md5(media).alias("checksum"),
    )


def decode_image_stub(raw: bytes) -> tuple[int, int, list[float]]:
    """STUB for a real image decoder (PIL.Image.open → size, pixels).

    Media libraries are not installed in this container; this produces a
    deterministic fake (dimensions and an 8-dim 'feature' derived from the
    byte content) so the distributed plumbing is fully exercisable.
    Replace the body with real decoding when the library is present:

        raise NotImplementedError("install Pillow and decode here")
    """
    n = len(raw)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    # 8-dim byte-histogram-ish feature, deterministic
    feat = [0.0] * 8
    for i, b in enumerate(raw):
        feat[b % 8] += 1.0
    total = float(n) or 1.0
    return width, height, [f / total for f in feat]


try:  # optional real decoder — media libs are absent in this container
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def decode_image(raw: bytes) -> tuple[int, int, list[float]]:
    """Real image decode when Pillow is importable (size + an 8-dim
    mean-brightness feature over a 4×2 thumbnail), falling back to the
    deterministic stub otherwise.  The declared oracle queries pin the
    STUB path (reproducible in any environment); production deployments
    pass this kernel to :func:`extract_media_features` explicitly."""
    if not HAS_PIL:
        return decode_image_stub(raw)
    import io

    img = _PILImage.open(io.BytesIO(raw)).convert("RGB")
    width, height = img.size
    thumb = img.resize((4, 2))
    feat = [sum(px) / (3.0 * 255.0) for px in thumb.getdata()]
    return width, height, feat


def extract_media_features(
    media_df: DataFrame, batch_size_hint: int = 256, kernel=None
) -> DataFrame:
    """Arrow-batched media feature extraction over mapInPandas.

    One Python worker pass per partition, streaming record batches; no
    collect, no per-row Python round trips.  ``kernel``: a
    ``bytes -> (width, height, feature)`` decoder; defaults to the
    deterministic stub (the oracle-pinned path — see
    :func:`decode_image` for the Pillow-backed real one).
    """
    import pandas as pd

    decode = kernel or decode_image_stub

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for raw in pdf["media"]:
                w, h, f = decode(bytes(raw))
                widths.append(w)
                heights.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": pdf["checksum"],
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(process, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, media binary, width int, height int"


def resize_stub(raw: bytes, target_w: int, target_h: int) -> bytes:
    """STUB for a real resize kernel (PIL resize → re-encode).  Emits a
    deterministic byte-subsample so output size tracks target dims."""
    keep = max(1, target_w * target_h // 64)
    step = max(1, len(raw) // keep)
    return raw[::step][:keep]


def resize_media(
    media_df: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Distributed media resize over mapInPandas (stub kernel).  Schema,
    batching and output typing are the real 100 TB plumbing; only the
    pixel kernel is fake (media libs absent in this container)."""
    import pandas as pd

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_stub(bytes(r), target_w, target_h) for r in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media_df.mapInPandas(process, schema=RESIZE_SCHEMA)


def sample_frames(
    docs: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "text",
    frame_size: int = 256,
    every: int = 4,
) -> DataFrame:
    """Frame sampling as pure relational algebra: split the payload into
    fixed-size frames, keep every ``every``-th.  For a video column the
    same plan applies over ``binary`` with codec-aware offsets supplied
    by an index column; here the payload is text so the op is exactly
    SQL-expressible (and DuckDB-oracle-checked).  explode(sequence) keeps
    the fan-out JVM-side — no Python, no driver loop."""
    n = F.length(payload_col)
    frames = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(payload_col).alias("_p"),
            # floor, not double-divide-then-cast: for an empty payload
            # (n=0) the cast truncates -0.004 to 0 and emits a spurious
            # frame, while floor gives -1 → empty sequence... except
            # sequence(0, -1) DESCENDS in Spark; guard with greatest so
            # empty payloads emit no frame (matches (n-1)//256 floor
            # semantics of the oracle for n>0, zero frames for n=0)
            F.explode(
                F.when(
                    n > 0,
                    F.sequence(
                        F.lit(0).cast("bigint"),
                        F.floor((n - 1) / frame_size).cast("bigint"),
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every == 0)
        .select(
            "doc_id",
            "frame_idx",
            F.expr(
                f"substring(_p, cast(frame_idx * {frame_size} + 1 as int), {frame_size})"
            ).alias("frame"),
        )
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").alias("frame_chars"),
        F.md5("frame").alias("frame_md5"),
    )
