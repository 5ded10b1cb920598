"""Multimodal column operators (SURVEY §2.10 — training-data extensions).

Image/audio/video payloads are modeled the way a 100 TB lake stores them:
an opaque ``binary`` content column plus typed metadata columns, processed
by **Arrow-batched ``mapInPandas``** — the payload bytes never pass through
row-at-a-time Python, and each task streams batches so one huge partition
never has to fit in executor Python memory at once.

The real codecs (PIL/librosa/av) are not in this container, so the decode
step is STUBBED: :func:`decode_image` raises ``NotImplementedError`` unless
PIL is importable, and the tested path uses a clearly-marked deterministic
fake (byte-level features) so all the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and oracle-checked.

Scale notes:
- ``mapInPandas`` keeps partition boundaries: no shuffle is introduced;
  the operator cost is scan + decode, embarrassingly parallel.
- Feature rows are tiny relative to payloads — project the binary column
  away immediately after extraction so downstream stages shuffle features,
  never bytes.
- Frame sampling is a 1→N expansion inside one task (no explode shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Deterministic fake "video" framing: fixed frame size, sample every k-th.
FRAME_BYTES = 256
FRAME_STRIDE = 4

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes int, first_byte int, "
    "byte_sum bigint, n_frames int, n_sampled_frames int"
)

FRAME_SCHEMA = "media_id bigint, frame_index int, frame_bytes binary"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a media table from the documents fixture: UTF-8 bytes of
    the text stand in for an encoded payload. Real pipelines read the
    bytes from parquet/object storage directly — the downstream plumbing
    is identical."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Real image decode — STUB. The container has no imaging libraries;
    when PIL is available this returns a decoded image object."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed in this "
            "environment; use extract_features() (deterministic byte-level "
            "fake) for plumbing tests"
        ) from exc


def decode_audio(content: bytes):  # pragma: no cover - stub by design
    """Real audio decode — STUB. The container has no audio libraries;
    when librosa/soundfile is available this returns (samples, rate)."""
    try:
        import io

        import soundfile  # noqa: F401

        return soundfile.read(io.BytesIO(content))
    except ImportError as exc:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa, not installed in "
            "this environment; byte-level plumbing is exercised by "
            "extract_features()/resize_media()"
        ) from exc


def resize_media(media: DataFrame, scale: int = 4) -> DataFrame:
    """Deterministic "resize": decimate the payload by ``scale`` (every
    scale-th byte), the stand-in for a thumbnail/downsample pass. Real
    pipelines swap the decimation line for PIL ``Image.resize`` /
    ``librosa.resample`` — the Arrow plumbing (binary in, binary out,
    partition-preserving mapInPandas, no shuffle) is identical. Output
    keeps original and resized sizes so downstream can verify the
    reduction ratio without touching bytes."""
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            resized = [bytes(b[::scale]) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "orig_bytes": [len(b) for b in pdf["content"]],
                    "resized_bytes": [len(b) for b in resized],
                    "content": resized,
                }
            )

    return media.mapInPandas(
        batches,
        schema="media_id bigint, orig_bytes int, resized_bytes int, content binary",
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary content column.

    Deterministic fake decode: byte length, first byte, byte sum, and the
    frame counts the sampler would produce. Numpy operates on the raw
    buffer per row — no per-byte Python loop — and the binary column is
    dropped on output so only small feature rows flow downstream.
    """
    import numpy as np
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            buf = [np.frombuffer(b, dtype=np.uint8) for b in pdf["content"]]
            n_bytes = np.array([len(a) for a in buf], dtype=np.int32)
            n_frames = -(-n_bytes // FRAME_BYTES)  # ceil-div
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": n_bytes,
                    "first_byte": np.array(
                        [int(a[0]) if len(a) else -1 for a in buf], dtype=np.int32
                    ),
                    "byte_sum": np.array(
                        [int(a.sum(dtype=np.int64)) for a in buf], dtype=np.int64
                    ),
                    "n_frames": n_frames,
                    "n_sampled_frames": -(-n_frames // FRAME_STRIDE),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """1→N frame sampling inside one task: split the payload into
    FRAME_BYTES chunks and emit every FRAME_STRIDE-th chunk as its own
    row. No shuffle — the expansion happens within partitions."""
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, chunks = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i in range(0, -(-len(content) // FRAME_BYTES), FRAME_STRIDE):
                    ids.append(mid)
                    idxs.append(i)
                    chunks.append(content[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": chunks}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
