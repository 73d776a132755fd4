"""Multimodal column plumbing: image/audio/video as opaque BinaryType
payloads with typed metadata, processed via Arrow-batched mapInPandas.

The decode step itself is STUBBED (image/audio libraries are not in
this container — see ``decode_image``); everything Spark-side is real:
schema, batch iteration, partitioning, UDF signatures. Swapping the stub
for PIL/ffmpeg is a one-function change.

At 100 TB: binary payloads dominate size — keep them in their own
column chunk (Parquet does this for free), filter on metadata columns
first so payload bytes are only read for surviving rows, and size
``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits
executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, ok boolean"
)


def pil_available() -> bool:
    """Runtime probe: use the real codec wherever the environment has
    one, fall back to the deterministic fake elsewhere."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_image(payload: bytes) -> dict:
    """Real decoder via PIL when importable; raises NotImplementedError
    when the environment has no image codec (this container), so callers
    must opt in to the deterministic fake used for plumbing tests.

    Undecodable bytes with PIL present yield ``ok=False`` rather than
    raising — at scale a corrupt blob must never fail the partition.
    """
    if not pil_available():
        raise NotImplementedError("image codecs not available in this environment")
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(payload))
        return {
            "n_bytes": len(payload),
            "format": (img.format or "unknown").lower(),
            "width": img.width,
            "height": img.height,
            "ok": True,
        }
    except Exception:
        return {
            "n_bytes": len(payload),
            "format": "undecodable",
            "width": 0,
            "height": 0,
            "ok": False,
        }


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives pseudo-metadata purely
    from the byte content, so tests and oracles are reproducible."""
    n = len(payload)
    return {
        "n_bytes": n,
        "format": "fake/raw",
        "width": n % 640,
        "height": (n * 7) % 480,
        "ok": True,
    }


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of
    the text — in production this is the stored image/audio blob)."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))


def extract_metadata(payloads: DataFrame, use_fake: bool | None = None) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata table.

    Arrow moves the bytes in columnar batches; the decoder sees a plain
    ``bytes`` per row. This is the real multimodal execution shape.

    ``use_fake=None`` (default) probes the environment: real PIL decode
    when importable, the deterministic fake otherwise. ``use_fake=True``
    forces the fake (reproducible oracles); ``use_fake=False`` demands
    the real codec and raises where the environment lacks one.
    """
    if use_fake is None:
        use_fake = not pil_available()
    if not use_fake and not pil_available():
        raise NotImplementedError("image codecs not available in this environment")

    # the closure must be self-contained: workers launched by an
    # arbitrary caller session may not have this package importable, and
    # module-level functions pickle by reference. Nested defs pickle by
    # value, so inline both decoders here.
    def _fake(payload: bytes) -> dict:
        n = len(payload)
        return {
            "n_bytes": n,
            "format": "fake/raw",
            "width": n % 640,
            "height": (n * 7) % 480,
            "ok": True,
        }

    def _real(payload: bytes) -> dict:
        import io

        from PIL import Image

        try:
            img = Image.open(io.BytesIO(payload))
            return {
                "n_bytes": len(payload),
                "format": (img.format or "unknown").lower(),
                "width": img.width,
                "height": img.height,
                "ok": True,
            }
        except Exception:
            # corrupt blob must never fail the partition at scale
            return {
                "n_bytes": len(payload),
                "format": "undecodable",
                "width": 0,
                "height": 0,
                "ok": False,
            }

    decoder = _fake if use_fake else _real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return payloads.mapInPandas(run, META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary, ok boolean"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_payload binary, n_frames int"


def resize_images(
    payloads: DataFrame, width: int = 224, height: int = 224, use_fake: bool = True
) -> DataFrame:
    """Resize operator plumbing: binary in -> binary out, fixed target
    dims. The real kernel is a PIL `Image.resize` inside the same
    closure shape; the deterministic fake truncates/pads the byte
    stream to width*height so tests can assert exact output sizes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "image codecs not available in this environment"
                )
            out_payloads = []
            for p in pdf["payload"]:
                b = bytes(p)
                out_payloads.append((b * (target // max(len(b), 1) + 1))[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                    "ok": True,
                }
            )

    return payloads.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    payloads: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, use_fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one binary 'video' in -> N 'frame' rows
    out (a 1->many UDTF-shaped mapInPandas). The real kernel seeks
    keyframes with ffmpeg; the deterministic fake slices the byte
    stream every ``every_n_bytes``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "video codecs not available in this environment"
                )
            ids, idxs, frames, totals = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                chunks = [
                    b[i : i + every_n_bytes] for i in range(0, len(b), every_n_bytes)
                ][:max_frames]
                for j, c in enumerate(chunks):
                    ids.append(doc_id)
                    idxs.append(j)
                    frames.append(c)
                    totals.append(len(chunks))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": frames,
                    "n_frames": totals,
                }
            )

    return payloads.mapInPandas(run, FRAMES_SCHEMA)
