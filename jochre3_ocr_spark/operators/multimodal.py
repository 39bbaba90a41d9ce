"""Multimodal columns: opaque binary payloads with typed metadata.

Images / audio / video travel as ``binary`` columns next to typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas. The image path is real
(the .npy codec + numpy transforms, operators/transforms.py); audio and
video decode are STUBS behind NotImplementedError because the decoding
libraries are not in this container — the Spark-side plumbing (schema,
batching, UDF signature) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from jochre3_ocr_spark.operators import transforms as T

MEDIA_SCHEMA_DDL = (
    "media_ref string, media_type string, content binary, "
    "width int, height int, n_frames int"
)

FEATURE_DDL = (
    "media_ref string, media_type string, width int, height int, "
    "ink_ratio double, mean_intensity double, skew_deg double, status string"
)


def synthesize_media_df(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic media table: synthetic grayscale 'page' images with
    known skew, encoded with the .npy codec."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import random

        for batch in batches:
            rows = []
            for i in batch["id"]:
                rng = random.Random((seed << 16) ^ int(i))
                img = make_text_image(
                    n_lines=rng.randint(3, 6),
                    skew_deg=rng.uniform(-3, 3),
                    seed=int(i),
                )
                rows.append(
                    {
                        "media_ref": f"img://media/{int(i)}",
                        "media_type": "image/npy",
                        "content": T.encode_image(img),
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref media_type content width height n_frames".split()
                ][0],
            )

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA_DDL
    )


def make_text_image(
    n_lines: int = 4, skew_deg: float = 0.0, seed: int = 0,
    width: int = 400, height: int = 300,
) -> np.ndarray:
    """Synthetic page: horizontal dark text bands on white, then rotated
    by ``skew_deg`` (the DeskewerTest-style fixture)."""
    img = np.full((height, width), 255, dtype=np.uint8)
    gap = height // (n_lines + 1)
    for li in range(n_lines):
        y = gap * (li + 1)
        img[y : y + 6, 30 : width - 30] = 20
    if skew_deg:
        img = T.rotate_image(img, skew_deg, fill=255)
    return img


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode → grayscale → ink stats + skew estimate, per media row.
    The multimodal analog of the preprocessing stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for ref, mtype, content, w, h in zip(
                batch["media_ref"],
                batch["media_type"],
                batch["content"],
                batch["width"],
                batch["height"],
            ):
                try:
                    if mtype not in ("image/npy", "image/png"):
                        # audio/video decode genuinely needs external libs
                        raise NotImplementedError(
                            f"decode for {mtype} not available in this container"
                        )
                    img = T.decode_image(bytes(content))
                    gray = T.grayscale(img)
                    ink = (gray < 128).mean()
                    skew = T.estimate_skew(img)
                    rows.append(
                        {
                            "media_ref": ref,
                            "media_type": mtype,
                            "width": int(w),
                            "height": int(h),
                            "ink_ratio": float(ink),
                            "mean_intensity": float(gray.mean()),
                            "skew_deg": float(skew) if skew is not None else None,
                            "status": "ok",
                        }
                    )
                except NotImplementedError as exc:
                    rows.append(
                        {
                            "media_ref": ref,
                            "media_type": mtype,
                            "width": int(w),
                            "height": int(h),
                            "ink_ratio": None,
                            "mean_intensity": None,
                            "skew_deg": None,
                            "status": f"stub: {exc}",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=(
                    "media_ref media_type width height ink_ratio "
                    "mean_intensity skew_deg status".split()
                ),
            )

    return media.mapInPandas(run, schema=FEATURE_DDL)


def sample_frames(content: bytes, media_type: str, every_n: int = 10):
    """STUB: video frame sampling needs a decoder (ffmpeg/av) — not in
    this container. Plumbing contract: binary → list of frame ndarrays."""
    raise NotImplementedError("video decode requires av/ffmpeg")


def decode_audio(content: bytes, media_type: str):
    """STUB: audio decode (soundfile/librosa) not in this container."""
    raise NotImplementedError("audio decode requires soundfile/librosa")
