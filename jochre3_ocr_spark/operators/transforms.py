"""Image transforms — the preprocessing stage (SURVEY.md §2.2).

numpy reimplementations of the reference's OpenCV operators
(core/transform/*.scala, core/utils/ImageUtils.scala). The container has
no OpenCV/PIL, so:

* grayscale / brightness-contrast / resize / crop / pad are exact
  numpy ports of the cv2 semantics the reference uses;
* deskew estimates the skew angle from the second-order moments of ink
  pixels per connected row-band, replacing the reference's
  contour→minAreaRect→median→inlier-mean chain
  (core/transform/Deskewer.scala:25-217) with an equivalent
  statistical estimator — pinned by a tolerance test like the
  reference's DeskewerTest (−1.09 ± 0.1°);
* media payloads travel as ``binary`` columns using the .npy codec as
  the deterministic stand-in for PNG (real deployments swap in
  cv2.imdecode inside the same pandas-UDF slots).

Each transform is a Series→Series pandas-UDF kernel over image-bytes
columns; aux outputs (skew angle, scale) become extra columns threaded
through the pipeline (Jochre.scala:318-342).
"""

from __future__ import annotations

import io
import math

import numpy as np

# ----------------------------------------------------------- media codec
def encode_image(img: np.ndarray) -> bytes:
    """Deterministic binary codec (.npy) — the sandbox stand-in for PNG."""
    buf = io.BytesIO()
    np.save(buf, img, allow_pickle=False)
    return buf.getvalue()


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes: real PNG / baseline JPEG via the
    pure-stdlib codecs (sources/png_codec.py, sources/jpeg_codec.py),
    else the .npy codec."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from jochre3_ocr_spark.sources.png_codec import decode_png as _png

        return _png(bytes(data))
    if data[:2] == b"\xff\xd8":
        from jochre3_ocr_spark.sources.jpeg_codec import decode_jpeg as _jpg

        return _jpg(bytes(data))
    return np.load(io.BytesIO(data), allow_pickle=False)


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode (ImageUtils.loadImage analog, ImageUtils.scala:22)
    — pure zlib+numpy, no imaging library (sources/png_codec.py).
    8-bit grey/RGB/palette/alpha, non-interlaced."""
    from jochre3_ocr_spark.sources.png_codec import decode_png as _png

    return _png(bytes(data))


# ----------------------------------------------------------- transforms
def grayscale(img: np.ndarray) -> np.ndarray:
    """GrayscaleTransform (core/transform/GrayscaleTransform.scala:5-9;
    impl ImageUtils.scala:101-111): BGR → gray, cv2 weights."""
    if img.ndim == 2:
        return img
    b = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    r = img[..., 2].astype(np.float64)
    return np.clip(np.rint(0.114 * b + 0.587 * g + 0.299 * r), 0, 255).astype(
        np.uint8
    )


def brightness_contrast(
    img: np.ndarray, alpha: float = 1.8, beta: float = 20.0
) -> np.ndarray:
    """BrightnessAndContrastTransform (core/transform/...:6-10; defaults
    from reference.conf:14-16): dst = saturate(α·src + β)."""
    return np.clip(np.rint(alpha * img.astype(np.float64) + beta), 0, 255).astype(
        np.uint8
    )


def resize_keep_aspect(
    img: np.ndarray, max_w: int, max_h: int
) -> tuple[np.ndarray, float]:
    """ResizeImageAndKeepAspectRatio (core/transform/...:7-48): downscale
    to fit, return (image, scale); scale later un-applied to coordinates
    (Jochre.scala:388)."""
    h, w = img.shape[:2]
    scale = min(max_w / w, max_h / h, 1.0)
    if scale >= 1.0:
        return img, 1.0
    new_h, new_w = max(1, int(h * scale)), max(1, int(w * scale))
    rows = (np.arange(new_h) / scale).astype(int).clip(0, h - 1)
    cols = (np.arange(new_w) / scale).astype(int).clip(0, w - 1)
    return img[np.ix_(rows, cols)], scale


def crop(img: np.ndarray, box) -> np.ndarray:
    """ImageUtils.crop (:139-147) — clamped to image bounds."""
    left, top, width, height = box
    h, w = img.shape[:2]
    left, top = max(0, left), max(0, top)
    return img[top : min(top + height, h), left : min(left + width, w)]


def pad_to_square(img: np.ndarray, dim: int, fill: int = 255) -> np.ndarray:
    """BoxTransform (core/transform/BoxTransform.scala:6-29):
    copyMakeBorder to a fixed square."""
    h, w = img.shape[:2]
    out = np.full((dim, dim), fill, dtype=img.dtype)
    top = (dim - h) // 2
    left = (dim - w) // 2
    out[top : top + h, left : left + w] = img[: dim, : dim]
    return out


def rotate_image(img: np.ndarray, angle_deg: float, fill: int = 255) -> np.ndarray:
    """ImageUtils rotation (:28-46): rotate about the center,
    nearest-neighbor (numpy warpAffine equivalent). Sign follows
    OpenCV getRotationMatrix2D: positive = counter-clockwise on screen
    (y-down image coords) — so unrotate(a) = rotate(−a) straightens a
    page whose Deskewer angle is a, matching the golden's −1.09°."""
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = math.radians(-angle_deg)
    cos_t, sin_t = math.cos(theta), math.sin(theta)
    ys, xs = np.mgrid[0:h, 0:w]
    # inverse mapping: source coords for each destination pixel
    sx = cos_t * (xs - cx) + sin_t * (ys - cy) + cx
    sy = -sin_t * (xs - cx) + cos_t * (ys - cy) + cy
    sxi = np.rint(sx).astype(int)
    syi = np.rint(sy).astype(int)
    valid = (sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h)
    out = np.full_like(img, fill)
    out[valid] = img[syi[valid], sxi[valid]]
    return out


def estimate_skew(img: np.ndarray, ink_threshold: int = 128) -> float | None:
    """Skew estimate in degrees (positive = counter-clockwise text).

    Replaces Deskewer.getSkewAngle (Deskewer.scala:25-217): instead of
    Otsu+dilate+contours+minAreaRect, fit the dominant orientation of
    each text band via second-order moments, then median → ±1° inliers
    → mean (the reference's consensus step, :183-216)."""
    gray = grayscale(img)
    ink = gray < ink_threshold
    if not ink.any():
        return None
    # split into connected row-bands (text lines) by ink-row runs
    row_has_ink = ink.any(axis=1)
    angles = []
    start = None
    for y, has in enumerate(list(row_has_ink) + [False]):
        if has and start is None:
            start = y
        elif not has and start is not None:
            band = ink[start:y]
            ys, xs = np.nonzero(band)
            if len(xs) > 50 and xs.ptp() > 4 * (ys.ptp() + 1):
                x = xs - xs.mean()
                yv = ys - ys.mean()
                mu11 = float((x * yv).sum())
                mu20 = float((x * x).sum())
                mu02 = float((yv * yv).sum())
                angle = 0.5 * math.atan2(2 * mu11, mu20 - mu02)
                # negate: image y is down, and the Deskewer convention
                # (golden −1.09°) reports the angle whose unrotate()
                # straightens the page
                angles.append(-math.degrees(angle))
            start = None
    if not angles:
        return None
    angles = np.array(angles)
    med = float(np.median(angles))
    inliers = angles[np.abs(angles - med) <= 1.0]
    return float(inliers.mean()) if len(inliers) else med


def deskew(img: np.ndarray, angle: float | None = None) -> tuple[np.ndarray, float]:
    """Deskewer.deskew: un-rotate by the estimated angle; the angle is
    emitted so coordinates can be rotated back (Jochre.scala:327-334)."""
    if angle is None:
        angle = estimate_skew(img) or 0.0
    return rotate_image(img, -angle), angle


def draw_boxes(
    img: np.ndarray, boxes, value: int = 0, thickness: int = 2
) -> np.ndarray:
    """Debug-image sink (Page.draw / TextBlock.draw analog,
    core/model/Page.scala:152-154, TextBlock.scala:76-90): draw box
    outlines into a grayscale image copy."""
    out = img.copy()
    h, w = out.shape[:2]
    for left, top, bw, bh in boxes:
        r, b = min(left + bw, w - 1), min(top + bh, h - 1)
        left, top = max(left, 0), max(top, 0)
        out[top : top + thickness, left:r] = value
        out[max(b - thickness, 0) : b, left:r] = value
        out[top:b, left : left + thickness] = value
        out[top:b, max(r - thickness, 0) : r] = value
    return out
