"""Contour-based skew estimation — numpy reimplementation of the
reference's full Deskewer chain (core/transform/Deskewer.scala:25-217):

    resize long-side 1000 (INTER_AREA)  → Gaussian blur 9×9 (σ auto)
    → Otsu threshold (BINARY_INV)       → dilate 10×3 rect, 3 iterations
    → contours by decreasing area       → top min(10, ceil(n/2))
    → drop rects ≥50%-contained in a bigger one
    → per-rect corrected angle (round HALF_UP 2dp, fold into (−45,45])
    → median → ±1° inliers → mean

Pinned against the reference's golden: nybc200089_0011.png → −1.09 ± 0.1°
(core/src/test/scala/.../transform/DeskewerTest.scala:10-17), decoded in
place via sources/png_codec (no imaging library needed).

Contours are realised as 8-connected components via run-length union-find
(RETR_LIST's hole contours are smaller and are removed by the containment
filter, so outer components suffice); minAreaRect is rotating calipers
over the monotone-chain convex hull. All array math, no per-pixel Python
in the hot loops except the run merge.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

MAX_CONTOURS = 10  # reference.conf:21 max-contours-for-calculation


# --------------------------------------------------------------- resize
def resize_area_keep_aspect(
    img: np.ndarray, max_w: int = 1000, max_h: int = 1000
) -> np.ndarray:
    """ResizeImageAndKeepAspectRatio (transform/ResizeImageAndKeepAspectRatio
    .scala:10-47) with INTER_AREA: exact fractional box averaging via a
    bilinear-sampled integral image (the integral of a piecewise-constant
    image is exactly bilinear between grid points)."""
    h, w = img.shape[:2]
    width_ratio = w / max_w
    height_ratio = h / max_h
    scale = max(width_ratio, height_ratio)
    if scale <= 1.0:
        return img
    if height_ratio > width_ratio:
        out_h, out_w = max_h, int(w / height_ratio)
    else:
        out_h, out_w = int(h / width_ratio), max_w

    # Fast path: integer power-of-two box size on an integer-typed image
    # (e.g. the 1280→640 prediction resize). Every 2^k-pixel block sum is
    # an exact float64 integer and the /2^k division is exact, so the
    # plain reshape-mean is BIT-IDENTICAL to the cumsum construction
    # below (whose interpolation weights are all 0/1 at integer edges and
    # whose float64 partial sums are exact for the same reason) — but
    # ~30× cheaper: no (n+1)×w float64 cumsum materialization per axis.
    # Non-power-of-two ratios stay on the general path: 1/s is then not
    # exactly representable and the two association orders could differ
    # in the last ulp.
    if (
        np.issubdtype(img.dtype, np.integer)
        and h % out_h == 0
        and w % out_w == 0
    ):
        sh, sw = h // out_h, w // out_w
        if sh == sw and sh >= 2 and sh & (sh - 1) == 0 and img.dtype == np.uint8:
            s2 = sh * sw
            # block sums by repeated 2×2 pairwise halving (strided adds
            # beat a reshape-sum ~6× here); every partial sum is an exact
            # integer, associativity-free
            acc = img[0::2, :].astype(np.uint16) + img[1::2, :]
            acc = acc[:, 0::2] + acc[:, 1::2]
            if sh > 2:
                acc = acc.astype(np.uint32)
                while acc.shape[0] > out_h:
                    acc = acc[0::2, :] + acc[1::2, :]
                    acc = acc[:, 0::2] + acc[:, 1::2]
            # np.rint semantics = round-half-to-EVEN on the exact
            # sum/s² value (both exactly representable in float64)
            q, r = acc >> (2 * sh.bit_length() - 2), acc & (s2 - 1)
            half = s2 >> 1
            q += ((r > half) | ((r == half) & (q & 1 == 1))).astype(q.dtype)
            return np.minimum(q, 255).astype(np.uint8)

    def box_reduce_axis0(arr: np.ndarray, out_n: int) -> np.ndarray:
        """Fractional box average along axis 0 via a 1D cumulative sum
        (the cumsum of a piecewise-constant density is exactly linear
        between grid points, so linear interpolation is exact). float64
        accumulator: a 5400-row sum of uint8 stays exactly representable."""
        n = arr.shape[0]
        cum = np.empty((n + 1,) + arr.shape[1:], dtype=np.float64)
        cum[0] = 0.0
        np.cumsum(arr, axis=0, dtype=np.float64, out=cum[1:])
        s = n / out_n
        edges = np.minimum(np.arange(out_n + 1) * s, n)
        i0 = np.minimum(np.floor(edges).astype(np.int64), n - 1)
        frac = edges - i0
        shape = (out_n + 1,) + (1,) * (arr.ndim - 1)
        vals = cum[i0] + (cum[i0 + 1] - cum[i0]) * frac.reshape(shape)
        widths = (edges[1:] - edges[:-1]).reshape((out_n,) + (1,) * (arr.ndim - 1))
        return (vals[1:] - vals[:-1]) / widths

    out = box_reduce_axis0(img, out_h)
    out = box_reduce_axis0(np.ascontiguousarray(out.swapaxes(0, 1)), out_w)
    return np.clip(np.rint(out.swapaxes(0, 1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- blur
def gaussian_blur(img: np.ndarray, ksize: int = 9) -> np.ndarray:
    """GaussianBlur(ksize×ksize, σ=0): OpenCV auto σ = 0.3·((k−1)/2 − 1)
    + 0.8, BORDER_REFLECT_101, separable."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(img.astype(np.float64), r, mode="reflect")  # REFLECT_101
    # horizontal then vertical
    out = np.zeros_like(pad)
    for i, kv in enumerate(k):
        out[:, r:-r] += kv * pad[:, i : i + img.shape[1]]
    out2 = np.zeros((img.shape[0], img.shape[1]), dtype=np.float64)
    for i, kv in enumerate(k):
        out2 += kv * out[i : i + img.shape[0], r:-r]
    return np.clip(np.rint(out2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- otsu
def otsu_threshold(img: np.ndarray) -> int:
    """Otsu's threshold over the 256-bin histogram (THRESH_OTSU)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    omega = np.cumsum(hist)
    mu = np.cumsum(hist * np.arange(256))
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu * total) ** 2 / (
            omega * (total - omega) * total * total
        )
    sigma_b[~np.isfinite(sigma_b)] = 0.0
    return int(np.argmax(sigma_b))


def threshold_binary_inv(img: np.ndarray, thresh: int) -> np.ndarray:
    """THRESH_BINARY_INV: dst = 0 where src > thresh else 255 → boolean ink."""
    return img <= thresh


# -------------------------------------------------------------- dilate
def dilate_rect(mask: np.ndarray, kw: int = 10, kh: int = 3, iterations: int = 3) -> np.ndarray:
    """Binary dilation with a kw×kh rect kernel, OpenCV default anchor
    (kw//2, kh//2), iterated: pixel (y,x) is set iff any ink in
    [y−it·ay , y+it·(kh−1−ay)] × [x−it·ax , x+it·(kw−1−ax)]
    (Deskewer.scala:73-84: Size(10,3), 3 iterations). Computed as one
    box-sum > 0 via the integral image (iterating a rect dilation equals
    one dilation with the Minkowski-summed rect)."""
    ax, ay = kw // 2, kh // 2
    left = iterations * ax
    right = iterations * (kw - 1 - ax)
    top = iterations * ay
    bottom = iterations * (kh - 1 - ay)
    h, w = mask.shape
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    integ[1:, 1:] = np.cumsum(np.cumsum(mask.astype(np.int64), axis=0), axis=1)
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - top, 0, h)
    y1 = np.clip(ys + bottom + 1, 0, h)
    x0 = np.clip(xs - left, 0, w)
    x1 = np.clip(xs + right + 1, 0, w)
    s = (
        integ[np.ix_(y1, x1)]
        - integ[np.ix_(y0, x1)]
        - integ[np.ix_(y1, x0)]
        + integ[np.ix_(y0, x0)]
    )
    return s > 0


# -------------------------------------------- connected components (RLE)
def _mask_runs(mask: np.ndarray):
    """Row runs of a boolean mask: arrays (row, x_start, x_end_incl)."""
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=bool)
    padded[:, 1:-1] = mask
    diff = np.diff(padded.astype(np.int8), axis=1)
    sy, sx = np.nonzero(diff == 1)
    ey, ex = np.nonzero(diff == -1)
    # starts and ends are paired in order per row
    return sy, sx, ex - 1  # inclusive end index


class _DSU:
    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, a: int) -> int:
        p = self.parent
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def connected_components_runs(mask: np.ndarray):
    """8-connected components from row runs. Returns a list of
    components, each a list of run indices, plus the run arrays."""
    rows, xs, xe = _mask_runs(mask)
    n = len(rows)
    dsu = _DSU(n)
    if n:
        # runs are sorted by (row, x) and disjoint within a row, so the
        # composite keys row·W + x are globally ascending for both run
        # starts and run ends (W > max x span prevents cross-row
        # aliasing). Two GLOBAL searchsorteds then give, for every run,
        # the window of previous-row runs it 8-touches: first prev run
        # whose end >= xs−1, last prev run whose start <= xe+1. Rows
        # other than r−1 cannot enter the window (their keys sort
        # entirely before/after it). The union SET is exactly the old
        # per-run scan's, and component order is union-order-independent
        # (groups are keyed by first run index below).
        W = int(mask.shape[1]) + 3
        rows_i = rows.astype(np.int64)
        key_start = rows_i * W + xs
        key_end = rows_i * W + xe
        a = (rows_i - 1) * W + (xs - 1)  # prev-row window lower bound
        b = (rows_i - 1) * W + (xe + 1)  # prev-row window upper bound
        lo = np.searchsorted(key_end, a, side="left")
        hi = np.searchsorted(key_start, b, side="right")
        cnts = hi - lo
        m = cnts > 0
        if m.any():
            starts = lo[m]
            cnts = cnts[m]
            ks = np.repeat(np.flatnonzero(m), cnts)
            tot = int(cnts.sum())
            offs = np.cumsum(cnts) - cnts
            qs = (
                np.arange(tot)
                - np.repeat(offs, cnts)
                + np.repeat(starts, cnts)
            )
            union = dsu.union
            for k, q in zip(ks.tolist(), qs.tolist()):
                union(k, q)
    groups: dict[int, list[int]] = {}
    for k in range(n):
        groups.setdefault(dsu.find(k), []).append(k)
    return list(groups.values()), rows, xs, xe


# ------------------------------------------------- hull + min-area rect
def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; points (N,2) float, returns CCW hull."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(pp):
        out = []
        for p in pp:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(tuple(p))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect_angle(hull: np.ndarray) -> tuple[float, tuple]:
    """Rotating calipers over the hull. Returns (angle_deg in (0, 90],
    (cx, cy, w_box, h_box) axis-aligned bounds of the rotated rect) —
    matching the OpenCV ≥4.5 minAreaRect angle convention modulo 90°
    (the reference folds the angle into (−45,45] afterwards, which makes
    the width/height edge choice irrelevant: Deskewer.scala:168-180)."""
    if len(hull) == 1:
        x, y = hull[0]
        return 90.0, (x, y, x, y)
    best = None
    n = len(hull)
    for i in range(n):
        p0 = hull[i]
        p1 = hull[(i + 1) % n]
        d = p1 - p0
        norm = math.hypot(d[0], d[1])
        if norm == 0:
            continue
        ux, uy = d[0] / norm, d[1] / norm
        # rotate all points into the edge frame
        proj_x = hull[:, 0] * ux + hull[:, 1] * uy
        proj_y = -hull[:, 0] * uy + hull[:, 1] * ux
        w_box = proj_x.max() - proj_x.min()
        h_box = proj_y.max() - proj_y.min()
        area = w_box * h_box
        if best is None or area < best[0]:
            theta = math.degrees(math.atan2(uy, ux))
            best = (area, theta, proj_x.min(), proj_x.max(), proj_y.min(), proj_y.max(), ux, uy)
    area, theta, px0, px1, py0, py1, ux, uy = best
    # fold the edge angle into (0, 90]
    a = theta % 90.0
    if a == 0.0:
        a = 90.0
    # axis-aligned bounding box of the rotated rect corners
    corners = []
    for cx in (px0, px1):
        for cy in (py0, py1):
            corners.append((cx * ux - cy * uy, cx * uy + cy * ux))
    corners = np.array(corners)
    bb = (
        corners[:, 0].min(),
        corners[:, 1].min(),
        corners[:, 0].max(),
        corners[:, 1].max(),
    )
    return a, bb


# ------------------------------------------------------------ consensus
def _corrected_angle(opencv_angle: float) -> float:
    """Deskewer.scala:164-180: negate (HALF_UP 2dp) then fold to ±45."""
    a = -float(
        Decimal(repr(opencv_angle)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )
    if a < -45:
        return 90 + a
    if a > 45:
        return 90 - a
    return a


def get_skew_angle(img: np.ndarray, max_contours: int = MAX_CONTOURS) -> float | None:
    """The full Deskewer.getSkewAngle chain (Deskewer.scala:40-217)."""
    if img.ndim == 3:
        img = np.clip(
            np.rint(
                0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
            ),
            0,
            255,
        ).astype(np.uint8)
    resized = resize_area_keep_aspect(img, 1000, 1000)
    blur = gaussian_blur(resized, 9)
    mask = threshold_binary_inv(blur, otsu_threshold(blur))
    dilated = dilate_rect(mask, 10, 3, 3)

    comps, rows, xs, xe = connected_components_runs(dilated)
    if not comps:
        return None

    items = []
    for runs in comps:
        idx = np.array(runs)
        pix_area = int(np.sum(xe[idx] - xs[idx] + 1))
        # hull over run endpoints (hull of a union of horizontal segments
        # equals hull of their endpoints)
        pts = np.concatenate(
            [
                np.stack([xs[idx], rows[idx]], axis=1),
                np.stack([xe[idx], rows[idx]], axis=1),
            ]
        ).astype(np.float64)
        items.append((pix_area, pts))
    items.sort(key=lambda t: -t[0])
    effective_max = min(max_contours, math.ceil(len(items) / 2))
    items = items[:effective_max]

    rects = []
    for area, pts in items:
        hull = convex_hull(pts)
        angle, bb = min_area_rect_angle(hull)
        rects.append((area, angle, bb))

    # drop rects ≥50%-contained (by axis-aligned bounds) in an earlier,
    # bigger rect (Deskewer.scala:139-161)
    def overlap_frac(big, small):
        l = max(big[0], small[0])
        t = max(big[1], small[1])
        r = min(big[2], small[2])
        b = min(big[3], small[3])
        if l >= r or t >= b:
            return 0.0
        s_area = (small[2] - small[0]) * (small[3] - small[1])
        if s_area <= 0:
            return 1.0
        return (r - l) * (b - t) / s_area

    kept = []
    for i, (area, angle, bb) in enumerate(rects):
        contained = any(
            overlap_frac(rects[j][2], bb) > 0.5 for j in range(i)
        )
        if not contained:
            kept.append(_corrected_angle(angle))
    if not kept:
        return None
    kept.sort()
    median = kept[len(kept) // 2]
    inliers = [a for a in kept if median - 1.0 <= a <= median + 1.0]
    return sum(inliers) / len(inliers)
