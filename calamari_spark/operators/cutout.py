"""Line cutout from page images: BOX / POLYGON / MBR modes with optional
rotation — pure-numpy re-derivation of the reference's cv2-based cutout
(reference: calamari_ocr/ocr/dataset/datareader/pagexml/reader.py:283-391,
orientation plumbing :128-145 and :660-676). Steps, in reference order:

1. parse + scale polygon coords, crop the enclosing bounding box,
2. auto-guess the skew angle from the min-area rectangle when requested,
3. ``cval`` defaults to the max pixel (page background is white),
4. rotate the crop clockwise by ``angle`` (bilinear, constant border),
   transforming the polygon with the same matrix,
5. POLYGON/MBR: mask pixels outside the polygon with ``cval``,
6. final crop to the (possibly rotated) polygon's bounding box.

cv2 is absent in this environment, so rotation (inverse-mapped bilinear
warp), polygon fill (even-odd scanline on pixel centers), and min-area-rect
(convex hull + rotating calipers) are implemented directly on numpy —
the math matches the cv2 calls the reference makes; pixel-exact parity at
polygon edges is not guaranteed (different rasterization conventions) and
not required by any reference test.
"""

from __future__ import annotations

import math
from enum import IntEnum
from typing import List, Tuple

import numpy as np


class CutMode(IntEnum):
    BOX = 0
    POLYGON = 1
    MBR = 2


def parse_coords(coordstring: str, scale: float = 1.0) -> np.ndarray:
    """PAGE 'x1,y1 x2,y2 ...' -> int array of (x, y) points, scaled."""
    pts = []
    for p in coordstring.split():
        if "," not in p:
            continue
        x, y = p.split(",")[:2]
        pts.append((int(scale * int(x)), int(scale * int(y))))
    return np.array(pts, dtype=np.int64).reshape(-1, 2)


# ---------------------------------------------------------------------------
# geometry primitives (numpy stand-ins for the cv2 calls)
# ---------------------------------------------------------------------------

def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; pts (N,2) float, returns hull CCW."""
    p = np.unique(pts.astype(np.float64), axis=0)
    p = p[np.lexsort((p[:, 1], p[:, 0]))]
    if len(p) <= 2:
        return p

    def half(points):
        out: List[np.ndarray] = []
        for q in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect_angle(pts: np.ndarray) -> float:
    """Rotating-calipers: the edge angle (degrees, normalized to [0, 90))
    of the minimum-area enclosing rectangle — the quantity the reference
    extracts from cv.minAreaRect(...)[2] for auto-deskew."""
    hull = _convex_hull(pts)
    if len(hull) < 3:
        if len(hull) == 2:
            dx, dy = hull[1] - hull[0]
            return math.degrees(math.atan2(dy, dx)) % 90.0
        return 0.0
    best_area, best_angle = None, 0.0
    for i in range(len(hull)):
        dx, dy = hull[(i + 1) % len(hull)] - hull[i]
        theta = math.atan2(dy, dx)
        c, s = math.cos(-theta), math.sin(-theta)
        rot = hull @ np.array([[c, -s], [s, c]]).T
        area = np.ptp(rot[:, 0]) * np.ptp(rot[:, 1])
        if best_area is None or area < best_area:
            best_area = area
            best_angle = math.degrees(theta) % 90.0
    return best_angle


def min_area_rect_points(pts: np.ndarray) -> np.ndarray:
    """The 4 corner points of the minimum-area enclosing rectangle
    (cv.boxPoints(cv.minAreaRect(...)) analog), int-rounded."""
    hull = _convex_hull(pts)
    if len(hull) < 3:
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.int64)
    best = None
    for i in range(len(hull)):
        dx, dy = hull[(i + 1) % len(hull)] - hull[i]
        theta = math.atan2(dy, dx)
        c, s = math.cos(-theta), math.sin(-theta)
        R = np.array([[c, -s], [s, c]])
        rot = hull @ R.T
        x0, y0 = rot.min(axis=0)
        x1, y1 = rot.max(axis=0)
        area = (x1 - x0) * (y1 - y0)
        if best is None or area < best[0]:
            corners = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]) @ R
            best = (area, corners)
    return np.rint(best[1]).astype(np.int64)


def _rotation_matrix(center: Tuple[float, float], angle_cw_deg: float) -> np.ndarray:
    """cv.getRotationMatrix2D(center, -angle, 1.0) equivalent: 2x3 forward
    affine rotating points by angle_cw_deg CLOCKWISE about center."""
    theta = math.radians(-angle_cw_deg)
    a, b = math.cos(theta), math.sin(theta)
    cx, cy = center
    return np.array(
        [
            [a, b, (1 - a) * cx - b * cy],
            [-b, a, b * cx + (1 - a) * cy],
        ]
    )


def _warp_affine(img: np.ndarray, M: np.ndarray, out_w: int, out_h: int, cval: float) -> np.ndarray:
    """Bilinear warp (cv.warpAffine, BORDER_CONSTANT): each destination
    pixel samples the source at the inverse transform, vectorized."""
    Mi = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
    ys, xs = np.mgrid[0:out_h, 0:out_w]
    sx = Mi[0, 0] * xs + Mi[0, 1] * ys + Mi[0, 2]
    sy = Mi[1, 0] * xs + Mi[1, 1] * ys + Mi[1, 2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = sx - x0, sy - y0
    h, w = img.shape[:2]
    srcf = img.astype(np.float64)

    def sample(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = np.full(yy.shape, float(cval))
        v[inside] = srcf[yy[inside], xx[inside]]
        return v

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(img.dtype)
    return out.astype(img.dtype)


def fill_poly_mask(shape: Tuple[int, int], pts: np.ndarray) -> np.ndarray:
    """Boolean mask of pixels inside the polygon (even-odd rule on pixel
    centers), edges included — the cv.fillPoly analog."""
    h, w = shape
    mask = np.zeros((h, w), dtype=bool)
    if len(pts) < 3:
        return mask
    px = pts[:, 0].astype(np.float64)
    py = pts[:, 1].astype(np.float64)
    n = len(pts)
    ys = np.arange(h) + 0.0
    for i in range(n):
        x1, y1 = px[i], py[i]
        x2, y2 = px[(i + 1) % n], py[(i + 1) % n]
        if y1 == y2:
            continue
        ylo, yhi = (y1, y2) if y1 < y2 else (y2, y1)
        rows = (ys >= ylo) & (ys < yhi)
        xi = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
        # crossing at column >= ceil(xi): toggle parity from there rightward
        cols = np.ceil(xi).astype(np.int64)
        for r in np.flatnonzero(rows):
            c = cols[r]
            if c < w:
                mask[r, max(0, c):] ^= True
            # c >= w: crossing right of the image, no pixels toggle
    # include boundary pixels (fillPoly paints the outline too)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        steps = int(max(abs(x2 - x1), abs(y2 - y1))) + 1
        xs = np.rint(np.linspace(x1, x2, steps)).astype(np.int64)
        ys_ = np.rint(np.linspace(y1, y2, steps)).astype(np.int64)
        ok = (xs >= 0) & (xs < w) & (ys_ >= 0) & (ys_ < h)
        mask[ys_[ok], xs[ok]] = True
    return mask


# ---------------------------------------------------------------------------
# the cutout (reference: reader.py:283-391)
# ---------------------------------------------------------------------------

def cutout(
    pageimg: np.ndarray,
    coordstring: str,
    mode: CutMode = CutMode.POLYGON,
    angle: float | None = 0,
    max_auto_angle: float = 0,
    cval: float | None = None,
    scale: float = 1,
) -> np.ndarray:
    """Cut a line region from a (grayscale 2-D) page image.

    angle: clockwise degrees; None -> guess from the min-area rectangle up
    to max_auto_angle. cval: fill/mask value; None -> max pixel (white)."""
    pts = parse_coords(coordstring, scale=scale)
    if len(pts) == 0:
        return pageimg[0:0, 0:0]
    min_x, min_y = pts.min(axis=0)
    max_x, max_y = pts.max(axis=0)
    # clamp the crop origin to the page AND shift the polygon by the SAME
    # clamped origin — a polygon with negative coords otherwise masks at a
    # displaced offset
    org_x, org_y = max(0, int(min_x)), max(0, int(min_y))
    cut = pageimg[org_y : max_y + 1, org_x : max_x + 1]
    if cut.size == 0:
        return cut
    pts = pts - (org_x, org_y)

    if angle is None:
        if max_auto_angle > 0:
            a = min_area_rect_angle(pts)
            angle = a - 90 if a > 45 else a
            if abs(angle) > max_auto_angle:
                angle = 0
        else:
            angle = 0

    if cval is None:
        cval = np.amax(cut).item()

    if angle:
        h, w = cut.shape[:2]
        cx, cy = w // 2, h // 2
        M = _rotation_matrix((cx, cy), angle)
        cos_a, sin_a = abs(M[0, 0]), abs(M[0, 1])
        new_w = int(np.ceil(h * sin_a + w * cos_a))
        new_h = int(np.ceil(h * cos_a + w * sin_a))
        M[0, 2] += new_w / 2 - cx
        M[1, 2] += new_h / 2 - cy
        pts = np.rint(pts @ M[:, :2].T + M[:, 2]).astype(np.int64)
        cut = _warp_affine(cut, M, new_w, new_h, cval)

    if mode is CutMode.MBR:
        pts = min_area_rect_points(pts)

    if mode in (CutMode.POLYGON, CutMode.MBR):
        mask = fill_poly_mask(cut.shape[:2], pts)
        cut = np.where(mask, cut, np.asarray(cval, dtype=cut.dtype))

    fx0, fy0 = pts.min(axis=0)
    fx1, fy1 = pts.max(axis=0)
    return cut[max(0, fy0) : fy1 + 1, max(0, fx0) : fx1 + 1]
