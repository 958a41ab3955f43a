"""Line-image preprocessing: the per-media-span map chain.

Pure-numpy re-derivation of the reference's image processors (no cv2 in
this container; resampling/blur kernels are standard algorithms, results
are deterministic and golden-tested against our own pinned fixtures):

* to_uint8 / to_float32            reference: calamari_ocr/utils/image.py:77-120
* DataRange (gray collapse)        reference: imageprocessors/data_range_normalizer.py:20-30
* scale_to_h (area down / bilinear up)  reference: scale_to_height_processor.py:35-53
* CenterNormalizer (dewarp+scale)  reference: center_normalizer.py:42-153
* FinalPreparation (norm/invert/transpose/pad)  reference: final_preparation.py:27-81
* line validity filter             reference: preparesample.py:32-67

The whole chain runs per image inside an Arrow-batched pandas UDF; each
processor also records the inverse-transform metadata consumed by
``calamari_spark.operators.vote.make_out_to_in``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

DEFAULT_LINE_HEIGHT = 48
DEFAULT_PAD = 16


# ---------------------------------------------------------------------------
# dtype conversions (reference: utils/image.py:77-120)
# ---------------------------------------------------------------------------

def to_uint8(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.uint8:
        return data
    if data.dtype == np.int8:
        return (data.astype("int16") + 128).astype("uint8")
    if data.dtype == np.uint16:
        return (data / 256).astype("uint8")
    if data.dtype == np.int16:
        return ((data / 128).astype("int16") + 128).astype("uint8")
    if data.dtype in (np.float32, np.float64):
        return (data * 255).astype("uint8")
    if data.dtype == bool:
        return data.astype("uint8") * 255
    raise ValueError(f"Unknown image dtype {data.dtype}")


def to_float32(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.uint8:
        return data.astype("float32") / 255
    if data.dtype in (np.float32, np.float64):
        return data.astype("float32")
    if data.dtype == bool:
        return data.astype("float32")
    return to_float32(to_uint8(data))


# ---------------------------------------------------------------------------
# resampling (reference: scale_to_height_processor.py:35-53)
# ---------------------------------------------------------------------------

def _resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    f = img.astype(np.float64)
    out = (
        f[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + f[np.ix_(y1, x0)] * fy * (1 - fx)
        + f[np.ix_(y0, x1)] * (1 - fy) * fx
        + f[np.ix_(y1, x1)] * fy * fx
    )
    return out


def _resize_area(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Box-average downsampling (cv2 INTER_AREA semantics): each output
    pixel averages the exactly-covered input box (fractional edges
    weighted)."""
    h, w = img.shape[:2]
    f = img.astype(np.float64)

    def axis_weights(n_in: int, n_out: int) -> np.ndarray:
        scale = n_in / n_out
        m = np.zeros((n_out, n_in))
        for o in range(n_out):
            lo, hi = o * scale, (o + 1) * scale
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, n_in)):
                m[o, i] = min(hi, i + 1) - max(lo, i)
        m /= m.sum(axis=1, keepdims=True)
        return m

    wy = axis_weights(h, oh)
    wx = axis_weights(w, ow)
    return wy @ f @ wx.T


def scale_to_h_dims(h: int, w: int, target_height: int) -> tuple:
    """(height, width) scale_to_h would produce, WITHOUT resampling any
    pixels — the single geometry definition shared by scale_to_h and the
    dimension-only consumers (x_image_stats needs the resize geometry of
    every line but discards the pixels; resampling them was pure waste,
    ~4 ms/line). Python round() = round-half-even, same as the oracle."""
    if h == target_height:
        return h, w
    if h == 0 or w == 0:
        return target_height, w
    return target_height, max(int(round((target_height / h) * w)), 1)


def scale_to_h(img: np.ndarray, target_height: int) -> np.ndarray:
    """Resize keeping aspect; area interpolation down, bilinear up
    (reference: scale_to_height_processor.py:35-53)."""
    assert img.dtype == np.uint8
    h, w = img.shape[:2]
    if h == target_height:
        return img
    if h == 0 or img.size == 0:
        return np.zeros((target_height, w) + img.shape[2:], dtype=img.dtype)
    scale = target_height / h
    _, target_width = scale_to_h_dims(h, w, target_height)
    if scale <= 1:
        out = _resize_area(img, target_height, target_width)
    else:
        out = _resize_bilinear(img, target_height, target_width)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# separable filters
# ---------------------------------------------------------------------------

def _gauss_kernel(sigma: float, size: int | None = None) -> np.ndarray:
    if size is None:
        size = 2 * int(np.ceil(4.0 * sigma)) + 1
    r = size // 2
    x = np.arange(-r, size - r)
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    return k / k.sum()


def _conv1d(arr: np.ndarray, kernel: np.ndarray, axis: int, mode: str) -> np.ndarray:
    """1-D correlation along ``axis`` with 'constant' (zero) or 'reflect'
    border handling. Vectorized: sliding windows along the axis reduce to
    one matvec over the window dimension (no per-slice Python loop)."""
    r = len(kernel) // 2
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (r, len(kernel) - 1 - r)
    padded = np.pad(arr, pad, mode="reflect" if mode == "reflect" else "constant")
    win = np.lib.stride_tricks.sliding_window_view(padded, len(kernel), axis=axis)
    out = win @ kernel  # correlation: sum_j v[i+j] * k[j]
    return np.moveaxis(out, -1, axis) if out.ndim != arr.ndim else out


def gaussian_blur(img: np.ndarray, sigma_x: float, sigma_y: float) -> np.ndarray:
    out = img.astype(np.float64)
    if sigma_y > 0:
        out = _conv1d(out, _gauss_kernel(sigma_y), axis=0, mode="constant")
    if sigma_x > 0:
        out = _conv1d(out, _gauss_kernel(sigma_x), axis=1, mode="constant")
    return out


def _box1d(arr: np.ndarray, taps: int, axis: int) -> np.ndarray:
    """Zero-border moving average along ``axis`` via cumulative sums —
    O(n) regardless of window width (box kernels here are image-sized)."""
    r = taps // 2
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (r + 1, taps - 1 - r)
    padded = np.pad(arr, pad, mode="constant")
    cs = np.cumsum(padded, axis=axis)
    hi = np.take(cs, np.arange(taps, taps + arr.shape[axis]), axis=axis)
    lo = np.take(cs, np.arange(arr.shape[axis]), axis=axis)
    return (hi - lo) / taps


def box_blur(img: np.ndarray, ksize: Tuple[int, int]) -> np.ndarray:
    """Box filter with zero border; ksize=(width, height)."""
    kw, kh = max(1, ksize[0]), max(1, ksize[1])
    out = img.astype(np.float64)
    out = _box1d(out, kh, axis=0)
    out = _box1d(out, kw, axis=1)
    return out


# ---------------------------------------------------------------------------
# DataRange (reference: data_range_normalizer.py:20-30)
# ---------------------------------------------------------------------------

def data_range(img: np.ndarray, meta: Dict) -> np.ndarray:
    img = to_uint8(img)
    if img.ndim == 3:
        img = np.mean(img.astype("float32"), axis=2).astype(np.uint8)
    meta["line_width"] = img.shape[1]
    return img


# ---------------------------------------------------------------------------
# CenterNormalizer (reference: center_normalizer.py:26-153)
# ---------------------------------------------------------------------------

class CenterNormalizer:
    def __init__(self, line_height: int = DEFAULT_LINE_HEIGHT,
                 extra_params: Tuple[float, float, float] = (4, 1.0, 0.3)):
        self.target_height = line_height
        self.range, self.smoothness, self.extra = extra_params

    def measure(self, line: np.ndarray) -> Tuple[np.ndarray, int]:
        """Column-wise text-center curve + half-band radius
        (reference: center_normalizer.py:42-61)."""
        h, w = line.shape
        smoothed = gaussian_blur(line, sigma_x=h * self.smoothness, sigma_y=h * 0.5)
        smoothed = smoothed + 0.001 * box_blur(smoothed, (w, int(h * 0.5)))
        a = np.argmax(smoothed, axis=0).astype(np.float64)
        kernel = _gauss_kernel(h * self.extra, int(8.0 * h * self.extra) + 1)
        center = _conv1d(a[None, :], kernel, axis=1, mode="reflect")[0]
        center = np.rint(center).astype(int)
        deltas = np.abs(np.arange(h)[:, None] - center[None, :])
        ink = line != 0
        mad = float(np.mean(deltas[ink])) if ink.any() else 1.0
        r = int(1 + self.range * mad)
        return center, r

    def dewarp(self, img: np.ndarray, cval: int = 0) -> np.ndarray:
        """Extract the 2r-band following the center curve
        (reference: center_normalizer.py:63-109)."""
        if img.size == 0:
            return img
        temp = (img / 255).astype(np.float32) if img.ndim == 2 else np.mean(img, axis=-1)
        temp = np.amax(temp) - temp
        amax = np.amax(temp)
        if amax == 0:  # blank image
            return (temp * 255).astype(np.uint8)
        inverted = temp / amax
        center, r = self.measure(inverted)
        hpad = r
        padded = np.pad(img, ((hpad, hpad), (0, 0)), mode="constant", constant_values=cval)
        center = np.clip(center + hpad - r, 0, padded.shape[0] - 2 * r)
        cols = [padded[c : c + 2 * r, i] for i, c in enumerate(center)]
        return np.swapaxes(np.array(cols, dtype=np.uint8), 1, 0)

    def normalize(self, img: np.ndarray, meta: Dict) -> np.ndarray:
        """Dewarp + scale to line_height; records (m1, m2, t)
        (reference: center_normalizer.py:111-153)."""
        intermediate = int(self.target_height * 1.5)
        m1 = 1.0
        if intermediate < img.shape[0]:
            m1 = intermediate / img.shape[0]
            img = scale_to_h(img, intermediate)
        cval = int(np.amax(img)) if img.size else 1
        dewarped = self.dewarp(img, cval=cval)
        t = dewarped.shape[0] - img.shape[0]
        scaled = scale_to_h(dewarped, self.target_height)
        m2 = scaled.shape[1] / dewarped.shape[1] if dewarped.size else 1.0
        meta["m1"], meta["m2"], meta["t"] = m1, m2, t
        return scaled


# ---------------------------------------------------------------------------
# FinalPreparation (reference: final_preparation.py:27-81)
# ---------------------------------------------------------------------------

def final_preparation(img: np.ndarray, meta: Dict, pad: int = DEFAULT_PAD,
                      pad_value: int = 0, normalize: bool = True,
                      invert: bool = True, transpose: bool = True) -> np.ndarray:
    """float32 -> normalize by max -> invert -> transpose to (W,H) -> pad
    ``pad`` zero frames on both time ends -> uint8."""
    data = to_float32(img)
    if data.size > 0:
        if normalize:
            amax = np.amax(data)
            if amax > 0:
                data = data / amax
        if invert:
            data = np.amax(data) - data
    if transpose:
        data = np.swapaxes(data, 1, 0)
    if pad > 0:
        w = data.shape[1]
        data = np.vstack(
            [np.full((pad, w), pad_value, dtype=data.dtype), data,
             np.full((pad, w), pad_value, dtype=data.dtype)]
        )
        meta["padded_width"] = data.shape[0]
    meta["pad"] = pad
    return to_uint8(data)


# ---------------------------------------------------------------------------
# full chain + validity
# ---------------------------------------------------------------------------

def preprocess_line(img: np.ndarray, line_height: int = DEFAULT_LINE_HEIGHT,
                    pad: int = DEFAULT_PAD) -> Tuple[np.ndarray, Dict]:
    """DataRange -> CenterNormalizer -> FinalPreparation; returns
    (time-major uint8 array [W_padded, line_height], inverse-transform meta)
    — the default chain (reference: default_image_processors.py:17-21)."""
    meta: Dict = {}
    img = data_range(img, meta)
    if img.size == 0 or img.shape[0] == 0 or img.shape[1] == 0:
        # degenerate input: empty time axis, still well-formed
        meta.update({"m1": 1.0, "m2": 1.0, "t": 0})
        out = np.zeros((2 * pad, line_height), dtype=np.uint8)
        meta["padded_width"] = out.shape[0]
        meta["pad"] = pad
        return out, meta
    img = CenterNormalizer(line_height).normalize(img, meta)
    out = final_preparation(img, meta, pad=pad)
    return out, meta


def is_valid_line(text_labels, downscaled_len: int, full_len: int,
                  max_line_width: int = 4096) -> bool:
    """Training/eval validity filter (reference: preparesample.py:32-67):
    too-wide lines, empty GT, and CTC-infeasible lines are rejected."""
    if max_line_width > 0 and full_len > max_line_width:
        return False
    if len(text_labels) == 0:
        return False
    required_blanks = 0
    last = -1
    for c in text_labels:
        if last == c:
            required_blanks += 1
        last = c
    return len(text_labels) + required_blanks <= downscaled_len
