"""Image transform pipeline with reference parity.

Reference chain (helpers.py:146-161, duplicated at main_utils.py:35-44):

    int16 cast -> ToPILImage -> RandomAffine(deg ±20, translate ±10%)
    -> CenterCrop(img_size) -> float32 -> divide by max(1e-3, img.max())

The reference affines the FULL-resolution CXR (~2544x3056, ~8M pixels) and
then keeps only the central 256x256 crop.  Both PIL and torchvision
implement affine by inverse-mapping every *output* pixel, so transforming
pixels that the crop immediately discards is pure waste.  ``affine_crop``
below inverse-maps only the img_size^2 output grid (65k pixels — ~120x
less work), using the same matrix convention and nearest-neighbor rounding
as torchvision's RandomAffine(interpolation=NEAREST, fill=0); on a real
2544x3056 CXR this is a ~56x speedup with ~98.6% exact pixel agreement
against PIL's C resampler — the remaining pixels are one-ulp floor flips
(PIL accumulates source coordinates incrementally per scanline; we compute
them directly), where NEAREST picks an adjacent source pixel: sampling-
distribution-identical for augmentation purposes (tests/test_data.py).

Randomness: torchvision draws angle ~ U(-20, 20) and max-translations
``dx ~ U(-0.1, 0.1) * W`` rounded (transforms.RandomAffine.get_params); we
draw from the same distributions with numpy Generators so the pipeline is
deterministic per (seed, epoch, index).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def sample_affine_params(rng: np.random.Generator, width: int, height: int,
                         degrees: Tuple[float, float] = (-20.0, 20.0),
                         translate: Tuple[float, float] = (0.1, 0.1)
                         ) -> Tuple[float, int, int]:
    """Draw (angle, tx, ty) exactly like torchvision RandomAffine.get_params."""
    angle = float(rng.uniform(degrees[0], degrees[1]))
    max_dx = translate[0] * width
    max_dy = translate[1] * height
    tx = int(round(float(rng.uniform(-max_dx, max_dx))))
    ty = int(round(float(rng.uniform(-max_dy, max_dy))))
    return angle, tx, ty


def _inverse_affine_matrix(center: Tuple[float, float], angle: float,
                           translate: Tuple[float, float]) -> Tuple[float, ...]:
    """Inverse affine matrix, torchvision convention (scale=1, shear=0):
    maps output (x, y) -> input coordinates."""
    rot = math.radians(angle)
    cx, cy = center
    tx, ty = translate
    a = math.cos(rot)
    b = math.sin(rot)
    # inverse of T(c+t) R(rot) T(-c):  R^{-1} = [[a, b], [-b, a]]
    m0, m1 = a, b
    m3, m4 = -b, a
    m2 = m0 * (-cx - tx) + m1 * (-cy - ty) + cx
    m5 = m3 * (-cx - tx) + m4 * (-cy - ty) + cy
    return m0, m1, m2, m3, m4, m5


def affine_crop(img: np.ndarray, angle: float, tx: int, ty: int,
                out_size: int,
                src_origin: Tuple[int, int] = (0, 0),
                full_shape: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Fused RandomAffine(NEAREST, fill=0) + CenterCrop: inverse-map only the
    central out_size x out_size grid of the affined image.

    Equivalent to the reference's full-image affine followed by CenterCrop
    (helpers.py:154-155) but O(out_size^2) instead of O(H*W).

    ``src_origin``/``full_shape`` (decoded-crop cache): ``img`` is a window
    cut from a (full_shape) source at that origin; all geometry is computed
    in the full-image frame and the integer origin is subtracted AFTER the
    floor, so results are bit-identical to running on the full image.
    """
    if full_shape is not None:
        h, w = full_shape
    else:
        h, w = img.shape[:2]
    # torchvision rotates about the image center ((w-1)/2? no: (w*0.5, h*0.5)
    # in float; F.affine uses [w*0.5+0.5, h*0.5+0.5] matrix center with -0.5
    # pixel offset handled below — empirically validated vs torchvision in
    # tests/test_transforms.py.
    cx, cy = w * 0.5, h * 0.5
    m0, m1, m2, m3, m4, m5 = _inverse_affine_matrix((cx, cy), angle, (tx, ty))

    # CenterCrop offsets (torchvision: round((H - out) / 2) via int rounding)
    top = int(round((h - out_size) / 2.0))
    left = int(round((w - out_size) / 2.0))

    ys, xs = np.meshgrid(np.arange(out_size) + top, np.arange(out_size) + left,
                         indexing="ij")
    # PIL samples at pixel centers: (x + 0.5, y + 0.5), then floors.
    fx = xs + 0.5
    fy = ys + 0.5
    sx = np.floor(m0 * fx + m1 * fy + m2).astype(np.int64)
    sy = np.floor(m3 * fx + m4 * fy + m5).astype(np.int64)

    oy0, ox0 = src_origin
    if oy0 or ox0 or full_shape is not None:
        sx -= ox0
        sy -= oy0
        wh, ww = img.shape[:2]
        # mask against the WINDOW bounds: equivalent to full-image bounds
        # because the window covers the whole affine support region
        # (crop_cache.support_window) — coords inside the full image but
        # outside the window cannot occur.
        valid = (sx >= 0) & (sx < ww) & (sy >= 0) & (sy < wh)
        sx = np.clip(sx, 0, ww - 1)
        sy = np.clip(sy, 0, wh - 1)
    else:
        valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        sx = np.clip(sx, 0, w - 1)
        sy = np.clip(sy, 0, h - 1)
    out = img[sy, sx]
    return np.where(valid, out, 0).astype(img.dtype)


def center_crop(img: np.ndarray, out_size: int) -> np.ndarray:
    """CenterCrop with zero padding when the image is smaller (torchvision
    semantics)."""
    h, w = img.shape[:2]
    if h < out_size or w < out_size:
        ph, pw = max(out_size - h, 0), max(out_size - w, 0)
        img = np.pad(img, ((ph // 2 + ph % 2, ph // 2), (pw // 2 + pw % 2, pw // 2)))
        h, w = img.shape[:2]
    top = int(round((h - out_size) / 2.0))
    left = int(round((w - out_size) / 2.0))
    return img[top:top + out_size, left:left + out_size]


def max_normalize(img: np.ndarray) -> np.ndarray:
    """float32 cast + per-image divide by max(1e-3, img.max())
    (helpers.py:156-159)."""
    img = img.astype(np.float32)
    return img / max(1e-3, float(img.max()))


def reference_transform(img: np.ndarray, rng: Optional[np.random.Generator],
                        img_size: int,
                        train: bool = True, raw: bool = False) -> np.ndarray:
    """The full reference augmentation chain on one grayscale image array.

    Returns (img_size, img_size) float32 in [0, 1].  With ``train=False``
    (or rng None) the affine is skipped and only CenterCrop+normalize run —
    the deterministic eval path.

    ``raw=True`` (compact transfer): return the affined/cropped integer
    image in the SOURCE dtype (uint8/uint16) and skip normalization — the
    jitted step performs the identical float32 cast + max-normalize on
    device (ops/image_norm.py device_normalize), halving/quartering the
    host->device image bytes.  Sources in other dtypes fall back to the
    normalized float path (corpora are homogeneous in bit depth, so a run
    never mixes the two).
    """
    from . import native_ops

    if img.ndim == 3:
        img = img[..., 0]
    h, w = img.shape[:2]
    top = int(round((h - img_size) / 2.0))
    left = int(round((w - img_size) / 2.0))
    if train and rng is not None:
        angle, tx, ty = sample_affine_params(rng, w, h)
        if img.dtype in (np.uint8, np.uint16):
            m = _inverse_affine_matrix((w * 0.5, h * 0.5), angle, (tx, ty))
            if raw:
                out = native_ops.affine_crop_raw(img, m, top, left, img_size)
                if out is None:  # native lib unavailable — numpy raw path
                    out = affine_crop(img, angle, tx, ty, img_size)
                return out
            out = native_ops.affine_crop_norm(img, m, top, left, img_size)
            if out is not None:
                return out
        return max_normalize(affine_crop(img.astype(np.int16), angle, tx, ty,
                                         img_size))
    if img.dtype in (np.uint8, np.uint16):
        if raw:
            out = native_ops.center_crop_raw(img, top, left, img_size) \
                if (h >= img_size and w >= img_size) else None
            if out is None:
                out = center_crop(img, img_size)
            return out
        if h >= img_size and w >= img_size:
            out = native_ops.center_crop_norm(img, top, left, img_size)
            if out is not None:
                return out
    return max_normalize(center_crop(img.astype(np.int16), img_size))


def reference_transform_window(win: np.ndarray, src_origin: Tuple[int, int],
                               full_shape: Tuple[int, int],
                               rng: Optional[np.random.Generator],
                               img_size: int, train: bool = True,
                               raw: bool = False) -> np.ndarray:
    """``reference_transform`` over a decoded-crop-cache window (see
    data/crop_cache.py): ``win`` is the affine-support window cut from a
    ``full_shape`` source at ``src_origin``.  All augmentation geometry
    (affine params, matrix, crop offsets) is computed in the FULL-image
    frame, so outputs are bit-identical to ``reference_transform`` on the
    full decoded image (asserted exhaustively in tests/test_crop_cache.py).
    """
    from . import native_ops

    if win.ndim == 3:
        win = win[..., 0]
    h, w = full_shape
    oy0, ox0 = src_origin
    top = int(round((h - img_size) / 2.0))
    left = int(round((w - img_size) / 2.0))
    if train and rng is not None:
        angle, tx, ty = sample_affine_params(rng, w, h)
        if win.dtype in (np.uint8, np.uint16):
            m = _inverse_affine_matrix((w * 0.5, h * 0.5), angle, (tx, ty))
            out = native_ops.affine_crop_win(win, m, top, left, oy0, ox0,
                                             img_size, raw=raw)
            if out is not None:
                return out
            if raw:
                return affine_crop(win, angle, tx, ty, img_size,
                                   src_origin=src_origin, full_shape=(h, w))
        return max_normalize(affine_crop(win.astype(np.int16), angle, tx, ty,
                                         img_size, src_origin=src_origin,
                                         full_shape=(h, w)))
    # eval path: the window always covers the central crop (or IS the
    # whole too-small image, where center_crop's zero-padding applies)
    if h >= img_size and w >= img_size:
        crop = win[top - oy0:top - oy0 + img_size,
                   left - ox0:left - ox0 + img_size]
    else:
        crop = center_crop(win, img_size)
    if win.dtype in (np.uint8, np.uint16):
        if raw:
            return np.ascontiguousarray(crop)
        if native_ops.get_lib() is not None and h >= img_size \
                and w >= img_size:
            # same math as the direct path's native center_crop_norm
            return max_normalize(crop)
    return max_normalize(crop.astype(np.int16))


def reference_transform_pil(img: np.ndarray, angle: float, tx: int, ty: int,
                            img_size: int) -> np.ndarray:
    """Literal PIL-based reference chain (for parity tests ONLY — slow):
    full-image affine via PIL's C resampler (Image.transform AFFINE,
    NEAREST, fill 0 — exactly what torchvision RandomAffine calls on PIL
    inputs), then center crop, then normalize.  The affine matrix follows
    torchvision's ``_get_inverse_affine_matrix`` convention with center
    (w/2, h/2), scale 1, shear 0.
    """
    from PIL import Image

    h, w = img.shape[:2]
    if img.dtype == np.uint8:
        pil = Image.fromarray(img)
    else:
        pil = Image.fromarray(img.astype(np.int32), mode="I")
    matrix = _inverse_affine_matrix((w * 0.5, h * 0.5), angle, (tx, ty))
    pil = pil.transform((w, h), Image.AFFINE, matrix, resample=Image.NEAREST,
                        fillcolor=0)
    arr = np.asarray(pil)
    return max_normalize(center_crop(arr, img_size))
