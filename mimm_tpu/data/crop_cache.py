"""Decoded-crop cache: decode each CXR JPEG ONCE, keep only the pixels
any augmentation can touch.

Full-resolution MIMIC-CXR JPEGs (~2544x3056, mean 6.9 Mpx) decode at
28.4 ms/image on one core (tools/bench_decode.py, the 142 shipped
full-res CXRs), while the downstream transform only ever reads the
affine support of the central ``img_size`` crop — RandomAffine(deg <=
20, translate <= 10%) + CenterCrop(256) touches a bounded center window
(~1024x1085 px on a 2544x3056 image, ~14% of the pixels).  The cache
stores exactly that window as a raw .npz: a cache hit replaces the
28.4 ms decode+transform with a measured 1.13 ms read+transform,
cutting the host cores needed to feed one chip at 1641 pairs/s from
~47 to ~2 at ~1 MB/image of disk (the epoch-1 build cost, ~30
ms/image, amortizes over num_train_epochs=20).

The window geometry guarantees BIT-IDENTICAL outputs vs decoding the
full image (tests/test_crop_cache.py): every source coordinate the
inverse-mapped output grid can floor to, over the full (angle, tx, ty)
parameter space, lies inside the window; the integer window origin is
subtracted AFTER the floor (transforms.reference_transform_window,
native affine_crop_*_win) so no float rounding can differ.

Reference counterpart: none — the reference re-decodes every image
every epoch through DataLoader workers (model_utils.py:80,
helpers.py:113-114 num_workers=32).  The cache is the TPU-native answer
to feeding a chip that trains ~90x faster than the reference's GPU.

Layout: one ``<cache_dir>/<img_id>.w<img_size>.npz`` per image holding
``win`` (source-dtype window), ``meta`` = [oy, ox, h, w].  Writes are
atomic (tmp + rename), so concurrent loader threads/processes can race
on a miss and both produce valid files.
"""

from __future__ import annotations

import math
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

# Reference augmentation bounds (helpers.py:151-153: RandomAffine
# degrees=20, translate=(0.1, 0.1)).  The cache window is derived FROM
# these; changing them invalidates the cache (bump _VERSION).
DEGREES = 20.0
TRANSLATE = (0.1, 0.1)
_VERSION = 1


def support_window(h: int, w: int, out_size: int) -> Tuple[int, int, int, int]:
    """(oy, ox, wh, ww) of the source window covering every pixel the
    fused affine+center-crop can sample, over all (angle, tx, ty) draws.

    Derivation: output pixel centers lie within ``half_out`` of the image
    center per axis (crop offset rounding + the +0.5 pixel-center shift);
    the inverse map is R^{-1}(p - c - t) + c with |t| <= translate*dims
    (+0.5 for the integer round), |angle| <= DEGREES.  Componentwise
    |src - c| <= cos*a + sin*b where a/b are the two axis bounds; +1 px
    margin for the floor-to-nearest pixel step."""
    cos = math.cos(math.radians(DEGREES))
    sin = math.sin(math.radians(DEGREES))
    half_out = out_size / 2.0 + 1.5  # crop-offset round + pixel centers
    max_tx = TRANSLATE[0] * w + 0.5
    max_ty = TRANSLATE[1] * h + 0.5
    half_x = cos * (half_out + max_tx) + sin * (half_out + max_ty) + 1.0
    half_y = sin * (half_out + max_tx) + cos * (half_out + max_ty) + 1.0
    cx, cy = w * 0.5, h * 0.5
    ox = max(0, int(math.floor(cx - half_x)))
    oy = max(0, int(math.floor(cy - half_y)))
    x1 = min(w, int(math.ceil(cx + half_x)) + 1)
    y1 = min(h, int(math.ceil(cy + half_y)) + 1)
    return oy, ox, y1 - oy, x1 - ox


def from_config(cfg) -> Optional["DecodedCropCache"]:
    """The Managers' constructor hook: a cache iff
    ``cfg.decoded_crop_cache`` names a directory."""
    d = getattr(cfg, "decoded_crop_cache", "")
    return DecodedCropCache(d, cfg.img_size) if d else None


class DecodedCropCache:
    """Read-through cache over ``pipeline._imread``.

    ``read(img_dir, img_id)`` returns ``(win, oy, ox, h, w)`` — the
    support window plus full-image geometry for
    ``transforms.reference_transform_window`` — or None when the source
    image is unreadable (the loader's skip-and-count handles it).
    """

    def __init__(self, cache_dir: str, img_size: int):
        self.cache_dir = cache_dir
        self.img_size = img_size
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _path(self, img_id: str) -> str:
        return os.path.join(self.cache_dir,
                            f"{img_id}.w{self.img_size}.npz")

    def valid(self, img_id: str) -> bool:
        """Cheap resumability peek (cli/prebuild_cache.py): True iff a
        current-version cache entry exists — reads only the tiny ``meta``
        member, never decompresses the pixel window."""
        try:
            with np.load(self._path(img_id)) as z:
                return int(z["meta"][4]) == _VERSION
        except (OSError, KeyError, ValueError, IndexError):
            return False

    def read(self, img_dir: str, img_id: str
             ) -> Optional[Tuple[np.ndarray, int, int, int, int]]:
        path = self._path(img_id)
        try:
            with np.load(path) as z:
                meta = z["meta"]
                if int(meta[4]) == _VERSION:
                    self.hits += 1
                    return (z["win"], int(meta[0]), int(meta[1]),
                            int(meta[2]), int(meta[3]))
        except (OSError, KeyError, ValueError, IndexError):
            pass  # miss (absent, stale version, or torn write): rebuild
        self.misses += 1
        return self._build(img_dir, img_id, path)

    def _build(self, img_dir: str, img_id: str, path: str):
        from .pipeline import _imread
        img = _imread(os.path.join(img_dir, img_id))
        if img is None:
            return None
        if img.ndim == 3:
            img = img[..., 0]
        h, w = img.shape[:2]
        oy, ox, wh, ww = support_window(h, w, self.img_size)
        win = np.ascontiguousarray(img[oy:oy + wh, ox:ox + ww])
        meta = np.array([oy, ox, h, w, _VERSION], np.int64)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                                   suffix=".tmp.npz")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, win=win, meta=meta)
            os.replace(tmp, path)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return win, oy, ox, h, w
