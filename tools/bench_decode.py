"""Host JPEG-decode cost for full-resolution MIMIC-CXR images — the
evidence VERDICT r2 item 2 asks for: can the host feed the chip?

The production host path per sample is: cv2.imread(IMREAD_ANYDEPTH)
(JPEG decode, reference model_utils.py:80) -> native affine-crop
(native/mimm_host.cpp, replaces the reference's PIL RandomAffine +
CenterCrop, helpers.py:146-161).  bench.py's device step rate is
measured with precomputed crops, so decode is the one host cost not yet
bounded.  This tool measures, on the shipped 142 full-res CXRs
(/root/reference/full_data_set/images, ~2.5k x 3k px):

* decode ms/image (cv2.imread, bundled libjpeg-turbo),
* affine-transform ms/image on the decoded array (native path),
* threaded scaling at 1..N threads (cv2 releases the GIL in imread),
* the cores-needed arithmetic at a target device rate.

Output: one JSON line.  Run on a production host to size
--data_loader_workers; on the 1-core dev box the per-image ms is valid,
the thread scaling section is not (documented in the output).

Usage:
    python tools/bench_decode.py [--target_pairs_per_sec 1641]
        [--threads 1,2,4] [--limit 142]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGES = "/root/reference/full_data_set/images"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=IMAGES)
    ap.add_argument("--limit", type=int, default=142)
    ap.add_argument("--target_pairs_per_sec", type=float, default=1641.0)
    ap.add_argument("--threads", default="1",
                    help="comma-separated thread counts for the scaling probe")
    ap.add_argument("--img_size", type=int, default=256)
    args = ap.parse_args()

    import cv2
    cv2.setNumThreads(1)  # per-image cost; parallelism comes from the pool
    paths = sorted(glob.glob(os.path.join(args.images, "*", "*.jpg")))[:args.limit]
    if not paths:
        print(json.dumps({"error": f"no jpgs under {args.images}"}))
        return

    # ---- per-image decode cost (serial, every shipped image once) ----
    sizes, dts = [], []
    decoded_last = None
    for p in paths:
        t0 = time.perf_counter()
        img = cv2.imread(p, cv2.IMREAD_ANYDEPTH)
        dts.append(time.perf_counter() - t0)
        sizes.append(img.shape)
        decoded_last = img
    dts_ms = np.array(dts) * 1e3
    mpix = np.array([h * w for h, w in sizes]) / 1e6

    # ---- transform cost on a decoded full-res array (native path) ----
    from mimm_tpu.data import transforms
    rng = np.random.default_rng(0)
    n_t = 20
    t0 = time.perf_counter()
    for _ in range(n_t):
        transforms.reference_transform(decoded_last, rng, args.img_size,
                                       train=True, raw=True)
    transform_ms = (time.perf_counter() - t0) / n_t * 1e3

    # ---- threaded decode scaling (cv2.imread releases the GIL) ----
    from concurrent.futures import ThreadPoolExecutor
    scaling = {}
    for n in [int(x) for x in args.threads.split(",") if x.strip()]:
        reps = paths * max(1, (2 * n * 8) // len(paths) + 1)
        with ThreadPoolExecutor(n) as pool:
            t0 = time.perf_counter()
            list(pool.map(lambda p: cv2.imread(p, cv2.IMREAD_ANYDEPTH), reps))
            dt = time.perf_counter() - t0
        scaling[str(n)] = round(len(reps) / dt, 1)  # images/s

    # ---- decoded-crop cache path (data/crop_cache.py): read the raw
    # support window instead of decoding the JPEG; bit-identical outputs
    # (tests/test_crop_cache.py) ----
    import shutil
    import tempfile
    from mimm_tpu.data.crop_cache import DecodedCropCache
    cache_dir = tempfile.mkdtemp(prefix="mimm_cropcache_")
    cache = DecodedCropCache(cache_dir, args.img_size)
    ids = [os.path.relpath(p, args.images) for p in paths]
    t0 = time.perf_counter()
    for i in ids:
        cache.read(args.images, i)  # epoch-1 build (decode + window write)
    build_ms = (time.perf_counter() - t0) / len(ids) * 1e3
    reps_c = ids * max(1, 60 // len(ids) + 1)
    t0 = time.perf_counter()
    for i in reps_c:
        win, oy, ox, h, w = cache.read(args.images, i)
        transforms.reference_transform_window(win, (oy, ox), (h, w), rng,
                                              args.img_size, train=True,
                                              raw=True)
    cached_ms = (time.perf_counter() - t0) / len(reps_c) * 1e3
    cache_bytes = sum(os.path.getsize(os.path.join(r, f))
                      for r, _, fs in os.walk(cache_dir) for f in fs)
    shutil.rmtree(cache_dir, ignore_errors=True)

    # ---- cores-needed arithmetic ----
    per_image_ms = float(np.mean(dts_ms)) + transform_ms
    images_per_core = 1e3 / per_image_ms
    cores_needed = args.target_pairs_per_sec / images_per_core
    cached_cores_needed = args.target_pairs_per_sec / (1e3 / cached_ms)

    print(json.dumps({
        "metric": "host_decode_ms_per_image",
        "n_images": len(paths),
        "decode_ms": {"mean": round(float(np.mean(dts_ms)), 2),
                      "p50": round(float(np.median(dts_ms)), 2),
                      "p90": round(float(np.percentile(dts_ms, 90)), 2),
                      "max": round(float(np.max(dts_ms)), 2)},
        "megapixels": {"mean": round(float(np.mean(mpix)), 2),
                       "max": round(float(np.max(mpix)), 2)},
        "ms_per_megapixel": round(float(np.mean(dts_ms / mpix)), 2),
        "transform_ms": round(transform_ms, 2),
        "host_ms_per_sample": round(per_image_ms, 2),
        "images_per_sec_per_core": round(images_per_core, 1),
        "threaded_images_per_sec": scaling,
        "target_pairs_per_sec": args.target_pairs_per_sec,
        "decode_cores_needed_at_target": round(cores_needed, 1),
        "crop_cache": {
            "build_ms_per_image": round(build_ms, 2),
            "cached_ms_per_sample": round(cached_ms, 2),
            "bytes_per_image": int(cache_bytes / max(1, len(ids))),
            "cores_needed_at_target": round(cached_cores_needed, 1),
        },
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
