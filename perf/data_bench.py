"""Host data-pipeline throughput: PIL vs native C++ preprocessing.

The training input pipeline is host CPU work (decode, resize, normalize,
batch assemble) racing the TPU step; if it can't exceed the device's
images/s, the chip starves. This harness measures the per-image and
batch-assemble paths of `data/image_processing.py` both ways:

  * PIL path: Image.resize(BICUBIC) + numpy normalize per image, np.stack;
  * native path: csrc/fast_image.cpp fused resize+normalize (and the
    GIL-free multi-image `assemble_batch` that writes the batch tensor
    in one call).

Run:  python perf/data_bench.py [--size 256] [--batch 64] [--iters 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def time_it(fn, iters):
    fn()                                   # warmup (native lib compiles)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--src-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from PIL import Image
    from setok_tpu.data.image_processing import ImageProcessor
    from setok_tpu.data.native import get_lib

    if get_lib() is None:
        raise SystemExit("native library unavailable (no g++?)")

    rs = np.random.RandomState(0)
    imgs = [Image.fromarray(rs.randint(0, 255, (args.src_size,
                                                args.src_size, 3),
                                       np.uint8))
            for _ in range(args.batch)]

    pil = ImageProcessor(size=args.size, use_native=False,
                         pad_to_square=False)
    nat = ImageProcessor(size=args.size, use_native=True,
                         pad_to_square=False)

    t_pil = time_it(lambda: pil.preprocess_batch(imgs), args.iters)
    t_nat = time_it(lambda: nat.preprocess_batch(imgs), args.iters)

    # correctness spot check (bicubic implementations differ slightly)
    a, b = pil.preprocess_batch(imgs), nat.preprocess_batch(imgs)
    max_err = float(np.abs(a - b).max())

    out = {"bench": f"data_pipeline {args.src_size}->{args.size}px",
           "batch": args.batch,
           "pil_ms_per_batch": t_pil * 1e3,
           "native_ms_per_batch": t_nat * 1e3,
           "speedup": t_pil / t_nat,
           "pil_img_per_s": args.batch / t_pil,
           "native_img_per_s": args.batch / t_nat,
           "max_abs_diff": max_err}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
