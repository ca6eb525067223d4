#!/usr/bin/env python
"""Residual-jitter metric tool mirroring the reference's eval_jitter
(eval_jitter.cpp:21-75): per video, dense Farneback optical flow between
consecutive frames, per-frame median flow magnitude, and the median of those
medians as ``median_jitter_px``.

Usage:
    python apps/eval_jitter.py VIDEO [VIDEO...]
    python apps/eval_jitter.py --dir output
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("videos", nargs="*")
    ap.add_argument("--dir",
                    help="evaluate every *.mp4 / *.y4m in a directory")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    from video_stabilizer_tpu.utils.io import read_video
    from video_stabilizer_tpu.utils.jitter import median_jitter_px

    videos = list(args.videos)
    if args.dir:
        for pat in ("*.mp4", "*.y4m"):
            videos += sorted(glob.glob(os.path.join(args.dir, pat)))
    if not videos:
        ap.error("no videos given")

    for v in videos:
        j = median_jitter_px(read_video(v, max_frames=args.max_frames))
        print(f"{v}: median_jitter_px = {j:.4f}")


if __name__ == "__main__":
    main()
