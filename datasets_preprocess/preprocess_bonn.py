#!/usr/bin/env python
"""Bonn dynamic RGB-D test prep: subsample to 110 frames.

Behavioural reference: /root/reference/datasets_preprocess/preprocess_bonn.py
— frames[30:140] of rgb/ and depth/ into rgb_110/ depth_110/, rows 30:140 of
groundtruth.txt into groundtruth_110.txt.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from datasets_preprocess.prepare_tum import main as tum_main
    sys.argv = [sys.argv[0], "--root",
                sys.argv[sys.argv.index("--root") + 1]
                if "--root" in sys.argv else "../data/bonn/rgbd_bonn_dataset",
                "--start", "30", "--count", "110"]
    tum_main()


if __name__ == "__main__":
    main()
