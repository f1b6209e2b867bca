#!/usr/bin/env python
"""Summarize kitti-eval stats files into mAP tables.

Reads results/<result_sha>/stats_pedestrian_<param>.txt (4 rows easy/moderate/
hard/all x 41 precision columns) and prints the 41-point AP per difficulty,
averaging columns 1..40 (the reference parser's convention,
/root/reference/kitti-eval/parser.py:44-47 — studied for behavior).

Usage: parser.py results_folder [results_root]
"""

import os
import sys

import numpy as np

CLASSES = ['pedestrian']
PARAMS = ['detection', 'detection_1%', 'detection_5%', 'detection_10%',
          'detection_3d', 'detection_ground', 'orientation', 'mppe']
DIFFICULTIES = ['easy', 'moderate', 'hard', 'all']


def main():
    if len(sys.argv) < 2:
        print('Usage: parser.py results_folder [results_root]')
        sys.exit(1)
    result_sha = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else 'results'
    txt_dir = os.path.join(root, result_sha)

    for class_name in CLASSES:
        for param in PARAMS:
            txt_name = os.path.join(txt_dir, f'stats_{class_name}_{param}.txt')
            if not os.path.isfile(txt_name):
                print(txt_name, ' not found')
                continue
            print(f"--{class_name} {param}--")
            cont = np.atleast_2d(np.loadtxt(txt_name))
            averages = []
            for idx, _ in enumerate(DIFFICULTIES):
                if idx >= cont.shape[0]:
                    averages.append(float('nan'))
                    continue
                averages.append(float(np.mean(cont[idx][1:41])))
            print("Easy\tMod.\tHard\tAll")
            print("{:.2f}\t{:.2f}\t{:.2f}\t{:.2f}".format(
                *[100 * a for a in averages]))
            print('-' * 81)


if __name__ == '__main__':
    main()
