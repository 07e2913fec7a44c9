#!/usr/bin/env python
"""CLI: Pascal-SBD .mat annotations -> COCO jsons (reference utils/pascal2coco.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolact_minimal_tpu.data.converters import pascal_sbd_to_coco

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--folder_path', required=True,
                   help='The path of the pascal_sbd folder.')
    args = p.parse_args()
    for out in pascal_sbd_to_coco(args.folder_path):
        print(f'Wrote {out}')
