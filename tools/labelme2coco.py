#!/usr/bin/env python
"""CLI: labelme jsons + labels.txt -> COCO json (reference utils/labelme2coco.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolact_minimal_tpu.data.converters import labelme_to_coco

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--img_dir', required=True, help='Annotated directory.')
    p.add_argument('--label_name', required=True, help='labels.txt path.')
    p.add_argument('--img_type', default='jpg')
    args = p.parse_args()
    out = labelme_to_coco(args.img_dir, args.label_name, args.img_type)
    print(f'Saved in: {out}')
