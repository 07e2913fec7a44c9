#!/usr/bin/env python
"""Generate the repo-local custom_dataset/ fixture (synthetic COCO-format
shapes dataset) used by the res50_custom / res101_custom configs, the test
suite, and the quickstart demo — the analog of the reference's shipped
custom_dataset/ (3 annotated images), but generated rather than copied."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolact_minimal_tpu.data.synthetic import generate_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--root', default='custom_dataset')
    p.add_argument('--num_images', type=int, default=12)
    p.add_argument('--img_size', type=int, default=448)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    img_dir, ann = generate_dataset(args.root, num_images=args.num_images,
                                    img_size=args.img_size, num_classes=4,
                                    seed=args.seed)
    with open(os.path.join(args.root, 'labels.txt'), 'w') as f:
        f.write('background\n' + '\n'.join(f'shape{i}' for i in range(4)) + '\n')
    print(f'Wrote {args.num_images} images to {img_dir}, annotations to {ann}')


if __name__ == '__main__':
    main()
