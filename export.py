#!/usr/bin/env python
"""Export CLI: checkpoint -> standalone AOT inference artifact (.jexport).

The TPU-native analog of /root/reference/export2onnx.py (incl. its immediate
torch-vs-runtime parity check, export2onnx.py:36-46).
"""
import argparse

from yolact_minimal_tpu.config import cfg_name_from_weight, get_config
from yolact_minimal_tpu.deploy import export_model
from yolact_minimal_tpu.utils.checkpoint import load_weights_auto


def main():
    from yolact_minimal_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument('--weight', type=str, required=True)
    p.add_argument('--img_size', type=int, default=544)
    p.add_argument('--out', type=str, default=None)
    p.add_argument('--cfg', type=str, default=None)
    p.add_argument('--batch', type=int, default=1,
                   help='Compiled batch size of the artifact (the driver '
                        'pads the tail chunk; batch>1 multiplies deploy '
                        'throughput on TPU).')
    args = p.parse_args()

    name = args.cfg or cfg_name_from_weight(args.weight)
    cfg = get_config(name, mode='val', img_size=args.img_size)
    variables = load_weights_auto(args.weight, include_semantic=False)
    out = args.out or args.weight.rsplit('.', 1)[0] + '.jexport'
    export_model(cfg, variables, out, batch=args.batch)
    print(f'Exported to {out}')


if __name__ == '__main__':
    main()
