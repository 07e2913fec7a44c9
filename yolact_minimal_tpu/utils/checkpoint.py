"""Checkpointing with the reference's filename contract.

`best_{maskmAP}_{cfg}_{step}.ckpt` / `latest_{cfg}_{step}.ckpt` — exactly one
of each kept per config, the step parsed back out of the name on resume
(reference common_utils.py:41-63, train.py:51-53). Payload is a flax-msgpack
dict: {'params', 'batch_stats'} always; `latest` checkpoints written by
train.py additionally carry {'opt_state', 'step'} so resume restores SGD
momentum / AdamW moments and the LR-schedule position exactly (the reference
restarts both, common_utils.py:55-63 — this exceeds it). `best` checkpoints
stay weights-only: they are eval/deploy artifacts.
"""
from __future__ import annotations

import glob
import os
import os.path as osp
import re
from typing import Optional, Tuple

import flax.serialization as fser
import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, variables: dict):
    os.makedirs(osp.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as f:
        f.write(fser.msgpack_serialize(_to_host(variables)))


def load_checkpoint(path: str) -> dict:
    with open(path, 'rb') as f:
        return fser.msgpack_restore(f.read())


def save_best(variables: dict, mask_map: float, cfg_name: str, step: int,
              weight_dir: str = 'weights') -> Optional[str]:
    """Keep exactly one best checkpoint per config; overwrite when the new
    mask mAP is >= the one parsed from the existing filename."""
    existing = [w for w in glob.glob(osp.join(weight_dir, 'best*.ckpt'))
                if cfg_name in osp.basename(w)]
    assert len(existing) <= 1, 'Multiple best checkpoints found.'
    best = float(osp.basename(existing[0]).split('_')[1]) if existing else 0.0
    if mask_map < best:
        return None
    if existing:
        os.remove(existing[0])
    path = osp.join(weight_dir, f'best_{mask_map}_{cfg_name}_{step}.ckpt')
    save_checkpoint(path, variables)
    print(f"\nSaving the best model as '{osp.basename(path)}'.\n")
    return path


def save_latest(variables: dict, cfg_name: str, step: int,
                weight_dir: str = 'weights') -> str:
    existing = [w for w in glob.glob(osp.join(weight_dir, 'latest*.ckpt'))
                if cfg_name in osp.basename(w)]
    assert len(existing) <= 1, 'Multiple latest checkpoints found.'
    if existing:
        os.remove(existing[0])
    path = osp.join(weight_dir, f'latest_{cfg_name}_{step}.ckpt')
    save_checkpoint(path, variables)
    print(f"\nSaving the latest model as '{osp.basename(path)}'.\n")
    return path


def step_from_name(path: str) -> int:
    m = re.search(r'_(\d+)\.(?:ckpt|pth|msgpack)$', path)
    if not m:
        raise ValueError(f'No step in checkpoint name {path!r}')
    return int(m.group(1))


def load_weights_auto(path: str, include_semantic: bool) -> dict:
    """Load either our .ckpt or a reference .pth (converted on the fly).
    Inference callers get pure variables; train.py pops the optional
    'opt_state'/'step' entries itself before building the model state."""
    if path.endswith('.pth'):
        from yolact_minimal_tpu.utils.weights import (convert_state_dict,
                                                      load_torch_checkpoint)
        return convert_state_dict(load_torch_checkpoint(path),
                                  include_semantic=include_semantic)
    variables = load_checkpoint(path)
    if not include_semantic:
        variables['params'].pop('semantic_seg_conv', None)
        variables.pop('opt_state', None)
        variables.pop('step', None)
        # train payloads of BN-free models (swin) store batch_stats=None;
        # inference callers need real collections only
        for k in [k for k, v in variables.items() if v is None]:
            variables.pop(k)
    return variables
