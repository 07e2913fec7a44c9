"""PyTorch-checkpoint -> JAX parameter conversion.

The reference publishes `.pth` state_dicts (README.md:30-42) whose key names
come from /root/reference/modules/{yolact,resnet,swin_transformer}.py. This
converter maps them onto our flax module tree (models/yolact.py) so reference
checkpoints port directly: conv kernels transpose OIHW -> HWIO, batch-norm
splits into params (scale/bias) and batch_stats (mean/var), and FPN/proto/
head Sequential indices map to our named submodules.

Torch is used host-side only (CPU) to read the file; nothing here touches
the device path.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_RESNET_STAGE = re.compile(r'^layers\.(\d+)\.(\d+)\.(.+)$')
_TV_STAGE = re.compile(r'^layer(\d)\.(\d+)\.(.+)$')   # torchvision naming


def _convert_resnet_entry(rest: str, value, params: dict, stats: dict, prefix=()):
    """One backbone tensor. `rest` is the name below the backbone root."""
    m = _RESNET_STAGE.match(rest) or _TV_STAGE.match(rest)
    if m:
        stage, block, leaf = m.groups()
        stage = int(stage) - (1 if _TV_STAGE.match(rest) else 0)
        mod = f'layer{stage}_{block}'
        if leaf.startswith('downsample.0.'):
            _set(params, prefix + (mod, 'downsample_conv', 'kernel'), _conv(value))
        elif leaf.startswith('downsample.1.'):
            _convert_bn(leaf.split('.')[-1], value, params, stats,
                        prefix + (mod, 'downsample_bn'))
        elif leaf.startswith('conv'):
            _set(params, prefix + (mod, leaf.split('.')[0], 'kernel'), _conv(value))
        elif leaf.startswith('bn'):
            _convert_bn(leaf.split('.')[-1], value, params, stats,
                        prefix + (mod, leaf.split('.')[0]))
        return
    if rest == 'conv1.weight':
        _set(params, prefix + ('conv1', 'kernel'), _conv(value))
    elif rest.startswith('bn1.'):
        _convert_bn(rest.split('.')[-1], value, params, stats, prefix + ('bn1',))


def _convert_bn(leaf: str, value, params: dict, stats: dict, path: Tuple[str, ...]):
    v = np.asarray(value)
    if leaf == 'weight':
        _set(params, path + ('scale',), v)
    elif leaf == 'bias':
        _set(params, path + ('bias',), v)
    elif leaf == 'running_mean':
        _set(stats, path + ('mean',), v)
    elif leaf == 'running_var':
        _set(stats, path + ('var',), v)
    # num_batches_tracked is dropped.


# FPN/proto/head Sequential-index -> our named modules
_FPN_MAP = {
    'lat_layers.0': 'lat3', 'lat_layers.1': 'lat4', 'lat_layers.2': 'lat5',
    'pred_layers.0.0': 'pred3', 'pred_layers.1.0': 'pred4', 'pred_layers.2.0': 'pred5',
    'downsample_layers.0.0': 'down6', 'downsample_layers.1.0': 'down7',
}
_PROTO_MAP = {
    'proto1.0': 'proto1_0', 'proto1.2': 'proto1_1', 'proto1.4': 'proto1_2',
    'proto2.0': 'proto2_0', 'proto2.2': 'proto2_1',
}
_HEAD_MAP = {
    'upfeature.0': 'upfeature', 'bbox_layer': 'bbox_layer',
    'conf_layer': 'conf_layer', 'coef_layer.0': 'coef_layer',
}


def _convert_plain_conv(name_map: Dict[str, str], rest: str, value,
                        params: dict, prefix: Tuple[str, ...]) -> bool:
    for torch_name, ours in name_map.items():
        if rest == f'{torch_name}.weight':
            _set(params, prefix + (ours, 'kernel'), _conv(value))
            return True
        if rest == f'{torch_name}.bias':
            _set(params, prefix + (ours, 'bias'), np.asarray(value))
            return True
    return False


def convert_state_dict(state_dict: Dict[str, 'np.ndarray'],
                       include_semantic: bool = True) -> dict:
    """Convert a full reference Yolact state_dict (resnet backbones) into
    {'params': ..., 'batch_stats': ...} matching models/yolact.py."""
    params: dict = {}
    stats: dict = {}
    is_swin = any('.blocks.' in k for k in state_dict)
    for key, value in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        if key.startswith('backbone.'):
            rest = key[len('backbone.'):]
            if is_swin:
                _convert_swin_entry(rest, value, params, stats, ('backbone',))
            else:
                _convert_resnet_entry(rest, value, params, stats, ('backbone',))
        elif key.startswith('fpn.'):
            _convert_plain_conv(_FPN_MAP, key[len('fpn.'):], value, params, ('fpn',))
        elif key.startswith('proto_net.'):
            _convert_plain_conv(_PROTO_MAP, key[len('proto_net.'):], value,
                                params, ('proto_net',))
        elif key.startswith('prediction_layers.'):
            _convert_plain_conv(_HEAD_MAP, key[len('prediction_layers.'):], value,
                                params, ('prediction_layers',))
        elif key.startswith('semantic_seg_conv.') and include_semantic:
            leaf = 'kernel' if key.endswith('weight') else 'bias'
            v = _conv(value) if leaf == 'kernel' else np.asarray(value)
            _set(params, ('semantic_seg_conv', leaf), v)
    out = {'params': params}
    if stats:
        out['batch_stats'] = stats
    return out


def convert_backbone_state_dict(state_dict: Dict[str, 'np.ndarray']) -> dict:
    """Convert a backbone-only checkpoint (reference init_backbone path,
    resnet.py:100-104 / swin_transformer.py:486-498; also accepts torchvision
    layer1..4 naming). Swin checkpoints are detected by their block keys."""
    params: dict = {}
    stats: dict = {}
    is_swin = any('.blocks.' in k for k in state_dict)
    for key, value in state_dict.items():
        if key.endswith('num_batches_tracked') or key.startswith(('fc.', 'head.')):
            continue
        if is_swin:
            _convert_swin_entry(key, value, params, stats, ())
        else:
            _convert_resnet_entry(key, value, params, stats, ())
    return {'params': params, 'batch_stats': stats}


def graft_backbone(variables: dict, backbone: dict, strict: bool) -> dict:
    """Overlay converted backbone tensors onto freshly-initialized model
    variables — the analog of reference `net.backbone.init_backbone(path)`
    (train.py:56): strict=True for resnets (every model tensor must be
    covered), strict=False for swin (published checkpoints carry extra
    buffers / lack stochastic-depth state, reference swin_transformer.py:498).
    Returns a new variables dict; shapes are always validated."""

    def clone(tree):
        """Copy the dict structure, sharing the (immutable) leaf arrays."""
        return {k: clone(v) if isinstance(v, dict) else v
                for k, v in tree.items()}

    def overlay(dst: dict, src: dict, path=()):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    raise KeyError(f'backbone weight has unknown module '
                                   f'{"/".join(path + (k,))}')
                overlay(dst[k], v, path + (k,))
            else:
                if k not in dst:
                    raise KeyError(f'backbone weight has unknown tensor '
                                   f'{"/".join(path + (k,))}')
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f'shape mismatch at {"/".join(path + (k,))}: '
                        f'model {tuple(dst[k].shape)} vs weight {np.shape(v)}')
                dst[k] = np.asarray(v)

    def count(tree) -> int:
        return sum(1 for _ in _leaves(tree))

    def _leaves(tree):
        for v in tree.values():
            if isinstance(v, dict):
                yield from _leaves(v)
            else:
                yield v

    out = {'params': clone(variables['params']),
           'batch_stats': clone(variables.get('batch_stats') or {})}
    overlay(out['params']['backbone'], backbone['params'])
    if backbone.get('batch_stats'):
        overlay(out['batch_stats']['backbone'], backbone['batch_stats'])
    if strict:
        n_model = count(out['params']['backbone']) + \
            count(out['batch_stats'].get('backbone', {}))
        n_weight = count(backbone['params']) + \
            count(backbone.get('batch_stats', {}))
        if n_model != n_weight:
            raise ValueError(f'backbone weight covers {n_weight} tensors but '
                             f'the model backbone has {n_model} (strict load)')
    if not variables.get('batch_stats'):
        out.pop('batch_stats')
    return out


def to_torch_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Reverse converter: our flax variables -> a reference-format state_dict
    (numpy values, reference modules/yolact.py + resnet.py key names). The
    inverse of convert_state_dict for resnet backbones; enables loading our
    trained checkpoints into the reference torch model (cross-stack eval
    parity, and an escape hatch back to the torch ecosystem)."""
    out: Dict[str, np.ndarray] = {}

    def conv_back(w):  # HWIO -> OIHW
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    params = variables['params']
    stats = variables.get('batch_stats', {})
    if any('stage' in k for k in params.get('backbone', {})):
        raise NotImplementedError('reverse conversion implemented for '
                                  'resnet backbones only')

    def put_bn(prefix: str, p: dict, s: dict):
        out[f'{prefix}.weight'] = np.asarray(p['scale'])
        out[f'{prefix}.bias'] = np.asarray(p['bias'])
        out[f'{prefix}.running_mean'] = np.asarray(s['mean'])
        out[f'{prefix}.running_var'] = np.asarray(s['var'])

    bb_p, bb_s = params['backbone'], stats.get('backbone', {})
    for mod, p in bb_p.items():
        if mod == 'conv1':
            out['backbone.conv1.weight'] = conv_back(p['kernel'])
        elif mod == 'bn1':
            put_bn('backbone.bn1', p, bb_s['bn1'])
        else:
            m = re.match(r'^layer(\d+)_(\d+)$', mod)
            assert m, f'unexpected backbone module {mod!r}'
            stage, block = m.groups()
            pre = f'backbone.layers.{stage}.{block}'
            for leaf, v in p.items():
                if leaf == 'downsample_conv':
                    out[f'{pre}.downsample.0.weight'] = conv_back(v['kernel'])
                elif leaf == 'downsample_bn':
                    put_bn(f'{pre}.downsample.1', v, bb_s[mod][leaf])
                elif leaf.startswith('conv'):
                    out[f'{pre}.{leaf}.weight'] = conv_back(v['kernel'])
                elif leaf.startswith('bn'):
                    put_bn(f'{pre}.{leaf}', v, bb_s[mod][leaf])

    for section, name_map in (('fpn', _FPN_MAP), ('proto_net', _PROTO_MAP),
                              ('prediction_layers', _HEAD_MAP)):
        rev = {ours: torch_name for torch_name, ours in name_map.items()}
        for mod, p in params.get(section, {}).items():
            out[f'{section}.{rev[mod]}.weight'] = conv_back(p['kernel'])
            if 'bias' in p:
                out[f'{section}.{rev[mod]}.bias'] = np.asarray(p['bias'])

    if 'semantic_seg_conv' in params:
        p = params['semantic_seg_conv']
        out['semantic_seg_conv.weight'] = conv_back(p['kernel'])
        out['semantic_seg_conv.bias'] = np.asarray(p['bias'])
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth file into numpy arrays (host-side torch, CPU only).
    Unwraps the common {'model': ...} / {'state_dict': ...} containers used
    by published backbone checkpoints."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    for wrapper in ('model', 'state_dict'):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
            break
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in sd.items()}


# --- Swin-Tiny (reference modules/swin_transformer.py) ---------------------

def _convert_swin_entry(rest: str, value, params: dict, stats: dict, prefix):
    """Swin backbone tensors; see models/swin.py for the module layout."""
    v = np.asarray(value)

    def lin(w):  # torch Linear [out,in] -> flax Dense kernel [in,out]
        return np.ascontiguousarray(w.T)

    if rest.startswith('patch_embed.proj.'):
        leaf = 'kernel' if rest.endswith('weight') else 'bias'
        _set(params, prefix + ('patch_embed', leaf),
             _conv(v) if leaf == 'kernel' else v)
        return
    if rest.startswith('patch_embed.norm.'):
        leaf = 'scale' if rest.endswith('weight') else 'bias'
        _set(params, prefix + ('patch_norm', leaf), v)
        return
    m = re.match(r'^layers\.(\d+)\.blocks\.(\d+)\.(.+)$', rest)
    if m:
        stage, block, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        mod = prefix + (f'stage{stage}', f'block{block}')
        table = {
            'norm1.weight': ('norm1', 'scale'), 'norm1.bias': ('norm1', 'bias'),
            'norm2.weight': ('norm2', 'scale'), 'norm2.bias': ('norm2', 'bias'),
            'attn.qkv.weight': ('attn', 'qkv', 'kernel'),
            'attn.qkv.bias': ('attn', 'qkv', 'bias'),
            'attn.proj.weight': ('attn', 'proj', 'kernel'),
            'attn.proj.bias': ('attn', 'proj', 'bias'),
            'attn.relative_position_bias_table': ('attn', 'rel_bias_table'),
            'mlp.fc1.weight': ('mlp', 'fc1', 'kernel'),
            'mlp.fc1.bias': ('mlp', 'fc1', 'bias'),
            'mlp.fc2.weight': ('mlp', 'fc2', 'kernel'),
            'mlp.fc2.bias': ('mlp', 'fc2', 'bias'),
        }
        if leaf in table:
            path = table[leaf]
            if leaf.endswith('.weight') and ('qkv' in leaf or 'proj' in leaf or 'fc' in leaf):
                v = lin(v)
            _set(params, mod + path, v)
        return
    m = re.match(r'^layers\.(\d+)\.downsample\.(.+)$', rest)
    if m:
        stage, leaf = int(m.group(1)), m.group(2)
        mod = prefix + (f'stage{stage}', 'downsample')
        if leaf == 'reduction.weight':
            _set(params, mod + ('reduction', 'kernel'), lin(v))
        elif leaf == 'norm.weight':
            _set(params, mod + ('norm', 'scale'), v)
        elif leaf == 'norm.bias':
            _set(params, mod + ('norm', 'bias'), v)
        return
    m = re.match(r'^norm(\d)\.(weight|bias)$', rest)
    if m:
        idx, leaf = m.groups()
        _set(params, prefix + (f'out_norm{idx}', 'scale' if leaf == 'weight' else 'bias'), v)
