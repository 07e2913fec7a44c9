"""AOT deployment: serialize the jitted inference graph to a standalone
artifact and run it without the model-building code.

TPU-native replacement for the reference's ONNX/TensorRT export tier
(/root/reference/export2onnx.py, export2trt.py): `export_model` lowers the
eval forward with jax.export (StableHLO), writes a self-contained .jexport
artifact (serialized graph + config metadata + anchors), and runs the same
immediate parity check the reference does after export (export2onnx.py:36-46).
`load_exported` restores a callable whose outputs feed the numpy-twin
postprocess (ops/nms_numpy.py) — the analog of the ONNXRuntime/TensorRT
drivers' host pipelines.
"""
from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Callable, Tuple

import numpy as np

from yolact_minimal_tpu.config import Config, get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops.boxes import make_anchors

_META_FIELDS = ('name', 'img_size', 'compute_dtype')


def export_model(cfg: Config, variables: dict, out_path: str,
                 check_parity: bool = True, batch: int = 1) -> str:
    """Serialize the raw eval forward (params baked in as constants) plus
    metadata + anchors into one artifact file. `batch` is the compiled batch
    size: the reference's TRT engine is built explicit-batch=1
    (/root/reference/export2trt.py:14-32); on TPU a batch>1 artifact
    multiplies deploy throughput and the driver pads the tail chunk."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    model = Yolact(cfg=cfg, train_mode=False)
    # `or {}`: swin latest_*.ckpt train payloads carry batch_stats=None
    # (LayerNorm-only backbone) — a None collection breaks flax apply
    frozen = jax.device_put({'params': variables['params'],
                             'batch_stats': variables.get('batch_stats') or {}})

    def forward(images):
        return model.apply(frozen, images, train=False)

    shape = jax.ShapeDtypeStruct((batch, cfg.img_size, cfg.img_size, 3),
                                 jnp.float32)
    exported = jexport.export(jax.jit(forward))(shape)
    blob = exported.serialize()

    anchors = make_anchors(cfg.img_size, cfg.aspect_ratios, cfg.scales)
    meta = {f: getattr(cfg, f) for f in _META_FIELDS}
    meta['class_names'] = list(cfg.class_names)
    meta['batch'] = batch

    with zipfile.ZipFile(out_path, 'w') as z:
        z.writestr('graph.stablehlo', blob)
        z.writestr('meta.json', json.dumps(meta))
        buf = io.BytesIO()
        np.save(buf, anchors)
        z.writestr('anchors.npy', buf.getvalue())

    if check_parity:
        img = np.random.RandomState(0).rand(
            batch, cfg.img_size, cfg.img_size, 3).astype(np.float32)
        live = jax.jit(forward)(jnp.asarray(img))
        restored, _, _ = load_exported(out_path)
        again = restored(img)
        for a, b in zip(live, again):
            diff = float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            assert diff < 1.0, f'Export parity check failed: sum|diff|={diff}'
        print('Export parity check passed.')
    return out_path


def load_exported(path: str) -> Tuple[Callable, dict, np.ndarray]:
    """Restore (callable(images)->(class_p, box_p, coef_p, proto), meta,
    anchors) from an exported artifact."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        blob = z.read('graph.stablehlo')
        meta = json.loads(z.read('meta.json'))
        anchors = np.load(io.BytesIO(z.read('anchors.npy')))
    exported = jexport.deserialize(blob)

    def call(images: np.ndarray):
        return exported.call(images)

    return call, meta, anchors
