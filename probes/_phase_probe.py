import time
T0=time.perf_counter()
def mark(s): print(f'{time.perf_counter()-T0:8.1f}s  {s}', flush=True)
from yolact_minimal_tpu.utils.compile_cache import enable
enable(); mark('cache enabled')
import jax, jax.numpy as jnp, numpy as np
mark('jax imported')
d = jax.devices(); mark(f'devices: {d}')
from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector
cfg = get_config('res50_coco', mode='val', img_size=544, compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
with jax.default_device(jax.devices('cpu')[0]):
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,544,544,3), jnp.float32), train=False)
mark('init on cpu')
variables = jax.device_put(variables, jax.devices()[0])
jax.block_until_ready(variables); mark('H2D params')
det = Detector(cfg, variables)
images = jnp.asarray(np.random.RandomState(0).rand(16,544,544,3).astype(np.float32))
out = det.detect_fixed(images, 544)
jax.device_get(out[0].scores[0,0]); mark('first detect_fixed call (compile/restore)')
out = det.detect_fixed(images, 544)
jax.device_get(out[0].scores[0,0]); mark('second call')
