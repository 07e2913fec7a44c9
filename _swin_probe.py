"""Progressive swin sub-graph probe to localize the TPU worker kill."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn

DTYPE = jnp.bfloat16 if len(sys.argv) > 1 and sys.argv[1] == 'bf16' else jnp.float32
from yolact_minimal_tpu.models import swin as S

print('devices:', jax.devices(), flush=True)
t0=time.time()
print('sanity matmul:', float(jax.device_get(jnp.sum(jnp.ones((256,256)) @ jnp.ones((256,256))))), f'{time.time()-t0:.1f}s', flush=True)

def run(name, module, x, **kw):
    t0 = time.time()
    print(f'probe {name}: init...', flush=True)
    vs = module.init(jax.random.PRNGKey(0), x, **kw)
    print(f'probe {name}: init done {time.time()-t0:.1f}s, apply...', flush=True)
    f = jax.jit(lambda v, x: module.apply(v, x, **kw))
    out = f(vs, x)
    leaf = jax.tree.leaves(out)[0]
    val = float(jax.device_get(leaf.reshape(-1)[0]))
    print(f'probe {name}: OK ({time.time()-t0:.1f}s, val={val:.4f})', flush=True)

B, H = 1, 224
x_img = jnp.asarray(np.random.RandomState(0).rand(B, H, H, 3).astype(np.float32))
print('input staged', flush=True)

class PatchOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(96, (4,4), strides=(4,4), padding='VALID', dtype=DTYPE, name='pe')(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=DTYPE)(x)
run('patch_embed', PatchOnly(), x_img)

x56 = jnp.asarray(np.random.RandomState(1).rand(B, 56, 56, 96).astype(np.float32))
run('wmsa_block', S.SwinBlock(96, 3, shift=0, drop_path_rate=0.0, dtype=DTYPE), x56)
run('swmsa_block', S.SwinBlock(96, 3, shift=3, drop_path_rate=0.0, dtype=DTYPE), x56)
run('patch_merge', S.PatchMerging(96, dtype=DTYPE), x56)
run('stage0', S.SwinStage(96, 2, 3, (0.0, 0.0), True, dtype=DTYPE), x56, train=False)
run('full_backbone', S.SwinTiny(dtype=DTYPE), x_img, train=False)
print('ALL PROBES PASSED', flush=True)
