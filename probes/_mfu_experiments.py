"""Round-3 MFU experiments (VERDICT #5): measured attempts to push the
res50 detect backbone beyond 0.32 MFU. Each experiment is one subprocess
(fresh client) started by run_all(); results print as JSON lines.

Run: python _mfu_experiments.py          # all experiments, isolated
     python _mfu_experiments.py <name>   # one experiment in-process
"""
import json
import os
import subprocess
import sys
import time


def _bench_detect(batch, img_size=544, extra_env=None, n_iters=20):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _cost_flops, _mfu
    from yolact_minimal_tpu.config import get_config
    from yolact_minimal_tpu.models.yolact import Yolact
    from yolact_minimal_tpu.pipeline import Detector

    cfg = get_config('res50_coco', mode='val', img_size=img_size,
                     compute_dtype='bfloat16')
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img_size, img_size, 3), jnp.float32),
                           train=False)
    det = Detector(cfg, variables)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, img_size, img_size, 3)
        .astype(np.float32))

    @jax.jit
    def perturb(images, scores):
        return images + (scores[0, 0] * 0).astype(images.dtype)

    out = det.detect_fixed(images, img_size)
    imgs_i = perturb(images, out[0].scores)
    out = det.detect_fixed(imgs_i, img_size)
    jax.device_get(out[0].scores[0, 0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        imgs_i = perturb(imgs_i, out[0].scores)
        out = det.detect_fixed(imgs_i, img_size)
    jax.device_get(out[0].scores[0, 0])
    dt = time.perf_counter() - t0
    flops = _cost_flops(jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    ).lower(det.variables, images))
    return {'img_per_s': round(n_iters * batch / dt, 2),
            'mfu': _mfu(flops, n_iters / dt, 'bfloat16')}


EXPERIMENTS = {
    # batch scaling: more rows per dispatch amortizes per-call overhead and
    # deepens XLA's pipeline
    'b8': lambda: _bench_detect(8),
    'b16': lambda: _bench_detect(16),
    'b32': lambda: _bench_detect(32),
    'b64': lambda: _bench_detect(64),
}

# env-var experiments: XLA flags must be set before the client initializes,
# so they ride the subprocess env rather than in-process switches
ENV_EXPERIMENTS = {
    'b16_latency_hiding': {
        'XLA_FLAGS': '--xla_tpu_enable_latency_hiding_scheduler=true'},
    'b32_latency_hiding': {
        'XLA_FLAGS': '--xla_tpu_enable_latency_hiding_scheduler=true'},
}


def run_all():
    for name in EXPERIMENTS:
        env = dict(os.environ)
        env.update(ENV_EXPERIMENTS.get(name, {}))
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=720, env=env)
            line = [l for l in p.stdout.splitlines() if l.startswith('{')]
            print(f'{name}: {line[-1] if line else "NO OUTPUT rc=" + str(p.returncode)}',
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f'{name}: TIMEOUT (worker dead?)', flush=True)
    for name, env_extra in ENV_EXPERIMENTS.items():
        batch = name.split('_')[0]
        env = dict(os.environ)
        env.update(env_extra)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), batch],
                capture_output=True, text=True, timeout=720, env=env)
            line = [l for l in p.stdout.splitlines() if l.startswith('{')]
            print(f'{name}: {line[-1] if line else "NO OUTPUT rc=" + str(p.returncode)}',
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f'{name}: TIMEOUT (worker dead?)', flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1:
        print(json.dumps(EXPERIMENTS[sys.argv[1]]()))
    else:
        run_all()
