"""Worker process for the multi-host DP test (tests/test_multihost.py).

Each of N processes owns 4 virtual CPU devices, joins the distributed
runtime through the YOLACT_COORDINATOR env contract (the same path
train.py uses), contributes its global_bs/N rows via shard_batch /
jax.make_array_from_process_local_data, and runs two jitted train steps
over the global 1-D data mesh. Process 0 saves losses + updated params for
the parent to compare against a single-process run on the same global
batch.

Usage: python _multihost_worker.py <out.npz>  (config via env vars)
"""
import os
import sys


def synth_global_batch(img: int, b: int, g: int, num_classes: int):
    """Deterministic synthetic global batch — every process derives the
    same one and slices out its own rows."""
    import numpy as np
    rng = np.random.RandomState(0)
    xy1 = rng.uniform(0, 0.5, size=(b, g, 2)).astype(np.float32)
    wh = rng.uniform(0.2, 0.4, size=(b, g, 2)).astype(np.float32)
    return dict(
        image=rng.rand(b, img, img, 3).astype(np.float32),
        boxes=np.concatenate([xy1, xy1 + wh], axis=2),
        labels=rng.randint(0, num_classes, size=(b, g)).astype(np.int32),
        valid=np.ones((b, g), bool),
        masks_proto=(rng.rand(b, g, img // 4, img // 4) > 0.5).astype(np.float32),
        masks_seg=(rng.rand(b, g, img // 8, img // 8) > 0.5).astype(np.float32),
    )


def main():
    out_path = sys.argv[1]
    os.environ['JAX_PLATFORMS'] = 'cpu'
    # drop any inherited device-count flag (the pytest session exports 8)
    # before pinning this process to its own 4 virtual devices
    flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    flags.append('--xla_force_host_platform_device_count=4')
    os.environ['XLA_FLAGS'] = ' '.join(flags)

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from yolact_minimal_tpu.parallel.mesh import (initialize_distributed,
                                                  is_main_process, make_mesh,
                                                  shard_batch)
    assert initialize_distributed(), 'YOLACT_COORDINATOR not set?'
    assert jax.process_count() > 1, 'expected a multi-process world'

    import numpy as np
    from yolact_minimal_tpu.config import get_config
    from yolact_minimal_tpu.train_state import (create_train_state,
                                                make_anchors_for,
                                                make_train_step)

    img, global_bs = 64, 8
    pidx, pcount = jax.process_index(), jax.process_count()
    local_bs = global_bs // pcount
    cfg = get_config('res50_custom', mode='train', img_size=img, max_gt=4,
                     train_bs=global_bs)
    step_fn = make_train_step(cfg, make_anchors_for(cfg))
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    full = synth_global_batch(img, global_bs, cfg.max_gt, len(cfg.class_names))
    local = {k: v[pidx * local_bs:(pidx + 1) * local_bs] for k, v in full.items()}

    mesh = make_mesh()
    assert mesh.devices.size == 8, mesh.devices
    losses_out = []
    with mesh:
        for _ in range(2):
            sharded = shard_batch(local, mesh)
            state, losses = step_fn(state, sharded, jax.random.PRNGKey(1))
            losses_out.append(float(losses.total))

    # every process saves its (replicated) params — the parent checks the
    # processes stayed bit-synchronized and close to the 1-process run
    params = jax.device_get(state.params)
    flat = {f'p{i}': np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(params))}
    np.savez(out_path, losses=np.array(losses_out), **flat)
    print(f'worker {pidx}: losses={losses_out}', flush=True)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
