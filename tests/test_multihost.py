"""Multi-host data parallelism: a 2-process x 4-virtual-device world (the
CPU-mesh analog of a 2-host pod over DCN) must train identically to one
process with 8 devices.

Covers the full multi-host contract end to end: initialize_distributed's
YOLACT_COORDINATOR env path (train.py's dist.init_process_group analog),
per-process loader rows (global_bs/process_count), shard_batch's
jax.make_array_from_process_local_data assembly, and the jit-induced
cross-process gradient all-reduce (Gloo on CPU, ICI/DCN collectives on a
real pod). The reference gets the equivalent via torch DDP + env:// NCCL
init (config.py:229-235) but has no way to test it without real GPUs —
this harness is the SURVEY §4 answer to that gap.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.parallel.mesh import make_mesh, shard_batch
from yolact_minimal_tpu.train_state import (create_train_state,
                                            make_anchors_for, make_train_step)

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKER = os.path.join(_HERE, '_multihost_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f'proc{i}.npz') for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   YOLACT_COORDINATOR=f'127.0.0.1:{port}',
                   YOLACT_NUM_PROCESSES='2',
                   YOLACT_PROCESS_ID=str(pid),
                   PYTHONPATH=os.path.dirname(_HERE))
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, outs[pid]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(_HERE)))
    logs = []
    for p in procs:
        try:
            # generous bound: this environment has ONE host core, so two
            # worker compiles + any concurrent load serialize onto it
            # (measured ~6 min unloaded, >15 min under a parallel bench run)
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), \
        f'worker failed:\n{logs[0][-2000:]}\n---\n{logs[1][-2000:]}'

    data = np.load(outs[0])
    data1 = np.load(outs[1])
    mh_losses = data['losses']
    n_leaves = len(data.files) - 1
    mh_params = [data[f'p{i}'] for i in range(n_leaves)]

    # replication consistency: after two steps through cross-process
    # collectives, both processes must hold the same parameters — any
    # desync (e.g. a process applying only its local gradient) shows here
    np.testing.assert_allclose(data1['losses'], mh_losses, rtol=1e-6)
    for i in range(n_leaves):
        np.testing.assert_allclose(data1[f'p{i}'], mh_params[i], atol=1e-6,
                                   err_msg=f'process param desync, leaf {i}')

    # single-process reference: same global batch on the in-session
    # 8-device CPU mesh (same worker code path minus the process split)
    sys.path.insert(0, _HERE)
    try:
        from _multihost_worker import synth_global_batch
    finally:
        sys.path.pop(0)
    cfg = get_config('res50_custom', mode='train', img_size=64, max_gt=4,
                     train_bs=8)
    step_fn = make_train_step(cfg, make_anchors_for(cfg))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    params_0 = jax.tree.leaves(jax.device_get(state.params))
    batch = synth_global_batch(64, 8, cfg.max_gt, len(cfg.class_names))
    sp_losses = []
    with make_mesh(8):
        for _ in range(2):
            state, losses = step_fn(state, shard_batch(batch, make_mesh(8)),
                                    jax.random.PRNGKey(1))
            sp_losses.append(float(losses.total))
    sp_params = jax.tree.leaves(jax.device_get(state.params))

    # step-1 loss: forward on IDENTICAL params + the same global batch —
    # only cross-process reassociation can differ (measured ~1e-5 relative),
    # so any batch-assembly error (dropped/duplicated rows, wrong row->shard
    # mapping, broken cross-shard BN stats) fails this tight bound
    np.testing.assert_allclose(mh_losses[0], sp_losses[0], rtol=1e-4,
                               err_msg='step-1 loss: global batch assembly '
                                       'or cross-process reduction is wrong')
    # step-2 loss reflects the step-1 UPDATE through a second forward: a
    # mis-scaled gradient mean (e.g. local mean instead of global) shifts it
    # far beyond this bound
    np.testing.assert_allclose(mh_losses[1], sp_losses[1], rtol=1e-2,
                               err_msg='step-2 loss: update diverged')
    # params: loose bound only — fp32 reassociation noise flips discrete
    # OHEM/top-k selections on this near-tie synthetic data, which perturbs
    # gradients by up to ~half the update across two steps (measured,
    # run-to-run variant); a missing all-reduce diverges at the FULL
    # update+ on many leaves at once, which this still catches
    bad = sum(float(np.max(np.abs(a - b))) >
              1e-3 + 0.75 * float(np.max(np.abs(b - z)))
              for a, b, z in zip(mh_params, sp_params, params_0))
    assert bad == 0, f'{bad}/{len(mh_params)} leaves diverged beyond 3/4 of ' \
                     f'their update magnitude'


def test_loader_shards_rows_across_processes():
    """TrainLoader yields global_bs/process_count rows per process, the same
    batch count everywhere, and disjoint index shards (DistributedSampler
    semantics, reference train.py:77)."""
    from yolact_minimal_tpu.data.coco import TrainLoader

    class FakeDS:
        def __len__(self):
            return 103

    cfg = get_config('res50_custom', mode='train', img_size=64)
    loaders = [TrainLoader(FakeDS(), cfg, batch_size=8, num_workers=1,
                           seed=3, process_index=p, process_count=2)
               for p in range(2)]
    for ld in loaders:
        ld.epoch = 1
    plans = [ld._epoch_indices() for ld in loaders]
    # 103 rows -> 51 per process -> 12 local batches of 8/2 = 4 rows
    assert plans[0].shape == plans[1].shape == (12, 4)
    assert not set(plans[0].ravel()) & set(plans[1].ravel())
    with pytest.raises(ValueError, match='divide'):
        TrainLoader(FakeDS(), cfg, batch_size=9, num_workers=1,
                    process_index=0, process_count=2)
