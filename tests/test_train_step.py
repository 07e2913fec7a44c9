"""Training-step tests: LR schedule parity, single-step mechanics, tiny
overfit (loss decreases), and an 8-device data-parallel step on the virtual
CPU mesh."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.data.coco import COCODetection, assemble_train_batch
from yolact_minimal_tpu.data.synthetic import generate_dataset
from yolact_minimal_tpu.parallel.mesh import make_mesh, shard_batch
from yolact_minimal_tpu.train_state import (create_train_state, lr_schedule,
                                            make_anchors_for, make_train_step)

IMG = 128


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth_train')
    img_dir, ann = generate_dataset(str(root), num_images=4, img_size=256,
                                    num_classes=4, seed=7)
    cfg = get_config('res50_custom', mode='train', img_size=IMG,
                     train_imgs=img_dir, train_ann=ann,
                     val_imgs=img_dir, val_ann=ann, max_gt=16, train_bs=8)
    ds = COCODetection(cfg, mode='train')
    import random
    samples = []
    i = 0
    rnd = random.Random(0)
    # 8 DISTINCT augmented samples: the DP-consistency test needs tie-free
    # scores — duplicated rows create exact OHEM/top-k ties that flip under
    # BN reassociation noise across shardings (measured: 3e-4 relative loss
    # diff with duplicates vs 7e-6 with distinct samples)
    while len(samples) < 8:
        s = ds.get_train(i % len(ds), rnd)
        if s is not None:
            samples.append(s)
        i += 1
    batch = assemble_train_batch(samples[:2], cfg)
    batch8 = assemble_train_batch(samples, cfg)
    return cfg, batch, batch8


def test_lr_schedule_matches_reference_policy():
    """Replicates train.py:103-109: warmup to step 500, then x0.1 at each
    lr_step."""
    cfg = get_config('res101_coco', mode='train', train_bs=8)
    sched = lr_schedule(cfg)
    lr, wi = cfg.lr, cfg.warmup_init
    assert float(sched(0)) == pytest.approx(wi)
    assert float(sched(250)) == pytest.approx((lr - wi) * 0.5 + wi)
    assert float(sched(500)) == pytest.approx(lr)
    assert float(sched(100000)) == pytest.approx(lr)
    assert float(sched(280000)) == pytest.approx(lr * 0.1)
    assert float(sched(600000)) == pytest.approx(lr * 0.01)
    assert float(sched(650000)) == pytest.approx(lr * 0.001)


def test_train_step_runs_and_overfits(setup):
    cfg, batch, _ = setup
    anchors = make_anchors_for(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, anchors)
    rng = jax.random.PRNGKey(42)

    batch = jax.tree.map(jnp.asarray, batch)
    history = []
    for i in range(24):
        state, losses = step_fn(state, batch, rng)
        vals = jax.tree.map(float, losses)
        assert all(np.isfinite(v) for v in vals), f'non-finite loss at {i}: {vals}'
        history.append(vals.total)
    # repeated steps on one batch must reduce the loss (warmup LR is tiny at
    # the start, so compare windows rather than endpoints)
    assert np.mean(history[-4:]) < np.mean(history[:4]), f'no overfit: {history}'


def test_train_step_multichip(setup):
    """Full data-parallel step over the 8-device CPU mesh: batch sharded on
    'data', params replicated; XLA inserts the gradient all-reduce. Pins DP
    consistency in CI: the sharded step must produce the same losses and
    params as a 1-device step on the same global batch (the same assertion
    __graft_entry__.dryrun_multichip makes for the driver gate)."""
    cfg, _, big = setup
    anchors = make_anchors_for(cfg)
    step_fn = make_train_step(cfg, anchors)

    def run(mesh):
        # the step donates its state — build a fresh identical one per mesh
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        params_0 = jax.device_get(state.params)
        with mesh:
            sharded = shard_batch(big, mesh)
            state, losses = step_fn(state, sharded, jax.random.PRNGKey(1))
        return params_0, jax.device_get(state.params), float(losses.total)

    params_0, params_8, total_8 = run(make_mesh(8))
    assert np.isfinite(total_8)
    _, params_1, total_1 = run(make_mesh(1))
    # loss rtol 1e-3: the batch mean is summed in shard-local partials on the
    # 8-device mesh, and fp32 reassociation over ~OHEM-sized sums reaches
    # ~2e-4 relative on this fixture (measured)
    np.testing.assert_allclose(total_1, total_8, rtol=1e-3)

    # tolerance relative to the update magnitude: different shardings sum
    # gradients in a different order (fp reassociation), so exact equality
    # is not expected — see __graft_entry__.py for the measured bound
    def leaf_excess(a, b, p0):
        a, b, p0 = np.asarray(a), np.asarray(b), np.asarray(p0)
        return float(np.max(np.abs(a - b))) - \
            (2e-4 + 0.15 * float(np.max(np.abs(a - p0))))

    worst = max(jax.tree.leaves(
        jax.tree.map(leaf_excess, params_8, params_1, params_0)))
    assert worst <= 0, f'DP param divergence exceeds tolerance by {worst:.2e}'


def test_split_step_matches_fused(setup):
    """The per-loss-backward split step (the fp32@544 TPU fallback) must
    produce the same losses and the same updated params as the fused step —
    same rng folding, so the lincomb subsample matches; gradients differ
    only by float summation order."""
    from yolact_minimal_tpu.train_state import make_train_step_split

    cfg, batch, _ = setup
    anchors = make_anchors_for(cfg)
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(42)

    def run(step_fn):
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        p0 = jax.device_get(state.params)
        state, losses = step_fn(state, batch, rng)
        return p0, jax.device_get(state.params), jax.tree.map(float, losses)

    p0, params_f, losses_f = run(make_train_step(cfg, anchors))
    _, params_s, losses_s = run(make_train_step_split(cfg, anchors))
    _, params_p, _ = run(make_train_step_split(
        cfg, anchors, groups=((0, 1), (2, 3))))

    np.testing.assert_allclose(losses_f.total, losses_s.total, rtol=1e-5)

    def leaf_excess(a, b, q0):
        a, b, q0 = np.asarray(a), np.asarray(b), np.asarray(q0)
        return float(np.max(np.abs(a - b))) - \
            (2e-4 + 0.15 * float(np.max(np.abs(a - q0))))

    for variant in (params_s, params_p):
        worst = max(jax.tree.leaves(
            jax.tree.map(leaf_excess, variant, params_f, p0)))
        assert worst <= 0, f'split-step divergence exceeds tol by {worst:.2e}'
