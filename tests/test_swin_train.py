"""Swin-Tiny training-path smoke test: AdamW step runs, losses finite, and
stochastic depth draws rngs correctly in train mode."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.train_state import (create_train_state,
                                            make_anchors_for, make_train_step)

IMG = 64


def test_swin_train_step(rng):
    # base_lr raised from the production 5e-5 so the overfit signal is
    # unambiguous within a short test; the AdamW/stochastic-depth path is
    # exercised identically.
    cfg = get_config('swin_tiny_custom', mode='train', img_size=IMG,
                     max_gt=4, train_bs=2, base_lr=1e-3)
    assert cfg.optimizer == 'adamw'
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, make_anchors_for(cfg))

    b, g = 2, 4
    xy1 = rng.uniform(0, 0.5, size=(b, g, 2)).astype(np.float32)
    wh = rng.uniform(0.2, 0.4, size=(b, g, 2)).astype(np.float32)
    batch = dict(
        image=jnp.asarray(rng.rand(b, IMG, IMG, 3).astype(np.float32)),
        boxes=jnp.asarray(np.concatenate([xy1, xy1 + wh], 2)),
        labels=jnp.asarray(rng.randint(0, 4, size=(b, g)).astype(np.int32)),
        valid=jnp.ones((b, g), bool),
        masks_proto=jnp.asarray(
            (rng.rand(b, g, IMG // 4, IMG // 4) > 0.5).astype(np.uint8)),
        masks_seg=jnp.asarray(
            (rng.rand(b, g, IMG // 8, IMG // 8) > 0.5).astype(np.uint8)),
    )
    history = []
    for i in range(12):
        state, losses = step_fn(state, batch, jax.random.PRNGKey(7))
        total = float(losses.total)
        assert np.isfinite(total), f'non-finite loss at step {i}'
        history.append(total)
    # repeated AdamW steps on one batch must reduce the loss (windowed
    # comparison — warmup keeps the first steps small)
    assert np.mean(history[-3:]) < np.mean(history[:3]), \
        f'no overfit on the swin/AdamW path: {history}'
