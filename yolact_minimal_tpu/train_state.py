"""Training state, optimizer schedule, and the jitted train step.

TPU-native rebuild of the reference training loop core
(/root/reference/train.py:96-135): the per-step Python LR mutation becomes an
optax schedule with identical values; DDP's gradient all-reduce becomes XLA
collectives induced by jit-with-sharding over the data mesh axis; BN running
stats flow through flax's mutable `batch_stats` (DDP's broadcast_buffers has
no analog — stats are computed over the replicated graph consistently).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from yolact_minimal_tpu.config import Config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops import boxes as box_ops
from yolact_minimal_tpu.ops.losses import LossBreakdown, compute_loss


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def lr_schedule(cfg: Config):
    """Reproduces the reference LR policy exactly (train.py:103-109):
    linear warmup from 0.1*lr over `warmup_until` steps, then x0.1 decay at
    each entry of lr_steps (entry 0 is step 0 -> factor 1)."""
    lr, warm_init, warm_until = cfg.lr, cfg.warmup_init, cfg.warmup_until
    steps = jnp.asarray(cfg.lr_steps, dtype=jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (lr - warm_init) * (step / warm_until) + warm_init
        decay_idx = jnp.sum(step >= steps) - 1
        decayed = lr * 0.1 ** decay_idx
        return jnp.where((warm_until > 0) & (step <= warm_until),
                         jnp.minimum(warm, decayed), decayed)

    return schedule


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """SGD(momentum .9, coupled wd 5e-4) for resnets; AdamW(wd .05) for swin
    (reference train.py:60-65)."""
    sched = lr_schedule(cfg)
    if cfg.optimizer == 'sgd':
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),   # torch coupled L2
            optax.sgd(sched, momentum=cfg.momentum))
    elif cfg.optimizer == 'adamw':
        return optax.adamw(sched, weight_decay=cfg.weight_decay)
    raise ValueError(f'Unknown optimizer {cfg.optimizer!r}')


def create_train_state(cfg: Config, rng, variables: Optional[dict] = None,
                       step: int = 0,
                       backbone_variables: Optional[dict] = None) -> TrainState:
    """`backbone_variables` (converted by utils/weights.py
    convert_backbone_state_dict) grafts a pretrained backbone over the fresh
    init — the reference's `net.backbone.init_backbone(cfg.weight)` path
    (train.py:56): strict for resnets, lenient for swin."""
    model = Yolact(cfg=cfg, train_mode=True)
    if variables is None:
        dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
        variables = model.init(rng, dummy, train=True)
        if backbone_variables is not None:
            from yolact_minimal_tpu.utils.weights import graft_backbone
            variables = graft_backbone(variables, backbone_variables,
                                       strict=cfg.backbone != 'swin_tiny')
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables['params'],
        tx=make_optimizer(cfg),
        batch_stats=variables.get('batch_stats'),
    )
    if step:
        state = state.replace(step=step)
    return state


def make_train_step(cfg: Config, anchors, mesh=None):
    """Build the jitted train step. `batch` is a dict of device arrays:
    image [B,S,S,3], boxes [B,G,4], labels [B,G], valid [B,G],
    masks_proto [B,G,S/4,S/4], masks_seg [B,G,S/8,S/8]. With `mesh` the
    fused swin window attention shard_maps over the data axis (otherwise
    GSPMD alone partitions the graph; the kernel has no partitioning rule)."""
    anchors = jnp.asarray(anchors)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng):
        from yolact_minimal_tpu.ops.window_attention import set_spmd_mesh
        rng = jax.random.fold_in(rng, state.step)
        loss_rng, dropout_rng = jax.random.split(rng)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats is not None:      # BN backbones only
                variables['batch_stats'] = state.batch_stats
            # trace-time declaration of the fused-window-attention mesh
            # (no-op at runtime); reset in finally so it never leaks into
            # other traces in the same process
            set_spmd_mesh(mesh)
            try:
                outputs, mutated = state.apply_fn(
                    variables, batch['image'], train=True,
                    mutable=['batch_stats'], rngs={'dropout': dropout_rng})
            finally:
                set_spmd_mesh(None)
            losses: LossBreakdown = compute_loss(cfg, outputs, batch, anchors,
                                                 loss_rng)
            return losses.total, (losses, mutated)

        grads, (losses, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_stats = mutated.get('batch_stats') or state.batch_stats
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, losses

    return train_step


def make_train_step_split(cfg: Config, anchors, groups=None, mesh=None):
    """Fallback train step for the fp32@544 operating point, where the
    COMBINED four-loss backward reproducibly faults this TPU backend's
    worker while every per-loss backward passes (round-3 bisection,
    docs/ARCHITECTURE.md "TPU worker kills"). Each loss group's gradient
    runs as its OWN XLA executable/dispatch — the known-good graphs — and
    the gradients are summed on device before a single optimizer apply.

    Numerically identical to make_train_step (same rng folding, so the
    lincomb mask subsample matches; gradients differ only by float
    summation order) at ~len(groups)x the forward/backward cost. It exists
    to keep the reference's default fp32 @ 544 training point AVAILABLE
    (reference /root/reference/train.py:96-135 trains fp32); bf16 remains
    the fast path.

    groups: tuple of index tuples over (loss_c, loss_b, loss_m, loss_s);
    default one dispatch per loss (the maximally safe grouping). The
    round-5 hardware bisection (probes/_fp32_group_bisect.py) validated
    ((0, 1), (2, 3)) — class+box | mask+semantic — at 544/b8: 112.9
    ms/step, halving the 4-way split's cost; train.py passes it at the
    fault boundary."""
    anchors = jnp.asarray(anchors)
    if groups is None:
        groups = ((0,), (1,), (2,), (3,))

    def make_group_fn(idxs, with_aux):
        @jax.jit
        def group_grad(state: TrainState, batch: dict, rng):
            from yolact_minimal_tpu.ops.window_attention import set_spmd_mesh
            rng = jax.random.fold_in(rng, state.step)
            loss_rng, dropout_rng = jax.random.split(rng)

            def loss_fn(params):
                variables = {'params': params}
                if state.batch_stats is not None:
                    variables['batch_stats'] = state.batch_stats
                set_spmd_mesh(mesh)
                try:
                    outputs, mutated = state.apply_fn(
                        variables, batch['image'], train=True,
                        mutable=['batch_stats'], rngs={'dropout': dropout_rng})
                finally:
                    set_spmd_mesh(None)
                losses = compute_loss(cfg, outputs, batch, anchors, loss_rng)
                part = sum(losses[i] for i in idxs)
                return part, (losses, mutated)

            grads, (losses, mutated) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            if with_aux:
                return grads, losses, mutated.get('batch_stats')
            # losses/stats dropped -> XLA DCE trims this graph to exactly
            # the per-loss-group forward+backward the probes validated
            return grads

        return group_grad

    group_fns = [make_group_fn(g, with_aux=(i == 0))
                 for i, g in enumerate(groups)]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def apply_grads(state: TrainState, grads_list, new_stats):
        grads = jax.tree_util.tree_map(lambda *gs: sum(gs), *grads_list)
        if new_stats is None:
            new_stats = state.batch_stats
        return state.apply_gradients(grads=grads, batch_stats=new_stats)

    def train_step(state: TrainState, batch: dict, rng):
        grads_list = []
        losses = new_stats = None
        for i, fn in enumerate(group_fns):
            if i == 0:
                g, losses, new_stats = fn(state, batch, rng)
            else:
                g = fn(state, batch, rng)
            grads_list.append(g)
        state = apply_grads(state, grads_list, new_stats)
        return state, losses

    return train_step


def make_anchors_for(cfg: Config):
    return box_ops.make_anchors(cfg.img_size, cfg.aspect_ratios, cfg.scales)


def opt_state_to_payload(opt_state) -> dict:
    """Serialize-friendly dict form of the optax state (namedtuples/chains
    become nested {'0': ..., 'count': ...} dicts)."""
    import flax.serialization as fser
    return fser.to_state_dict(jax.device_get(opt_state))


def restore_opt_state(state: TrainState, payload: dict) -> TrainState:
    """Restore a checkpointed optimizer payload (momentum/moments + schedule
    counts) into a freshly created state."""
    import flax.serialization as fser
    return state.replace(
        opt_state=fser.from_state_dict(state.opt_state, payload))


def fast_forward_schedule(state: TrainState, step: int) -> TrainState:
    """For checkpoints without an opt_state payload (reference .pth, old
    .ckpt): advance every optax `count` leaf to `step` so the LR schedule
    resumes at the right position instead of silently replaying warmup/decay
    from zero (the optimizer's internal count — not TrainState.step — is what
    drives the schedule)."""
    import flax.serialization as fser
    sd = fser.to_state_dict(state.opt_state)

    def fix(node):
        if isinstance(node, dict):
            return {k: (jnp.asarray(step, v.dtype) if k == 'count'
                        else fix(v)) for k, v in node.items()}
        return node

    return state.replace(
        opt_state=fser.from_state_dict(state.opt_state, fix(sd)))
