#!/usr/bin/env python
"""Training CLI.

TPU-native rebuild of /root/reference/train.py: one jitted train step over a
1-D data mesh (replacing DDP/NCCL), host data pipeline with threaded
prefetch, per-10-step console/TensorBoard logging with ETA, in-training
validation every --val_interval steps with best/latest checkpointing under
the reference's filename contract, and Ctrl-C-safe save.
"""
from __future__ import annotations

import argparse
import datetime
import time

import numpy as np

from yolact_minimal_tpu.config import cfg_name_from_weight, get_config
from yolact_minimal_tpu.data.coco import COCODetection, TrainLoader
from yolact_minimal_tpu.parallel.mesh import (initialize_distributed,
                                              is_main_process, make_mesh,
                                              shard_batch)
from yolact_minimal_tpu.pipeline import Detector
from yolact_minimal_tpu.train_state import (create_train_state,
                                            fast_forward_schedule, lr_schedule,
                                            make_anchors_for, make_train_step,
                                            make_train_step_split,
                                            opt_state_to_payload,
                                            restore_opt_state)
from yolact_minimal_tpu.utils import timer
from yolact_minimal_tpu.utils.checkpoint import (load_weights_auto, save_best,
                                                 save_latest, step_from_name)


def _tb_writer(cfg_name):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(f'tensorboard_log/{cfg_name}')
    except ImportError:
        try:
            from torch.utils.tensorboard import SummaryWriter
            return SummaryWriter(f'tensorboard_log/{cfg_name}')
        except Exception:
            return None


def main():
    import jax

    from yolact_minimal_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser(description='YOLACT-TPU Training')
    parser.add_argument('--cfg', default='res101_coco')
    parser.add_argument('--train_bs', type=int, default=8,
                        help='Global training batch size (split over devices).')
    parser.add_argument('--img_size', type=int, default=544)
    parser.add_argument('--resume', default=None, type=str)
    parser.add_argument('--backbone_weight', default=None, type=str,
                        help='Pretrained backbone .pth for init when not '
                             'resuming (default: per-backbone path from the '
                             'config, loaded if the file exists).')
    parser.add_argument('--val_interval', type=int, default=4000)
    parser.add_argument('--val_num', type=int, default=-1)
    parser.add_argument('--val_bs', type=int, default=None,
                        help='Device batch size for in-training validation.')
    parser.add_argument('--coco_api', action='store_true')
    parser.add_argument('--traditional_nms', action='store_true')
    parser.add_argument('--num_workers', type=int, default=8)
    parser.add_argument('--compute_dtype', default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--remat', action='store_true',
                        help='Rematerialize backbone blocks in the backward '
                             'pass (less activation memory, extra forward '
                             'FLOPs) — for large images/batches.')
    parser.add_argument('--max_steps', type=int, default=-1,
                        help='Stop early after this many steps (debug).')
    parser.add_argument('--force', action='store_true',
                        help='Use the fused four-loss backward even at the '
                             'operating point known to crash the TPU worker '
                             '(fp32 at img_size >= 544, train_bs > 4); '
                             'without it that point falls back to the '
                             'per-loss-backward split step.')
    parser.add_argument('--lr', type=float, default=None,
                        help='Override the base learning rate.')
    parser.add_argument('--train_imgs', type=str, default=None)
    parser.add_argument('--train_ann', type=str, default=None)
    parser.add_argument('--val_imgs', type=str, default=None)
    parser.add_argument('--val_ann', type=str, default=None)
    args = parser.parse_args()

    overrides = {k: v for k, v in (
        ('base_lr', args.lr), ('train_imgs', args.train_imgs),
        ('train_ann', args.train_ann), ('val_imgs', args.val_imgs),
        ('val_ann', args.val_ann), ('val_bs', args.val_bs)) if v is not None}
    cfg = get_config(args.cfg, mode='train', img_size=args.img_size,
                     train_bs=args.train_bs, val_interval=args.val_interval,
                     val_num=args.val_num, coco_api=args.coco_api,
                     compute_dtype=args.compute_dtype, remat=args.remat,
                     traditional_nms=args.traditional_nms, **overrides)
    # Multi-host: join the distributed runtime BEFORE the first backend
    # touch (jax.default_backend() below initializes the client). No-op
    # unless YOLACT_COORDINATOR is configured; see parallel/mesh.py.
    if initialize_distributed():
        print(f'Joined distributed runtime: process {jax.process_index()} '
              f'of {jax.process_count()}, {len(jax.devices())} global / '
              f'{len(jax.local_devices())} local devices.')

    # Known-fatal operating point on this TPU backend: the COMBINED
    # four-loss fp32 backward at img_size >= 544 with train_bs > 4
    # reproducibly kills the worker, while every per-loss backward passes
    # (round-3 bisection, probes/_fp32_probe*.py: execution-level backend
    # fault, not OOM — compiler accounts 5.4 GB of 16 GB HBM; --remat does
    # not help). The split train step dispatches loss-GROUP backwards as
    # separate executables and sums gradients on device, keeping the
    # reference's fp32 default point available. Round-5 bisection
    # (probes/_fp32_group_bisect.py) validated the 2-group split
    # (class+box | mask+semantic): 112.9 ms/step (70.9 img/s) at 544/b8 —
    # ~2x the estimated fused-fp32 cost instead of the 4-way split's ~4x.
    # --force runs the fused step anyway.
    use_split_step = (cfg.compute_dtype == 'float32' and cfg.img_size >= 544
                      and cfg.train_bs > 4
                      and jax.default_backend() != 'cpu' and not args.force)
    split_groups = ((0, 1), (2, 3))   # validated on hardware, round 5
    if use_split_step:
        print('NOTE: fp32 training at img_size>=544/train_bs>4 uses the '
              '2-group split step on this backend (the fused four-loss '
              'backward faults the TPU worker; see docs/ARCHITECTURE.md). '
              'Expect ~2x step cost; --compute_dtype bfloat16 is the '
              'fast path.')

    main_proc = is_main_process()
    if main_proc:
        cfg.print_cfg()

    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert cfg.train_bs % n_dev == 0, \
        f'global train_bs {cfg.train_bs} must divide over {n_dev} devices.'
    # multi-device DP keeps the fused window-attention fast path: the
    # kernel shard_maps over the data axis (ops/window_attention.py,
    # mesh passed to make_train_step below)

    rng = jax.random.PRNGKey(0)
    anchors = make_anchors_for(cfg)

    start_step = 0
    variables = None
    backbone_variables = None
    opt_payload = None
    if args.resume:
        # exact cfg-name equality parsed from the filename (reference
        # train.py:51 regex semantics — 'res50_coco' must NOT match a
        # 'res50_coco_v2' weight, which a substring test would allow)
        assert cfg_name_from_weight(args.resume) == args.cfg, \
            'Resume weight is not compatible with current cfg.'
        variables = load_weights_auto(args.resume, include_semantic=True)
        opt_payload = variables.pop('opt_state', None)
        variables.pop('step', None)
        start_step = step_from_name(args.resume)
        print(f'Resumed from {args.resume} at step {start_step}.')
    else:
        # pretrained-backbone init (reference train.py:56): required when
        # --backbone_weight is given explicitly, best-effort on the
        # config's default path.
        bw = args.backbone_weight or cfg.backbone_weight
        import os.path as osp
        if args.backbone_weight and not osp.exists(bw):
            raise FileNotFoundError(f'--backbone_weight {bw!r} not found.')
        if bw and osp.exists(bw):
            from yolact_minimal_tpu.utils.weights import (
                convert_backbone_state_dict, load_torch_checkpoint)
            backbone_variables = convert_backbone_state_dict(
                load_torch_checkpoint(bw))
            print(f'\nBackbone is initiated with {bw}.\n')
        elif main_proc:
            print(f'\nNo pretrained backbone at {bw!r}; '
                  'training from random init.\n')
    state = create_train_state(cfg, rng, variables=variables, step=start_step,
                               backbone_variables=backbone_variables)
    if opt_payload is not None:
        state = restore_opt_state(state, opt_payload)
        print('Optimizer state (momentum/moments + schedule) restored.')
    elif start_step:
        state = fast_forward_schedule(state, start_step)
    if main_proc:
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(state.params))
        print(f'Number of all parameters: {n_params}\n')

    dataset = COCODetection(cfg, mode='train')
    loader = TrainLoader(dataset, cfg, batch_size=cfg.train_bs,
                         num_workers=args.num_workers, seed=0,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
    train_step = (make_train_step_split(cfg, anchors, groups=split_groups,
                                        mesh=mesh)
                  if use_split_step
                  else make_train_step(cfg, anchors, mesh=mesh))
    sched = lr_schedule(cfg)
    writer = _tb_writer(cfg.name) if main_proc else None

    step = start_step
    end_step = cfg.lr_steps[-1] if args.max_steps < 0 \
        else min(cfg.lr_steps[-1], start_step + args.max_steps)
    map_tables = []
    timer.reset()
    training, val_step, time_last = True, start_step, None
    data_rng = jax.random.PRNGKey(1)

    detector_cache = {}

    def _train_payload(state):
        """latest-checkpoint payload: weights + optimizer state + step, so
        resume is exact (momentum/moments and LR-schedule position)."""
        return {'params': jax.device_get(state.params),
                'batch_stats': jax.device_get(state.batch_stats),
                'opt_state': opt_state_to_payload(state.opt_state),
                'step': int(state.step)}

    def run_validation(step):
        val_cfg = cfg.replace(mode='val')
        host_vars = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        # build the jitted detector once; later rounds only swap weights
        # (static_weights=False keeps the weights as jit ARGUMENTS so the
        # swap needs no retrace — each val round reuses the compiled fns)
        if 'det' not in detector_cache:
            detector_cache['det'] = Detector(val_cfg, host_vars,
                                             static_weights=False)
        else:
            detector_cache['det'].update_variables(host_vars)
        detector = detector_cache['det']
        from eval import evaluate
        table, box_row, mask_row = evaluate(detector, val_cfg, step=step,
                                            max_images=cfg.val_num)
        if table is not None:
            map_tables.append(table)
            if writer:
                writer.add_scalar('mAP/box_map', box_row[1], global_step=step)
                writer.add_scalar('mAP/mask_map', mask_row[1], global_step=step)
            save_best({'params': host_vars['params'],
                       'batch_stats': host_vars['batch_stats']},
                      mask_row[1], cfg.name, step)

    try:
        with mesh:
            while training:
                for batch in loader:
                    batch = shard_batch(batch, mesh)
                    # fence on the loss so 'step' reports device time, not
                    # dispatch time (the analog of the reference's
                    # cuda.synchronize-bracketed sections, timer.py:65-74)
                    with timer.counter('step',
                                       fence=lambda: losses.total):
                        state, losses = train_step(state, batch, data_rng)
                    l_total = losses.total

                    now = time.time()
                    if step > start_step and time_last is not None:
                        timer.add_batch_time(now - time_last)
                    time_last = now

                    if step % 10 == 0 and step != start_step and main_proc:
                        jax.block_until_ready(l_total)
                        l_c, l_b, l_m, l_s = (float(losses.loss_c), float(losses.loss_b),
                                              float(losses.loss_m), float(losses.loss_s))
                        # failure detection: a non-finite loss means poisoned
                        # params — save a post-mortem checkpoint and abort
                        # instead of burning the rest of the schedule.
                        if not np.isfinite(l_c + l_b + l_m + l_s):
                            save_latest(_train_payload(state), cfg.name + '_nan',
                                        step)
                            raise FloatingPointError(
                                f'Non-finite loss at step {step}: '
                                f'c={l_c} b={l_b} m={l_m} s={l_s}')
                        cur_lr = float(sched(step))
                        t_t, t_d, t_s = timer.get_times(['batch', 'data', 'step'])
                        eta = str(datetime.timedelta(
                            seconds=int((end_step - step) * max(t_t, 1e-9))))
                        if writer:
                            writer.add_scalar('loss/class', l_c, global_step=step)
                            writer.add_scalar('loss/box', l_b, global_step=step)
                            writer.add_scalar('loss/mask', l_m, global_step=step)
                            writer.add_scalar('loss/semantic', l_s, global_step=step)
                            writer.add_scalar('loss/total',
                                              l_c + l_b + l_m + l_s, global_step=step)
                        print(f'step: {step} | lr: {cur_lr:.2e} | l_class: {l_c:.3f} | '
                              f'l_box: {l_b:.3f} | l_mask: {l_m:.3f} | '
                              f'l_semantic: {l_s:.3f} | t_t: {t_t:.3f} | '
                              f't_d: {t_d:.3f} | t_step: {t_s:.3f} | ETA: {eta}')

                    if (cfg.val_interval > 0 and step % cfg.val_interval == 0
                            and step != start_step and main_proc):
                        val_step = step
                        run_validation(step)
                        timer.reset()

                    if main_proc and step == val_step + 1:
                        timer.start()

                    step += 1
                    if step >= end_step:
                        training = False
                        if main_proc:
                            save_latest(_train_payload(state), cfg.name, step)
                            print('\nValidation results during training:\n')
                            for t in map_tables:
                                print(t, '\n')
                            print('Training completed.')
                        break
    except KeyboardInterrupt:
        if main_proc:
            save_latest(_train_payload(state), cfg.name, step)
            print('\nValidation results during training:\n')
            for t in map_tables:
                print(t, '\n')


if __name__ == '__main__':
    main()
