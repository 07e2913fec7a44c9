"""Sustained end-to-end training throughput: run train.py as a subprocess
(res50_custom, 544px, bf16, real process-pool loader) for N steps while
sampling its RSS from /proc, then report steps/s over the back half of the
run (past compile + pool warmup) vs the device-only bench figure
(bench.py train:res50_coco:544:8 — 188 img/s in r03).

Usage: python probes/_sustained_train.py [--steps 300] [--bs 8]
"""
import argparse
import os
import re
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rss_mb(pid):
    try:
        with open(f'/proc/{pid}/status') as f:
            for line in f:
                if line.startswith('VmRSS'):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--bs', type=int, default=8)
    p.add_argument('--img_size', type=int, default=544)
    p.add_argument('--num_workers', type=int, default=8)
    args = p.parse_args()

    cmd = [sys.executable, '-u', os.path.join(ROOT, 'train.py'),
           '--cfg', 'res50_custom', '--train_bs', str(args.bs),
           '--img_size', str(args.img_size), '--compute_dtype', 'bfloat16',
           '--num_workers', str(args.num_workers),
           '--max_steps', str(args.steps), '--val_interval', '1000000']
    print('run:', ' '.join(cmd), flush=True)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=ROOT)

    rss_samples = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            r = rss_mb(proc.pid)
            if r is not None:
                rss_samples.append((time.time(), r))
            stop.wait(5.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()

    # parse step timestamps from train.py's console lines ("step N | ...")
    step_times = {}
    pat = re.compile(r'\bstep[ :]+(\d+)\b')
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        m = pat.search(line)
        if m:
            step_times[int(m.group(1))] = time.time()
    proc.wait()
    stop.set()
    th.join(timeout=2)

    if len(step_times) >= 4:
        steps = sorted(step_times)
        # back half only: past compile + loader warmup
        half = steps[len(steps) // 2:]
        dt = step_times[half[-1]] - step_times[half[0]]
        nsteps = half[-1] - half[0]
        sps = nsteps / dt if dt > 0 else float('nan')
        print(f'\nback-half sustained: {nsteps} steps in {dt:.1f}s = '
              f'{sps:.3f} steps/s = {sps * args.bs:.1f} img/s', flush=True)
    if rss_samples:
        t0, r0 = rss_samples[0]
        t1, r1 = rss_samples[-1]
        print(f'RSS: {r0:.0f} MB -> {r1:.0f} MB over {t1 - t0:.0f}s '
              f'({(r1 - r0) / max((t1 - t0) / 60, 1e-9):.1f} MB/min)',
              flush=True)
    print(f'train.py rc={proc.returncode}', flush=True)


if __name__ == '__main__':
    main()
