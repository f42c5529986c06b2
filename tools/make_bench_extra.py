"""Produce BENCH_extra.json: train / reenact / synthesis throughput on the
real chip (VERDICT r2 item 3 — committed artifacts beyond the driver's
single headline bench).

Runs bench.py in each mode as a subprocess (fresh runtime per mode so HBM
is clean) and collects the JSON lines. Usage:

    python tools/make_bench_extra.py            # all modes
    NEXT3D_BENCH_EXTRA_MODES=train python tools/make_bench_extra.py
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_mode(mode, extra_env=None, timeout=3600):
    # append (not overwrite) PYTHONPATH: the TPU tunnel registers its jax
    # backend via a site dir already on PYTHONPATH
    pp = os.pathsep.join(p for p in (ROOT, os.environ.get('PYTHONPATH'))
                         if p)
    env = dict(os.environ, NEXT3D_BENCH_MODE=mode,
               PYTHONPATH=pp, **(extra_env or {}))
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(ROOT, 'bench.py')],
                       env=env, capture_output=True, text=True,
                       timeout=timeout)
    line = next((ln for ln in p.stdout.splitlines()
                 if ln.startswith('{')), None)
    rec = json.loads(line) if line else {'error': p.stderr[-2000:]}
    rec['mode'] = mode
    rec.update(extra_env or {})
    rec['wall_s'] = round(time.time() - t0, 1)
    if p.stderr.strip():
        rec['stderr_tail'] = p.stderr.strip().splitlines()[-3:]
    print(json.dumps(rec), flush=True)
    return rec


def main():
    modes = os.environ.get(
        'NEXT3D_BENCH_EXTRA_MODES', 'synthesis,reenact,train').split(',')
    # NOTE: no jax import here — a parent-process device claim could
    # starve the bench subprocesses on the shared single-chip tunnel
    path = os.path.join(ROOT, 'BENCH_extra.json')
    out = {'platform': os.environ.get('JAX_PLATFORMS', 'default'),
           'records': []}
    if os.path.exists(path):
        # partial reruns (NEXT3D_BENCH_EXTRA_MODES=train) replace only
        # their own mode's record
        with open(path) as f:
            prior = json.load(f)
        out['records'] = [r for r in prior.get('records', [])
                          if r.get('mode') not in modes]
    for m in modes:
        # the full 4-phase 512^2 step at batch 4 exhausts v5e HBM;
        # batch 2 is the measured operating point (overridable)
        env = ({'NEXT3D_BENCH_BATCH':
                os.environ.get('NEXT3D_BENCH_TRAIN_BATCH', '2')}
               if m == 'train' else {})
        try:
            out['records'].append(run_mode(m.strip(), env))
        except Exception as e:
            out['records'].append({'mode': m, 'error': str(e)})
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()
