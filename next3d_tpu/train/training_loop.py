"""Host-side training orchestration.

Behavioral spec: training_avatar_texture/training_loop.py:99-534 — phase
scheduling with lazy regularization intervals, EMA with ramp-up, per-tick
stats lines, image snapshot grids, full snapshots, jsonl logging.

TPU-first: the heavy work happens in TrainStep's jitted phases over the
data mesh; this loop only feeds host batches, tracks schedules, and does IO.
Resume restores the FULL state (params, EMA, both Adam states, cur_nimg) —
an exact continuation, unlike the reference's warm start (SURVEY 5.3/5.4).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from ..parallel import StatsCollector, data_parallel_mesh, replicate, shard_batch
from ..utils.checkpoint import load_snapshot, save_snapshot


def check_replica_consistency(tree, mesh):
    """Assert replicated params are bitwise identical across devices
    (substitutes the reference's check_ddp_consistency broadcast-compare,
    torch_utils/misc.py:185-196). With GSPMD replication this is structural,
    so this is a debug assertion, not a per-snapshot necessity."""
    import jax
    for leaf in jax.tree.leaves(tree):
        shards = getattr(leaf, 'addressable_shards', None)
        if not shards or len(shards) < 2:
            continue
        first = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(first, np.asarray(s.data)):
                raise AssertionError('replica mismatch detected')


def training_loop(
    G, D, loss_obj, step, data_iterator, run_dir,
    total_kimg=25000,
    batch_size=32,
    ema_kimg=10.0,
    ema_rampup=0.05,
    g_reg_interval=4,
    d_reg_interval=16,
    kimg_per_tick=4,
    snapshot_ticks=50,
    image_snapshot_ticks=50,
    resume_path: Optional[str] = None,
    seed=0,
    config=None,
    snapshot_vis_batch=None,
    abort_fn=None,
    progress_fn=None,
):
    import jax

    os.makedirs(run_dir, exist_ok=True)
    mesh = data_parallel_mesh()
    rng = jax.random.PRNGKey(seed)

    state = step.init_state(jax.random.fold_in(rng, 0))
    cur_nimg = 0
    if resume_path:
        snap = load_snapshot(resume_path)
        if snap.get('format_version') == 1:
            state.params_G = snap['params_G'] or state.params_G
            state.params_D = snap['params_D'] or state.params_D
            state.params_G_ema = snap['params_G_ema'] or state.params_G_ema
            if snap.get('opt_state_G') is not None:
                state.opt_state_G = _restore_opt(state.opt_state_G,
                                                 snap['opt_state_G'])
                state.opt_state_D = _restore_opt(state.opt_state_D,
                                                 snap['opt_state_D'])
            cur_nimg = snap.get('cur_nimg', 0)
        else:
            # reference .pkl warm start (EG3D or Next3D snapshot)
            from ..utils.pkl_import import state_dict_to_params
            from .warm_start import copy_matching_params, eg3d_to_next3d
            sd = snap['G_ema'].state_dict() if 'G_ema' in snap else None
            if sd:
                imported = state_dict_to_params(sd)
                imported = eg3d_to_next3d(imported)
                state.params_G = copy_matching_params(state.params_G, imported)
                state.params_G_ema = copy_matching_params(state.params_G_ema,
                                                          imported)
            if 'D' in snap and snap['D'] is not None:
                state.params_D = copy_matching_params(
                    state.params_D,
                    state_dict_to_params(snap['D'].state_dict()))

    for attr in ('params_G', 'params_D', 'params_G_ema', 'opt_state_G',
                 'opt_state_D'):
        setattr(state, attr, replicate(getattr(state, attr), mesh))

    stats = StatsCollector()
    stats_jsonl = open(os.path.join(run_dir, 'stats.jsonl'), 'at')
    if config is not None:
        with open(os.path.join(run_dir, 'training_options.json'), 'wt') as f:
            json.dump(config, f, indent=2, default=str)

    tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    start_time = time.time()
    batch_idx = 0

    while True:
        host_batch = next(data_iterator)
        real_img = shard_batch(host_batch['image'], mesh)
        rng, k_z, k_step = jax.random.split(rng, 3)
        gen_z = np.asarray(jax.random.normal(
            k_z, (batch_size, G.z_dim), np.float32))
        # generator conditioning: shuffled real labels/verts (reference
        # training_loop.py:324-333 draws from the dataset label distribution)
        perm = np.random.RandomState(batch_idx).permutation(batch_size)
        batch = shard_batch({
            'gen_z': gen_z,
            'gen_c': host_batch['c'][perm],
            'gen_v': host_batch['v'][perm],
            'real_c': host_batch['c'],
        }, mesh)

        sched, nrr = loss_obj.schedules(cur_nimg)
        do_greg = (g_reg_interval is not None and
                   batch_idx % g_reg_interval == 0)
        do_dreg = (d_reg_interval is not None and
                   batch_idx % d_reg_interval == 0)
        # EMA beta with ramp-up (reference training_loop.py:374-381)
        ema_nimg = ema_kimg * 1000
        if ema_rampup is not None:
            ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
        ema_beta = 0.5 ** (batch_size / max(ema_nimg, 1e-8))

        state, step_stats = step.run_phases(
            state, batch, real_img, k_step, sched, nrr,
            do_greg=do_greg, do_dreg=do_dreg,
            g_reg_interval=g_reg_interval, d_reg_interval=d_reg_interval,
            ema_beta=ema_beta)
        stats.report_dict({k: float(v) for k, v in step_stats.items()})

        cur_nimg += batch_size
        batch_idx += 1
        state.cur_nimg = cur_nimg

        done = cur_nimg >= total_kimg * 1000
        if abort_fn is not None and abort_fn():
            done = True
        if cur_nimg < tick_start_nimg + kimg_per_tick * 1000 and not done:
            continue

        # ---- tick
        tick_time = time.time() - tick_start_time
        line = (f"tick {tick:<5d} kimg {cur_nimg / 1e3:<8.1f} "
                f"time {time.time() - start_time:<8.1f}s "
                f"sec/kimg {tick_time / max((cur_nimg - tick_start_nimg) / 1e3, 1e-8):<7.2f} ")
        for name in ('Loss/G/loss', 'Loss/D/loss'):
            if name in stats.names():
                line += f"{name.split('/')[-2]}loss {stats.mean(name):<6.3f} "
        print(line, flush=True)
        stats_jsonl.write(json.dumps(
            {'tick': tick, 'kimg': cur_nimg / 1e3,
             **{k: stats.mean(k) for k in stats.names()}}) + '\n')
        stats_jsonl.flush()
        stats.reset()
        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)

        if image_snapshot_ticks is not None and \
                (tick % image_snapshot_ticks == 0 or done) and \
                snapshot_vis_batch is not None:
            _save_fakes_grid(G, state, snapshot_vis_batch, run_dir,
                             cur_nimg)

        if snapshot_ticks is not None and (tick % snapshot_ticks == 0 or done) \
                and tick > 0:
            check_replica_consistency(state.params_G, mesh)
            save_snapshot(
                os.path.join(run_dir,
                             f'network-snapshot-{cur_nimg // 1000:06d}.pkl'),
                params_G=state.params_G, params_D=state.params_D,
                params_G_ema=state.params_G_ema,
                opt_state_G=state.opt_state_G, opt_state_D=state.opt_state_D,
                cur_nimg=cur_nimg, rng_key=rng, config=config)

        tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        if done:
            break

    stats_jsonl.close()
    return state


def _restore_opt(template, saved):
    """Rebuild optimizer state preserving optax's structure."""
    import jax
    leaves_saved = jax.tree.leaves(saved)
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves_saved)


def _save_fakes_grid(G, state, vis_batch, run_dir, cur_nimg):
    """fakes<kimg>.png grid from G_ema (reference training_loop.py:428-435)."""
    import jax
    import jax.numpy as jnp
    from ..cli.common import save_image_grid
    try:
        ws = G.mapping(state.params_G_ema, jnp.asarray(vis_batch['gen_z']),
                       jnp.asarray(vis_batch['gen_c']))
        out = G.synthesis(state.params_G_ema, ws,
                          jnp.asarray(vis_batch['gen_c']),
                          jnp.asarray(vis_batch['gen_v']),
                          noise_mode='const')
        save_image_grid(np.asarray(out['image']),
                        os.path.join(run_dir,
                                     f'fakes{cur_nimg // 1000:06d}.png'))
        save_image_grid(np.asarray(out['image_raw']),
                        os.path.join(run_dir,
                                     f'fakes{cur_nimg // 1000:06d}_raw.png'))
    except Exception as e:  # snapshot images must never kill training
        print(f'image snapshot failed: {e}')
