"""Jitted data-parallel training phases.

Replaces the reference's host-driven gradient plumbing
(training_avatar_texture/training_loop.py:311-394: manual grad flatten ->
all_reduce -> /world -> nan_to_num -> opt.step, params broadcast at startup,
NCCL process groups) with explicit SPMD over a 1-D Mesh('data'): each phase
computes per-device gradients under ``jax.shard_map`` (batch sharded on the
data axis, params replicated) and reduces them with ONE ``lax.pmean`` over
ICI — exactly the collective structure of the reference's
all_reduce-then-divide (training_loop.py:352-355). Optimizer updates run on
the replicated params outside the shard_map. nan_to_num scrubbing
(reference :356) is applied to the reduced grads.

shard_map (not GSPMD auto-sharding) is deliberate: the rasterizer's
scatter/gather graphs partition trivially when the batch axis is explicit,
and the per-device program matches the reference's per-GPU semantics
(local minibatch-std groups, local conditioning-swap roll).

Lazy-regularization optimizer scaling (reference training_loop.py:252-263):
when a reg interval is set, lr and Adam betas are scaled by
mb_ratio = interval / (interval + 1) and the reg-phase loss is multiplied by
the interval (the reference's ``gain``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

NON_TRAINABLE_LEAVES = ('w_avg', 'noise_const', 'orth_scale', 'orth_shift',
                        # SG3 forward-magnitude EMA buffer: gradient flows
                        # into it via input_gain=rsqrt(magnitude_ema), but the
                        # reference never trains it (ADVICE r2; wire the
                        # functional EMA update before training SG3 nets)
                        'magnitude_ema')
W_AVG_BETA = 0.998  # reference networks_stylegan2.py:204


def trainable_mask(params, frozen_paths=()):
    """Pytree of bools: False for buffers the reference never trains
    (w_avg EMA, per-layer noise_const; orth_scale/orth_shift are plain
    tensors in the reference — never Parameters — so they never update).

    frozen_paths: path-prefix tuples (e.g. ('b512', 'conv0')) whose whole
    subtree is frozen — the D freeze_layers mechanism (reference
    networks_stylegan2.py:699-703 + train CLI --freezed)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    frozen = [tuple(fp) for fp in frozen_paths]
    mask = []
    for path, _ in flat:
        names = tuple(p.key if hasattr(p, 'key') else str(p) for p in path)
        ok = names[-1] not in NON_TRAINABLE_LEAVES
        if ok and frozen:
            ok = not any(names[:len(fp)] == fp for fp in frozen)
        mask.append(ok)
    return jax.tree_util.tree_unflatten(treedef, mask)


def make_optimizer(lr, beta1, beta2, eps, reg_interval=None):
    """Adam with lazy-regularization scaling (reference train_next3d.py
    :252-263 via training_loop.py:256-260)."""
    if reg_interval is not None and reg_interval > 1:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        beta1 = beta1 ** mb_ratio
        beta2 = beta2 ** mb_ratio
    return optax.adam(learning_rate=lr, b1=beta1, b2=beta2, eps=eps)


@dataclasses.dataclass
class TrainState:
    params_G: Any
    params_D: Any
    params_G_ema: Any
    opt_state_G: Any
    opt_state_D: Any
    cur_nimg: int = 0

    def tree(self):
        return dataclasses.asdict(self)


def _masked(grads, mask):
    return jax.tree.map(lambda g, m: jnp.nan_to_num(g) if m else jnp.zeros_like(g),
                        grads, mask)


class TrainStep:
    """Builds the four jit-compiled phase functions.

    mesh: a 1-D Mesh(('data',)) for SPMD, or None for single-device.
    """

    def __init__(self, loss_obj, opt_G, opt_D, mesh=None):
        self.loss = loss_obj
        self.opt_G = opt_G
        self.opt_D = opt_D
        self.mesh = mesh
        self._gmask = None
        self._dmask = None

    def init_state(self, rng, batch_template=None):
        kG, kD = jax.random.split(rng)
        params_G = self.loss.G.init(kG)
        params_D = self.loss.D.init(kD)
        self._gmask = trainable_mask(params_G)
        self._dmask = trainable_mask(params_D, self._d_frozen_paths())
        return TrainState(
            params_G=params_G,
            params_D=params_D,
            params_G_ema=jax.tree.map(jnp.copy, params_G),
            opt_state_G=self.opt_G.init(params_G),
            opt_state_D=self.opt_D.init(params_D),
        )

    def masks_for(self, state: TrainState):
        if self._gmask is None:
            self._gmask = trainable_mask(state.params_G)
            self._dmask = trainable_mask(state.params_D,
                                         self._d_frozen_paths())
        return self._gmask, self._dmask

    def _d_frozen_paths(self):
        fn = getattr(self.loss.D, 'frozen_paths', None)
        return fn() if fn is not None else ()

    # ------------------------------------------------------------- SPMD glue
    def _spmd_grads(self, local_fn, arg_specs):
        """Wrap a per-device (grads, aux...) fn in shard_map + pmean.

        ``local_fn(rng, *args)`` runs with the batch shard; the wrapper folds
        the device index into rng (each device draws independent noise, like
        the reference's per-rank seeds, training_loop.py:136-137) and pmeans
        every output (== all_reduce grads / world, training_loop.py:352-355).
        """
        if self.mesh is None:
            return lambda rng, *args: local_fn(rng, *args)

        def wrapped(rng, *args):
            rng = jax.random.fold_in(rng, jax.lax.axis_index('data'))
            outs = local_fn(rng, *args)
            return jax.tree.map(lambda x: jax.lax.pmean(x, 'data'), outs)

        return jax.shard_map(wrapped, mesh=self.mesh,
                             in_specs=(P(),) + tuple(arg_specs),
                             out_specs=P(),
                             check_vma=False)

    @staticmethod
    def _batch_spec():
        return {'gen_z': P('data'), 'gen_c': P('data'), 'gen_v': P('data'),
                'real_c': P('data')}

    # ---------------------------------------------------------------- phases
    @partial(jax.jit, static_argnums=(0, 7))
    def gmain(self, state_pg, state_og, params_D, batch, rng, sched, nrr):
        def local(rng, pg, pd, batch, sched):
            batch, _ = self.loss.flatten_clips(batch)
            (loss, (stats, w_mean)), grads = jax.value_and_grad(
                self.loss.gmain_loss, has_aux=True)(pg, pd, batch, rng,
                                                    sched, nrr)
            return grads, stats, w_mean

        fn = self._spmd_grads(local, (P(), P(), self._batch_spec(), P()))
        grads, stats, w_mean = fn(rng, state_pg, params_D, batch, sched)
        grads = _masked(grads, self._gmask)
        updates, new_og = self.opt_G.update(grads, state_og, state_pg)
        new_pg = optax.apply_updates(state_pg, updates)
        new_pg = self._update_w_avg(new_pg, w_mean)
        return new_pg, new_og, stats

    @partial(jax.jit, static_argnums=(0, 5))
    def greg(self, state_pg, state_og, batch, rng, gain, sched):
        def local(rng, pg, batch, sched):
            batch, _ = self.loss.flatten_clips(batch)

            def scaled(pg):
                loss, (stats,) = self.loss.greg_loss(pg, batch, rng, sched)
                return loss * gain, stats
            (loss, stats), grads = jax.value_and_grad(scaled, has_aux=True)(pg)
            return grads, stats

        fn = self._spmd_grads(local, (P(), self._batch_spec(), P()))
        grads, stats = fn(rng, state_pg, batch, sched)
        grads = _masked(grads, self._gmask)
        updates, new_og = self.opt_G.update(grads, state_og, state_pg)
        new_pg = optax.apply_updates(state_pg, updates)
        return new_pg, new_og, stats

    @partial(jax.jit, static_argnums=(0, 8))
    def dmain(self, params_pd, state_od, params_G, batch, real_img, rng, sched,
              nrr):
        def local(rng, pd, pg, batch, real_img, sched):
            batch, real_img = self.loss.flatten_clips(batch, real_img)
            real = self.loss.prepare_real(real_img, sched['blur_sigma'], nrr)
            real = jax.tree.map(jax.lax.stop_gradient, real)
            (loss, (stats, w_mean)), grads = jax.value_and_grad(
                self.loss.dmain_loss, has_aux=True)(pd, pg, batch, real, rng,
                                                    sched, nrr)
            return grads, stats, w_mean

        fn = self._spmd_grads(local, (P(), P(), self._batch_spec(),
                                      P('data'), P()))
        grads, stats, w_mean = fn(rng, params_pd, params_G, batch, real_img,
                                  sched)
        grads = _masked(grads, self._dmask)
        updates, new_od = self.opt_D.update(grads, state_od, params_pd)
        new_pd = optax.apply_updates(params_pd, updates)
        # the reference also updates G's w_avg during Dmain (update_emas=True
        # in run_G, loss.py:264)
        params_G = self._update_w_avg(params_G, w_mean)
        return new_pd, new_od, params_G, stats

    @partial(jax.jit, static_argnums=(0, 5, 8))
    def dreg(self, params_pd, state_od, batch, real_img, gain, rng, sched, nrr):
        def local(rng, pd, batch, real_img, sched):
            batch, real_img = self.loss.flatten_clips(batch, real_img)
            real = self.loss.prepare_real(real_img, sched['blur_sigma'], nrr)
            real = jax.tree.map(jax.lax.stop_gradient, real)

            def scaled(pd):
                loss, (stats,) = self.loss.dreg_loss(pd, batch, real, rng,
                                                     sched)
                return loss * gain, stats
            (loss, stats), grads = jax.value_and_grad(scaled, has_aux=True)(pd)
            return grads, stats

        fn = self._spmd_grads(local, (P(), self._batch_spec(), P('data'), P()))
        grads, stats = fn(rng, params_pd, batch, real_img, sched)
        grads = _masked(grads, self._dmask)
        updates, new_od = self.opt_D.update(grads, state_od, params_pd)
        new_pd = optax.apply_updates(params_pd, updates)
        return new_pd, new_od, stats

    def _update_w_avg(self, params_G, w_mean):
        """Reference MappingNetwork w_avg EMA (networks_stylegan2.py:251-253):
        w_avg <- lerp(mean_w, w_avg, beta)."""
        m = params_G['backbone']['mapping']
        m = dict(m, w_avg=w_mean + W_AVG_BETA * (m['w_avg'] - w_mean))
        return dict(params_G, backbone=dict(params_G['backbone'], mapping=m))

    @partial(jax.jit, static_argnums=0)
    def ema_update(self, params_G_ema, params_G, ema_beta):
        """G_ema lerp (reference training_loop.py:374-384)."""
        return jax.tree.map(
            lambda e, p: p + (e - p) * ema_beta, params_G_ema, params_G)

    # ------------------------------------------------------------- full step
    def run_phases(self, state: TrainState, batch, real_img, rng, sched, nrr,
                   do_greg: bool, do_dreg: bool, g_reg_interval=4,
                   d_reg_interval=16, ema_beta=0.999, timer=None):
        """Host-side phase sequencing for one global batch (mirrors
        training_loop.py:335-384). Returns (new_state, stats dict).

        ``timer``: optional PhaseTimer; each phase is timed with a
        block_until_ready on its outputs (the reference's Timing/<phase>
        CUDA-event stats, training_loop.py:264-269). Blocking serializes
        dispatch, so callers pass a timer only on sampled batches."""
        self.masks_for(state)
        stats = {}
        k = jax.random.split(rng, 4)

        import contextlib

        def phase(name, out=None):
            if timer is None:
                return contextlib.nullcontext()
            return timer.phase(name, block_on=out)

        with phase('Gmain') as _:
            pg, og, s = self.gmain(state.params_G, state.opt_state_G,
                                   state.params_D, batch, k[0], sched, nrr)
            if timer is not None:
                jax.block_until_ready(s)
        stats.update(s)
        if do_greg:
            with phase('Greg'):
                pg, og, s = self.greg(pg, og, batch, k[1],
                                      float(g_reg_interval), sched)
                if timer is not None:
                    jax.block_until_ready(s)
            stats.update(s)
        with phase('Dmain'):
            pd, od, pg, s = self.dmain(state.params_D, state.opt_state_D, pg,
                                       batch, real_img, k[2], sched, nrr)
            if timer is not None:
                jax.block_until_ready(s)
        stats.update(s)
        if do_dreg:
            with phase('Dreg'):
                pd, od, s = self.dreg(pd, od, batch, real_img,
                                      float(d_reg_interval), k[3], sched, nrr)
                if timer is not None:
                    jax.block_until_ready(s)
            stats.update(s)
        ema = self.ema_update(state.params_G_ema, pg, ema_beta)
        return TrainState(params_G=pg, params_D=pd, params_G_ema=ema,
                          opt_state_G=og, opt_state_D=od,
                          cur_nimg=state.cur_nimg), stats
