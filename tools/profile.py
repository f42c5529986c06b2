"""Consolidated trusted-protocol profiler for the flagship pipeline.

Every probe is ONE jit whose inputs are derived on-device from a fresh host
scalar per call, so the remote client cannot dedup dispatches and XLA cannot
constant-fold the stage away (measurement discipline: see README "TPU
kernels & performance").

Usage:
    python tools/profile.py stages   # coarse per-stage table (512^2 fwd)
    python tools/profile.py render   # volume-render internals
    python tools/profile.py raster   # rasterize-stage internals
    python tools/profile.py sr       # superresolution + backbones detail

Env: PROF_B (batch, default 8), PROF_FP32=1 for parity dtype,
PROF_ITERS (default 8).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import __graft_entry__ as ge  # noqa: E402
from next3d_tpu.models import TriPlaneGenerator  # noqa: E402

B = int(os.environ.get('PROF_B', '8'))
ITERS = int(os.environ.get('PROF_ITERS', '8'))

G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4,
                      force_fp32=os.environ.get('PROF_FP32', '0') == '1')
params = jax.device_put(G.init(jax.random.PRNGKey(0)))
c = jnp.asarray(ge._camera_batch(B))
v = jnp.asarray(ge._verts_batch(B))
n_tex = G.texture_backbone.num_ws


def _drain(out):
    """Guaranteed sync: fetch a scalar that depends on the output (this
    client's block_until_ready can return before the queue drains — see
    docs/STAGE_PROFILE.md measurement discipline)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def probe(name, fn, iters=ITERS):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(params, jnp.float32(0.5))
    _drain(out)
    compile_s = time.perf_counter() - t0
    _drain(f(params, jnp.float32(0.33)))  # warm-up (autotune drain)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, jnp.float32(0.1 + 0.8 * np.random.rand()))
    _drain(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1000:9.1f} ms   [compile {compile_s:.0f}s]",
          flush=True)
    return dt


def sub(name, t_with, t_base):
    print(f"{'  -> ' + name:42s} {(t_with - t_base) * 1000:9.1f} ms")
    return t_with - t_base


def mk_z(eps):
    k = jax.random.fold_in(jax.random.PRNGKey(7),
                           (eps * 1e6).astype(jnp.int32))
    return jax.random.normal(k, (B, 512)) * eps


def mk_ws(p, eps):
    return G.mapping(p, mk_z(eps), c)


def tex(p, eps):
    ws = mk_ws(p, eps)
    return G.texture_backbone.synthesis(p['texture_backbone']['synthesis'],
                                        ws[:, n_tex:], noise_mode='const',
                                        force_fp32=G.force_fp32)


def planes_fn(p, eps):
    ws = mk_ws(p, eps)
    return G.build_planes(p, ws, v, noise_mode='const')[0]


def mode_stages():
    def full(p, eps):
        return G(p, mk_z(eps), c, v, noise_mode='const')['image']
    t_full = probe("FULL forward 512^2", full)

    t_tex = probe("texture backbone 256^2x32", tex)

    def stat(p, eps):
        ws = mk_ws(p, eps)
        return G.backbone.synthesis(p['backbone']['synthesis'], ws[:, :n_tex],
                                    noise_mode='const',
                                    force_fp32=G.force_fp32)
    probe("static backbone 256^2x96", stat)

    def rast(p, eps):
        t = tex(p, eps)
        return G.rasterize(p, v[:, :5023], v[:, 5023:], t)
    t_rast = probe("tex + rasterize 4 views", rast)
    sub("rasterize alone", t_rast, t_tex)

    def mouth(p, eps):
        ws = mk_ws(p, eps)
        imgs, alphas, lm2d = G.rasterize(p, v[:, :5023], v[:, 5023:],
                                         tex(p, eps))
        return G._mouth_pipeline(p, imgs[0], lm2d, ws[:, :n_tex], 'const',
                                 None)
    t_m = probe("tex + rast + mouth/blend", mouth)
    sub("mouth/blend alone", t_m, t_rast)

    t_pl = probe("build_planes (all)", planes_fn)

    from next3d_tpu.render.ray_sampler import sample_rays
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4),
                         c[:, 16:25].reshape(-1, 3, 3), 64)

    def rend(p, eps):
        pl = planes_fn(p, eps)
        return G.renderer(None, pl, (p['decoder'], G.decoder), ro, rd,
                          G.rendering_kwargs)[0]
    t_r = probe("planes + volume render", rend)
    sub("volume render alone", t_r, t_pl)

    def sr(p, eps):
        ws = mk_ws(p, eps)
        feats = rend(p, eps)
        fi = feats.transpose(0, 2, 1).reshape(B, 32, 64, 64)
        return G.superresolution(p['superresolution'], fi[:, :3], fi,
                                 ws[:, :n_tex], noise_mode='none',
                                 force_fp32=G.force_fp32)
    t_sr = probe("... + superresolution", sr)
    sub("SR alone", t_sr, t_r)
    print(f"\nFULL {t_full * 1000:.1f} ms -> {B / t_full:.1f} img/s")


def mode_render():
    """Volume-render internals at the training/bench shape: 64^2 rays,
    48 coarse + 48 importance."""
    from next3d_tpu.render import renderer as R
    from next3d_tpu.render.ray_marcher import mip_ray_marcher2
    from next3d_tpu.render.ray_sampler import sample_rays
    opts = G.rendering_kwargs
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4),
                         c[:, 16:25].reshape(-1, 3, 3), 64)
    S = opts['depth_resolution']

    def mk_planes(p, eps):
        # synthesized-plane stand-in: cheap on-device derivation (trusted
        # protocol) with the same shape/dtype as build_planes output
        k = jax.random.fold_in(jax.random.PRNGKey(3),
                               (eps * 1e6).astype(jnp.int32))
        return jax.random.normal(k, (B, 3, 32, G.plane_resolution,
                                     G.plane_resolution), jnp.float32)

    def mk_coords(p, eps):
        d = R.sample_stratified(None, ro, opts['ray_start'], opts['ray_end'],
                                S, False) + eps * 1e-6
        coords = (ro[:, :, None] + d * rd[:, :, None]).reshape(B, -1, 3)
        dirs = jnp.broadcast_to(rd[:, :, None],
                                (B, ro.shape[1], S, 3)).reshape(B, -1, 3)
        return d, coords, dirs

    t0 = probe("depths+coords only", lambda p, e: mk_coords(p, e)[1])

    def gather(p, eps):
        pl = mk_planes(p, eps)
        _, coords, _ = mk_coords(p, eps)
        return R.sample_from_planes(pl, coords, box_warp=opts['box_warp'],
                                    gather_bf16=opts.get('gather_bf16',
                                                         not G.force_fp32))
    t_g = probe("1 pass: tri-plane gather (1.57M x3)", gather)
    sub("gather alone", t_g, t0)

    def decode(p, eps):
        feats = gather(p, eps)
        return G.decoder(p['decoder'], feats, None)['sigma']
    t_d = probe("gather + decoder MLP", decode)
    sub("decoder alone", t_d, t_g)

    def march(p, eps):
        pl = mk_planes(p, eps)
        d, coords, dirs = mk_coords(p, eps)
        out = R.run_model(pl, (p['decoder'], G.decoder), coords, dirs, opts) \
            if hasattr(R, 'run_model') else None
        feats = R.sample_from_planes(pl, coords, box_warp=opts['box_warp'],
                                     gather_bf16=True)
        o = G.decoder(p['decoder'], feats, None)
        colors = o['rgb'].reshape(B, -1, S, o['rgb'].shape[-1])
        dens = o['sigma'].reshape(B, -1, S, 1)
        return mip_ray_marcher2(colors, dens, d, opts)[0]
    t_m = probe("pass + marcher", march)
    sub("marcher alone", t_m, t_d)

    def pdf(p, eps):
        pl = mk_planes(p, eps)
        d, coords, dirs = mk_coords(p, eps)
        feats = R.sample_from_planes(pl, coords, box_warp=opts['box_warp'],
                                     gather_bf16=True)
        o = G.decoder(p['decoder'], feats, None)
        colors = o['rgb'].reshape(B, -1, S, o['rgb'].shape[-1])
        dens = o['sigma'].reshape(B, -1, S, 1)
        _, _, w = mip_ray_marcher2(colors, dens, d, opts)
        return R.sample_importance(None, d, w,
                                   opts['depth_resolution_importance'])
    t_p = probe("pass + marcher + sample_pdf", pdf)
    sub("sample_pdf alone", t_p, t_m)

    def unify(p, eps):
        pl = mk_planes(p, eps)
        d, coords, dirs = mk_coords(p, eps)
        feats = R.sample_from_planes(pl, coords, box_warp=opts['box_warp'],
                                     gather_bf16=True)
        o = G.decoder(p['decoder'], feats, None)
        colors = o['rgb'].reshape(B, -1, S, o['rgb'].shape[-1])
        dens = o['sigma'].reshape(B, -1, S, 1)
        return R.unify_samples(d, colors, dens, d + 0.01, colors, dens)[0]
    t_u = probe("pass + unify sort (96 samples)", unify)
    sub("unify alone", t_u, t_d)

    def full(p, eps):
        pl = mk_planes(p, eps)
        return G.renderer(None, pl, (p['decoder'], G.decoder), ro, rd, opts)[0]
    probe("FULL two-pass render", full)


def mode_raster():
    """Rasterize-stage internals: binned kernel, attribute path, texture
    gather, fill_mouth, eye-mask ride-along."""
    from next3d_tpu.ops import grid_sample_2d
    from next3d_tpu.render.fill_mouth import fill_mouth
    from next3d_tpu.render.mesh import batch_orth_proj

    V = len(G.view_tforms)
    res = G.uv_resolution

    def mk_tv(p, eps):
        vv = v[:, :5023] * jnp.asarray([1., -1., 1.])
        tv = jnp.einsum('vnpc,vcd->vnpd',
                        jnp.broadcast_to(vv[None], (V,) + vv.shape),
                        jnp.asarray(G.view_tforms))
        tv = (tv + p['orth_shift']) * p['orth_scale'] + eps * 1e-6
        tv = tv.reshape(V * B, 5023, 3)
        tv = batch_orth_proj(tv, jnp.asarray([1., 0., 0.]))
        tv = tv.at[:, :, 1:].multiply(-1)
        return tv.at[:, :, 2].add(10.0)

    probe("project verts only", mk_tv)

    faces = jnp.asarray(G.faces)
    attrs0 = jnp.asarray(G.face_uvcoords[..., :2])

    def prep(p, eps):
        from next3d_tpu.ops.pallas_raster import _binned_uv_entries
        tv = mk_tv(p, eps)
        attrs = jnp.broadcast_to(attrs0[None], (V * B,) + attrs0.shape)
        return _binned_uv_entries(tv, faces, attrs, res,
                                  4096)[1]
    t_prep = probe("binned prep alone (sort 32x40k entries)", prep)

    def kernel(p, eps):
        from next3d_tpu.ops.pallas_raster import \
            rasterize_mesh_pallas_binned_uv
        tv = mk_tv(p, eps)
        attrs = jnp.broadcast_to(attrs0[None], (V * B,) + attrs0.shape)
        pf, u, vv = rasterize_mesh_pallas_binned_uv(tv, faces, attrs, res)
        return u
    t_k = probe("binned UV raster kernel (32 meshes)", kernel)
    sub("pallas kernel alone", t_k, t_prep)

    def prep16(p, eps):
        from next3d_tpu.ops.pallas_raster import _binned_uv_entries16
        tv = mk_tv(p, eps)
        attrs = jnp.broadcast_to(attrs0[None], (V * B,) + attrs0.shape)
        return _binned_uv_entries16(tv, faces, attrs, res, 1024)[1]
    t_p16 = probe("binned16 prep alone (sort 32x90k)", prep16)

    def kernel16(p, eps):
        from next3d_tpu.ops.pallas_raster import \
            rasterize_mesh_pallas_binned_uv16
        tv = mk_tv(p, eps)
        attrs = jnp.broadcast_to(attrs0[None], (V * B,) + attrs0.shape)
        pf, u, vv = rasterize_mesh_pallas_binned_uv16(tv, faces, attrs, res)
        return u
    t_k16 = probe("binned16 UV raster kernel (32 meshes)", kernel16)
    sub("pallas kernel16 alone", t_k16, t_p16)

    def mk_grid(p, eps):
        u = kernel(p, eps)
        grid = jnp.stack([u, u], -1)
        grid_vn = grid.reshape(V, B, res, res, 2).transpose(1, 0, 2, 3, 4)
        return grid_vn.reshape(B, V * res, res, 2)

    def texgather(p, eps):
        # round-4 fused form: eye mask rides the texture gather -> packed
        # rows are 4*33 = 132 bf16 lanes = 264 B, past the 256 B boundary
        t = tex(p, eps)
        if not G.force_fp32:
            t = t.astype(jnp.bfloat16)
        eye = jnp.broadcast_to(jnp.asarray(G.uv_face_mask)[None, None],
                               (B, 1, res, res)).astype(t.dtype)
        return grid_sample_2d(jnp.concatenate([t, eye], 1), mk_grid(p, eps))
    t_tx = probe("kernel + tex gather FUSED 33ch (2.1M)", texgather)
    t_tex_b = probe("  (texture backbone alone)", tex)
    print(f"{'  -> fused texture gather alone':42s} "
          f"{(t_tx - t_k - t_tex_b) * 1000:9.1f} ms")

    def texgather_sep(p, eps):
        # round-5 form: 128-lane texture gather + separable mask contraction
        from next3d_tpu.ops.shared_sample import bilinear_sample_shared
        t = tex(p, eps)
        if not G.force_fp32:
            t = t.astype(jnp.bfloat16)
        grid_vn = mk_grid(p, eps)
        s = grid_sample_2d(t, grid_vn)
        m = bilinear_sample_shared(jnp.asarray(G.uv_face_mask).astype(t.dtype),
                                   grid_vn)
        return s, m
    t_tx2 = probe("kernel + tex gather SEP 32ch + mask", texgather_sep)
    print(f"{'  -> separable texture gather alone':42s} "
          f"{(t_tx2 - t_k - t_tex_b) * 1000:9.1f} ms")

    def maskonly(p, eps):
        from next3d_tpu.ops.shared_sample import bilinear_sample_shared
        dt = jnp.float32 if G.force_fp32 else jnp.bfloat16
        return bilinear_sample_shared(jnp.asarray(G.uv_face_mask).astype(dt),
                                      mk_grid(p, eps))
    t_mo = probe("kernel + mask contraction only", maskonly)
    sub("mask contraction alone", t_mo, t_k)

    def fm(p, eps):
        u = kernel(p, eps)
        alpha = (u > 0).astype(jnp.float32)[:, None]
        return fill_mouth(alpha)
    t_f = probe("kernel + fill_mouth (32 x 256^2)", fm)
    sub("fill_mouth alone", t_f, t_k)

    def full(p, eps):
        t = tex(p, eps)
        return G.rasterize(p, v[:, :5023], v[:, 5023:], t)[0][0]
    t_full = probe("FULL rasterize stage (incl. texture)", full)
    sub("full minus texture backbone", t_full, t_tex_b)


def mode_gap():
    """Locate the production-vs-microbench volume-gather gap (round 5):
    the stage profile attributes ~82-90 ms/pass to the tri-plane gather
    while the microbench floor for the same 4.7M rows is ~51 ms. Probes
    peel the production formulation back to the raw gather."""
    from next3d_tpu.render import renderer as R
    from next3d_tpu.render.ray_sampler import sample_rays
    from next3d_tpu.ops.grid_sample import _grid_sample_packed
    opts = G.rendering_kwargs
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4),
                         c[:, 16:25].reshape(-1, 3, 3), 64)
    S = opts['depth_resolution']
    res = G.plane_resolution
    dt = jnp.float32 if G.force_fp32 else jnp.bfloat16

    def mk_planes(p, eps):
        k = jax.random.fold_in(jax.random.PRNGKey(3),
                               (eps * 1e6).astype(jnp.int32))
        return jax.random.normal(k, (B, 3, 32, res, res), dt)

    def mk_coords(p, eps):
        d = R.sample_stratified(None, ro, opts['ray_start'], opts['ray_end'],
                                S, False) + eps * 1e-6
        return (ro[:, :, None] + d * rd[:, :, None]).reshape(B, -1, 3)

    t_in = probe("planes + coords only", lambda p, e: (mk_planes(p, e),
                                                       mk_coords(p, e)))

    # (a) microbench formulation: raw flat gather from a PREBUILT packed
    # table; only the indices vary per call.
    packed_const = jax.device_put(
        np.random.randn(B * 3 * res * res, 128).astype(np.float32)
        .astype(dt))
    M = 4096 * S

    def raw(p, eps):
        coords = mk_coords(p, eps)
        proj = R.project_onto_planes((2 / opts['box_warp']) * coords)
        x = (proj[..., 0] + 1) * (res / 2) - 0.5
        y = (proj[..., 1] + 1) * (res / 2) - 0.5
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 2)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 2)
        idx = (by * res + bx).reshape(B * 3, M)
        fidx = idx + (jnp.arange(B * 3, dtype=jnp.int32)
                      * (res * res))[:, None]
        g = jax.lax.gather(
            packed_const, fidx.reshape(-1, 1),
            jax.lax.GatherDimensionNumbers(offset_dims=(1,),
                                           collapsed_slice_dims=(0,),
                                           start_index_map=(0,)),
            slice_sizes=(1, 128),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return jnp.sum(g.astype(jnp.float32), axis=-1)
    t_raw = probe("(a) raw gather, prebuilt table (4.7M)", raw)
    sub("raw gather alone", t_raw, t_in)

    # (b) full packed grid_sample on fresh planes: adds table build
    # (pad/concat/transpose) + 4-slot weighting + output transpose.
    def packed(p, eps):
        pl = mk_planes(p, eps).reshape(B * 3, 32, res, res)
        coords = mk_coords(p, eps)
        proj = R.project_onto_planes((2 / opts['box_warp']) * coords)
        x = (proj[..., 0] + 1) * (res / 2) - 0.5
        y = (proj[..., 1] + 1) * (res / 2) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        return _grid_sample_packed(pl, x0.astype(jnp.int32),
                                   y0.astype(jnp.int32), x - x0, y - y0,
                                   1, M)
    t_pk = probe("(b) packed grid_sample, fresh planes", packed)
    sub("table build + weighting + transpose", t_pk, t_raw)

    # (c) production sample_from_planes (adds f32 promote + final
    # transpose/reshape to (N, 3, M, C)).
    def prod(p, eps):
        return R.sample_from_planes(mk_planes(p, eps), mk_coords(p, eps),
                                    box_warp=opts['box_warp'],
                                    gather_bf16=not G.force_fp32)
    t_pr = probe("(c) sample_from_planes production", prod)
    sub("promote + out transpose", t_pr, t_pk)

    # (d) as (b) but WITHOUT the final (N, C, 1, M) -> transpose: isolates
    # the output relayout cost.
    def packed_sum(p, eps):
        out = packed(p, eps)
        return jnp.sum(out.astype(jnp.float32), axis=1)
    probe("(d) packed + reduce (no out transpose)", packed_sum)


def mode_sr():
    from next3d_tpu.render.ray_sampler import sample_rays
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4),
                         c[:, 16:25].reshape(-1, 3, 3), 64)

    def mk_feat(p, eps):
        k = jax.random.fold_in(jax.random.PRNGKey(5),
                               (eps * 1e6).astype(jnp.int32))
        return jax.random.normal(k, (B, 32, 64, 64), jnp.float32)

    def sr(p, eps):
        ws = mk_ws(p, eps)
        fi = mk_feat(p, eps)
        return G.superresolution(p['superresolution'], fi[:, :3], fi,
                                 ws[:, :n_tex], noise_mode='none',
                                 force_fp32=G.force_fp32)
    probe("SR head alone (64 -> 512)", sr)

    def mouth(p, eps):
        ws = mk_ws(p, eps)
        k = jax.random.fold_in(jax.random.PRNGKey(6),
                               (eps * 1e6).astype(jnp.int32))
        front = jax.random.normal(k, (B, 32, G.plane_resolution,
                                      G.plane_resolution), jnp.float32)
        lm2d = v[:, 5023:, :2] * 0.5
        return G._mouth_pipeline(p, front, lm2d, ws[:, :n_tex], 'const', None)
    probe("mouth+blend StyleUNets alone", mouth)

    # --- mouth-pipeline internals (VERDICT r4 #1c) ---
    def mk_crop(p, eps):
        k = jax.random.fold_in(jax.random.PRNGKey(8),
                               (eps * 1e6).astype(jnp.int32))
        dt = jnp.float32 if G.force_fp32 else jnp.bfloat16
        return jax.random.normal(k, (B, 32, 64, 64), dt)

    def mouth_bb(p, eps):
        ws = mk_ws(p, eps)
        return G.mouth_backbone.synthesis(
            p['mouth_backbone']['synthesis'], mk_crop(p, eps), ws[:, :n_tex],
            noise_mode='const', force_fp32=G.force_fp32)
    probe("  mouth_backbone alone (64-cond)", mouth_bb)

    def blend_bb(p, eps):
        ws = mk_ws(p, eps)
        k = jax.random.fold_in(jax.random.PRNGKey(9),
                               (eps * 1e6).astype(jnp.int32))
        dt = jnp.float32 if G.force_fp32 else jnp.bfloat16
        st = jax.random.normal(k, (B, 32, G.plane_resolution,
                                   G.plane_resolution), dt)
        return G.neural_blending.synthesis(
            p['neural_blending']['synthesis'], st, ws[:, :n_tex],
            noise_mode='const', force_fp32=G.force_fp32)
    probe("  neural_blending alone (256-cond)", blend_bb)

    def croppaste(p, eps):
        from next3d_tpu.ops.interpolate import (paste_resized_region,
                                                resample_region)
        k = jax.random.fold_in(jax.random.PRNGKey(6),
                               (eps * 1e6).astype(jnp.int32))
        front = jax.random.normal(k, (B, 32, G.plane_resolution,
                                      G.plane_resolution), jnp.float32)
        lm2d = v[:, 5023:, :2] * 0.5
        boxes = G.gen_mouth_mask(lm2d)
        size = boxes[:, 1] - boxes[:, 0]
        if not G.force_fp32:
            front = front.astype(jnp.bfloat16)
        crop = jax.vmap(
            lambda img, b, s: resample_region(img, b[0], b[2], s, s, 64, 64)
        )(front, boxes, size)
        return jax.vmap(
            lambda img, patch, b, s: paste_resized_region(img, patch, b[0],
                                                          b[2], s, s)
        )(front, crop, boxes, size)
    probe("  crop+paste resamplers alone", croppaste)


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'stages'
    print(f"profile mode={mode} batch={B} "
          f"force_fp32={G.force_fp32} device={jax.devices()[0]}", flush=True)
    {'stages': mode_stages, 'render': mode_render, 'raster': mode_raster,
     'sr': mode_sr, 'gap': mode_gap}[mode]()
