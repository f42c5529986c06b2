#!/bin/bash
# One-shot TPU measurement queue for when the shared chip is claimable.
# Run from the repo root:  bash tools/tpu_session.sh
# Each step logs to /tmp/tpu_*.log; steps are ordered by value so a
# mid-session loss of the chip still leaves the most important numbers.
set -x
cd "$(dirname "$0")/.."
# append, don't overwrite: the TPU tunnel's jax backend registers via a
# site dir already on PYTHONPATH
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}

# 0. liveness (fails fast if the relay is down)
timeout 600 python -c "
import jax, jax.numpy as jnp
print('LIVE', float(jnp.sum(jnp.ones((128,128)))))" || exit 1

# 1. headline bench on the NEW default path (separable texmask), then the
#    fused-texmask and tiled-raster A/Bs, then binned16
timeout 1800 python bench.py 2>&1 | tee /tmp/tpu_bench_auto.log
NEXT3D_TEXMASK_PATH=fused timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_fusedmask.log
NEXT3D_BENCH_RASTER=pallas_binned16 timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_binned16.log

# 2. batch sweep 1/2/4/8/16/32 (VERDICT r4 #1d)
NEXT3D_BENCH_SWEEP=1 timeout 2400 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_sweep.log

# 3. train + reenact + synthesis -> committed BENCH_extra.json
#    (hardened fetched-median train harness; VERDICT r4 #2)
timeout 9000 python tools/make_bench_extra.py 2>&1 \
    | tee /tmp/tpu_bench_extra.log

# 4. gather-gap isolation (production vs microbench formulation) + row
#    width sweep (256 B boundary theory; multi-sample packing headroom)
timeout 1800 python tools/profile.py gap 2>&1 | tee /tmp/tpu_gap.log
timeout 1800 python tools/bench_gather_width.py 2>&1 \
    | tee /tmp/tpu_width.log

# 5. stage profiles (current hot-spot truth, incl. separable-mask A/B in
#    raster mode and mouth/blend internals in sr mode)
timeout 2400 python tools/profile.py raster 2>&1 | tee /tmp/tpu_raster.log
timeout 2400 python tools/profile.py sr 2>&1 | tee /tmp/tpu_sr.log
timeout 2400 python tools/profile.py stages 2>&1 | tee /tmp/tpu_stages.log
timeout 2400 python tools/profile.py render 2>&1 | tee /tmp/tpu_render.log
