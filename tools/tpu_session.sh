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
timeout 600 python -c "import jax; print(jax.devices())" || exit 1

# 1. verify drive: flagship fwd on-chip, UV kernel vs tiled (correctness)
timeout 1200 python /tmp/verify_drive.py 2>&1 | tee /tmp/tpu_verify.log

# 2. headline bench A/B: UV-emitting binned kernel (auto) vs tiled,
#    then the fused VMEM-gather sampler (round-3 candidate)
timeout 1800 python bench.py 2>&1 | tee /tmp/tpu_bench_auto.log
NEXT3D_BENCH_RASTER=tiled timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_tiled.log
NEXT3D_BENCH_SWEEP=1 timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_sweep.log

# 3. train + reenact + synthesis -> committed BENCH_extra.json
#    (VERDICT r2 #3)
timeout 9000 python tools/make_bench_extra.py 2>&1 \
    | tee /tmp/tpu_bench_extra.log

# 4. stage profiles (current hot-spot truth)
timeout 1800 python tools/profile_stages2.py 2>&1 | tee /tmp/tpu_stages.log
timeout 1800 python tools/profile_render2.py 2>&1 | tee /tmp/tpu_render.log

# 5. gather microbench (fused-kernel design input)
timeout 1800 python tools/profile_dyngather.py 2>&1 \
    | tee /tmp/tpu_dyngather.log
