#!/bin/bash
# One-shot TPU measurement queue for when the shared chip is claimable.
# Run from the repo root:  bash tools/tpu_session.sh
# Each step logs to /tmp/tpu_*.log; steps are ordered by value so a
# mid-session loss of the chip still leaves the most important numbers.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD

# 0. liveness (fails fast if the relay is down)
timeout 600 python -c "import jax; print(jax.devices())" || exit 1

# 1. verify drive: flagship fwd on-chip, UV kernel vs tiled (correctness)
timeout 1200 python /tmp/verify_drive.py 2>&1 | tee /tmp/tpu_verify.log

# 2. headline bench A/B: UV-emitting binned kernel (auto) vs tiled,
#    then the fused VMEM-gather sampler (round-3 candidate)
timeout 1800 python bench.py 2>&1 | tee /tmp/tpu_bench_auto.log
NEXT3D_BENCH_RASTER=tiled timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_tiled.log
NEXT3D_BENCH_FUSED_GATHER=1 timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_fusedgather.log

# 3. train + reenact modes (BENCH_extra artifacts; VERDICT r2 #3)
NEXT3D_BENCH_MODE=train NEXT3D_BENCH_BATCH=4 timeout 3600 python bench.py \
    2>&1 | tee /tmp/tpu_bench_train.log
NEXT3D_BENCH_MODE=reenact timeout 1800 python bench.py 2>&1 \
    | tee /tmp/tpu_bench_reenact.log

# 4. stage profiles (current hot-spot truth)
timeout 1800 python tools/profile_stages2.py 2>&1 | tee /tmp/tpu_stages.log
timeout 1800 python tools/profile_render2.py 2>&1 | tee /tmp/tpu_render.log

# 5. gather microbench (fused-kernel design input)
timeout 1800 python tools/profile_dyngather.py 2>&1 \
    | tee /tmp/tpu_dyngather.log
