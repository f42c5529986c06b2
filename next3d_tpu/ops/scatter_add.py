"""Scatter-add of update rows into a table, without TPU scatter.

The VJP of every large gather in the pipeline (tri-plane sampling, texture
sampling — reference torch ``F.grid_sample`` backward, implemented there by
cuDNN's GridSamplerBackward) is a scatter-add with colliding indices. XLA
lowers that scatter to a serialized per-row loop on TPU: measured
~1.3 us/row (515 ms for 393k x 32ch rows) vs ~11.5 ns/row for the forward
gather — the single cause of the round-4 train-step pathology
(101 s/step at batch 2, BENCH_extra.json).

``scatter_add_rows`` computes the same reduction scatter-free:

  1. stable-sort the update indices together with ``num_rows`` sentinel
     keys (one per table row, listed after the updates so the stable sort
     places sentinel k after every update for row k — i.e. LAST in its
     segment);
  2. gather the update rows into sorted order (batched row gather, the
     fast TPU path) with a zero row for each sentinel;
  3. segmented inclusive scan down the sorted stream (f32 accumulation,
     resetting at each segment boundary — a global cumsum + differences
     loses up to ~1e-2 relative to catastrophic cancellation when the
     stream is long and same-signed; the segmented scan's error is
     bounded by the per-segment collision count instead);
  4. the scan value AT sentinel k is exactly the total for table row k.

Everything is sorts, gathers and elementwise math — no scatter anywhere.
All steps are BATCHED along the leading axis (axis-1 sorts/scans): under a
data-parallel mesh the whole backward stays shard-local — a single
flattened stream would force a cross-device distributed ``lax.sort``.
Summation order within a row differs from ``.at[].add`` (tree reduction),
so results match to f32 rounding, not bitwise; accumulation is always f32
even for bf16 updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# channel-chunk the scan when the sorted f32 stream would exceed this
# many bytes (keeps peak HBM bounded for wide rows, e.g. the 528-channel
# packed texture backward at batch 8); each extra chunk costs one more
# row-gather pass over the stream.
_MAX_STREAM_BYTES = 1 << 30


def _seg_combine(a, b):
    (va, fa), (vb, fb) = a, b
    return jnp.where(fb, vb, va + vb), fa | fb


def scatter_add_rows_batched(num_rows: int, idx, upd):
    """Equivalent of ``zeros((N, num_rows, C)).at[arange(N)[:, None], idx]
    .add(upd)`` — batched scatter-add, no scatter.

    Args:
      num_rows: static table height K.
      idx: (N, M) int32 row indices in [0, num_rows) — duplicates expected.
      upd: (N, M, C) update rows (any float dtype; f32 accumulation).

    Returns:
      (N, num_rows, C) in upd.dtype.
    """
    N, M, C = upd.shape
    K = int(num_rows)
    sent = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (N, K))
    keys = jnp.concatenate([idx.astype(jnp.int32), sent], axis=1)  # (N, M+K)
    pos = jnp.broadcast_to(jnp.arange(M + K, dtype=jnp.int32), (N, M + K))
    # stable: updates (listed first) sort before the equal-keyed sentinel
    _, sperm = jax.lax.sort((keys, pos), dimension=1, num_keys=1,
                            is_stable=True)
    # positions of the sentinels in the sorted stream: sorting sperm back
    # by original position puts them (already in row order — sentinel keys
    # are distinct and increasing) in the tail slice
    _, inv = jax.lax.sort((sperm, pos), dimension=1, num_keys=1)
    q = inv[:, M:]  # (N, K) position of sentinel k, strictly increasing in k

    skeys = jnp.take_along_axis(keys, sperm, axis=1)
    starts = jnp.concatenate(
        [jnp.ones((N, 1), bool), skeys[:, 1:] != skeys[:, :-1]],
        axis=1)[..., None]

    n_chunks = max(1, -(-(N * (M + K) * C * 4) // _MAX_STREAM_BYTES))
    step = -(-C // n_chunks)
    outs = []
    for c0 in range(0, C, step):
        chunk = upd[:, :, c0:c0 + step]
        zrow = jnp.zeros((N, K, chunk.shape[2]), upd.dtype)
        rows = jnp.take_along_axis(
            jnp.concatenate([chunk, zrow], axis=1), sperm[..., None],
            axis=1).astype(jnp.float32)
        scanned, _ = jax.lax.associative_scan(_seg_combine, (rows, starts),
                                              axis=1)
        outs.append(jnp.take_along_axis(scanned, q[..., None],
                                        axis=1).astype(upd.dtype))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)


def scatter_add_rows(num_rows: int, idx, upd):
    """Equivalent of ``jnp.zeros((num_rows, C)).at[idx].add(upd)``.

    Args:
      num_rows: static table height K.
      idx: (M,) int32 row indices in [0, num_rows) — duplicates expected.
      upd: (M, C) update rows (any float dtype; f32 accumulation).

    Returns:
      (num_rows, C) in upd.dtype.
    """
    return scatter_add_rows_batched(num_rows, idx[None], upd[None])[0]
