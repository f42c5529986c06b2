"""Inception score (reference: metrics/inception_score.py)."""

from __future__ import annotations

import numpy as np

from .metric_utils import MetricOptions, compute_feature_stats_for_generator


def compute_is(opts: MetricOptions, num_gen=50000, num_splits=10):
    """Expects the detector to return softmax probabilities (the reference
    calls the Inception pickle with no_output_bias=True,
    inception_score.py:23). When no explicit detector is passed, build the
    on-device probs head from NEXT3D_INCEPTION_PATH."""
    import dataclasses
    import os
    if opts.detector is None:
        path = os.environ.get('NEXT3D_INCEPTION_PATH')
        if path and os.path.exists(path):
            from .inception_jax import make_jax_probs_detector
            opts = dataclasses.replace(
                opts, detector=make_jax_probs_detector(path))
    gen_probs = compute_feature_stats_for_generator(
        opts, capture_all=True, capture_mean_cov=False,
        max_items=num_gen).get_all()
    scores = []
    for i in range(num_splits):
        part = gen_probs[i * num_gen // num_splits:
                         (i + 1) * num_gen // num_splits]
        kl = part * (np.log(part + 1e-12) -
                     np.log(np.mean(part, 0, keepdims=True) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    return float(np.mean(scores)), float(np.std(scores))
