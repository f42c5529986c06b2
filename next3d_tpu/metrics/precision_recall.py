"""Improved precision & recall (reference: metrics/precision_recall.py)."""

from __future__ import annotations

import numpy as np

from .metric_utils import (MetricOptions, compute_feature_stats_for_dataset,
                           compute_feature_stats_for_generator)


def _kth_nn_distance(row_features, col_features, nhood_size, batch=1024):
    """Distance to the k-th nearest col neighbour for each row feature."""
    out = []
    for lo in range(0, row_features.shape[0], batch):
        rows = row_features[lo:lo + batch]
        d2 = (np.sum(rows ** 2, 1, keepdims=True)
              - 2 * rows @ col_features.T
              + np.sum(col_features ** 2, 1)[None])
        d2 = np.maximum(d2, 0)
        kth = np.partition(d2, nhood_size, axis=1)[:, nhood_size]
        out.append(np.sqrt(kth))
    return np.concatenate(out)


def compute_pr(opts: MetricOptions, max_real=200000, num_gen=50000,
               nhood_size=3):
    real = compute_feature_stats_for_dataset(
        opts, capture_all=True, capture_mean_cov=False,
        max_items=max_real).get_all().astype(np.float64)
    gen = compute_feature_stats_for_generator(
        opts, capture_all=True, capture_mean_cov=False,
        max_items=num_gen).get_all().astype(np.float64)

    # manifold radii
    real_radii = _kth_nn_distance(real, real, nhood_size)
    gen_radii = _kth_nn_distance(gen, gen, nhood_size)

    # precision: fraction of gen inside the real manifold
    d_gen_to_real = _nn_under_radius(gen, real, real_radii)
    precision = float(np.mean(d_gen_to_real))
    # recall: fraction of real inside the gen manifold
    d_real_to_gen = _nn_under_radius(real, gen, gen_radii)
    recall = float(np.mean(d_real_to_gen))
    return precision, recall


def _nn_under_radius(queries, refs, ref_radii, batch=1024):
    hits = []
    for lo in range(0, queries.shape[0], batch):
        q = queries[lo:lo + batch]
        d2 = (np.sum(q ** 2, 1, keepdims=True) - 2 * q @ refs.T
              + np.sum(refs ** 2, 1)[None])
        d = np.sqrt(np.maximum(d2, 0))
        hits.append(np.any(d <= ref_radii[None, :], axis=1))
    return np.concatenate(hits)
