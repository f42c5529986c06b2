"""Calculate quality metrics for a snapshot (reference: calc_metrics.py)."""

from __future__ import annotations

import json
import os

import click

from .common import build_generator_from_kwargs


@click.command()
@click.option('--network', 'network_path', required=True)
@click.option('--metrics', type=str, default='fid50k_full')
@click.option('--data', 'data_path', required=True)
@click.option('--topology-path', type=str,
              default='/root/reference/data/demo/demo.obj')
@click.option('--run-dir', type=str, default=None)
@click.option('--batch', 'batch_size', type=int, default=16)
def main(network_path, metrics, data_path, topology_path, run_dir, batch_size):
    from ..data import ImageFolderDataset
    from ..metrics import calc_metric, is_valid_metric, list_valid_metrics
    from ..utils.checkpoint import load_any_generator

    params, init_kwargs = load_any_generator(network_path)
    G = build_generator_from_kwargs(init_kwargs, topology_path)
    dataset = ImageFolderDataset(data_path, resolution=G.img_resolution)

    for metric in metrics.split(','):
        if not is_valid_metric(metric):
            raise click.ClickException(
                f'unknown metric {metric}; valid: {list_valid_metrics()}')
        record = calc_metric(metric, run_dir=run_dir, generator=G,
                             params=params, dataset=dataset,
                             batch_size=batch_size)
        print(json.dumps(record, default=str))


if __name__ == '__main__':
    main()
