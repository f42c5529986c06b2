"""Unified CLI: next3d-tpu <command>."""

import click


@click.group()
def main():
    """TPU-native Next3D: 3D-aware generative head avatars."""


def _register():
    from .gen_samples import main as gen_samples
    from .gen_videos import main as gen_videos
    from .reenact import main as reenact
    from .train import main as train
    from .calc_metrics import main as calc_metrics
    from .dataset_tool import main as dataset_tool
    from .preprocess_cli import preprocess
    main.add_command(gen_samples, 'gen-samples')
    main.add_command(gen_videos, 'gen-videos')
    main.add_command(reenact, 'reenact')
    main.add_command(train, 'train')
    main.add_command(calc_metrics, 'calc-metrics')
    main.add_command(dataset_tool, 'dataset-tool')
    main.add_command(preprocess, 'preprocess')


_register()

if __name__ == '__main__':
    main()
