"""CLI for the pure-image dataset-preparation stages.

Mirrors the image-only steps of the reference FFHQ pipeline
(dataset_preprocessing/ffhq/runme.py:21-77): align -> crop -> mirror
(the camera-label canonicalization lives in `data/preprocess.py` and the
final packing in `dataset-tool`). The 3DMM/FLAME fitting networks remain
an external pipeline (SURVEY 7.2).
"""

from __future__ import annotations

import click


@click.group()
def preprocess():
    """Image-only dataset preparation (align / crop / mirror)."""


@preprocess.command()
@click.option('--source', required=True, help='wild-image folder')
@click.option('--dest', required=True, help='aligned output folder')
@click.option('--landmarks', 'landmarks_json', required=True,
              help='JSON {filename: [[x, y] * 68]} (FFHQ in-the-wild '
                   'face_landmarks)')
@click.option('--output-size', type=int, default=1500, show_default=True)
@click.option('--transform-size', type=int, default=4096, show_default=True)
@click.option('--no-padding', is_flag=True, default=False)
@click.option('--max-images', type=int, default=None)
def align(source, dest, landmarks_json, output_size, transform_size,
          no_padding, max_images):
    """FFHQ landmark-quad realignment (align_multiprocess.py)."""
    from ..data.image_prep import align_dataset
    n = align_dataset(source, dest, landmarks_json, output_size=output_size,
                      transform_size=transform_size,
                      enable_padding=not no_padding, max_images=max_images)
    click.echo(f'aligned {n} images -> {dest}')


@preprocess.command()
@click.option('--indir', 'source', required=True)
@click.option('--outdir', 'dest', required=True)
@click.option('--cropping-params', default=None,
              help='cropping_params.json (default: <indir>/cropping_params.json)')
@click.option('--max-images', type=int, default=None)
def crop(source, dest, cropping_params, max_images):
    """Final 512^2 POS-aligned crops (crop_images.py)."""
    from ..data.image_prep import crop_dataset
    n = crop_dataset(source, dest, cropping_params=cropping_params,
                     max_images=max_images)
    click.echo(f'cropped {n} images -> {dest}')


@preprocess.command()
@click.option('--source', required=True)
@click.option('--dest', default=None,
              help='defaults to in-place (like the reference)')
@click.option('--max-images', type=int, default=None)
def mirror(source, dest, max_images):
    """x-flip images (+ yaw-flipped labels when dataset.json is present)."""
    from ..data.image_prep import mirror_dataset
    n = mirror_dataset(source, dest, max_images=max_images)
    click.echo(f'mirrored {n} images')


@preprocess.command('cameras')
@click.option('--source', required=True, help='folder with dataset.json')
@click.option('--dest', default=None)
@click.option('--mode', type=click.Choice(['orig', 'cor']), default='orig')
def cameras(source, dest, mode):
    """Canonicalize camera labels (preprocess_face_cameras.py)."""
    from ..data.preprocess import canonicalize_cameras_json
    out = canonicalize_cameras_json(source, dest, mode=mode)
    click.echo(f'wrote {out}')
