"""Dataset packer (reference: dataset_tool.py:328-521).

Converts an images+meshes+lms folder into the training layout and pre-bakes
the mesh/landmark arrays (the TPU input pipeline never parses text at train
time — SURVEY section 7.3 step 8).
"""

from __future__ import annotations

import json
import os
import shutil
import zipfile

import click
import numpy as np


@click.command()
@click.option('--source', required=True,
              help='folder with images512x512/, meshes512x512/, lms512x512/, dataset.json')
@click.option('--dest', required=True, help='output folder (or .zip)')
@click.option('--resolution', type=int, default=None)
def main(source, dest, resolution):
    convert_dataset(source, dest, resolution)


def convert_dataset(source, dest, resolution=None):
    from PIL import Image
    from ..data import ImageFolderDataset

    os.makedirs(dest, exist_ok=True)
    labels = {}
    src_json = os.path.join(source, 'dataset.json')
    if os.path.exists(src_json):
        with open(src_json) as f:
            labels = dict(json.load(f)['labels'])

    out_labels = []
    for root, _dirs, files in os.walk(source):
        for fname in sorted(files):
            rel = os.path.relpath(os.path.join(root, fname), source)
            rel = rel.replace('\\', '/')
            ext = os.path.splitext(fname)[1].lower()
            src = os.path.join(root, fname)
            dst = os.path.join(dest, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if ext in ('.png', '.jpg', '.jpeg'):
                if resolution is not None:
                    img = Image.open(src)
                    if img.size != (resolution, resolution):
                        img = img.resize((resolution, resolution),
                                         Image.LANCZOS)
                    img.save(dst)
                else:
                    shutil.copyfile(src, dst)
                if rel in labels:
                    out_labels.append([rel, labels[rel]])
            elif ext in ('.obj', '.txt'):
                shutil.copyfile(src, dst)
    with open(os.path.join(dest, 'dataset.json'), 'w') as f:
        json.dump({'labels': out_labels}, f)

    ds = ImageFolderDataset(dest)
    vp, lp = ds.prebake(force=True)
    print(f'packed {len(ds)} items -> {dest}; prebaked {vp}, {lp}')


if __name__ == '__main__':
    main()
