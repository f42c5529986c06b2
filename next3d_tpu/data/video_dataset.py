"""Video-clip dataset: depth-2 frame directories with temporal sampling.

Behavioral spec: training_avatar_texture/dataset.py:378-584
(VideoFramesFolderDataset) + the ``sample_frames`` temporal sampler the
training path reuses from dataset_tool.py:458-516. Each item is a CLIP of
``num_frames`` frames (images, labels, verts+lms each per frame); the loss
flattens clips into the batch axis (loss.py:102-108).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..utils.obj_io import load_lms, load_obj_verts


def sample_frames(num_available, num_frames=1, sampling='random',
                  max_frame_dist=30, rng=None):
    """Temporal frame-index sampling (reference: dataset_tool.py:458-516).

    'random': random window up to max_frame_dist; 'uniform': evenly spaced
    over a random window; 'consecutive': adjacent frames.
    """
    rng = rng or np.random
    if num_frames == 1:
        return np.array([rng.randint(num_available)])
    if sampling == 'consecutive':
        start = rng.randint(max(num_available - num_frames + 1, 1))
        return np.arange(start, start + num_frames) % num_available
    window = min(max_frame_dist, num_available)
    start = rng.randint(max(num_available - window + 1, 1))
    if sampling == 'uniform':
        offs = np.linspace(0, window - 1, num_frames).astype(np.int64)
    else:  # random
        offs = np.sort(rng.choice(window, size=num_frames, replace=False)) \
            if window >= num_frames else np.arange(num_frames) % window
    return start + offs


class VideoFramesFolderDataset:
    """root/<clip>/<frame>.png (+ mesh/lms via the images->meshes->lms path
    swap) with labels in dataset.json keyed by 'clip/frame' paths."""

    def __init__(self, path, resolution=None, num_frames=1, sampling='random',
                 max_frame_dist=30, max_num_frames=None, use_labels=True,
                 load_verts=True, labels_file='dataset.json', seed=0):
        self._path = path
        self.num_frames = num_frames
        self.sampling = sampling
        self.max_frame_dist = max_frame_dist
        # cap on usable frames per clip (reference train loop:
        # min(get_video_len(i), max_num_frames), training_loop.py:323)
        self.max_num_frames = max_num_frames
        self.load_verts = load_verts
        self._rng = np.random.RandomState(seed)

        labels = {}
        jpath = os.path.join(path, labels_file)
        if use_labels and os.path.exists(jpath):
            with open(jpath) as f:
                labels = dict(json.load(f)['labels'])
        self._labels = labels

        # depth-2 clip discovery
        self._clips = []
        for clip in sorted(os.listdir(path)):
            cdir = os.path.join(path, clip)
            if not os.path.isdir(cdir) or clip.startswith(('meshes', 'lms')):
                continue
            frames = sorted(f for f in os.listdir(cdir)
                            if f.lower().endswith(('.png', '.jpg', '.jpeg')))
            if frames:
                self._clips.append((clip, frames))
        if not self._clips:
            raise IOError(f'no clips under {path}')
        if resolution is None:
            from PIL import Image
            clip0, frames0 = self._clips[0]
            with Image.open(os.path.join(path, clip0, frames0[0])) as im:
                resolution = im.size[0]
        self.resolution = resolution

    def __len__(self):
        return len(self._clips)

    def _clip_len(self, idx):
        n = len(self._clips[idx][1])
        return min(n, self.max_num_frames) if self.max_num_frames else n

    @property
    def label_dim(self):
        if not self._labels:
            return 0
        return len(next(iter(self._labels.values())))

    def _frame_paths(self, clip, frame):
        img = os.path.join(self._path, clip, frame)
        stem = os.path.splitext(frame)[0]
        mesh = os.path.join(self._path, clip.replace('images', 'meshes'),
                            stem + '.obj')
        if not os.path.exists(mesh):
            mesh = os.path.join(self._path, 'meshes', clip, stem + '.obj')
        lms = mesh.replace('meshes', 'lms').replace('.obj', '.txt')
        return img, mesh, lms

    def get_label_std(self):
        if not self._labels:
            return np.zeros((0,), np.float32)
        return np.asarray(list(self._labels.values()), np.float32).std(0)

    def _load_frames(self, idx, sel, load_images=True):
        """(T,C,H,W) uint8 images, (T,L) labels, (T,5091,3) verts+lms for
        frame indices ``sel`` of clip ``idx``. ``load_images=False`` skips
        image decode (conditioning draws need only labels+verts — the
        reference's get_label/get_vert path, training_loop.py:326-333)."""
        from PIL import Image
        clip, frames = self._clips[idx]
        imgs, labels, verts = [], [], []
        for fi in sel:
            frame = frames[int(fi)]
            ipath, mpath, lpath = self._frame_paths(clip, frame)
            if load_images:
                img = np.asarray(Image.open(ipath))
                if img.ndim == 2:
                    img = img[:, :, None]
                imgs.append(img.transpose(2, 0, 1))
            key = f'{clip}/{frame}'
            labels.append(np.asarray(self._labels.get(key, []), np.float32))
            if self.load_verts:
                v = load_obj_verts(mpath)
                l = load_lms(lpath)
                verts.append(np.concatenate([v, l], 0))
        out_v = np.stack(verts) if verts else np.zeros((len(sel), 0, 3),
                                                       np.float32)
        out_i = np.stack(imgs) if imgs else None
        return (out_i, np.stack(labels), out_v)

    def sample_conditioning(self, rnd, n):
        """n generator-conditioning draws, each a fresh clip + per-clip
        temporal frame sampling — the reference's per-video gen conditioning
        (training_loop.py:323-333: random video index, sample_frames over its
        length, get_label/get_vert per frame). Returns c (n, T, L) and
        v (n, T, 5091, 3)."""
        cs, vs = [], []
        for _ in range(n):
            idx = rnd.randint(len(self))
            sel = sample_frames(self._clip_len(idx), self.num_frames,
                                self.sampling, self.max_frame_dist, rng=rnd)
            _, c, v = self._load_frames(idx, sel, load_images=False)
            cs.append(c)
            vs.append(v)
        return (np.stack(cs).astype(np.float32),
                np.stack(vs).astype(np.float32))

    def __getitem__(self, idx):
        sel = sample_frames(self._clip_len(idx), self.num_frames,
                            self.sampling, self.max_frame_dist,
                            rng=self._rng)
        return self._load_frames(idx, sel)
