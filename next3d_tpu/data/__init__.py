from .dataset import ImageFolderDataset, InfiniteSampler, make_data_iterator
from .video_dataset import VideoFramesFolderDataset, sample_frames
