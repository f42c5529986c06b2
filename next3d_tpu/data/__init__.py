from .dataset import ImageFolderDataset, InfiniteSampler, make_data_iterator
