from .pipeline import (
    CenterCropDataset, ContentStylePairDataset, ImageFolderDataset, Loader,
    NpyFolderDataset, PairGridDataset, is_img, load_image, resize_shorter_side,
)
