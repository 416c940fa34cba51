from .nifti import NiftiImage, load, save
from .acdc import (
    ACDCDataset,
    ACDCTestDataset,
    Volume,
    kfold_split,
    pad_center_crop,
    read_series_file,
    resample_to_orig,
    undo_crop,
)
from .augment import (
    edge_ground_truth,
    make_augment_fn,
    normalize_for_eval,
)
