from . import transforms
from .crowd import CrowdDataset, NWPUTestDataset, normalize_image, denormalize_image
from .density import rasterize_points, block_sum
from .loader import Batch, TrainLoader, pad_points, make_train_transforms, make_eval_transforms
