from . import batched, distortion, distortion_policy
from .batched import batch_distort_images
from .distortion_policy import random_distortion_factory
