from . import batched, batched_random, distortion, distortion_policy
from .batched import batch_distort_images
from .batched_random import batch_random_photometric_distort
from .distortion_policy import random_distortion_factory
