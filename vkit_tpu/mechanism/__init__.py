from . import distortion, distortion_policy
from .distortion_policy import random_distortion_factory
