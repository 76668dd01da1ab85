from .interface import (
    Distortion,
    DistortionConfig,
    DistortionNopState,
    DistortionResult,
    DistortionState,
)
from . import geometric, photometric
