from .type import (
    DistortionConfigGenerator,
    DistortionPolicy,
    DistortionPolicyFactory,
)
from .random_distortion import (
    RandomDistortion,
    RandomDistortionDebug,
    RandomDistortionFactory,
    RandomDistortionFactoryConfig,
    RandomDistortionStageConfig,
    random_distortion_factory,
)
from . import geometric, photometric
