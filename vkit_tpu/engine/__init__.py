"""Engine layer: pluggable content generators.

Capability parity: vkit/engine/* (font, char_sampler, char_and_font_sampler,
image, barcode, seal_impression, char_heatmap, char_mask).
"""
from .interface import (
    Engine,
    EngineExecutor,
    EngineExecutorAggregator,
    EngineExecutorAggregatorFactory,
    EngineExecutorFactory,
    NoneTypeEngineInitConfig,
    NoneTypeEngineInitResource,
)
from .barcode import (
    barcode_code39_engine_executor_factory,
    barcode_qr_engine_executor_factory,
)
from .char_and_font_sampler import (
    CharAndFont,
    char_and_font_sampler_engine_executor_factory,
)
from .char_heatmap import char_heatmap_engine_executor_aggregator_factory
from .char_mask import char_mask_engine_executor_aggregator_factory
from .char_sampler import char_sampler_engine_executor_aggregator_factory
from .font import font_engine_executor_aggregator_factory
from .image import image_engine_executor_aggregator_factory
from .seal_impression import seal_impression_engine_executor_aggregator_factory
