from ..interface import EngineExecutorAggregatorFactory
from .type import (
    CharBox,
    CharGlyph,
    FontCollection,
    FontEngineRunConfig,
    FontEngineRunConfigGlyphSequence,
    FontEngineRunConfigStyle,
    FontGlyphInfo,
    FontGlyphInfoCollection,
    FontMeta,
    FontMode,
    FontVariant,
    TextLine,
)
from .pil_font import (
    FontFreetypeDefaultEngine,
    FontFreetypeLcdEngine,
    FontFreetypeMonochromeEngine,
    font_freetype_default_engine_executor_factory,
    font_freetype_lcd_engine_executor_factory,
    font_freetype_monochrome_engine_executor_factory,
)

font_engine_executor_aggregator_factory = EngineExecutorAggregatorFactory([
    font_freetype_default_engine_executor_factory,
    font_freetype_lcd_engine_executor_factory,
    font_freetype_monochrome_engine_executor_factory,
])
