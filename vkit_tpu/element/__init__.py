"""Element layer: host-side label algebra.

Capability parity: vkit/element/__init__.py:14-22.
"""
from .type import ElementSetOperationMode, Shapable
from .point import Point, PointList, PointTuple
from .line import Line
from .box import Box, BoxOverlappingValidator
from .polygon import Polygon, unionize_polygons
from .mask import Mask, MaskSetItemConfig
from .score_map import ScoreMap, ScoreMapSetItemConfig
from .image import Image, ImageMode, ImageSetItemConfig
from .lexicon import Lexicon, LexiconCollection
from ..ops.resize_taps import Interpolation
