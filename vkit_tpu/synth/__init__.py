"""The tensor-first synthesis pipeline (SURVEY §7 `synth/`).

Host steps (layout sampling, char/font sampling, label polygon prep) emit
flat tensors + placement tables; ONE device program batch then covers
assemble (glyph compositing) -> distort (photometric rounds + dense
geometric warp of image AND label rasters) -> label correction (local
Jacobian height rescale) -> resize.  This is the throughput twin of the
per-sample 17-step host pipeline (vkit_tpu/pipeline/text_detection/),
which remains the behavioral reference.
"""
from .prep import SynthPlanner, SynthPlannerConfig, HostPage
from .device import CropConfig, SynthBatchResult, synthesize_page_batch, synthesize_stream
from .region import (
    CharRegression,
    RegionBatchResult,
    RegionStreamConfig,
    stack_text_regions,
)

__all__ = [
    'SynthPlanner',
    'SynthPlannerConfig',
    'HostPage',
    'synthesize_page_batch',
    'synthesize_stream',
    'SynthBatchResult',
    'CropConfig',
    'CharRegression',
    'RegionBatchResult',
    'RegionStreamConfig',
    'stack_text_regions',
]
