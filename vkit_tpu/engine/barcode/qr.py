"""QR barcode engine.

Capability parity: vkit/engine/barcode/qr.py:33-97.  QR encoding is a
host-side content step (not a dense kernel); it goes through OpenCV's
QRCodeEncoder when present — the same native library the reference calls —
with a deterministic pseudo-QR fallback (finder patterns + random payload
modules) so the engine works on cv2-free installs.
"""
import string
from typing import Optional

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import Mask, ScoreMap
from ...utility import rng_choice_with_size
from ..interface import Engine, EngineExecutorFactory, NoneTypeEngineInitResource
from .type import BarcodeEngineRunConfig

CV_PAYLOAD_TEXT_LENGTH_MAX = 150

try:
    import cv2 as _cv2
    _HAS_CV2_QR = hasattr(_cv2, 'QRCodeEncoder')
except Exception:  # noqa: BLE001
    _cv2 = None
    _HAS_CV2_QR = False


def _pseudo_qr_matrix(payload_len: int, rng: RandomGenerator) -> np.ndarray:
    """QR-looking module matrix (finder patterns + random data modules)."""
    version = int(np.clip(1 + payload_len // 20, 1, 10))
    size = 17 + 4 * version
    mat = (rng.random((size, size)) < 0.5).astype(np.uint8)

    def put_finder(y, x):
        mat[y:y + 7, x:x + 7] = 0
        mat[y:y + 7, x] = 1
        mat[y:y + 7, x + 6] = 1
        mat[y, x:x + 7] = 1
        mat[y + 6, x:x + 7] = 1
        mat[y + 2:y + 5, x + 2:x + 5] = 1

    put_finder(0, 0)
    put_finder(0, size - 7)
    put_finder(size - 7, 0)
    return mat


@attr.define
class BarcodeQrEngineInitConfig:
    payload_text_length_min: int = 1
    payload_text_length_max: int = CV_PAYLOAD_TEXT_LENGTH_MAX
    alpha_min: float = 0.7
    alpha_max: float = 1.0


class BarcodeQrEngine(
    Engine[
        BarcodeQrEngineInitConfig,
        NoneTypeEngineInitResource,
        BarcodeEngineRunConfig,
        ScoreMap,
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'qr'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)
        assert self.init_config.payload_text_length_max <= CV_PAYLOAD_TEXT_LENGTH_MAX
        self.ascii_letters = tuple(string.ascii_letters)

    def run(self, run_config: BarcodeEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> ScoreMap:
        assert rng is not None

        payload_text_length = int(
            rng.integers(
                self.init_config.payload_text_length_min,
                self.init_config.payload_text_length_max + 1,
            )
        )
        payload_text = ''.join(
            rng_choice_with_size(rng, self.ascii_letters, size=payload_text_length)
        )

        if _HAS_CV2_QR:
            encoder = _cv2.QRCodeEncoder.create()
            # Black modules are the activated pixels.
            mask = Mask(mat=encoder.encode(payload_text)).to_inverted_mask()
        else:
            mask = Mask(mat=_pseudo_qr_matrix(payload_text_length, rng))
        assert mask.height == mask.width

        qrcode_score_map = ScoreMap.from_shapable(mask)
        qrcode_score_map[mask] = float(
            rng.uniform(self.init_config.alpha_min, self.init_config.alpha_max)
        )

        if qrcode_score_map.shape != (run_config.height, run_config.width):
            qrcode_score_map = qrcode_score_map.to_resized_score_map(
                resized_height=run_config.height,
                resized_width=run_config.width,
            )
        return qrcode_score_map


barcode_qr_engine_executor_factory = EngineExecutorFactory(BarcodeQrEngine)
