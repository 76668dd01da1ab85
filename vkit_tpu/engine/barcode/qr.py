"""QR barcode engine.

Capability parity: vkit/engine/barcode/qr.py:33-97.  QR encoding is a
host-side content step; unlike the reference's cv2.QRCodeEncoder call, the
symbol is produced by the first-party ISO/IEC 18004 encoder in
qr_encode.py (byte mode, ECC L) — cv2 appears only in tests, as the decode
oracle.
"""
import string
from typing import Optional

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Mask, ScoreMap
from ...utility import rng_choice_with_size
from ..interface import Engine, EngineExecutorFactory, NoneTypeEngineInitResource
from .qr_encode import encode_qr
from .type import BarcodeEngineRunConfig

CV_PAYLOAD_TEXT_LENGTH_MAX = 150


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

        # Dark modules are the activated pixels.
        mask = Mask(mat=encode_qr(payload_text))
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
