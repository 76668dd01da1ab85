"""First-party QR encoder: decode oracle + structural checks."""
import numpy as np
import pytest

from vkit_tpu.engine.barcode.qr_encode import (
    _build_codewords,
    _rs_ec_codewords,
    encode_qr,
)

cv2 = pytest.importorskip('cv2')


def test_rs_known_vector():
    # "HELLO WORLD" v1-M data codewords -> published EC codewords.
    data = [
        0x20, 0x5B, 0x0B, 0x78, 0xD1, 0x72, 0xDC, 0x4D,
        0x43, 0x40, 0xEC, 0x11, 0xEC, 0x11, 0xEC, 0x11,
    ]
    assert _rs_ec_codewords(data, 10) == [
        0xC4, 0x23, 0x27, 0x77, 0xEB, 0xD7, 0xE7, 0xE2, 0x5D, 0x17,
    ]


def test_byte_mode_codewords():
    cw = _build_codewords(b'A', 1)
    assert len(cw) == 26
    assert cw[:5] == [0x40, 0x14, 0x10, 0xEC, 0x11]


def _decode(mat: np.ndarray) -> str:
    big = np.kron(1 - mat, np.ones((8, 8), dtype=np.uint8)) * 255
    big = np.pad(big, 32, constant_values=255)
    text, _, _ = cv2.QRCodeDetector().detectAndDecode(big)
    return text


@pytest.mark.parametrize('payload', [
    'A',
    'hello world',
    'The quick brown fox jumps over the lazy dog',
    'Z' * 150,
    'mixed 123 !@# text',
    'y' * 200,
])
def test_roundtrip_cv2_oracle(payload):
    mat = encode_qr(payload)
    size = mat.shape[0]
    assert size % 4 == 1 and size >= 21
    assert _decode(mat) == payload


def test_capacity_limit():
    with pytest.raises(ValueError):
        encode_qr('x' * 500)


def test_qr_engine_runs():
    from vkit_tpu.engine.barcode.qr import (
        BarcodeQrEngineInitConfig,
        barcode_qr_engine_executor_factory,
    )
    from vkit_tpu.engine.barcode.type import BarcodeEngineRunConfig

    executor = barcode_qr_engine_executor_factory.create(
        BarcodeQrEngineInitConfig()
    )
    rng = np.random.default_rng(0)
    score_map = executor.run(
        BarcodeEngineRunConfig(height=96, width=96), rng
    )
    assert score_map.shape == (96, 96)
    assert score_map.mat.max() > 0.5
