import numpy as np
import pytest

from vkit_tpu.utility import (
    convert_camel_case_name_to_snake_case_name,
    normalize_to_keys_and_probs,
    normalize_to_probs,
    rng_choice,
    rng_choice_with_size,
    rng_shuffle,
)
from vkit_tpu.utility.text import LexiconType, get_lexicon_type, normalize


def test_camel_to_snake():
    assert convert_camel_case_name_to_snake_case_name('GaussianBlurConfig') \
        == 'gaussian_blur_config'
    assert convert_camel_case_name_to_snake_case_name('JPEGQuality') == 'jpeg_quality'


def test_probs():
    assert normalize_to_probs([1, 3]) == [0.25, 0.75]
    keys, probs = normalize_to_keys_and_probs([('a', 2.0), ('b', 2.0)])
    assert keys == ['a', 'b']
    assert probs == [0.5, 0.5]


def test_rng_helpers():
    rng = np.random.default_rng(0)
    items = ['a', 'b', 'c']
    assert rng_choice(rng, items) in items
    out = rng_choice_with_size(rng, items, size=5)
    assert len(out) == 5 and set(out) <= set(items)
    shuffled = rng_shuffle(rng, items)
    assert sorted(shuffled) == items


@pytest.mark.parametrize(
    'char,expected',
    [
        ('a', LexiconType.ENGLISH),
        ('Z', LexiconType.ENGLISH),
        ('5', LexiconType.DIGIT),
        (',', LexiconType.DELIMITER),
        (' ', LexiconType.WHITESPACE),
        ('中', LexiconType.CHINESE),
        ('〇', LexiconType.CHINESE),
        ('\x00', LexiconType.UNKNOWN),
    ],
)
def test_lexicon_type(char, expected):
    assert get_lexicon_type(char) is expected


def test_normalize_fullwidth_and_compat():
    assert normalize('Ａｂｃ１２３') == 'Abc123'
    # U+F900 is the compatibility form of U+8C48.
    assert normalize('豈') == '豈'
