"""Deep element equality for the single-fill optimization.

Capability parity: vkit/element/uniqueness.py:20-90.
"""
from typing import Any, Sequence

import numpy as np


def check_element_equal(element0: Any, element1: Any) -> bool:
    if element0 is element1:
        return True
    if type(element0) is not type(element1):
        return False
    if isinstance(element0, np.ndarray):
        return bool(np.array_equal(element0, element1))
    if isinstance(element0, (tuple, list)):
        if len(element0) != len(element1):
            return False
        return all(check_element_equal(a, b) for a, b in zip(element0, element1))
    # Element types (Mask/ScoreMap/Image) compare by mat + box.
    mat0 = getattr(element0, 'mat', None)
    if mat0 is not None:
        return bool(
            np.array_equal(mat0, element1.mat)
            and getattr(element0, 'box', None) == getattr(element1, 'box', None)
        )
    return bool(element0 == element1)


def check_elements_uniqueness(elements: Sequence[Any]) -> bool:
    assert elements
    first = elements[0]
    return all(check_element_equal(first, element) for element in elements[1:])
